package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting.
  *
  * AQE's skew-join split (enabled by default in [[graft.Sessions]]) handles
  * most runtime skew; salting is the explicit, planner-independent fallback
  * for the pathological case — one key holding a double-digit percentage of
  * a 100 TB fact table.
  *
  * Shape: the big (skewed) side gets a deterministic salt in [0, n) derived
  * from a non-key column hash; the small side is replicated n times with
  * every salt value. The join key becomes (key, salt) — the hot key's rows
  * spread over n reducers instead of one.
  */
object Skew {

  /** Deterministic salt from row content (never rand() — retries and
    * speculative tasks must salt identically).
    */
  def salt(n: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong)).cast("int")

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side salted by
    * `saltCols` content and the small side replicated `n` ways. Result is
    * row-identical to the plain join (spec-verified).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
                 saltCols: Seq[String]): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      salt(n, saltCols.map(col): _*))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
