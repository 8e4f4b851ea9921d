package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard assignment — the last step of corpus
  * assembly: route every document to one of `nShards` output shards and
  * give it a stable position within its shard, so a training run reads
  * identical shard files from any engine, cluster size, or rerun.
  *
  * Both the shard id and the in-shard order are CONTENT-keyed (md5 of the
  * text), not partition- or arrival-keyed: adding hardware, reordering
  * input splits, or regenerating upstream parquet cannot move a document
  * to a different shard or position (the [[QualityFilters.hashSampleFlag]]
  * stability argument).
  *
  * Scale shape: the in-shard position is a window partitioned BY SHARD —
  * one sort task per shard. That is only a problem if shards are sized
  * absurdly; real training shards target file-system-friendly sizes
  * (~0.5-2 GB), so `nShards ≈ corpus / 1 GB` gives thousands of
  * well-sized sort tasks at 100 TB, which is exactly the parallelism the
  * final write wants anyway.
  */
object Sharding {

  /** 60-bit md5-prefix of a string column as a non-negative long —
    * the scalar twin of [[graft.functions.PortableHash.hash60]]
    * (`('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB).
    */
  private def md5Prefix60Scalar(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Assign (shard, pos) to every row: shard = content-hash mod nShards,
    * pos = 0-based rank of the full md5 within the shard (ties broken by
    * id — identical texts keep distinct, stable slots).
    */
  def assignShards(df: DataFrame, idCol: String, textCol: String,
                   nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy("shard")
      .orderBy(col("__md5key"), col(idCol))
    df.select(col(idCol), col(textCol),
              md5(col(textCol).cast("binary")).as("__md5key"))
      .withColumn("shard",
                  pmod(md5Prefix60Scalar(col(textCol)), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__md5key")
  }

  /** Write the sharded corpus as parquet partitioned by shard, each
    * shard's file sorted by `pos` — the layout a data loader streams
    * sequentially. One output file per shard (that is what `pos` is for);
    * size nShards to your file-size target, per the scale note above.
    */
  def writeShardedParquet(df: DataFrame, idCol: String, textCol: String,
                          nShards: Int, path: String): Unit =
    assignShards(df, idCol, textCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
}
