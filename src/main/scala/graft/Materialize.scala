package graft

import org.apache.spark.sql.DataFrame

/** One switch for how iterative operators pin their per-round state.
  *
  * The engine's iterative loops (connected-components closure, the
  * curation funnel, multi-consumer intermediates) must MATERIALIZE each
  * round: plain persist() leaves the logical plan growing per round
  * (optimizer time explodes) and partial actions leave caches incomplete
  * (exponential recompute). `localCheckpoint(eager = true)` is the right
  * default — no configuration, no HDFS round-trip — but its blocks live
  * on executors only: under executor loss the lineage is gone and the job
  * fails. At 100 TB on preemptible machines that trade-off flips.
  *
  * The escape hatch: set BOTH a SparkContext checkpoint directory and
  * `graft.checkpoint.reliable=true` in the session conf, and every
  * materialization point goes through reliable `checkpoint()` (plan +
  * blocks re-loadable from the checkpoint dir, surviving executor loss).
  * Results are identical either way — MaterializeSpec pins that.
  */
object Materialize {

  val ReliableKey = "graft.checkpoint.reliable"

  /** True when the session asks for reliable checkpoints AND a
    * checkpoint dir exists to honor it.
    */
  def reliable(df: DataFrame): Boolean = {
    val spark = df.sparkSession
    spark.conf.getOption(ReliableKey).exists(_.equalsIgnoreCase("true")) &&
      spark.sparkContext.getCheckpointDir.isDefined
  }

  /** Cut the plan and pin the data: reliable `checkpoint()` when
    * configured, `localCheckpoint` otherwise.
    */
  def apply(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
