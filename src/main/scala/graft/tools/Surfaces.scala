package graft.tools

/** Prints the driver-contract surface counts (dev tool): registered
  * queries, oracle-carrying queries, bench subset, and any query missing
  * an oracle (which the driver downgrades to a rows-only check).
  */
object Surfaces {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    val b = graft.SparkEntry.benchQueries
    println(s"[surfaces] queries=${q.size} oracles=${o.size} " +
            s"bench=${b.size}")
    val noOracle = (q -- o).toSeq.sorted
    if (noOracle.nonEmpty)
      println(s"[surfaces] rows-only (no oracle): ${noOracle.mkString(",")}")
    val dangling = (o -- q).toSeq.sorted
    if (dangling.nonEmpty)
      println(s"[surfaces] ORACLE WITHOUT QUERY: ${dangling.mkString(",")}")
    val benchMissing = b.filterNot(q.contains)
    if (benchMissing.nonEmpty)
      println(s"[surfaces] BENCH WITHOUT QUERY: ${benchMissing.mkString(",")}")
  }
}
