package graft.plans

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Column lineage ([[PlanLineage]]): hand-derived expectations on
  * independent plans — aliases, expressions, aggregation, joins (value
  * lineage of the surviving attribute), unions, windows, and the
  * filter/join-condition exclusion (control lineage stays out).
  */
class PlanLineageSpec extends SparkSpec {

  private def lin(df: org.apache.spark.sql.DataFrame) =
    PlanLineage.columnLineage(df).toSet

  test("projection, alias chains, and multi-column expressions") {
    val l = Tables.lineitem(spark, sf0001)
    val df = l.select((col("l_extendedprice") * (lit(1) -
                        col("l_discount"))).as("rev"),
                      col("l_orderkey").as("k"))
      .select(col("rev"), (col("k") + 1).as("k1"))
    assert(lin(df) == Set(
      ("rev", "lineitem", "l_extendedprice"),
      ("rev", "lineitem", "l_discount"),
      ("k1", "lineitem", "l_orderkey")))
  }

  test("filters and join conditions are control lineage — excluded; " +
       "the surviving join attribute carries its own side's lineage") {
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
    val df = l.filter(col("l_quantity") > 10) // control only
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
      .join(o.select(col("o_orderkey"), col("o_custkey")),
            Seq("o_orderkey"))
      .select("o_orderkey", "o_custkey")
    assert(lin(df) == Set(
      // USING join keeps the LEFT attribute: lineage follows the value
      ("o_orderkey", "lineitem", "l_orderkey"),
      ("o_custkey", "orders", "o_custkey")))
  }

  test("aggregation: grouping keys and literal-only aggregates") {
    val l = Tables.lineitem(spark, sf0001)
    val df = l.groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    assert(lin(df) == Set(
      ("flag", "lineitem", "l_returnflag"),
      // n = count(1) depends on no column — absent by design
      ("qty", "lineitem", "l_quantity")))
  }

  test("union merges positional lineage across branches") {
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
    val df = o.select(col("o_orderkey").as("k"))
      .unionByName(l.select(col("l_orderkey").as("k")))
      .select(col("k"))
    assert(lin(df) == Set(("k", "orders", "o_orderkey"),
                          ("k", "lineitem", "l_orderkey")))
  }

  test("window expressions reference their value columns") {
    import org.apache.spark.sql.expressions.Window
    val l = Tables.lineitem(spark, sf0001)
    val df = l.withColumn("r",
      sum(col("l_quantity")).over(
        Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
      .select("r")
    val got = lin(df)
    assert(got.contains(("r", "lineitem", "l_quantity")))
  }

  test("Generate (explode) output columns derive from the generator's " +
       "inputs; pass-through columns keep their own lineage") {
    val d = Tables.documents(spark, sf0001)
    val df = d.select(col("doc_id"),
                      explode(split(col("text"), "\\s+")).as("tok"))
      .select(col("tok"), col("doc_id").as("id"))
    assert(lin(df) == Set(("tok", "documents", "text"),
                          ("id", "documents", "doc_id")))
    // posexplode: BOTH generator outputs (pos and value) trace back
    val df2 = d.select(posexplode(split(col("text"), "\\s+")))
    assert(lin(df2) == Set(("pos", "documents", "text"),
                           ("col", "documents", "text")))
  }

  test("Expand (rollup/cube) feeds each output position from every " +
       "projection; gid is literal-only and emits nothing") {
    val l = Tables.lineitem(spark, sf0001)
    val df = l.rollup(col("l_returnflag").as("flag"),
                      col("l_linestatus").as("st"))
      .agg(sum("l_quantity").as("qty"))
    assert(lin(df) == Set(
      ("flag", "lineitem", "l_returnflag"),
      ("st", "lineitem", "l_linestatus"),
      ("qty", "lineitem", "l_quantity")))
  }

  test("an unmodeled producer fails LOUDLY instead of under-reporting " +
       "(silent empty lineage is the worst governance failure)") {
    import spark.implicits._
    val typed = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).as[Long].map(_ + 1).toDF("k")
    val err = intercept[IllegalArgumentException] {
      PlanLineage.columnLineage(typed)
    }
    assert(err.getMessage.contains("under-report"))
  }

  test("q269 impact analysis is exactly the inversion of forward " +
       "lineage over its targets") {
    val targets = Seq(
      "q01_pricing_summary", "q03_shipping_priority",
      "q05_region_revenue", "q16_decimal_agg", "q17_semi_join",
      "q256_join_view_roll")
    val expected = targets
      .flatMap { n =>
        PlanLineage.columnLineage(
            graft.SparkEntry.queries(n)(spark, sf0001))
          .map { case (_, t, c) => ((t, c), n) }
      }
      .distinct.groupBy(_._1)
      .map { case ((t, c), hits) =>
        (t, c, hits.map(_._2).distinct.sorted.mkString(","))
      }.toSet
    val got = graft.operators.RelationalQueries
      .q269ImpactAnalysis(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3)))
      .toSet
    assert(got == expected)
    // the blast-radius reading: the price column hits 5 of 6 targets,
    // the nation name exactly one
    val byCol = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(byCol(("lineitem", "l_extendedprice")).split(",").length == 5)
    assert(byCol(("nation", "n_name")) == "q05_region_revenue")
  }

  test("q266 pins the q256 join view's full mapping") {
    val got = graft.operators.RelationalQueries
      .q266ColumnLineage(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1),
                           r.getString(2))).toSet
    assert(got == Set(
      ("o_custkey", "orders", "o_custkey"),
      ("o_orderkey", "lineitem", "l_orderkey"),
      ("o_orderpriority", "orders", "o_orderpriority"),
      ("revenue", "lineitem", "l_discount"),
      ("revenue", "lineitem", "l_extendedprice")))
  }
}
