package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** SQL-dialect cross-check: the engine's relational anchors are
  * DataFrame programs; this suite runs a full Spark-SQL STATEMENT twin
  * of each over temp views of the same tables and pins the results
  * bit-identical (Row-for-Row, including decimal string renderings and
  * row order). This exercises the one entry surface the DataFrame
  * programs never touch — the SQL parser, statement-level analysis,
  * and subquery decorrelation (the EXISTS / NOT EXISTS twins must
  * rewrite to the same semi/anti joins the DataFrame legs declare
  * directly).
  */
class SparkSqlParitySpec extends SparkSpec {

  private lazy val views: Unit = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem").foreach { t =>
    Tables.table(spark, sf0001, t).createOrReplaceTempView(t)
  }

  private val twins = SqlAnchors.twins

  twins.foreach { case (name, sql) =>
    test(s"$name: the Spark-SQL statement twin is bit-identical to " +
         "the DataFrame program") {
      views
      val viaSql = spark.sql(sql)
      val viaDf = graft.SparkEntry.queries(name)(spark, sf0001)
      assert(viaSql.schema.fields.map(f => (f.name, f.dataType)).toSeq
               == viaDf.schema.fields.map(f => (f.name, f.dataType))
                    .toSeq,
             s"$name schema drift between SQL and DataFrame legs")
      val s = viaSql.collect().toSeq
      val d = viaDf.collect().toSeq
      assert(s == d, s"$name rows differ: sql=${s.take(3)} " +
                       s"df=${d.take(3)}")
      assert(s.nonEmpty, s"$name must return rows")
    }
  }

  test("the EXISTS twins actually decorrelate: q17's statement plans " +
       "a semi join, q19's a left-anti join — no nested-loop subquery " +
       "survives") {
    views
    val semi = spark.sql(twins.toMap.apply("q17_semi_join"))
      .queryExecution.optimizedPlan.toString
    val anti = spark.sql(twins.toMap.apply("q19_anti_join"))
      .queryExecution.optimizedPlan.toString
    assert(semi.contains("LeftSemi"), s"q17 twin must semi-join:\n$semi")
    assert(anti.contains("LeftAnti"), s"q19 twin must anti-join:\n$anti")
    assert(!semi.contains("exists#") || !semi.contains("Subquery"),
           "the EXISTS must be decorrelated into the join")
  }
}
