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

  // the decimal-exact revenue row shared by q01/q03/q05's twins —
  // byte-for-byte the cast chain of RelationalQueries.discPriceRow
  private val discPriceSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |  * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))
      |  AS DECIMAL(14,4))""".stripMargin

  private val twins: Seq[(String, String)] = Seq(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
         |       AS DECIMAL(38,2)) AS STRING) AS sum_qty,
         |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
         |       AS DECIMAL(38,2)) AS STRING) AS sum_base_price,
         |  CAST(CAST(sum($discPriceSql) AS DECIMAL(38,2)) AS STRING)
         |    AS sum_disc_price,
         |  CAST(CAST(sum(CAST($discPriceSql
         |         * CAST(1 + CAST(l_tax AS DECIMAL(3,2))
         |                AS DECIMAL(4,2)) AS DECIMAL(16,6)))
         |       AS DECIMAL(38,2)) AS STRING) AS sum_charge,
         |  round(avg(l_quantity), 4) AS avg_qty,
         |  round(avg(l_extendedprice), 4) AS avg_price,
         |  round(avg(l_discount), 4) AS avg_disc,
         |  count(1) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(revenue_d AS STRING) AS revenue
         |FROM (
         |  SELECT l_orderkey, o_orderdate, o_orderpriority,
         |    CAST(sum($discPriceSql) AS DECIMAL(38,2)) AS revenue_d
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |    AND l_shipdate > TIMESTAMP '1998-01-01'
         |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |  ORDER BY revenue_d DESC, l_orderkey ASC
         |  LIMIT 10)
         |ORDER BY revenue_d DESC, l_orderkey ASC""".stripMargin,
    "q05_region_revenue" ->
      s"""SELECT n_name, CAST(revenue_d AS STRING) AS revenue
         |FROM (
         |  SELECT n_name,
         |    CAST(sum($discPriceSql) AS DECIMAL(38,2)) AS revenue_d
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |    AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-01-01'
         |  GROUP BY n_name)
         |ORDER BY revenue_d DESC, n_name ASC""".stripMargin,
    "q11_window_top_orders" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, rn
        |FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT)
        |      AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q12_set_ops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM (
        |    SELECT c_custkey FROM customer
        |    WHERE c_mktsegment = 'BUILDING'
        |    UNION ALL
        |    SELECT c_custkey FROM customer
        |    WHERE c_mktsegment = 'MACHINERY')
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |  EXCEPT
        |  (SELECT c_custkey FROM customer
        |   WHERE c_mktsegment = 'BUILDING'
        |   INTERSECT
        |   SELECT c_custkey FROM customer
        |   WHERE c_mktsegment = 'MACHINERY'))
        |ORDER BY c_custkey""".stripMargin,
    "q13_distinct" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_nationkey) AS n_nations
        |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q16_decimal_agg" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |       AS DECIMAL(38,2)) AS STRING) AS sum_price_exact,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |       AS DECIMAL(38,2)) AS STRING) AS sum_qty_exact
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the full-statement EXISTS — the parser + decorrelation path the
    // DataFrame leg (an explicit left_semi) never exercises
    "q17_semi_join" ->
      """SELECT o_orderpriority, count(1) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_quantity >= 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q18_left_join_count" ->
      """SELECT c_count, count(1) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q19_anti_join" ->
      """SELECT c_mktsegment, count(1) AS n_inactive
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-06-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q20_having" ->
      """SELECT l_partkey, round(avg(l_quantity), 4) AS avg_qty,
        |  count(1) AS n_items
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING count(1) >= 30
        |ORDER BY n_items DESC, l_partkey ASC
        |LIMIT 50""".stripMargin)

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
