package graft.operators

/** Full Spark-SQL STATEMENT twins of the relational anchors — the same
  * queries `RelationalQueries` declares as DataFrame programs,
  * expressed through the parser. Shared by `SparkSqlParitySpec` (which
  * pins twin ≡ DataFrame bit-identical over temp views) and the CBO
  * anchor harness (`graft.tools.CboAnchors` / `CboAnchorsSpec`, which
  * re-binds the same statements onto stats-published CATALOG tables to
  * measure which standing plans the cost-based optimizer actually
  * changes).
  */
object SqlAnchors {

  /** Rebind a twin's bare table names onto other relations (temp views
    * or catalog tables). Table tokens are matched whole-word and
    * case-sensitively — column prefixes (`l_`, `o_`…) never collide,
    * and SQL keywords are upper-case in the twins (`ORDER BY` does not
    * contain the token `orders`). Both sides are quoted so regex
    * metacharacters in a source name and `$`/`\` in a target name pass
    * through literally regardless of what the caller sanitizes.
    */
  def rebind(sql: String, mapping: Map[String, String]): String =
    mapping.foldLeft(sql) { case (s, (from, to)) =>
      s.replaceAll("\\b" + java.util.regex.Pattern.quote(from) + "\\b",
                   java.util.regex.Matcher.quoteReplacement(to))
    }

  // the decimal-exact revenue row shared by q01/q03/q05's twins —
  // byte-for-byte the cast chain of RelationalQueries.discPriceRow
  private val discPriceSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |  * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))
      |  AS DECIMAL(14,4))""".stripMargin

  val twins: Seq[(String, String)] = Seq(
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

  /** Epoch-day twins of the date-filtered anchors (q17/q19 — q18 has
    * no date predicate and needs no twin): the testdata's `o_orderdate`
    * loads as TIMESTAMP_NTZ, which Spark 4.1.2's `FilterEstimation`
    * cannot estimate (no NTZ branch — it MatchErrors, so
    * `StatsCatalog.publish` excludes NTZ columns entirely and those
    * filters fall back to default selectivity). These twins filter on
    * `o_orderdate_day` — a BIGINT epoch-day column derived as
    * `datediff(o_orderdate, DATE '1970-01-01')` in the day-table CTAS
    * (`StatsCatalog.ensureDayTable`) — so the SAME range predicate
    * becomes estimable from published min/max. Day boundaries are
    * whole days, so each twin is answer-identical to its anchor.
    */
  val dayTwins: Seq[(String, String)] = {
    def d(iso: String): Long = java.time.LocalDate.parse(iso).toEpochDay
    Seq(
      "q17_semi_join_day" ->
        s"""SELECT o_orderpriority, count(1) AS order_count
           |FROM orders_day
           |WHERE o_orderdate_day >= ${d("1997-01-01")}
           |  AND o_orderdate_day < ${d("1997-07-01")}
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey
           |                AND l_quantity >= 45)
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin,
      "q19_anti_join_day" ->
        s"""SELECT c_mktsegment, count(1) AS n_inactive
           |FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders_day
           |                  WHERE o_custkey = c_custkey
           |                    AND o_orderdate_day >=
           |                      ${d("1998-06-01")})
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin)
  }

  /** The day-table stats publish list: the twins' join keys plus the
    * now-estimable epoch-day filter column.
    */
  val dayStatsColumns: Map[String, Seq[String]] = Map(
    "orders_day" -> Seq("o_orderkey", "o_custkey", "o_orderdate_day"))

  /** The TPC-H-ish tables the twins reference, with the columns whose
    * statistics matter to their plans (join keys + pushed filters) —
    * the publish list the CBO harness ANALYZEs.
    */
  val statsColumns: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey",
                      "l_shipdate", "l_quantity"),
    "orders"   -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment",
                      "c_acctbal"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "nation"   -> Seq("n_nationkey", "n_regionkey"),
    "region"   -> Seq("r_regionkey", "r_name"))
}
