package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN + AGGREGATE materialized view —
  * the binary-operator sibling of the index/stats roll family
  * (q144/q147/q180/q244): a standing per-order revenue view over
  * `orders ⋈ lineitem` kept current by folding in insert-only deltas
  * that arrive on BOTH sides of the join, without re-touching the
  * already-joined history.
  *
  * For an insert-only changelog the delta of the join distributes over
  * the union — `(O ∪ ΔO) ⋈ (L ∪ ΔL) = (O ⋈ L) ∪ (O ⋈ ΔL) ∪ (ΔO ⋈ ΔL)`
  * (the `ΔO ⋈ L` leg is empty under the FK discipline that a new
  * order's lines arrive with or after the order, never before) — and
  * because every measure in the view is a commutative monoid (COUNT,
  * decimal SUM), the aggregate of the union is the key-wise merge of
  * the standing view with the aggregated delta legs. That is the whole
  * roll: aggregate the delta lines, attach order attributes (from the
  * delta orders for new keys; inherited from the standing view row for
  * existing keys), and merge by key.
  *
  * Scale shape (100 TB): the delta legs shuffle DELTA-sized data only —
  * the day's lines are aggregated by order key (map-side partial agg
  * first) and joined to the day's orders. The standing view is touched
  * once, through the final key-wise merge; with the view stored
  * bucketed by order key (the [[graft.llm.IndexStore]] contract every
  * other roll in the tree uses) that merge co-locates with the view's
  * own layout and the only full exchange left is the delta stream.
  * Nothing re-reads, re-joins, or re-aggregates the historical
  * lineitem table.
  *
  * Money stays DECIMAL-exact end to end (the q01/q16 convention):
  * per-row revenue is `DECIMAL(14,4)`, partial and merged sums are
  * pinned back to `DECIMAL(24,4)` after every aggregate so the rolled
  * and rebuilt views carry byte-identical types as well as values.
  */
object ViewMaintenance {

  /** Per-row discounted revenue, decimal-exact (the q01 money path). */
  private def revRow: Column =
    (col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1) - col("l_discount").cast("decimal(3,2)"))
        .cast("decimal(3,2)"))
      .cast("decimal(14,4)")

  /** The view's aggregate measures over a lineitem-shaped frame. */
  private def lineMeasures(lines: DataFrame): DataFrame =
    lines
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
           sum(revRow).cast("decimal(24,4)").as("revenue"))

  /** Full build: `orders ⋈ lineitem` aggregated to one row per order
    * (key, custkey, priority, n_items, revenue). The from-scratch
    * definition the roll must reproduce byte-for-byte.
    */
  def orderRevenueView(orders: DataFrame, lines: DataFrame): DataFrame =
    lineMeasures(lines)
      .join(orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
            Seq("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_orderpriority",
              "n_items", "revenue")

  /** Roll insert-only deltas (new orders + new lines, on both join
    * sides) onto a standing view. Order attributes for keys already in
    * the view ride in from the standing row at merge time (`max`
    * ignores the delta row's nulls); attributes for brand-new keys
    * come from `deltaOrders`, which therefore must cover every delta
    * key ABSENT from the standing view — i.e. the day's new orders
    * plus the attribute rows for any late-line key whose order never
    * made it into the view (the caller's delta-key semi-join against
    * the orders table; delta-sized). Superfluous `deltaOrders` keys
    * are ignored. An empty delta is the identity.
    */
  def orderRevenueRoll(view: DataFrame, deltaOrders: DataFrame,
                       deltaLines: DataFrame): DataFrame =
    mergeByKey(view, attachAttrs(lineMeasures(deltaLines), deltaOrders))

  /** Roll a RETRACTABLE changelog — lineitem-shaped rows carrying an
    * `op` column (+1 insert, −1 delete; an update is its before-image
    * delete plus its after-image insert, the standard CDC encoding) —
    * onto a standing view. Every measure is a commutative GROUP (not
    * just a monoid): COUNT retracts by summing signed ops, the
    * decimal revenue SUM by summing sign-weighted per-row revenue
    * recomputed from the delete's before-image, so a delete gives
    * back EXACTLY what its insert contributed (decimal arithmetic —
    * no float cancellation error). Keys whose item count reaches zero
    * leave the view entirely, exactly as a rebuild would drop them.
    * Scale shape identical to [[orderRevenueRoll]]: only the
    * changelog shuffles; the standing view is touched once in the
    * key-wise merge.
    */
  def orderRevenueRetractRoll(view: DataFrame, deltaOrders: DataFrame,
                              changelog: DataFrame): DataFrame = {
    val signed = changelog
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(col("op")).cast("long").as("n_items"),
           sum(col("op") * revRow).cast("decimal(24,4)").as("revenue"))
    mergeByKey(view, attachAttrs(signed, deltaOrders))
      .filter(col("n_items") > 0)
  }

  /** The CO-LOCATED roll — [[orderRevenueRoll]]'s shape for a view
    * PERSISTED bucketed by its key (the [[graft.llm.IndexStore]]
    * contract): instead of union + re-aggregate (whose Union erases
    * the view's distribution and forces a full re-shuffle), the
    * aggregated delta MERGE-JOINs the view full-outer on the key and
    * folds the measures column-wise. Because the view is unique per
    * key (it is an aggregate) and the delta aggregates to one row per
    * key, the join is 1:1 and the fold is exact. With the view
    * key-bucketed, Catalyst reads it Exchange-free and only the delta
    * shuffles — the claim ViewMaintenanceSpec pins in the plan.
    */
  def orderRevenueRollCoLocated(view: DataFrame, deltaOrders: DataFrame,
                                deltaLines: DataFrame): DataFrame = {
    val deltaRows =
      attachAttrs(lineMeasures(deltaLines), deltaOrders)
        .select(col("o_orderkey"), col("o_custkey").as("d_custkey"),
                col("o_orderpriority").as("d_priority"),
                col("n_items").as("d_items"),
                col("revenue").as("d_revenue"))
    view.join(deltaRows, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
              coalesce(col("o_custkey"), col("d_custkey"))
                .as("o_custkey"),
              coalesce(col("o_orderpriority"), col("d_priority"))
                .as("o_orderpriority"),
              (coalesce(col("n_items"), lit(0L)) +
                coalesce(col("d_items"), lit(0L))).as("n_items"),
              (coalesce(col("revenue"), lit(0).cast("decimal(24,4)")) +
                coalesce(col("d_revenue"), lit(0).cast("decimal(24,4)")))
                .cast("decimal(24,4)").as("revenue"))
  }

  /** Attach order attributes to aggregated delta rows (left join —
    * keys already in the standing view may carry nulls here; the
    * merge inherits their attributes from the standing row).
    */
  private def attachAttrs(deltaAgg: DataFrame,
                          deltaOrders: DataFrame): DataFrame =
    deltaAgg
      .join(deltaOrders.select("o_orderkey", "o_custkey",
                               "o_orderpriority"),
            Seq("o_orderkey"), "left")
      .select("o_orderkey", "o_custkey", "o_orderpriority",
              "n_items", "revenue")

  /** Key-wise merge of the standing view with aggregated delta rows:
    * `max` resolves attributes (ignores the delta side's nulls), the
    * group sums fold the measures.
    */
  private def mergeByKey(view: DataFrame, deltaRows: DataFrame): DataFrame =
    view
      .unionByName(deltaRows)
      .groupBy("o_orderkey")
      .agg(max(col("o_custkey")).as("o_custkey"),
           max(col("o_orderpriority")).as("o_orderpriority"),
           sum(col("n_items")).as("n_items"),
           sum(col("revenue")).cast("decimal(24,4)").as("revenue"))
}
