package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, ExprId,
  NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand,
  Generate, LeafNode, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Column-level lineage extracted from the ANALYZED Catalyst plan — the
  * governance/provenance introspection a data platform runs before it
  * trusts a derived table: for every output column, which leaf
  * (table, column) attributes its VALUES transitively derive from.
  *
  * Conventions (the ones column-lineage tools standardize on):
  *  - VALUE lineage only: an output column depends on the attributes
  *    referenced by the expressions that produce it (Project/Aggregate/
  *    Window named expressions). Filter predicates and join conditions
  *    are CONTROL lineage and are deliberately excluded — they decide
  *    which rows survive, not what a value is made of.
  *  - A USING-style equi-join output key carries the lineage of the
  *    side whose attribute survives in the output (Spark keeps the
  *    left attribute), not the equivalence class of both keys.
  *  - Literal-only expressions (e.g. `count(1)`) have empty lineage
  *    and emit no rows.
  *
  * Pure plan-tree arithmetic on the driver — O(plan size), never
  * touches data, so it costs the same at 100 TB as at 1 MB.
  */
object PlanLineage {

  private def tableName(l: LeafNode): String = l match {
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          val base = fs.location.rootPaths.headOption
            .map(_.getName).getOrElse("relation")
          base.replaceAll("\\.[A-Za-z0-9]+$", "")
        case _ => "relation"
      }
    case _ => l.nodeName.toLowerCase
  }

  /** Bottom-up map from attribute ExprId to its leaf dependencies. */
  private def walk(plan: LogicalPlan)
      : Map[ExprId, Set[(String, String)]] = plan match {
    case l: LeafNode =>
      val t = tableName(l)
      l.output.map(a => a.exprId -> Set((t, a.name))).toMap
    case u: Union =>
      val maps = u.children.map(walk)
      val merged = maps.reduce(_ ++ _)
      val byPos = u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(maps).flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
        }.toSet
      }.toMap
      merged ++ byPos
    case other =>
      val childMap = other.children.map(walk)
        .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
      def deps(e: Expression): Set[(String, String)] =
        e.references.toSeq.flatMap { a =>
          childMap.get(a.exprId) match {
            case Some(ds) => ds
            case None => throw new IllegalArgumentException(
              s"PlanLineage cannot resolve '${a.name}' (referenced " +
                s"in ${other.nodeName}): it is produced by an " +
                "operator the walker does not model — refusing to " +
                "under-report lineage")
          }
        }.toSet
      def named(nes: Seq[NamedExpression]) =
        nes.map(ne => ne.exprId -> deps(ne)).toMap
      val produced = other match {
        case p: Project   => named(p.projectList)
        case a: Aggregate => named(a.aggregateExpressions)
        case w: Window    => named(w.windowExpressions)
        // explode/posexplode etc.: every generator output column's
        // values derive from whatever the generator reads
        case g: Generate  =>
          val gDeps = deps(g.generator)
          g.generatorOutput.map(a => a.exprId -> gDeps).toMap
        // grouping sets / rollup / cube: output position i is fed by
        // that position of EVERY projection (gid columns are
        // literal-only and so emit nothing, like count(1))
        case e: Expand    =>
          e.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> e.projections.flatMap(p => deps(p(i))).toSet
          }.toMap
        case _            => Map.empty[ExprId, Set[(String, String)]]
      }
      childMap ++ produced
  }

  /** (out_col, src_table, src_col) rows for the frame's output, sorted;
    * literal-only outputs contribute nothing. An output column the
    * walker cannot resolve AT ALL (an unmodeled producer, e.g. an
    * object/deserialize node) throws instead of silently emitting no
    * rows — under-reporting is the worst failure mode for a
    * governance tool (q269 would miss a dependency).
    */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val analyzed = df.queryExecution.analyzed
    val m = walk(analyzed)
    analyzed.output.flatMap { a =>
      m.get(a.exprId) match {
        case Some(ds) => ds.toSeq.map { case (t, c) => (a.name, t, c) }
        case None => throw new IllegalArgumentException(
          s"PlanLineage cannot resolve output column '${a.name}' to " +
            "leaf dependencies: the plan contains a producer the " +
            "walker does not model — refusing to under-report lineage")
      }
    }.distinct.sorted
  }
}
