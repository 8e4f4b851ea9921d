package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnotationSpec extends SparkSpec {

  private def rows(pairs: (Long, Long, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    pairs.toDF("item", "rater", "label")
  }

  test("Cohen kappa exact on hand-computed tables: chance-level " +
       "agreement is 0, perfect agreement is 1e6 ppm") {
    // r1: 1,1,0,0  r2: 1,0,0,1 → agree 2/4, marginals 2/2 → pe = 1/2,
    // kappa = 0 exactly
    val chance = Annotation.agreement(
      rows((1, 1, 1), (2, 1, 1), (3, 1, 0), (4, 1, 0),
           (1, 2, 1), (2, 2, 0), (3, 2, 0), (4, 2, 1)),
      "item", "rater", "label").collect()
    val c = chance.find(_.getString(0) == "cohen 1:2").get
    assert((c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4),
            c.getLong(5)) == ((4L, 2L, 500000L, 500000L, 0L)))
    // identical raters → po = 1e6, kappa = 1e6 regardless of pe
    val perfect = Annotation.agreement(
      rows((1, 1, 1), (2, 1, 1), (3, 1, 0), (4, 1, 0),
           (1, 2, 1), (2, 2, 1), (3, 2, 0), (4, 2, 0)),
      "item", "rater", "label").collect()
    val p = perfect.find(_.getString(0) == "cohen 1:2").get
    assert(p.getLong(3) == 1000000L && p.getLong(5) == 1000000L)
    // with exactly two raters Fleiss degenerates to the same po (one
    // rater-pair per item) with pooled-marginal pe
    val f = chance.find(_.getString(0) == "fleiss").get
    assert(f.getLong(3) == 500000L)
    // degenerate one-class marginals (pe = 1): perfect agreement pins
    // kappa at 1e6, disagreement pins 0 — never a divide-by-zero
    val degen = Annotation.agreement(
      rows((1, 1, 1), (2, 1, 1), (1, 2, 1), (2, 2, 1)),
      "item", "rater", "label").collect()
    val d = degen.find(_.getString(0) == "cohen 1:2").get
    assert(d.getLong(4) == 1000000L && d.getLong(5) == 1000000L)
  }

  test("negative kappa truncates toward zero like the DuckDB 1.0.0 " +
       "oracle `//` (floor would round below-chance agreement DOWN " +
       "by one ppm and diverge from the replay)") {
    // r1: 1,1,0  r2: 0,0,1 → agree 0, po = 0; marginals 2/1 over 9
    // rater-pairs → pe = 444444 ppm, kappa strictly negative and
    // inexact, so trunc ≠ floor — the branch where the conventions
    // can diverge. DuckDB 1.0.0 `//` truncates toward zero (verified:
    // (0-7)//2 = -3), same as Spark DIV and Scala /.
    val out = Annotation.agreement(
      rows((1, 1, 1), (2, 1, 1), (3, 1, 0),
           (1, 2, 0), (2, 2, 0), (3, 2, 1)),
      "item", "rater", "label").collect()
    val c = out.find(_.getString(0) == "cohen 1:2").get
    val (po, pe, kappa) = (c.getLong(3), c.getLong(4), c.getLong(5))
    assert(po == 0L && pe == 444444L)
    val trunc = (po - pe) * 1000000L / (1000000L - pe)
    assert(kappa == trunc,
           s"kappa must truncate toward zero: $kappa vs $trunc")
    assert(trunc != Math.floorDiv((po - pe) * 1000000L, 1000000L - pe),
           "fixture must make trunc and floor actually diverge")
  }

  test("Fleiss counters: agree counts rater-pairs per item " +
       "(C(r1,2)+C(r0,2)), items with a single rating are excluded") {
    // item 1: labels 1,1,0 → 1 agreeing pair of 3; item 2: 1,1,1 → 3
    // of 3; item 3: single rating → excluded entirely
    val out = Annotation.agreement(
      rows((1, 1, 1), (1, 2, 1), (1, 3, 0),
           (2, 1, 1), (2, 2, 1), (2, 3, 1),
           (3, 1, 1)),
      "item", "rater", "label").collect()
    val f = out.find(_.getString(0) == "fleiss").get
    assert(f.getLong(1) == 2L, "n = items with >= 2 ratings")
    assert(f.getLong(2) == 4L, "agree = 1 + 3 rater-pairs")
    assert(f.getLong(3) == 4L * 1000000L / 6L)
  }

  test("syntheticRaters: deterministic keyed coins at the configured " +
       "flip rates, and q239's kappa ordering tracks rater noise") {
    val ground = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
              (TextAnalysis.wsTokenCount(col("text")) >= 56)
                .cast("long").as("ground"))
    val labels = Annotation.syntheticRaters(
      ground, "doc_id", "ground", Seq(1 -> 5, 2 -> 15, 3 -> 35),
      key = "rate12")
    val again = Annotation.syntheticRaters(
      ground, "doc_id", "ground", Seq(1 -> 5, 2 -> 15, 3 -> 35),
      key = "rate12")
    assert(labels.collect().toSet == again.collect().toSet,
           "keyed-hash raters must be replayable")
    // observed flip rates near the configured percentages
    val flips = labels.join(ground, col("item") === col("doc_id"))
      .groupBy("rater")
      .agg(count(lit(1)).as("n"),
           sum(when(col("label") =!= col("ground"), 1L).otherwise(0L))
             .as("fl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1)))
      .toMap
    Seq(1L -> 5, 2L -> 15, 3L -> 35).foreach { case (r, pct) =>
      val (fl, n) = flips(r)
      val obs = fl * 100.0 / n
      assert(math.abs(obs - pct) < 8.0,
             s"rater $r flip rate $obs vs configured $pct")
    }
    // noisier pairs agree less: kappa(1:2) > kappa(1:3) > kappa(2:3),
    // all positive; Fleiss lands strictly between the extremes
    val q = graft.operators.LlmQueries
      .queries("q239_rater_agreement")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(q("cohen 1:2") > q("cohen 1:3") &&
           q("cohen 1:3") > q("cohen 2:3") && q("cohen 2:3") > 0L,
           s"kappa ordering broken: $q")
    assert(q("fleiss") > q("cohen 2:3") && q("fleiss") < q("cohen 1:2"))
  }

  test("agreement plan shape: pair stats come from ONE item-keyed " +
       "self-join over label rows and bounded aggregates — no " +
       "cartesian product") {
    val labels = Annotation.syntheticRaters(
      graft.sources.Tables.documents(spark, sf0001)
        .select(col("doc_id"), lit(1L).as("ground")),
      "doc_id", "ground", Seq(1 -> 10, 2 -> 20), key = "plan12")
    val plan = Annotation.agreement(labels, "item", "rater", "label")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
             !plan.contains("BroadcastNestedLoopJoin"),
           s"pair join must be an equi-join on the item id:\n$plan")
  }
}
