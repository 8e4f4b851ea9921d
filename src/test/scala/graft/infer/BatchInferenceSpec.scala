package graft.infer

import graft.SparkSpec

class BatchInferenceSpec extends SparkSpec {

  test("U3: scores every row with the lazy per-partition scorer, emits confidence") {
    import spark.implicits._
    val df = Seq(("hello", 1), ("world", 0), ("again", 1))
      .toDF("text", "target")
    val out = BatchInference
      .scoreAll(df, "text", "target", () => new HashScorer(Seq("a", "b")))
    assert(out.columns.toSeq == Seq("target", "predicted_label", "confidence"))
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows.forall(r => Seq("a", "b").contains(r.getString(1))))
    assert(rows.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) < 1.0))
  }

  test("U3: deterministic across repartitionings (row-local scoring)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"text $i", i)).toDF("text", "target")
    def run(d: org.apache.spark.sql.DataFrame) = BatchInference
      .scoreAll(d, "text", "target", () => new HashScorer(Seq("x", "y", "z")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(run(df) == run(df.repartition(7)))
  }

  test("U3: per-row scorer failure yields ERROR sentinel, not task failure") {
    import spark.implicits._
    val df = Seq(("ok", 1), ("boom", 2)).toDF("text", "target")
    val failing = () => new TextScorer {
      def score(t: String): (String, Double) =
        if (t == "boom") throw new RuntimeException("model error")
        else ("fine", 0.9)
    }
    val rows = BatchInference.scoreAll(df, "text", "target", failing)
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1, "fine"), (2, "ERROR")))
  }

  test("A5/F7/F8: grouped-map shape scores every row exactly once") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"text $i", i)).toDF("text", "target")
    val out = BatchInference
      .scoreGrouped(df, "text", "target", nGroups = 7,
                    () => new HashScorer(Seq("x", "y")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(out.map(_._1) == (0 until 100))
    // identical per-row results to the mapPartitions path (row-local scorer)
    val flat = BatchInference
      .scoreAll(df, "text", "target", () => new HashScorer(Seq("x", "y")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(out == flat)
  }

  test("U3: scoreRepartitioned widens parallelism without changing results") {
    import spark.implicits._
    val df = (0 until 50).map(i => (s"t$i", i)).toDF("text", "target")
    val a = BatchInference
      .scoreAll(df, "text", "target", () => new HashScorer(Seq("l")))
      .collect().map(_.getInt(0)).sorted.toSeq
    val b = BatchInference
      .scoreRepartitioned(df, "text", "target", 8, () => new HashScorer(Seq("l")))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(a == b)
  }
}
