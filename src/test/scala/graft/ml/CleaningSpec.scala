package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("U1: positiveProbability reads index 1 of dense AND sparse vectors") {
    import spark.implicits._
    val df = Seq(
      (1L, Vectors.dense(0.3, 0.7)),
      (2L, Vectors.sparse(2, Array(1), Array(0.9)))
    ).toDF("id", "probability")
    val out = df.select(col("id"),
      Cleaning.positiveProbability(col("probability")).as("p"))
      .orderBy("id").collect()
    assert(math.abs(out(0).getDouble(1) - 0.7) < 1e-12)
    assert(math.abs(out(1).getDouble(1) - 0.9) < 1e-12)
  }

  test("U1 UDF variant: Scala UDF surface produces same values as the expression") {
    // The engine's preferred path is the pure expression (codegen'd); this
    // exercises the udf() registration surface the reference relies on
    // (sst2_test2.py:68-75) and pins both paths to identical outputs.
    import spark.implicits._
    import org.apache.spark.ml.linalg.Vector
    val extractProb = udf((v: Vector) => v(1).toFloat)
    val df = Seq(
      (1L, Vectors.dense(0.25, 0.75)),
      (2L, Vectors.sparse(2, Array(1), Array(0.5)))).toDF("id", "probability")
    val both = df.select(
      col("id"),
      extractProb(col("probability")).as("via_udf"),
      Cleaning.positiveProbability(col("probability")).as("via_expr"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getFloat(1) - r.getDouble(2)) < 1e-6)
    }
  }

  test("U2: cleanLabel covers entailment/not_entailment/numeric/null branches") {
    import spark.implicits._
    val df = Seq("not_entailment", "entailment", "3", "junk")
      .toDF("raw")
    val out = df.select(Cleaning.cleanLabel(col("raw")).as("l")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(1), Some(0), Some(3), None))
  }

  test("F5: labelMapToExpr maps knowns, defaults unknowns") {
    import spark.implicits._
    val df = Seq("pos", "neg", "???").toDF("s")
    val out = df.select(
      Cleaning.labelMapToExpr(col("s"), Map("pos" -> 1, "neg" -> 0)).as("i"))
      .collect().map(_.getInt(0))
    assert(out.toSeq == Seq(1, 0, -1))
  }

  test("U4: replaceEmptyTokens fills null and empty arrays only") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, null)
    ).toDF("id", "toks")
    val out = df.select(col("id"),
      Cleaning.replaceEmptyTokens(col("toks")).as("t"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) == Seq("a", "b"))
    assert(out(1).getSeq[String](1) == Seq("unknown"))
    assert(out(2).getSeq[String](1) == Seq("unknown"))
  }

  test("F1/F2: pairConcat + composeText match reference semantics") {
    import spark.implicits._
    val df = Seq(("why?", " how? "), (null, "x")).toDF("a", "b")
    val out = df.select(
      Cleaning.pairConcat(col("a"), col("b")).as("p"),
      Cleaning.composeText(col("a"), col("b")).as("c")).collect()
    assert(out(0).getString(0) == "why? [SEP]  how? ")
    assert(out(0).getString(1) == "why? how?")
    assert(out(1).isNullAt(0))       // concat is null-propagating
    assert(out(1).getString(1) == "x") // concat_ws skips nulls
  }
}
