package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class CosineSimExprSpec extends SparkSpec {

  test("registered via extensions; SQL-callable") {
    import spark.implicits._
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("cos_in")
    val v = spark.sql("SELECT cosine_sim(a, b) FROM cos_in").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("bit-identical to the HOF spec formulation on generated float vectors") {
    import spark.implicits._
    val vec = Gen.listOfN(64, Gen.chooseNum(-1000, 1000).map(_ / 251.0f))
    val pair = for { a <- vec; b <- vec } yield (a, b)
    (1L to 5L).foreach { seed =>
      val pairs = Gen.listOfN(30, pair)(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail("gen failed"))
      val df = pairs.toDF("a", "b")
      val native = df.select(Similarity.cosine(col("a"), col("b")))
        .collect().map(_.getDouble(0)).toSeq
      val hof = df.select(Similarity.cosineHof(col("a"), col("b")))
        .collect().map(_.getDouble(0)).toSeq
      // exact ==, not approx: kernel must preserve accumulation order
      assert(native == hof, s"seed $seed diverged")
    }
  }

  test("mixed float/double arrays and null inputs") {
    import spark.implicits._
    val df = Seq((Seq(3.0f, 4.0f), Seq(3.0d, 4.0d))).toDF("f", "d")
    val v = df.select(Similarity.cosine(col("f"), col("d"))).head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    val n = Seq((Seq(1.0f), null.asInstanceOf[Seq[Double]])).toDF("f", "d")
      .select(Similarity.cosine(col("f"), col("d"))).head()
    assert(n.isNullAt(0))
  }

  test("null ELEMENTS propagate to null, matching the HOF twin") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 2.0, null)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    val native = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val hof = df.select(Similarity.cosineHof(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(native.toSeq == hof.toSeq)
    assert(native(0).isEmpty && native(1).isEmpty && native(2).nonEmpty)
  }
}
