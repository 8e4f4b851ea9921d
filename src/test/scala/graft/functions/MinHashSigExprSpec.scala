package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MinHashSigExprSpec extends SparkSpec {

  test("registered via extensions; SQL-callable; correct length") {
    import spark.implicits._
    Seq(Seq("a", "b", "c")).toDF("sh").createOrReplaceTempView("mh_in")
    val sig = spark.sql("SELECT minhash_signature(sh, 16) FROM mh_in")
      .head().getSeq[Long](0)
    assert(sig.length == 16)
    assert(sig.distinct.length > 1, "slots should differ across seeds")
  }

  test("identical to the HOF spec formulation on generated shingle sets") {
    import spark.implicits._
    val word = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val row = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, word))
    (1L to 5L).foreach { seed =>
      val rows = Gen.listOfN(15, row)(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail("gen failed"))
      val df = rows.zipWithIndex.map { case (sh, i) => (i.toLong, sh) }
        .toDF("id", "sh")
      val hof = df.select(col("id"),
        Dedup.minhashSignature(col("sh"), 24).as("s"))
        .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
      val native = df.select(col("id"),
        Dedup.minhashSignatureNative(col("sh"), 24).as("s"))
        .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
      assert(hof == native, s"seed $seed diverged")
    }
  }

  test("empty arrays: native emits MaxValue sentinels where HOF emits null " +
       "slots — the documented divergence, unreachable via shingles()") {
    import spark.implicits._
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a")))
      .toDF("id", "sh")
    val native = df.select(col("id"),
      Dedup.minhashSignatureNative(col("sh"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native(1L).forall(_ == Long.MaxValue),
           "empty input → all-sentinel signature (never null)")
    assert(native(2L).forall(_ != Long.MaxValue))
    // the HOF twin instead yields numHashes NULL slots (array_min of an
    // empty array) — callers feeding raw arrays must normalize empties
    // first; Dedup.shingles never produces an empty array
    val hofNulls = df.select(col("id"),
      size(filter(Dedup.minhashSignature(col("sh"), 8), x => x.isNull))
        .as("nulls"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hofNulls(1L) == 8 && hofNulls(2L) == 0)
  }

  test("null ELEMENTS are skipped by the native kernel: signature equals " +
       "that of the array with nulls removed") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", null, "b")),
      (2L, Seq("a", "b"))).toDF("id", "sh")
    val sigs = df.select(col("id"),
      Dedup.minhashSignatureNative(col("sh"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
  }

  test("identical docs share full signature; disjoint docs do not") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("x1", "x2", "x3", "x4")),
      (2L, Seq("x1", "x2", "x3", "x4")),
      (3L, Seq("y1", "y2", "y3", "y4"))).toDF("id", "sh")
    val sigs = df.select(col("id"),
      Dedup.minhashSignatureNative(col("sh"), 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }
}
