package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SimHash64ExprSpec extends SparkSpec {

  test("simhash64 is registered via SparkSessionExtensions and callable from SQL") {
    import spark.implicits._
    val out = Seq(Seq("hello", "world")).toDF("toks")
      .createOrReplaceTempView("simhash_in")
    val v = spark.sql("SELECT simhash64(toks) FROM simhash_in").head().getLong(0)
    assert(v != 0L)
  }

  test("native expression equals the HOF formulation on generated corpora") {
    import spark.implicits._
    // ScalaCheck generators sampled at fixed seeds: deterministic property
    // sweep without the scalatest bridge (offline cache has raw scalacheck)
    val word = Gen.chooseNum(1, 10)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val text = Gen.chooseNum(0, 15)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(25, text)
    (1L to 5L).foreach { seed =>
      val texts = corpus(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"gen failed at seed $seed"))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val hof = Dedup.withSimhash(df, "text", "h")
        .orderBy("id").collect().map(_.getLong(2)).toSeq
      val native = Dedup.withSimhashNative(df, "text", "h")
        .orderBy("id").collect().map(_.getLong(2)).toSeq
      assert(hof == native, s"divergence at seed $seed")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq.empty[String]),
      (3L, Seq("a", null, "c"))).toDF("id", "toks")
    val viaExpr = df.select(col("id"), expr("simhash64(toks)").as("h"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    // empty array → all votes negative → 0
    assert(viaExpr(1) == 0L)
    // null elements are skipped, not poisonous
    val noNull = Seq((3L, Seq("a", "c"))).toDF("id", "toks")
      .select(expr("simhash64(toks)")).head().getLong(0)
    assert(viaExpr(2) == noNull)
  }

  test("null input array yields null") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[Seq[String]])).toDF("id", "toks")
    assert(df.select(expr("simhash64(toks)")).head().isNullAt(0))
  }
}
