package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class JaccardLongExprSpec extends SparkSpec {

  test("registered via extensions; SQL-callable") {
    import spark.implicits._
    Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
      .createOrReplaceTempView("jac_in")
    val v = spark.sql("SELECT jaccard_long(a, b) FROM jac_in")
      .head().getDouble(0)
    assert(math.abs(v - 0.5) < 1e-12) // |{2,3}| / |{1,2,3,4}|
  }

  test("equals the array_intersect/array_union formulation, incl. multisets") {
    import spark.implicits._
    val elem = Gen.chooseNum(0L, 40L) // small domain → guaranteed overlap+dups
    val arr  = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, elem))
    val pair = for { a <- arr; b <- arr } yield (a, b)
    (1L to 5L).foreach { seed =>
      val rows = Gen.listOfN(40, pair)(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail("gen failed"))
      val df = rows.toDF("a", "b")
      val native = df.select(Dedup.jaccardLong(col("a"), col("b")))
        .collect().map(_.getDouble(0)).toSeq
      val hof = df.select(
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b"))).cast("double")))
        .collect().map(_.getDouble(0)).toSeq
      assert(native == hof, s"seed $seed diverged")
    }
  }

  test("edge cases: identical, disjoint, one-sided, empty/empty → NaN") {
    import spark.implicits._
    val df = Seq(
      (Seq(5L, 6L), Seq(5L, 6L)),
      (Seq(1L), Seq(2L)),
      (Seq.empty[Long], Seq(9L)),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val v = df.select(Dedup.jaccardLong(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(v(0) == 1.0 && v(1) == 0.0 && v(2) == 0.0 && v(3).isNaN)
  }

  test("null array inputs propagate null") {
    import spark.implicits._
    val n = Seq((Seq(1L), null.asInstanceOf[Seq[Long]])).toDF("a", "b")
      .select(Dedup.jaccardLong(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("accepts containsNull=true inputs (parquet-shaped) and matches HOF on null elements") {
    import spark.implicits._
    // Option elements ⇒ ArrayType(LongType, containsNull = true), the
    // shape parquet reads and most SQL expressions produce.
    val df = Seq(
      (Seq[Option[Long]](Some(1L), None, Some(2L)),
       Seq[Option[Long]](None, Some(2L), Some(3L))),
      (Seq[Option[Long]](Some(1L), None),
       Seq[Option[Long]](Some(1L), Some(2L))),
      (Seq[Option[Long]](None), Seq[Option[Long]](None)),
      (Seq[Option[Long]](Some(4L)), Seq[Option[Long]](Some(4L), Some(4L))))
      .toDF("a", "b")
    val native = df.select(Dedup.jaccardLong(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    val hof = df.select(
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b"))).cast("double")))
      .collect().map(_.getDouble(0)).toSeq
    assert(native == hof)
    // spelled out: {1,null,2}∩{null,2,3}={null,2} / union {1,null,2,3} = 0.5
    assert(math.abs(native.head - 0.5) < 1e-12)
  }

  test("SQL function analyzes on a parquet-read array column") {
    import spark.implicits._
    val dirPath = java.nio.file.Files.createTempDirectory("jacpq")
    try {
      val dir = dirPath.toString
      Seq((Seq(1L, 2L), Seq(2L, 3L))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      // parquet arrays carry containsNull=true — must pass the type check
      val v = spark.read.parquet(dir)
        .selectExpr("jaccard_long(a, b)").head().getDouble(0)
      assert(math.abs(v - 1.0 / 3.0) < 1e-12)
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(dirPath).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
