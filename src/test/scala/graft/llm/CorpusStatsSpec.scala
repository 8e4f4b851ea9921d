package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {

  test("entropy and counts match a hand-computed distribution") {
    import spark.implicits._
    // counts: a=8, b=4, c=2, d=2 → N=16
    // H = -(8/16·log2(8/16) + 4/16·log2(4/16) + 2·(2/16·log2(2/16)))
    //   = 0.5·1 + 0.25·2 + 2·(0.125·3) = 1.75 bits
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(2)("d")).mkString(" ")
    val row = CorpusStats.corpusStats(Seq(text).toDF("text"), "text").head()
    assert(row.getAs[Long]("n_tokens") == 16L)
    assert(row.getAs[Long]("n_distinct") == 4L)
    assert(math.abs(row.getAs[Double]("ttr") - 0.25) < 1e-9)
    assert(math.abs(row.getAs[Double]("entropy_bits") - 1.75) < 1e-6)
  }

  test("an exact power law fits with slope -1") {
    import spark.implicits._
    // token i appears round(120/rank_i) times — ln-ln slope ≈ -1; use
    // EXACT 1/rank counts for ranks 1,2,3,4,6,8,12,24 (divisors of 24)
    val ranks = Seq(1, 2, 3, 4, 6, 8, 12, 24)
    val text = ranks.zipWithIndex.flatMap { case (rk, i) =>
      Seq.fill(24 / rk)(f"w$i%02d")
    }.mkString(" ")
    val row = CorpusStats.corpusStats(Seq(text).toDF("text"), "text").head()
    // counts 24/rk vs assigned rank by freq: freq ∝ 1/rank over the
    // REALIZED ranks 1..8, not the construction ranks — compute expected
    // slope with the same closed form over (ln r, ln n_r)
    val ns = ranks.map(rk => 24.0 / rk).sorted(Ordering[Double].reverse)
    val xs = ns.indices.map(i => math.log(i + 1.0))
    val ys = ns.map(math.log)
    val k = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 1e-5)
  }

  test("empty corpus yields a single row with null/zero-safe fields") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("text", StringType))))
    val rows = CorpusStats.corpusStats(empty, "text").collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(rows.head.fieldIndex("n_tokens")) ||
           rows.head.getAs[Long]("n_tokens") == 0L)
  }

  test("incremental counts: merged batch counts reproduce the full-corpus " +
       "stats exactly; counts survive save/load") {
    import spark.implicits._
    val day1 = (0 until 300).map(i =>
      (i.toLong, s"common words appear here tok${i % 23} and tok${i % 7}"))
      .toDF("doc_id", "text")
    val day2 = (300 until 500).map(i =>
      (i.toLong, s"fresh batch text tok${i % 31} with common words too"))
      .toDF("doc_id", "text")
    val full = CorpusStats.corpusStats(day1.unionByName(day2), "text")
      .head()
    CorpusStats.saveCounts(CorpusStats.tokenCounts(day1, "text"),
                           "graft_cs_spec")
    try {
      val merged = CorpusStats.mergeCounts(
        CorpusStats.loadCounts(spark, "graft_cs_spec"),
        CorpusStats.tokenCounts(day2, "text"))
      val inc = CorpusStats.statsFromCounts(merged).head()
      assert(inc.getAs[Long]("n_tokens") == full.getAs[Long]("n_tokens"))
      assert(inc.getAs[Long]("n_distinct") ==
        full.getAs[Long]("n_distinct"))
      assert(inc.getAs[Double]("entropy_bits") ==
        full.getAs[Double]("entropy_bits"))
      assert(inc.getAs[Double]("zipf_slope") ==
        full.getAs[Double]("zipf_slope"))
    } finally CorpusStats.dropCounts(spark, "graft_cs_spec")
  }

  test("psiDrift: identical distributions score 0; a shifted one alarms; " +
       "empty buckets are smoothed") {
    import spark.implicits._
    val ref = (0 until 1000).map(i => (i % 10) / 10.0 + 0.05).toDF("v")
    val same = CorpusStats.psiDrift(ref, ref, "v")
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(same.values.forall(_ == 0.0), s"self-PSI must be 0: $same")
    // concentrated current distribution: everything in bucket 0
    val shifted = (0 until 1000).map(_ => 0.01).toDF("v")
    val drift = CorpusStats.psiDrift(ref, shifted, "v")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(drift(-1)._3 > 0.25, s"concentration must alarm: $drift")
    // buckets 1..9 are empty on the current side but still present
    assert((0 to 9).forall(drift.contains))
    assert(drift(5)._2 == 0L)
    // out-of-range values clamp into the edge buckets
    val edges = Seq(-0.5, 1.7).toDF("v")
    val e = CorpusStats.psiDrift(edges, edges, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(e(0) == 1L && e(9) == 1L)
  }

  test("ksDrift: hand-computed max CDF gap with smallest-value tiebreak; " +
       "identical samples score 0") {
    import spark.implicits._
    // ref = {0.1, 0.1, 0.5, 0.5}; cur = {0.5, 0.5, 0.9, 0.9}
    // CDF gaps: at 0.1 → |0.5 − 0| = 0.5; at 0.5 → |1 − 0.5| = 0.5;
    // at 0.9 → 0. Max 0.5, tie → smallest value 0.1.
    val ref = Seq(0.1, 0.1, 0.5, 0.5).toDF("v")
    val cur = Seq(0.5, 0.5, 0.9, 0.9).toDF("v")
    val r = CorpusStats.ksDrift(ref, cur, "v").head()
    assert(r.getAs[Double]("ks") == 0.5)
    assert(r.getAs[Double]("v_at_max") == 0.1)
    assert(r.getAs[Long]("n_ref") == 4L && r.getAs[Long]("n_cur") == 4L)
    val same = CorpusStats.ksDrift(ref, ref, "v").head()
    assert(same.getAs[Double]("ks") == 0.0)
  }

  test("psiDrift and ksDrift reject an empty sample side instead of " +
       "emitting NaN CDFs") {
    import spark.implicits._
    val some = Seq(0.1, 0.5).toDF("v")
    val none = Seq.empty[Double].toDF("v")
    intercept[IllegalArgumentException](CorpusStats.psiDrift(some, none, "v"))
    intercept[IllegalArgumentException](CorpusStats.psiDrift(none, some, "v"))
    intercept[IllegalArgumentException](CorpusStats.ksDrift(some, none, "v"))
    intercept[IllegalArgumentException](CorpusStats.ksDrift(none, some, "v"))
  }

  test("ngram diversity matches hand-computed trigram counts") {
    import spark.implicits._
    // "a b a b a" → trigrams: (a b a), (b a b), (a b a) → 3 instances,
    // 2 distinct, ttr = 2/3, rep mass = 2 instances of (a b a) → 2/3
    // "x y z w"  → (x y z), (y z w) → 2 instances, 2 distinct, rep 0
    // "hi"       → shorter than a trigram → contributes nothing
    val docs = Seq(("rep", "a b a b a"), ("uniq", "x y z w"),
                   ("uniq", "hi")).toDF("source", "text")
    val out = CorpusStats.ngramDiversity(docs, "text", "source")
      .orderBy("source").collect()
    assert(out.length == 2)
    val rep = out(0)
    assert(rep.getAs[String]("source") == "rep")
    assert(rep.getAs[Long]("n_grams") == 3L)
    assert(rep.getAs[Long]("distinct_grams") == 2L)
    assert(math.abs(rep.getAs[Double]("ttr") - 0.666667) < 1e-6)
    assert(math.abs(rep.getAs[Double]("rep_frac") - 0.666667) < 1e-6)
    val un = out(1)
    assert(un.getAs[Long]("n_grams") == 2L)
    assert(un.getAs[Long]("distinct_grams") == 2L)
    assert(un.getAs[Double]("ttr") == 1.0)
    assert(un.getAs[Double]("rep_frac") == 0.0)
  }

  test("ngram diversity flags a templated source and is partition-stable") {
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      val src = if (i % 2 == 0) "varied" else "templated"
      val text = if (i % 2 == 0)
        s"doc $i speaks of topic${i} and angle${i * 7} uniquely today"
      else
        s"click here to buy now item$i click here to buy now"
      (src, text)
    }.toDF("source", "text")
    val out = CorpusStats.ngramDiversity(docs, "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("templated").getAs[Double]("rep_frac") >
             out("varied").getAs[Double]("rep_frac") + 0.3)
    assert(out("varied").getAs[Double]("ttr") >
             out("templated").getAs[Double]("ttr"))
    val re = CorpusStats.ngramDiversity(docs.repartition(17), "text",
                                        "source")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(out.keys.forall(k => out(k).toSeq == re(k)))
  }

  test("stats are invariant to partitioning (order-independent to 6dp)") {
    import spark.implicits._
    val docs = (0 until 500).map { i =>
      (i.toLong, s"alpha beta gamma delta tok$i common words appear here " +
        s"and also tok${i % 37} repeats across documents")
    }.toDF("doc_id", "text")
    val a = CorpusStats.corpusStats(docs.repartition(1), "text").head()
    val b = CorpusStats.corpusStats(docs.repartition(32), "text").head()
    assert(a.getAs[Double]("entropy_bits") == b.getAs[Double]("entropy_bits"))
    assert(a.getAs[Double]("zipf_slope") == b.getAs[Double]("zipf_slope"))
  }
}
