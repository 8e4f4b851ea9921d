package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextPackingSpec extends SparkSpec {

  test("packing: every doc assigned once; no bin over capacity (except oversized singletons)") {
    val docs = Tables.documents(spark, sf0001)
    val capacity = 64
    val packed = TextPacking.packDocuments(docs, "doc_id", "text", capacity)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())

    val binLoads = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("load"), count(lit(1)).as("k"))
    // multi-doc bins must respect capacity; only singleton bins may exceed
    val over = binLoads.filter(col("load") > capacity && col("k") > 1)
    assert(over.count() == 0, over.collect().mkString(","))
  }

  test("packing efficiency: first-fit keeps mean multi-doc bin fill above 50%") {
    val docs = Tables.documents(spark, sf0001).coalesce(2)
    val capacity = 256
    val packed = TextPacking.packDocuments(docs, "doc_id", "text", capacity)
    val loads = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("load"), count(lit(1)).as("k"))
      .filter(col("load") <= capacity) // exclude oversized singletons
      .select(avg("load")).head().getDouble(0)
    assert(loads > capacity * 0.5, s"mean fill $loads of $capacity")
  }

  test("oversized documents get dedicated bins") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.fill(100)("tok").mkString(" ")), // 100 tokens > capacity 32
      (2L, "a b c"), (3L, "d e f")).toDF("doc_id", "text")
    val packed = TextPacking.packDocuments(df.coalesce(1), "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(packed(1L) != packed(2L))
    assert(packed(2L) == packed(3L), "small docs share a bin")
  }

  test("chunking: hand-computed windows, short last chunk, sub-window " +
       "docs yield one chunk") {
    import spark.implicits._
    // 10 tokens, chunk 4, overlap 1 → stride 3 → ceil((10-4)/3)+1 = 3
    // chunks starting at 0, 3, 6; the last runs 4 long (tokens 7-10).
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
                 (2L, "a b"))                       // n=2 ≤ 4 → 1 chunk
      .toDF("doc_id", "text")
    val out = TextPacking.chunkDocuments(df, "doc_id", "text",
                                         chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
                 r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1, 3L, 4L, "t4 t5 t6 t7"),
      (1L, 2, 6L, 4L, "t7 t8 t9 t10"),
      (2L, 0, 0L, 2L, "a b")))
  }

  test("chunking invariants on the real corpus: full coverage with the " +
       "exact overlap, deterministic, token counts add up") {
    val docs = Tables.documents(spark, sf0001)
    val chunks = TextPacking.chunkDocuments(docs, "doc_id", "text",
                                            chunkTokens = 32, overlap = 8)
    val n = docs.select(
      sum(size(split(trim(col("text")), "\\s+"))).cast("long")).head()
      .getLong(0)
    val stats = chunks.agg(
      sum("n_tok").cast("long"),
      sum(when(col("chunk_idx") > 0, lit(8L)).otherwise(0L))
        .cast("long")).head()
    // Σ chunk tokens = corpus tokens + 8 overlap tokens per non-first
    // chunk — exact coverage, nothing dropped or double-counted beyond
    // the designed overlap.
    assert(stats.getLong(0) == n + stats.getLong(1))
    // every chunk is non-empty and within the window size
    assert(chunks.filter(col("n_tok") < 1 || col("n_tok") > 32)
      .count() == 0)
    // deterministic across runs
    assert(chunks.orderBy("doc_id", "chunk_idx").collect().toSeq ==
      TextPacking.chunkDocuments(docs, "doc_id", "text", 32, 8)
        .orderBy("doc_id", "chunk_idx").collect().toSeq)
  }

  test("spanCorrupt: deterministic, reconstructable, and near the nominal rate") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf0001)
    val out = TextPacking.spanCorrupt(docs, "doc_id", "text", "2666")
    // deterministic across evaluations
    assert(out.orderBy("doc_id").collect().toSeq ==
             TextPacking.spanCorrupt(docs, "doc_id", "text", "2666")
               .orderBy("doc_id").collect().toSeq)
    // reconstruction: substituting target tokens back at their 1-based
    // positions recovers the original whitespace token stream
    val rows = out.orderBy("doc_id").limit(50).collect()
    val orig = docs.orderBy("doc_id").limit(50).collect()
      .map(r => r.getAs[String]("text").trim.split("\\s+").toSeq)
    rows.zip(orig).foreach { case (r, toks) =>
      val input = r.getAs[String]("input_text").split(" ", -1)
      val tgt   = r.getAs[String]("target_text")
      val subs  = if (tgt.isEmpty) Map.empty[Int, String]
                  else tgt.split(" ").map { p =>
                    val i = p.indexOf(':')
                    p.take(i).toInt -> p.drop(i + 1)
                  }.toMap
      val rebuilt = input.zipWithIndex.map { case (t, i) =>
        if (subs.contains(i + 1)) subs(i + 1) else t
      }.toSeq
      assert(rebuilt == toks, s"doc ${r.getLong(0)} failed to reconstruct")
      // every masked slot is the sentinel in the input
      subs.keys.foreach(k => assert(input(k - 1) == "<X>"))
    }
    // corpus-level mask rate ~ 0x2666/0x10000 = 15%
    val agg = out.agg(sum("n_masked").cast("double") / sum("n_tokens"))
      .head().getDouble(0)
    assert(agg > 0.10 && agg < 0.20, s"mask rate drifted: $agg")
  }

  test("q250 seqlen sweep: truncation falls and padding climbs with " +
       "the window, concat-packing tail waste stays far below " +
       "one-doc-per-sequence padding, and a driver recount matches") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.LlmQueries
      .queries("q250_seqlen_sweep")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5),
                 r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq(64L, 128L, 256L, 512L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 >= b._5, "trunc_ppm must not rise with len")
        assert(a._6 <= b._6, "pad_ppm must not fall with len")
      case _ =>
    }
    rows.foreach { case (_, _, _, _, _, pad, concat) =>
      assert(concat < pad, "packing must beat padding") }
    // driver recount at len = 128
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(graft.llm.TextAnalysis.wsTokenCount(col("text"))
                .cast("long").as("t"))
      .collect().map(_.getLong(0))
    val r128 = rows.find(_._1 == 128L).get
    assert(r128._2 == toks.length && r128._3 == toks.sum)
    assert(r128._4 == toks.map(t => math.max(0L, t - 128L)).sum)
    assert(r128._6 == toks.map(t => math.max(0L, 128L - t)).sum *
             1000000L / (toks.length * 128L))
  }
}
