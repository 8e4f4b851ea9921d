package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {

  // Sennrich's classic corpus shape: low×5, lower×2, newest×6, widest×3
  private def corpus = {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("fitMerges reproduces the hand-computed merge sequence") {
    // pair counts round 1: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 …
    //   tie at 9 → lexicographic → (e,s); then (es,t)=9; then the 7-tie
    //   → (l,o); then (lo,w)=7
    val merges = BpeTrainer.fitMerges(
      BpeTrainer.wordCounts(corpus, "text"), numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("applyMerges tokenizes an unseen word with the learned merges") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val toks = Seq("lowest").toDF("w")
      .select(BpeTrainer.applyMergesToWord(col("w"), merges).as("t"))
      .head().getString(0)
    assert(toks == "low est")
  }

  test("marker delimiting prevents cross-symbol false merges") {
    import spark.implicits._
    // symbols [xa][b]: an unguarded replace of "a b"→"ab" would corrupt
    // this to "xab"; the <>-wrapped form must leave it alone
    val merges = Seq(("x", "a"), ("a", "b"))
    val toks = Seq("xab").toDF("w")
      .select(BpeTrainer.applyMergesToWord(col("w"), merges).as("t"))
      .head().getString(0)
    // (x,a) merges first → [xa][b]; then (a,b) must NOT match inside "xa b"
    assert(toks == "xa b")
  }

  test("merge loop stops early when no pairs remain") {
    import spark.implicits._
    val one = Seq((1L, "a b c")).toDF("doc_id", "text") // 1-char words only
    val merges = BpeTrainer.fitMerges(
      BpeTrainer.wordCounts(one, "text"), numMerges = 10)
    assert(merges.isEmpty)
  }

  test("maxVocabRows guard refuses an unpruned giant vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, (0 until 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      BpeTrainer.fitMerges(BpeTrainer.wordCounts(docs, "text"),
                           numMerges = 2, maxVocabRows = 50)
    }
  }

  test("tokenStream concatenates per-word tokenizations in order") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val s = Seq((1L, "Lowest low!")).toDF("doc_id", "text")
      .select(BpeTrainer.tokenStream(col("text"), merges).as("s"))
      .head().getString(0)
    assert(s == "low est low")
  }

  test("save/load round-trips the merge list in fit order") {
    val merges = BpeTrainer.fitMerges(
      BpeTrainer.wordCounts(corpus, "text"), numMerges = 6)
    BpeTrainer.save(spark, merges, "graft_bpe_spec")
    try {
      assert(BpeTrainer.load(spark, "graft_bpe_spec") == merges)
      // idempotent re-save (the stale-location trap)
      BpeTrainer.save(spark, merges, "graft_bpe_spec")
      assert(BpeTrainer.load(spark, "graft_bpe_spec") == merges)
    } finally BpeTrainer.drop(spark, "graft_bpe_spec")
  }

  test("fit is deterministic across partitioning") {
    import spark.implicits._
    val docs = (0 until 200).map(i =>
      (i.toLong, s"repeat common text tok${i % 13} again and again"))
      .toDF("doc_id", "text")
    val a = BpeTrainer.fitMerges(
      BpeTrainer.wordCounts(docs.repartition(1), "text"), 15)
    val b = BpeTrainer.fitMerges(
      BpeTrainer.wordCounts(docs.repartition(32), "text"), 15)
    assert(a == b)
  }

  test("native bpe_apply kernel is byte-identical to the composed " +
       "replace chain on the real corpus and on repeat/chain edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // edge fixtures: repeated-pair non-overlap (x,x on xxx), a chained
    // merge consuming an earlier merge's output, rules that never fire,
    // multi-word docs, empty-ish docs
    val edge = Seq(
      (1L, "xxx xxxx"), (2L, "lowest lower low"), (3L, "ab ba aab"),
      (4L, "a"), (5L, "   "), (6L, "!!!"), (7L, "mix 123 under_score")
    ).toDF("doc_id", "text")
    val merges = Seq(("x", "x"), ("l", "o"), ("lo", "w"), ("e", "s"),
                     ("es", "t"), ("low", "est"), ("a", "b"), ("z", "q"))
    def both(df: org.apache.spark.sql.DataFrame) = {
      val out = df.select(
        col("doc_id"),
        BpeTrainer.tokenStream(col("text"), merges).as("native"),
        BpeTrainer.tokenStreamComposed(col("text"), merges)
          .as("composed"))
      val bad = out.filter(!(col("native") <=> col("composed"))).count()
      assert(bad == 0L, s"$bad rows diverge")
      out
    }
    val e = both(edge).orderBy("doc_id").collect()
    // spot-check the semantics, not just self-consistency
    assert(e(0).getString(1) == "xx x xx xx", s"got ${e(0).getString(1)}")
    assert(e(1).getString(1) == "lowest low e r low")
    val docs = graft.sources.Tables
      .documents(spark, sf0001).select("doc_id", "text")
    both(docs)
  }

  test("tokenizerFertilityFrames: exact integer fertility on a planted corpus") {
    import spark.implicits._
    // merges: l+o -> lo, lo+w -> low; "low" encodes to 1 token, "lower"
    // to 3 (low e r), anything else letter-by-letter
    val merges = Seq(("l", "o"), ("lo", "w"))
    val docs = Seq(
      (1L, "srcA", "low low"),   // 2 words, 2 bpe tokens, 6 chars
      (2L, "srcA", "lower"),     // 1 word,  3 bpe tokens, 5 chars
      (3L, "srcB", "ab")         // 1 word,  2 bpe tokens, 2 chars
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.LlmQueries
      .tokenizerFertilityFrames(docs, merges)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      // srcA: 3 words, 5 bpe tokens, 11 chars -> fertility 1666, cpt 2200
      ("srcA", 2L, 3L, 5L, 11L, 1666L, 2200L),
      // srcB: 1 word, 2 tokens, 2 chars -> fertility 2000, cpt 1000
      ("srcB", 1L, 1L, 2L, 2L, 2000L, 1000L)))
  }
}
