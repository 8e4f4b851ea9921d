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
}
