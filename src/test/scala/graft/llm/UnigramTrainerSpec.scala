package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class UnigramTrainerSpec extends SparkSpec {

  private def countsDf(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("word", "n")
  }

  test("fitUnigram keeps a whole frequent word as one piece when the EM " +
       "prefers it, and always retains every single character") {
    val vocab = UnigramTrainer.fitUnigram(
      countsDf(Seq(("abab", 10L), ("ab", 5L), ("cd", 3L))),
      vocabSize = 10, minCount = 2L)
    val pieces = vocab.map(_._1).toSet
    assert(pieces.contains("abab"),
           s"the dominant word must survive as one piece: $vocab")
    assert(Set("a", "b", "c", "d").subsetOf(pieces),
           s"single-char coverage floor violated: $vocab")
    // vocabSize cap: multi-char pieces beyond the cap are pruned
    val tight = UnigramTrainer.fitUnigram(
      countsDf(Seq(("abab", 10L), ("ab", 5L), ("cd", 3L))),
      vocabSize = 5, minCount = 2L)
    assert(tight.count(_._1.length > 1) <= 1,
           s"cap must bind after reserving singles: $tight")
  }

  test("fitUnigram is deterministic and a pure function of the counts") {
    val counts = BpeTrainer.wordCounts(
      Tables.documents(spark, sf0001), "text")
    val a = UnigramTrainer.fitUnigram(counts, vocabSize = 300)
    val b = UnigramTrainer.fitUnigram(counts.repartition(7),
                                      vocabSize = 300)
    assert(a == b, "fit must not depend on partitioning")
    assert(a.nonEmpty && a.map(_._1).distinct.length == a.length)
  }

  test("greedySegment takes the longest match, falls back to single " +
       "chars, and always reconstructs the word") {
    val v = Set("ab", "abc", "c", "a", "b")
    assert(UnigramTrainer.greedySegment("abcab", v, 6) ==
             Seq("abc", "ab"))
    assert(UnigramTrainer.greedySegment("dd", v, 6) == Seq("d", "d"),
           "chars outside the vocab must fall back, not fail")
    val corpusWords = BpeTrainer.wordCounts(
        Tables.documents(spark, sf0001), "text")
      .select("word").limit(500).collect().map(_.getString(0))
    val vocab = UnigramTrainer.fitUnigram(
      BpeTrainer.wordCounts(Tables.documents(spark, sf0001), "text"),
      vocabSize = 300).map(_._1).toSet
    corpusWords.foreach { w =>
      assert(UnigramTrainer.greedySegment(w, vocab, 6).mkString("") == w,
             s"segmentation must reconstruct '$w'")
    }
  }

  test("segmentDocs matches a per-doc local replay and is stable across " +
       "partitionings") {
    val docs = Tables.documents(spark, sf0001)
    val vocab = UnigramTrainer.fitUnigram(
      BpeTrainer.wordCounts(docs, "text"), vocabSize = 300)
    val out = UnigramTrainer.segmentDocs(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
    val out2 = UnigramTrainer
      .segmentDocs(docs.repartition(9), "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
    assert(out.toSeq == out2.toSeq)
    // local replay of one doc
    val vset = vocab.map(_._1).toSet
    val one = docs.orderBy("doc_id").select("doc_id", "text").head()
    val words = one.getString(1).toLowerCase.trim
      .split("\\W+").filter(_.nonEmpty).toSeq
    val pieces = words.map(w =>
      UnigramTrainer.greedySegment(w, vset, 6).mkString(" "))
    val row = out.find(_.getLong(0) == one.getLong(0)).get
    assert(row.getLong(1) == words.length)
    assert(row.getLong(2) ==
             pieces.map(_.split(" ").length.toLong).sum)
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(pieces.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row.getString(3) == fp, "piece stream fingerprint must match")
  }
}
