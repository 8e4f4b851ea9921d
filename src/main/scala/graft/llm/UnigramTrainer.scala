package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (Kudo 2018, the SentencePiece unigram
  * model) with WordPiece-style greedy maximal-munch application — the
  * second tokenizer family next to [[BpeTrainer]]'s BPE.
  *
  * Scale shape, exactly BPE's: the ONLY corpus-scale pass is the word
  * count aggregation ([[BpeTrainer.wordCounts]]); the EM fit runs on the
  * aggregated (word, n) table — per-DISTINCT-word, MBs even for a 100 TB
  * corpus once `minCount` prunes hapaxes — as a guarded driver endgame
  * (`maxVocabRows`, same rationale as [[BpeTrainer.fitMerges]]).
  * Application is per-DISTINCT-word too: segment each distinct word once
  * (row-local greedy munch against the broadcast vocabulary), then join
  * the piece streams back to the corpus on the word — so tokenizing
  * 100 TB costs one explode + one vocabulary-sized equi-join, never a
  * per-occurrence DP.
  *
  * Determinism: the Viterbi-EM variant (hard assignments, the
  * SentencePiece `--hard_em` shape) with fully ordered tie-breaks —
  * DP prefers the LONGER piece at equal score, pruning ranks by
  * (count desc, piece asc) — so the fitted vocabulary is a pure function
  * of (word counts, config), bit-stable across partitionings.
  *
  * Greedy maximal-munch (BERT WordPiece's matching rule) rather than
  * Viterbi at apply time keeps application replayable by a plain SQL
  * engine: longest-prefix matching is a recursive CTE over an inlined
  * vocabulary (the q166 oracle), where a Viterbi replay would need the
  * log-prob DP.
  */
object UnigramTrainer {

  /** Fit a unigram vocabulary from a (word, n) table. Returns
    * (piece, finalCount) with multi-char pieces ranked by
    * (count desc, piece asc), capped at `vocabSize` AFTER reserving every
    * single character seen (coverage: greedy munch can always fall back
    * to a single char).
    */
  def fitUnigram(counts: DataFrame, vocabSize: Int,
                 maxPieceLen: Int = 6, seedSize: Int = 2000,
                 minCount: Long = 2L, emIters: Int = 3,
                 maxVocabRows: Int = 2000000): Seq[(String, Long)] = {
    val rows = counts
      .select(col("word").cast("string"), col("n").cast("long"))
      .limit(maxVocabRows + 1).collect()
    require(rows.length <= maxVocabRows,
            s"vocabulary exceeds maxVocabRows=$maxVocabRows — raise " +
              "minCount (tokenizer training always prunes rare words)")
    val words: Seq[(String, Long)] =
      rows.toSeq.map(r => (r.getString(0), r.getLong(1)))
        .filter(_._1.nonEmpty)

    // single characters: always retained (coverage floor)
    val singles: Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, n) =>
        w.foreach(c => m.update(c.toString, m.getOrElse(c.toString, 0L) + n))
      }
      m.toMap
    }
    // seed multi-char pieces: every substring occurrence of length
    // 2..maxPieceLen, counted with multiplicity; pruned to the
    // (count desc, piece asc) top `seedSize` at `minCount`
    val seed: Seq[(String, Long)] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, n) =>
        var i = 0
        while (i < w.length) {
          var l = 2
          while (l <= maxPieceLen && i + l <= w.length) {
            val s = w.substring(i, i + l)
            m.update(s, m.getOrElse(s, 0L) + n)
            l += 1
          }
          i += 1
        }
      }
      m.toSeq.filter(_._2 >= minCount)
        .sortBy { case (p, n) => (-n, p) }
        .take(seedSize)
    }

    var pieceCounts: Map[String, Long] = singles ++ seed
    var iter = 0
    while (iter < emIters) {
      // accumulate in Long (exact, order-independent) and convert ONCE:
      // a double fold in hash-iteration order is stable within one JVM
      // build but not guaranteed across Scala collection versions
      val total = pieceCounts.values.sum.toDouble +
        singles.size // add-one mass for singles (coverage smoothing)
      def logp(p: String): Double = {
        val c = pieceCounts.getOrElse(p, 0L).toDouble +
          (if (p.length == 1) 1.0 else 0.0)
        math.log(c / total)
      }
      val vocab = pieceCounts.keySet
      val next = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, n) =>
        val L = w.length
        val dp = Array.fill(L + 1)(Double.NegativeInfinity)
        val back = Array.fill(L + 1)(-1)
        dp(0) = 0.0
        var i = 1
        while (i <= L) {
          // j ascending = longest piece first; strict > keeps the longer
          // piece on exact ties — fully deterministic
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            val p = w.substring(j, i)
            if (p.length == 1 || vocab.contains(p)) {
              val cand = dp(j) + logp(p)
              if (cand > dp(i)) { dp(i) = cand; back(i) = j }
            }
            j += 1
          }
          i += 1
        }
        var k = L
        while (k > 0) {
          val j = back(k)
          val p = w.substring(j, k)
          next.update(p, next.getOrElse(p, 0L) + n)
          k = j
        }
      }
      // unused multi-char pieces drop out; singles persist (0-count ok)
      pieceCounts = singles.map { case (c, _) =>
        c -> next.getOrElse(c, 0L)
      } ++ next.filter(_._1.length > 1)
      iter += 1
    }

    val multis = pieceCounts.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, n) => (-n, p) }
      .take(math.max(0, vocabSize - singles.size))
    val kept = multis ++ singles.map { case (c, _) =>
      c -> pieceCounts.getOrElse(c, 0L)
    }.toSeq
    kept.sortBy { case (p, n) => (-n, p) }
  }

  /** Persist a fitted vocabulary — the train-once/apply-daily contract
    * (same pattern as [[BpeTrainer.save]]).
    */
  def save(spark: SparkSession, vocab: Seq[(String, Long)],
           name: String): Unit = {
    import spark.implicits._
    IndexStore.savePlainArtifact(
      vocab.zipWithIndex
        .map { case ((p, n), i) => (i, p, n) }
        .toDF("rank", "piece", "n"),
      s"${name}_pieces")
  }

  /** Load a persisted vocabulary in rank order. */
  def load(spark: SparkSession, name: String): Seq[(String, Long)] =
    IndexStore.loadPlainArtifact(spark, s"${name}_pieces").orderBy("rank")
      .collect().toSeq.map(r => (r.getString(1), r.getLong(2)))

  /** Greedy maximal-munch segmentation of one word: repeatedly take the
    * longest vocabulary piece matching at the cursor, falling back to the
    * single character (always defined). Pure function — shared by the
    * distributed apply and the spec brute-force.
    */
  def greedySegment(w: String, vocab: Set[String],
                    maxPieceLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      var l = math.min(maxPieceLen, w.length - i)
      while (l > 1 && !vocab.contains(w.substring(i, i + l))) l -= 1
      out += w.substring(i, i + l)
      i += l
    }
    out.toSeq
  }

  /** Segment every document's token stream against a fitted vocabulary.
    * Per-DISTINCT-word work: explode → distinct words → one row-local
    * greedy munch each (mapPartitions; genuinely imperative char
    * matching) → join the piece strings back on the word → per-doc
    * ordered reassembly (the [[Dedup.lineDedup]] shape). Output:
    * (doc_id, n_words, n_pieces, piece_fp) where piece_fp is the md5 of
    * the space-joined piece stream — the canonical comparable form.
    */
  def segmentDocs(docs: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[(String, Long)],
                  maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("doc_id"),
                           posexplode(Dedup.wordTokens(col(textCol))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
              col("col").as("word"))
    val vocabSet = vocab.map(_._1).toSet
    val vb = spark.sparkContext.broadcast(vocabSet)
    val segmented = toks.select("word").distinct()
      .as[String]
      .mapPartitions { ws =>
        val v = vb.value
        ws.map { w =>
          val ps = greedySegment(w, v, maxPieceLen)
          (w, ps.mkString(" "), ps.length.toLong)
        }
      }
      .toDF("word", "pieces", "n_pieces")
    toks.join(segmented, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        md5(array_join(
              transform(
                array_sort(collect_list(
                  struct(col("pos"), col("pieces")))),
                s => s.getField("pieces")),
              " ").cast("binary")).as("piece_fp"))
  }
}
