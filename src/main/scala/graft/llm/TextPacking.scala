package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-capacity token bins (the pre-tokenization step of packed-sequence
  * training). Documents longer than the capacity get a bin of their own
  * (flagged truncatable by the caller's policy).
  *
  * Packing is first-fit per partition via mapPartitions — embarrassingly
  * parallel, zero shuffle, and the waste bound of first-fit (≤ 2× optimal
  * bins) holds per partition independently, so quality doesn't degrade as
  * the corpus grows. Bin ids are (partition << 32 | local), unique without
  * any cross-partition coordination.
  */
object TextPacking {

  val packedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("bin_id", LongType, nullable = false),
    StructField("bin_fill", LongType, nullable = false))) // fill AFTER adding

  /** Sliding-window document chunking — the RAG/pretraining prep staple:
    * split each doc into `chunkTokens`-token windows advancing by
    * `chunkTokens - overlap`, the last window running short rather than
    * back-shifting (so chunk starts are a pure function of the index and
    * the whole op replays in SQL — the q115 oracle). Pure codegen'd
    * expressions: whitespace split → integer chunk count →
    * explode(sequence) → slice, all row-local (scan-speed at 100 TB, no
    * shuffle, no UDF). Emits (doc_id, chunk_idx, start_tok, n_tok,
    * chunk_text) — md5(chunk_text) is the usual downstream dedup key.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
            "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol).as("doc_id"), toks.as("__t"))
      .withColumn("__n", size(col("__t")))
      // integer ceil((n - chunkTokens) / stride) + 1, portable DIV math
      .withColumn("__nc",
        when(col("__n") <= chunkTokens, lit(1)).otherwise(
          expr(s"((__n - $chunkTokens + ${stride - 1}) DIV $stride) + 1")
            .cast("int")))
      .withColumn("chunk_idx",
                  explode(sequence(lit(0), col("__nc") - 1)))
      .withColumn("start_tok", (col("chunk_idx") * stride).cast("long"))
      .withColumn("n_tok",
                  least(lit(chunkTokens),
                        col("__n") - col("chunk_idx") * stride)
                    .cast("long"))
      .withColumn("chunk_text",
                  concat_ws(" ", slice(col("__t"),
                                       col("chunk_idx") * stride + 1,
                                       lit(chunkTokens))))
      .select("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_text")
  }

  /** Seeded span-corruption pairs (the T5/BERT denoising-objective data
    * prep): deterministically mask ~`rateHex4`/0x10000 of each document's
    * whitespace tokens — the mask decision is the 4-hex-digit md5 prefix
    * of `"id:pos"` compared against the threshold, so the corruption is a
    * pure function of (doc, position): reproducible across engines,
    * partitionings, and reruns, with no RNG state to checkpoint. Emits
    * `input_text` (masked positions replaced by the sentinel) and
    * `target_text` ("pos:token" for every masked position, in order) —
    * the (input, label) pair a denoising trainer consumes.
    *
    * Row-local HOFs over a materialized token array, one md5 per token
    * (computed once into the flagged struct array — the HOF scale rule);
    * zero shuffle, SQL-replayable.
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  rateHex4: String = "2666",
                  sentinel: String = "<X>"): DataFrame = {
    require(rateHex4.matches("[0-9a-f]{4}"), "rateHex4: 4 lowercase hex digits")
    df.select(col(idCol).as("doc_id"),
              split(trim(col(textCol)), "\\s+").as("__t"))
      .withColumn(
        "__m",
        transform(col("__t"), (t, i) =>
          struct(
            (substring(md5(concat_ws("",
                                     col("doc_id").cast("string"), lit(":"),
                                     (i + 1).cast("string")).cast("binary")),
                       1, 4) < lit(rateHex4)).as("f"),
            t.as("t"),
            (i + 1).cast("long").as("p"))))
      .select(
        col("doc_id"),
        size(col("__m")).cast("long").as("n_tokens"),
        size(filter(col("__m"), m => m.getField("f")))
          .cast("long").as("n_masked"),
        array_join(
          transform(col("__m"),
                    m => when(m.getField("f"), lit(sentinel))
                      .otherwise(m.getField("t"))),
          " ").as("input_text"),
        array_join(
          transform(filter(col("__m"), m => m.getField("f")),
                    m => concat_ws(":", m.getField("p").cast("string"),
                                   m.getField("t"))),
          " ").as("target_text"))
  }

  def packDocuments(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int): DataFrame = {
    require(capacity > 0)
    val in = df.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("n_tokens"))
    val enc = Encoders.row(packedSchema)
    in.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      // open bins: (binLocalId, fill) — first-fit over the open list
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      rows.map { r =>
        val id = r.getLong(0)
        val n  = math.max(r.getLong(1), 1L)
        val fit = bins.indexWhere { case (_, fill) => fill + n <= capacity }
        val (binLocal, newFill) =
          if (n >= capacity) { // oversized → dedicated bin, not kept open
            val b = bins.size.toLong
            bins += ((b, capacity.toLong))
            (b, n)
          } else if (fit >= 0) {
            val (b, fill) = bins(fit)
            bins(fit) = (b, fill + n)
            (b, fill + n)
          } else {
            val b = bins.size.toLong
            bins += ((b, n))
            (b, n)
          }
        Row(id, n, (pid << 32) | binLocal, newFill)
      }
    }(enc)
  }
}
