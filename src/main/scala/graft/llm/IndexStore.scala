package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for the incremental-dedup and ANN indexes — the piece that
  * closes the daily-ingest contract: an index built from yesterday's corpus
  * must classify today's batch from DISK, in a fresh session, without
  * re-touching corpus text.
  *
  * Every index is written as a parquet table BUCKETED (and bucket-sorted)
  * by its join key, so the classify-time equi-join reads the corpus-scale
  * side shuffle-free: Spark's bucketed-scan planning aligns the join's
  * required distribution with the table's bucket spec and only the (small,
  * delta-sized) batch side exchanges. That is exactly the layout the
  * [[Dedup.MinhashIndex]] scaladoc promises for production.
  *
  * Tables are registered in the session catalog (metastore) because bucket
  * metadata lives there — a bare parquet directory loses the bucketing
  * contract. Pass `dir` to pin the data files to an external location
  * (e.g. the corpus lake); omit it for warehouse-managed storage.
  */
object IndexStore {

  /** Overwrite-save `df` as a bucketed, bucket-sorted parquet table.
    * The pre-drop makes re-saves atomic w.r.t. metadata: a stale table
    * with different bucketing/path can never half-merge with the new one.
    */
  private def writeBucketedTable(df: DataFrame, table: String,
                                 numBuckets: Int, keys: Seq[String],
                                 dir: Option[String]): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    dir.fold(w)(d => w.option("path", d)).saveAsTable(table)
  }

  // ---------------------------------------------------------------- MinHash

  /** Persist a [[Dedup.MinhashIndex]] as two bucketed tables:
    * `{name}_buckets` bucketed by (band, bucket) — the candidate-join key —
    * and `{name}_shingles` bucketed by corpus_id — the verify-join key.
    */
  def saveMinhashIndex(index: Dedup.MinhashIndex, name: String,
                       numBuckets: Int = 32,
                       dir: Option[String] = None): Unit = {
    writeBucketedTable(index.buckets, s"${name}_buckets", numBuckets,
                       Seq("band", "bucket"), dir.map(d => s"$d/buckets"))
    writeBucketedTable(index.shingles, s"${name}_shingles", numBuckets,
                       Seq("corpus_id"), dir.map(d => s"$d/shingles"))
  }

  /** Load a persisted MinHash index; the returned frames carry the bucket
    * spec, so [[Dedup.minhashIncrementalPortable]] joins them without an
    * index-side Exchange.
    */
  def loadMinhashIndex(spark: SparkSession, name: String): Dedup.MinhashIndex =
    Dedup.MinhashIndex(spark.table(s"${name}_buckets"),
                       spark.table(s"${name}_shingles"))

  // ------------------------------------------------------------ fingerprint

  /** Persist the exact-dedup (fp, corpus_id) index bucketed by fp — the
    * [[Dedup.exactIncremental]] join key.
    */
  def saveFingerprintIndex(index: DataFrame, name: String,
                           numBuckets: Int = 32,
                           dir: Option[String] = None): Unit =
    writeBucketedTable(index, name, numBuckets, Seq("fp"), dir)

  def loadFingerprintIndex(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  // -------------------------------------------------------------------- LSH

  /** Persist an ANN [[Similarity.lshIndex]] bucketed by its hyperplane
    * `bucket` key.
    */
  def saveLshIndex(index: DataFrame, name: String,
                   numBuckets: Int = 32,
                   dir: Option[String] = None): Unit =
    writeBucketedTable(index, name, numBuckets, Seq("bucket"), dir)

  def loadLshIndex(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  // -------------------------------------------------------------------- IVF

  /** Persist a [[Similarity.IvfIndex]]: the cell-assigned corpus bucketed
    * by `cell` (the probe-join key) and the tiny centroid table plain.
    */
  def saveIvfIndex(index: Similarity.IvfIndex, name: String,
                   numBuckets: Int = 16,
                   dir: Option[String] = None): Unit = {
    writeBucketedTable(index.assigned, s"${name}_assigned", numBuckets,
                       Seq("cell"), dir.map(d => s"$d/assigned"))
    val cents = s"${name}_centroids"
    index.centroids.sparkSession.sql(s"DROP TABLE IF EXISTS $cents")
    val w = index.centroids.write.mode(SaveMode.Overwrite).format("parquet")
    dir.fold(w)(d => w.option("path", s"$d/centroids")).saveAsTable(cents)
  }

  def loadIvfIndex(spark: SparkSession, name: String): Similarity.IvfIndex =
    Similarity.IvfIndex(spark.table(s"${name}_assigned"),
                        spark.table(s"${name}_centroids"))

  /** Drop a persisted index's tables (managed data is deleted; external
    * `dir` data is left for the caller's lifecycle).
    */
  def drop(spark: SparkSession, name: String): Unit =
    Seq(name, s"${name}_buckets", s"${name}_shingles",
        s"${name}_assigned", s"${name}_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
}
