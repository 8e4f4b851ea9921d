package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for co-located joins — the repeated-join answer at
  * 100 TB: pay one clustered write, then every equi-join on the bucket key
  * runs shuffle-free (both sides pre-hashed into the same bucket layout,
  * and sortBy makes it merge-ready without a sort step).
  *
  * The synthetic testdata is plain parquet (no metastore tables), so this
  * is exposed as a utility + spec rather than a Verify query: BucketingSpec
  * asserts the join plan contains NO shuffle Exchange over bucketed tables
  * vs two Exchanges over the plain ones.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on the bucket key. */
  def cocolocatedJoin(spark: SparkSession, left: String, right: String,
                      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
