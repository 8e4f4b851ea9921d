package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the second columnar format large Spark/Hive estates
  * actually hold data in (Spark ships a native vectorized ORC reader).
  * An engine that claims "switch to me and run everything" has to ingest
  * the columnar tables a warehouse already has, not just parquet.
  *
  * Scale notes: the native reader supports the same pushdown surface as
  * parquet — predicate pushdown, column pruning, partition pruning —
  * so every plan-shape guarantee in PLANS.md carries over. Prefer zstd
  * (`option("compression", "zstd")`) on write; ORC stripes are the
  * split unit, so many medium files beat one giant stream for
  * parallelism, same as parquet row groups.
  */
object Orc {

  /** Explicit-schema ORC reader — the 100 TB-preferred shape (no
    * footer-sampling inference pass over thousands of files).
    */
  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Schema-from-footer reader (dev/ad-hoc use). */
  def readOrcInfer(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink (`compression` e.g. "zstd", "zlib", "snappy"). */
  def writeOrc(df: DataFrame, path: String,
               compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).orc(path)
  }
}
