package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)

  test("compactParquet collapses a many-file table to the target count") {
    import spark.implicits._
    val dir = tmpDir("compact")
    // simulate a fragmented ingest: 64 partitions → 64 tiny files
    (1L to 2000L).map(i => (i, s"row $i")).toDF("id", "v")
      .repartition(64)
      .write.parquet(s"$dir/frag")
    assert(parquetFiles(s"$dir/frag").size == 64)
    val frag = spark.read.parquet(s"$dir/frag")
    Compaction.compactParquet(frag, s"$dir/out", nFiles = 4)
    assert(parquetFiles(s"$dir/out").size == 4)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 2000)
    assert(back.agg(sum("id")).head().getLong(0) == 2000L * 2001 / 2)
  }

  test("maxRecordsPerFile splits oversized partitions") {
    import spark.implicits._
    val dir = tmpDir("compactmax")
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    Compaction.compactParquet(df, s"$dir/out", nFiles = 1,
                              maxRecordsPerFile = 300L)
    // 1000 rows / cap 300 → 4 files despite nFiles = 1
    assert(parquetFiles(s"$dir/out").size == 4)
    assert(spark.read.parquet(s"$dir/out").count() == 1000)
  }

  test("compactSortedParquet: files own contiguous ranges; scan prunes") {
    import spark.implicits._
    val dir = tmpDir("compactsort")
    val df = (1L to 4000L).map(i => (i, i % 7)).toDF("id", "grp")
    Compaction.compactSortedParquet(df, s"$dir/out", nFiles = 4,
                                    sortCol = "id")
    val files = parquetFiles(s"$dir/out")
    assert(files.size == 4)
    // each file's id range must be disjoint from the others
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("id"), max("id")).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // a tight id filter reads one file's worth of rows
    val sel = spark.read.parquet(s"$dir/out").filter(col("id") <= 100)
    assert(sel.count() == 100)
  }
}
