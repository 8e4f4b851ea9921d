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

  test("zInterleave matches the hand-computed Morton code") {
    import spark.implicits._
    // a=0b101=5, b=0b011=3 → z bits: a0→p0,b0→p1,a1→p2,b1→p3,a2→p4,b2→p5
    //   = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Compaction.zInterleave(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(z == 27L)
    // order-2 curve over the full 2-bit grid: the classic z pattern
    val grid = for { a <- 0L to 3L; b <- 0L to 3L } yield (a, b)
    val zs = grid.toDF("a", "b")
      .select(col("a"), col("b"),
              Compaction.zInterleave(col("a"), col("b"), 2).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(zs((0L, 0L)) == 0 && zs((1L, 0L)) == 1 &&
      zs((0L, 1L)) == 2 && zs((1L, 1L)) == 3 && zs((2L, 2L)) == 12)
  }

  test("zBin clamps to [0, 2^bits) and degenerate range bins to 0") {
    import spark.implicits._
    val df = Seq(0.0, 50.0, 100.0).toDF("x")
    val bins = df.select(Compaction.zBin(col("x"), 0.0, 100.0, 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(bins == Seq(0L, 128L, 255L)) // max clamps 256 → 255
    val const = df.select(Compaction.zBin(col("x"), 7.0, 7.0, 8))
      .collect().map(_.getLong(0)).toSet
    assert(const == Set(0L))
  }

  test("z-ordered layout prunes 2-D box queries where a 1-D sort cannot") {
    import spark.implicits._
    val dir = tmpDir("zorder")
    // uniform 64×64 grid of points
    val pts = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toDouble, y.toDouble, x * 64L + y)).toSeq
      .toDF("x", "y", "id")
    Compaction.compactZOrderedParquet(pts, s"$dir/z", nFiles = 16,
                                      colA = "x", colB = "y")
    Compaction.compactSortedParquet(pts, s"$dir/x", nFiles = 16,
                                    sortCol = "x")
    assert(parquetFiles(s"$dir/z").size == 16)

    // box = the low-left quadrant's low-left quadrant (1/16 of the plane)
    def overlapping(dir: String): Int =
      parquetFiles(dir).count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        r.getDouble(0) <= 15.0 && r.getDouble(1) >= 0.0 &&
          r.getDouble(2) <= 15.0 && r.getDouble(3) >= 0.0
      }
    val zHit = overlapping(s"$dir/z")
    val xHit = overlapping(s"$dir/x")
    // z-clustering: the box is a contiguous z-prefix → ~1/16 of files;
    // x-sort: the y-constraint prunes nothing, the x-range spans 1/4 of
    // the x axis → ≥ 4 of 16 files
    assert(zHit <= 2, s"z layout should localize the box, hit $zHit/16")
    assert(xHit >= zHit * 2,
           s"1-D sort must overlap more files ($xHit vs $zHit)")
    // correctness: both layouts return the identical box contents
    val zRows = spark.read.parquet(s"$dir/z")
      .filter(col("x") <= 15 && col("y") <= 15).count()
    assert(zRows == 256)
  }
}
