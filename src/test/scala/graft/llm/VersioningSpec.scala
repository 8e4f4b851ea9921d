package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkSpec {

  test("snapshotDiff classifies added/removed/changed/unchanged per doc") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta"))
      .toDF("doc_id", "text")
    val out = Versioning.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
                      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff carries the surviving side's fingerprint; removed " +
       "rows keep the old one") {
    import spark.implicits._
    val v1 = Seq((1L, "gone"), (2L, "old")).toDF("doc_id", "text")
    val v2 = Seq((2L, "new")).toDF("doc_id", "text")
    val fp = Versioning.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(fp(1L) == md5hex("gone"), "removed row keeps the old fp")
    assert(fp(2L) == md5hex("new"), "changed row carries the new fp")
  }

  test("snapshotDiffSummary aggregates to one row per change kind") {
    import spark.implicits._
    val v1 = (1L to 10L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val v2 = (3L to 12L).map(i =>
      (i, if (i == 5L) "rewritten" else s"text$i")).toDF("doc_id", "text")
    val out = Versioning.snapshotDiffSummary(v1, v2, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("removed" -> 2L, "added" -> 2L,
                      "changed" -> 1L, "unchanged" -> 7L))
  }

  test("applyChangelog: latest version wins; deletes remove; inserts " +
       "land; untouched docs pass through") {
    import spark.implicits._
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (2L, 1L, "upsert", "two v1"),
      (2L, 3L, "upsert", "two v3"),   // latest wins over v1
      (2L, 2L, "upsert", "two v2"),
      (3L, 1L, "delete", ""),
      (5L, 1L, "upsert", "five new"), // insert
      (4L, 1L, "delete", ""),
      (4L, 2L, "upsert", "four back")) // re-upsert AFTER delete → kept
      .toDF("doc_id", "version", "op", "text")
    val out = Versioning.applyChangelog(base, changes,
                                        "doc_id", "version", "op", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "one", 2L -> "two v3",
                      4L -> "four back", 5L -> "five new"))
  }

  test("corpusDigest is invariant to partitioning and row order") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"document body $i"))
      .toDF("doc_id", "text")
    val a = Versioning.corpusDigest(docs.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2))
      .toMap
    val b = Versioning.corpusDigest(
      docs.repartition(32).sortWithinPartitions("text"), "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(a == b)
    assert(a.keys.count(_._1 == 1) == 1) // exactly one root
  }

  test("frameDigest: partitioning-invariant, content-sensitive, and " +
       "equal to a driver-computed Merkle root") {
    import spark.implicits._
    import java.security.MessageDigest
    val rows = (0L until 300L).map(i => (i, s"k$i"))
    val df = rows.toDF("id", "k")
    val leaf = concat_ws(":", col("k"), col("id").cast("string"))
    def out(d: org.apache.spark.sql.DataFrame) =
      Versioning.frameDigest(d, leaf).head()
    val a = out(df.repartition(1))
    val b = out(df.repartition(17).sortWithinPartitions("k"))
    assert(a == b, "digest must not depend on partitioning or order")
    assert(a.getLong(0) == 300L)
    // independent scalar reference
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString
    val leaves = rows.map { case (i, k) => md5hex(s"$k:$i") }
    val byBucket = leaves.groupBy { l =>
      java.lang.Long.parseLong(md5hex(l).take(15), 16) % 64
    }
    val root = md5hex(byBucket.toSeq.sortBy(_._1)
      .map { case (_, ls) => md5hex(ls.sorted.mkString("")) }
      .mkString(""))
    assert(a.getString(1) == root, "must equal the scalar Merkle root")
    // any single-row change flips the digest
    val mutated = rows.updated(7, (7L, "MUT")).toDF("id", "k")
    assert(out(mutated).getString(1) != a.getString(1))
  }

  test("frameDigestSurvivors: digest and n_rows identical to " +
       "frameDigest; survivors equal the semi-join count; duplicate " +
       "subject keys cannot re-multiply rows") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, s"k$i"))
    val df = rows.toDF("id", "k")
    val leaf = concat_ws(":", col("k"), col("id").cast("string"))
    val keys = Seq(3L, 7L, 7L, 7L, 250L, 999L).toDF("id") // dups + a miss
    val plain = Versioning.frameDigest(df, leaf).head()
    val fused = Versioning
      .frameDigestSurvivors(df.repartition(13), leaf, keys, "id").head()
    assert(fused.getLong(0) == plain.getLong(0), "n_rows unchanged")
    assert(fused.getString(1) == plain.getString(1), "digest unchanged")
    val semi = df.join(keys, Seq("id"), "left_semi").count()
    assert(fused.getLong(2) == semi && semi == 3L,
           "survivors = semi-join count despite duplicate keys")
  }

  test("corpusDigest localizes a single-doc mutation to one bucket") {
    import spark.implicits._
    val v1 = (0L until 500L).map(i => (i, s"document body $i"))
      .toDF("doc_id", "text")
    val v2 = (0L until 500L).map(i =>
      (i, if (i == 250L) "tampered" else s"document body $i"))
      .toDF("doc_id", "text")
    val d1 = Versioning.corpusDigest(v1, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2))
      .toMap
    val d2 = Versioning.corpusDigest(v2, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2))
      .toMap
    // root differs; exactly ONE level-0 bucket differs (the mutated
    // leaf moves bucket: at most 2 buckets touched)
    assert(d1((1, 0L)) != d2((1, 0L)))
    val changed = d1.keys.filter(_._1 == 0)
      .count(k => d1(k) != d2.getOrElse(k, ""))
    assert(changed >= 1 && changed <= 2, s"$changed buckets changed")
  }

  test("shardDiff: identical snapshots are all-unchanged; a one-doc " +
       "edit touches at most two buckets; doc mass is conserved") {
    val v1 = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val same = Versioning.shardDiff(v1, v1, "doc_id", "text")
    assert(same.filter(col("status") =!= "unchanged").count() == 0)
    val v2 = v1.select(
      col("doc_id"),
      when(col("doc_id") === 7, concat(col("text"), lit(" edited")))
        .otherwise(col("text")).as("text"))
    val diff = Versioning.shardDiff(v1, v2, "doc_id", "text").collect()
    val touched = diff.count(_.getString(5) != "unchanged")
    assert(touched >= 1 && touched <= 2,
           s"a one-doc edit must touch <= 2 buckets, got $touched")
    assert(diff.map(_.getLong(1)).sum == v1.count() &&
             diff.map(_.getLong(2)).sum == v2.count(),
           "per-bucket doc counts must conserve corpus mass")
  }

  test("selective rescore touches only changed buckets: a one-doc edit " +
       "re-scores ~1/64th of the corpus, and bucket routing agrees " +
       "with the digest") {
    val v1 = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val v2 = v1.select(
      col("doc_id"),
      when(col("doc_id") === 7, concat(col("text"), lit(" edited")))
        .otherwise(col("text")).as("text"))
    val changed = Versioning.shardDiff(v1, v2, "doc_id", "text", 64)
      .filter(col("status") =!= "unchanged").select("bucket")
    val nChanged = changed.count()
    assert(nChanged >= 1 && nChanged <= 2)
    val rescored = v2.withColumn(
        "bucket", Versioning.contentBucket(col("doc_id"),
                                           col("text"), 64))
      .join(broadcast(changed), Seq("bucket"))
    val n = rescored.count()
    // a handful of bucket-mates, never the corpus
    assert(n >= 1 && n <= v1.count() / 8,
           s"one-doc edit must re-score a sliver, got $n")
    assert(rescored.filter(col("doc_id") === 7).count() == 1,
           "the edited doc itself must be in the rescore set")
  }

  test("scd2History: intervals chain correctly, deletes close without " +
       "opening, equal-version collisions resolve changelog-first, and " +
       "the is_current slice reconciles EXACTLY with applyChangelog") {
    import spark.implicits._
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (2L, 1L, "upsert", "two v1"),   // collides with the base at v1 —
                                      //   changelog must win
      (2L, 3L, "upsert", "two v3"),
      (2L, 2L, "upsert", "two v2"),
      (3L, 1L, "delete", ""),         // delete AT the base version
      (5L, 1L, "upsert", "five new"),
      (4L, 1L, "delete", ""),
      (4L, 2L, "upsert", "four back"))
      .toDF("doc_id", "version", "op", "text")
    val hist = Versioning.scd2History(base, changes,
                                      "doc_id", "version", "op", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getLong(3)))
    // doc 1: untouched → one open interval from the base
    assert(hist.filter(_._1 == 1L).toSeq ==
             Seq((1L, 1L, Versioning.Scd2Open, 1L)))
    // doc 2: v1 (changelog wins the collision) → v2 → v3 open
    assert(hist.filter(_._1 == 2L).toSeq ==
             Seq((2L, 1L, 2L, 0L), (2L, 2L, 3L, 0L),
                 (2L, 3L, Versioning.Scd2Open, 1L)))
    // doc 3: deleted at the base version → NO interval at all
    assert(!hist.exists(_._1 == 3L))
    // doc 4: deleted at v1 then re-upserted at v2 → one open interval
    assert(hist.filter(_._1 == 4L).toSeq ==
             Seq((4L, 2L, Versioning.Scd2Open, 1L)))
    // doc 5: inserted → open from its insert version
    assert(hist.filter(_._1 == 5L).toSeq ==
             Seq((5L, 1L, Versioning.Scd2Open, 1L)))
    // every id's intervals tile without gaps or overlaps
    hist.groupBy(_._1).values.foreach { iv =>
      val s = iv.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._3 == b._2, s"gap/overlap in $s")
        case _           =>
      }
      assert(s.count(_._4 == 1L) <= 1 &&
               (s.count(_._4 == 1L) == 1) ==
                 (s.last._3 == Versioning.Scd2Open))
    }
    // current-state reconciliation: is_current rows ≡ applyChangelog
    val current = Versioning.scd2History(base, changes,
                                         "doc_id", "version", "op",
                                         "text")
      .filter(col("is_current") === 1L)
      .select("doc_id", "content_h")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val merged = Versioning.applyChangelog(base, changes,
                                           "doc_id", "version", "op",
                                           "text")
      .select(col("doc_id"),
              conv(substring(md5(col("text").cast("binary")), 1, 15),
                   16, 10).cast("long").as("content_h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(current == merged,
           s"SCD2 current slice must equal the MERGE view:\n" +
             s"current=$current\nmerged=$merged")
  }

  test("scd2History on the q240 corpus changelog: row counts decompose " +
       "into base + revisions + inserts − deletions, and the current " +
       "slice matches q105's merged corpus") {
    val sf = sf0001
    val d = graft.sources.Tables.documents(spark, sf)
    val hist = graft.operators.LlmQueries
      .queries("q240_scd2_history")(spark, sf)
    val n = d.count()
    val nRev2 = d.filter(col("doc_id") % 7 === 0).count()
    val nRev3 = d.filter(col("doc_id") % 14 === 0).count()
    val nIns = d.filter(col("doc_id") % 13 === 0).count()
    // every upsert row opens exactly one interval (deletes open none)
    assert(hist.count() == n + nRev2 + nRev3 + nIns)
    val nDel = d.filter(col("doc_id") % 11 === 0 &&
                        col("doc_id") % 7 =!= 0).count()
    assert(hist.filter(col("is_current") === 1L).count() ==
             n + nIns - nDel)
    val current = hist.filter(col("is_current") === 1L)
      .select("doc_id", "content_h")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val merged = graft.operators.LlmQueries
      .queries("q105_apply_changelog")(spark, sf)
      .select(col("doc_id"),
              conv(substring(col("content_md5"), 1, 15), 16, 10)
                .cast("long").as("content_h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(current == merged)
  }

  test("scd2Roll ≡ rebuild: day-by-day rolls (including a delete-only " +
       "day and a brand-new id) land byte-identical to the one-shot " +
       "history, and the roll only broadcasts the delta against hist") {
    import spark.implicits._
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val day1 = Seq((2L, 2L, "upsert", "two v2"),
                   (4L, 2L, "upsert", "four new"))
      .toDF("doc_id", "version", "op", "text")
    val day2 = Seq((3L, 3L, "delete", ""),       // delete-only for 3
                   (2L, 3L, "delete", ""),
                   (2L, 4L, "upsert", "two back")) // delete then revive
      .toDF("doc_id", "version", "op", "text")
    val cols = ("doc_id", "version", "op", "text")
    def hist(ch: org.apache.spark.sql.DataFrame) =
      Versioning.scd2History(base, ch, cols._1, cols._2, cols._3,
                             cols._4)
    def roll(h: org.apache.spark.sql.DataFrame,
             ch: org.apache.spark.sql.DataFrame) =
      Versioning.scd2Roll(h, ch, cols._1, cols._2, cols._3, cols._4)
    val rolled = roll(roll(hist(day1.limit(0)), day1), day2)
    val rebuilt = hist(day1.unionByName(day2))
    assert(rolled.collect().toSeq == rebuilt.collect().toSeq,
           "chained daily rolls must equal the one-shot rebuild")
    // the corpus-scale check, against the q240 full build
    val sf = sf0001
    val rolledQ = graft.operators.LlmQueries
      .queries("q244_scd2_roll")(spark, sf).collect().toSeq
    val rebuiltQ = graft.operators.LlmQueries
      .queries("q240_scd2_history")(spark, sf).collect().toSeq
    assert(rolledQ == rebuiltQ)
    // hist never shuffles: its branch reaches the union through a
    // BroadcastHashJoin on the delta's affected-id set
    val plan = graft.operators.LlmQueries
      .queries("q244_scd2_roll")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"the roll must broadcast the delta id set:\n$plan")
  }

  test("q245 as-of serving: the final-version state digest equals the " +
       "q105 merged corpus digested the same way, and doc counts move " +
       "with the changelog (inserts at v1, deletes at v2)") {
    import spark.implicits._
    val sf = sf0001
    val rows = graft.operators.LlmQueries
      .queries("q245_scd2_asof")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val d = graft.sources.Tables.documents(spark, sf)
    val n = d.count()
    val nIns = d.filter(col("doc_id") % 13 === 0).count()
    val nDel = d.filter(col("doc_id") % 11 === 0 &&
                        col("doc_id") % 7 =!= 0).count()
    assert(rows(1L)._1 == n + nIns, "v1 = base + inserts")
    assert(rows(2L)._1 == n + nIns - nDel, "v2 loses the deletes")
    assert(rows(3L)._1 == rows(2L)._1, "v3 only rewrites")
    val mergedDigest = graft.operators.LlmQueries
      .queries("q105_apply_changelog")(spark, sf)
      .select(sum((conv(substring(col("content_md5"), 1, 15), 16, 10)
                     .cast("long") + col("doc_id")) % 1048576L))
      .head.getLong(0)
    assert(rows(3L)._2 == mergedDigest,
           "as-of final version must digest-match the MERGE view")
  }
}
