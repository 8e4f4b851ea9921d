package graft.llm

import graft.SparkSpec

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
}
