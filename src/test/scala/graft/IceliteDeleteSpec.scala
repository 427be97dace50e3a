package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Icelite

/** Row-level equality deletes: logical hiding at read time, time travel
  * across the delete, composition with appends and incremental reads,
  * physical reclamation through compaction, and resume semantics. */
class IceliteDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private def base = graft.engine.Pages.indexedPages(spark, "/root/testdata/sf0.001")
    .withColumn("bucket", pmod(col("page_id"), lit(5)))

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("page_id").collect().map(_.getLong(0)).sorted.toSeq

  test("delete hides matching rows; history and manifest metrics are untouched") {
    val root = java.nio.file.Files.createTempDirectory("icelite-del").toString
    Icelite.writeResumable(spark, base, root, "bucket")
    val preId = Icelite.currentSnapshot(root).get.id
    val preEntries = Icelite.currentSnapshot(root).get.entries
      .map(e => e.value -> (e.rows, e.checksum)).toMap

    val keys = base.filter(col("page_id") % 7 === 0).select("bucket", "page_id")
    val touched = Icelite.deleteRowsResumable(spark, keys, root, "bucket",
      Seq("page_id"), runId = "del-1")
    assert(touched == 5) // every bucket holds some page_id % 7 == 0 row

    // Live read excludes exactly the deleted keys — on every read path.
    val want = ids(base.filter(col("page_id") % 7 =!= 0))
    assert(ids(Icelite.read(spark, root)) == want)
    assert(ids(Icelite.readWhere(spark, root, _ == "2")) ==
      ids(base.filter(col("page_id") % 7 =!= 0 && col("bucket") === 2)))

    // Time travel to the pre-delete snapshot still sees everything.
    assert(ids(Icelite.readAsOf(spark, root, preId)) == ids(base))

    // Data-file metrics are untouched (rows/checksum describe data files);
    // the delete rides as delete files + key declaration.
    val entries = Icelite.currentSnapshot(root).get.entries
    assert(entries.map(e => e.value -> (e.rows, e.checksum)).toMap == preEntries)
    assert(entries.forall(e => e.deleteFiles.nonEmpty && e.deleteKey == Seq("page_id")))
    Icelite.drop(root)
  }

  test("standing deletes stay in force over later appends (takedown semantics)") {
    val root = java.nio.file.Files.createTempDirectory("icelite-delapp").toString
    val first = base.filter(col("page_id") < 5000)
    Icelite.writeResumable(spark, first, root, "bucket")
    val keys = first.filter(col("page_id") % 7 === 0).select("bucket", "page_id")
    Icelite.deleteRowsResumable(spark, keys, root, "bucket",
      Seq("page_id"), runId = "del-1")
    val preAppend = Icelite.currentSnapshot(root).get.id

    // Append fresh rows PLUS a re-crawl of a deleted key (page_id 7):
    // the standing delete must keep hiding it — a taken-down url stays
    // down until an explicit compact-then-rewrite readmits it.
    val fresh = base.filter(col("page_id") >= 5000 && col("page_id") < 6000)
    val recrawl = first.filter(col("page_id") === 7)
    Icelite.appendResumable(spark, fresh.unionByName(recrawl), root, "bucket",
      runId = "app-1")

    val want = ids(first.filter(col("page_id") % 7 =!= 0)) ++ ids(fresh)
    assert(ids(Icelite.read(spark, root)) == want.sorted)

    // Incremental read delivers the appended files' rows minus deletes:
    // the re-crawled deleted key is not re-surfaced.
    assert(ids(Icelite.readIncremental(spark, root, preAppend)) == ids(fresh))
    Icelite.drop(root)
  }

  test("compaction applies deletes physically and clears delete files") {
    val root = java.nio.file.Files.createTempDirectory("icelite-delcomp").toString
    Icelite.writeResumable(spark, base, root, "bucket")
    // Bucket 3 is deleted WHOLE (the fully-emptied-bucket edge); others
    // lose their page_id % 7 rows.
    val keys = base.filter(col("page_id") % 7 === 0 || col("bucket") === 3)
      .select("bucket", "page_id")
    Icelite.deleteRowsResumable(spark, keys, root, "bucket",
      Seq("page_id"), runId = "del-1")
    val live = ids(Icelite.read(spark, root))
    assert(live == ids(base.filter(col("page_id") % 7 =!= 0 && col("bucket") =!= 3)))

    val compacted = Icelite.compactBuckets(spark, root)
    assert(compacted == 5, s"compacted $compacted")
    val entries = Icelite.currentSnapshot(root).get.entries
    assert(entries.forall(_.deleteFiles.isEmpty))
    val empty3 = entries.find(_.value == "3").get
    assert(empty3.rows == 0 && empty3.files.isEmpty)
    // Content identical before/after the physical rewrite.
    assert(ids(Icelite.read(spark, root)) == live)
    // Post-compaction metrics describe the live content: a from-scratch
    // write of the live rows yields identical (rows, checksum) per bucket.
    val root2 = java.nio.file.Files.createTempDirectory("icelite-delcomp2").toString
    Icelite.writeResumable(spark,
      base.filter(col("page_id") % 7 =!= 0 && col("bucket") =!= 3), root2, "bucket")
    val m1 = entries.filter(_.rows > 0).map(e => e.value -> (e.rows, e.checksum)).toMap
    val m2 = Icelite.currentSnapshot(root2).get.entries
      .map(e => e.value -> (e.rows, e.checksum)).toMap
    assert(m1 == m2)
    // Vacuum reclaims the superseded data + delete files; reads survive.
    assert(Icelite.vacuum(root) > 0)
    assert(ids(Icelite.read(spark, root)) == live)
    Icelite.drop(root); Icelite.drop(root2)
  }

  test("delete resumes by runId after a mid-run crash") {
    val root = java.nio.file.Files.createTempDirectory("icelite-delres").toString
    Icelite.writeResumable(spark, base, root, "bucket")
    val keys = base.filter(col("page_id") % 7 === 0).select("bucket", "page_id")
    intercept[RuntimeException] {
      Icelite.deleteRowsResumable(spark, keys, root, "bucket",
        Seq("page_id"), runId = "del-x", failAfter = 2)
    }
    val resumed = Icelite.deleteRowsResumable(spark, keys, root, "bucket",
      Seq("page_id"), runId = "del-x")
    assert(resumed == 3, s"resumed $resumed buckets")
    assert(ids(Icelite.read(spark, root)) ==
      ids(base.filter(col("page_id") % 7 =!= 0)))
    Icelite.drop(root)
  }

  test("one table uses one delete key; unknown buckets are ignored") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-delkey").toString
    Icelite.writeResumable(spark, base, root, "bucket")
    val keys = base.filter(col("page_id") % 11 === 0).select("bucket", "page_id")
    Icelite.deleteRowsResumable(spark, keys, root, "bucket",
      Seq("page_id"), runId = "del-1")
    intercept[IllegalArgumentException] {
      Icelite.deleteRowsResumable(spark,
        base.select("bucket", "url"), root, "bucket", Seq("url"), runId = "del-2")
    }
    // Keys routed to buckets the table does not hold are dropped silently.
    val ghost = Seq((99L, 1L)).toDF("bucket", "page_id")
    assert(Icelite.deleteRowsResumable(spark, ghost, root, "bucket",
      Seq("page_id"), runId = "del-3") == 0)
    Icelite.drop(root)
  }
}
