package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Icelite, Knn, Pages}

/** The bucketed prepared-corpus kNN path: file-precise scan pruning for
  * localized query batches, stats-driven fallback to the full scan, and
  * exact agreement with the one-shot path in every planning regime. */
class KnnPreparedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def points = Pages.pages(spark, sfDir)
    .select(col("page_id").as("id"), col("lat"), col("lng"))

  private def oneShot(queries: org.apache.spark.sql.DataFrame, k: Int) = {
    val df = Knn.knnJoin(spark, points, queries, k = k, res = 7)
    val out = df.select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSet
    df.unpersist(blocking = false)
    out
  }

  private def prepared(corpus: Knn.PreparedCorpus,
                       queries: org.apache.spark.sql.DataFrame, k: Int) = {
    val df = Knn.knnJoinPrepared(spark, corpus, queries, k = k)
    val out = df.select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSet
    df.unpersist(blocking = false)
    out
  }

  test("localized batch prunes the corpus scan to few files and stays exact") {
    import spark.implicits._
    val corpus = Knn.prepareCorpus(spark, points, res = 7)
    try {
      val totalFiles = corpus.store.get.filesByBucket.valuesIterator.sum
      assert(totalFiles > 8, s"need a multi-bucket table, got $totalFiles files")
      // All queries inside the Paris cluster: their ring-2 disks at res 7
      // truncate to one or two res-1 buckets.
      val qs = Seq((1L, 48.8566, 2.3522), (2L, 48.8666, 2.3622),
        (3L, 48.8466, 2.3422)).toDF("qid", "lat", "lng")
      Knn.lastPreparedScan = None
      val got = prepared(corpus, qs, k = 4)
      val scan = Knn.lastPreparedScan
      assert(scan.exists(_._1 == "pruned"), s"expected pruned scan, got $scan")
      val files = scan.get._2
      assert(files > 0 && files <= totalFiles / 4,
        s"expected <= ${totalFiles / 4} files scanned, got $files of $totalFiles")
      assert(got == oneShot(qs, k = 4))
    } finally corpus.release()
  }

  test("batch over most of the corpus keeps the full scan (row-mass planning)") {
    // pruneMaxRowFraction = 0 forces the full-scan plan for ANY batch;
    // results must not depend on the plan chosen.
    val corpus = Knn.prepareCorpus(spark, points, res = 7,
      pruneMaxRowFraction = 0.0)
    try {
      val qs = points.filter(col("id") % 101 === 0)
        .select(col("id").as("qid"), col("lat"), col("lng"))
      Knn.lastPreparedScan = None
      val got = prepared(corpus, qs, k = 3)
      assert(Knn.lastPreparedScan.exists(_._1 == "full"))
      assert(got == oneShot(qs, k = 3))
    } finally corpus.release()
  }

  test("ocean batch (no bucket matches) escalates through the empty pruned scan") {
    import spark.implicits._
    val corpus = Knn.prepareCorpus(spark, points, res = 7)
    try {
      // Mid-Pacific: the round-0 disk buckets hold no corpus points, so
      // the pruned scan is empty and the ladder must escalate to settle.
      val qs = Seq((9002L, -43.2, -140.5)).toDF("qid", "lat", "lng")
      val got = prepared(corpus, qs, k = 3)
      assert(got == oneShot(qs, k = 3))
      assert(got.size == 3)
    } finally corpus.release()
  }

  test("empty corpus prepares without a store and yields no rows") {
    import spark.implicits._
    val empty = points.filter(lit(false))
    val corpus = Knn.prepareCorpus(spark, empty, res = 7)
    try {
      assert(corpus.store.isEmpty)
      val qs = Seq((1L, 48.85, 2.35)).toDF("qid", "lat", "lng")
      assert(prepared(corpus, qs, k = 2).isEmpty)
    } finally corpus.release()
  }

  test("re-preparing over a caller-provided root resumes instead of rewriting") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-knn-resume").toString
    try {
      val c1 = Knn.prepareCorpus(spark, points, res = 7, root = root)
      val snap1 = Icelite.currentSnapshot(root).get
      c1.release() // root is caller-owned: the table must survive
      assert(Icelite.currentSnapshot(root).isDefined)
      val c2 = Knn.prepareCorpus(spark, points, res = 7, root = root)
      try {
        // Resume skipped every bucket: same snapshot content, no new files.
        val snap2 = Icelite.currentSnapshot(root).get
        assert(snap2.entries.map(e => e.value -> e.files).toMap ==
          snap1.entries.map(e => e.value -> e.files).toMap)
        import spark.implicits._
        val qs = Seq((1L, 48.8566, 2.3522)).toDF("qid", "lat", "lng")
        assert(prepared(c2, qs, k = 3) == oneShot(qs, k = 3))
      } finally c2.release()
    } finally Icelite.drop(root)
  }
}
