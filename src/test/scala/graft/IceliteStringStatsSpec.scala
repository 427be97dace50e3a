package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Icelite

/** String-column manifest statistics: equality/range pruning, truncation
  * safety (lower truncates down, upper truncate-and-increments), ASCII
  * guard, and composition across appends. */
class IceliteStringStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("equality pruning opens only the buckets whose lang range matches") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-str").toString
    // Each bucket holds exactly one language.
    val langs = Seq("de", "en", "fr", "ja")
    val df = (0 until 4000).map { i =>
      (langs(i % 4), i.toLong, langs(i % 4), s"https://host-$i.example/p")
    }.toDF("bucket", "page_id", "lang", "url")
    Icelite.writeResumable(spark, df, root, "bucket")

    // Pruned read returns ONLY the matching bucket's rows — before any
    // exact filter — which proves the other buckets were never opened.
    val got = Icelite.readWhereEquals(spark, root, "lang", "de")
      .select("page_id").collect().map(_.getLong(0)).sorted
    assert(got.length == 1000 && got.forall(_ % 4 == 0))

    // A value outside every bucket's range prunes everything.
    intercept[IllegalArgumentException] {
      Icelite.readWhereEquals(spark, root, "lang", "zz")
    }
    // Range slice spanning two buckets.
    val range = Icelite.readWhereStringRange(spark, root, "lang", "en", "fr")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(range == Set("en", "fr"))
    Icelite.drop(root)
  }

  test("truncated upper bounds are incremented: no row beyond the prefix is lost") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-strtr").toString
    val p = "https://very-long-host.example/pp" // 33 chars > StrStatLen=32
    assert(p.length == 33)
    val df = Seq((0L, 1L, p + "x"), (0L, 2L, p + "y"))
      .toDF("bucket", "page_id", "url")
    Icelite.writeResumable(spark, df, root, "bucket")
    val e = Icelite.currentSnapshot(root).get.entries.head
    val (mn, mx) = e.strStats("url")
    assert(mn.length <= 32 && mx.length <= 32) // stored bounds truncated
    // A naive prefix-truncated upper bound would order BELOW the real
    // values and prune the bucket; the incremented bound must keep it.
    val got = Icelite.readWhereEquals(spark, root, "url", p + "y")
      .filter(col("url") === (p + "y")).count()
    assert(got == 1L)
    Icelite.drop(root)
  }

  test("stats compose across appends; non-ASCII buckets disable pruning safely") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-strapp").toString
    val first = Seq((0L, 1L, "aa"), (0L, 2L, "bb")).toDF("bucket", "page_id", "lang")
    Icelite.writeResumable(spark, first, root, "bucket")
    Icelite.appendResumable(spark,
      Seq((0L, 3L, "zz")).toDF("bucket", "page_id", "lang"),
      root, "bucket", runId = "app-1")
    val (mn, mx) = Icelite.currentSnapshot(root).get.entries.head.strStats("lang")
    assert(mn == "aa" && mx == "zz") // widened union bounds
    assert(Icelite.readWhereEquals(spark, root, "lang", "zz").count() == 3)

    // Non-ASCII values: no stats stored for that bucket -> always kept.
    val root2 = java.nio.file.Files.createTempDirectory("icelite-strnoa").toString
    Icelite.writeResumable(spark,
      Seq((0L, 1L, "日本語"), (0L, 2L, "en")).toDF("bucket", "page_id", "lang"),
      root2, "bucket")
    assert(!Icelite.currentSnapshot(root2).get.entries.head.strStats.contains("lang"))
    assert(Icelite.readWhereEquals(spark, root2, "lang", "en")
      .filter(col("lang") === "en").count() == 1)
    Icelite.drop(root); Icelite.drop(root2)
  }
}
