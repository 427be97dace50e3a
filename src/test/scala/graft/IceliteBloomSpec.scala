package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Icelite, IceliteBloom}

/** Per-bucket bloom manifest stats: kernel soundness (no false
  * negatives, bounded false positives, deterministic encoding),
  * point-lookup pruning, append composition (OR with equal sizes, drop
  * otherwise), delete/compaction superset validity, and the empty-frame
  * all-pruned contract. */
class IceliteBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ------------------------------------------------------------- kernel

  test("bloom kernel: no false negatives, bounded false positives") {
    val nBits = IceliteBloom.DefaultBits
    val words = new Array[Long](nBits / 64)
    val rnd = new scala.util.Random(7)
    val present = Array.fill(300)(rnd.nextLong())
    present.foreach { v =>
      val (h1, h2) = IceliteBloom.hashLong(v)
      IceliteBloom.add(words, nBits, h1, h2)
    }
    // Every inserted element tests positive — the soundness invariant
    // pruning correctness rests on.
    assert(present.forall { v =>
      val (h1, h2) = IceliteBloom.hashLong(v)
      IceliteBloom.mightContain(words, nBits, h1, h2)
    })
    // 300 elements in 8192 bits with 4 probes: theoretical FP ~3e-4;
    // assert a generous 2% over 10k absent probes.
    val presentSet = present.toSet
    val fp = (0 until 10000).count { i =>
      val v = rnd.nextLong()
      if (presentSet(v)) false
      else {
        val (h1, h2) = IceliteBloom.hashLong(v)
        IceliteBloom.mightContain(words, nBits, h1, h2)
      }
    }
    assert(fp < 200, s"false-positive count $fp")
    // encode/decode round-trip is exact
    assert(IceliteBloom.decode(IceliteBloom.encode(words)).sameElements(words))
  }

  test("bloom kernel: string hashing and merge") {
    val nBits = 1024
    val a = new Array[Long](nBits / 64)
    val b = new Array[Long](nBits / 64)
    def put(w: Array[Long], s: String): Unit = {
      val (h1, h2) = IceliteBloom.hashBytes(s.getBytes("UTF-8"))
      IceliteBloom.add(w, nBits, h1, h2)
    }
    put(a, "https://a.example/x"); put(b, "https://b.example/y")
    val merged = IceliteBloom.merge(
      IceliteBloom.encode(a), IceliteBloom.encode(b)).get
    assert(IceliteBloom.mightContainString(merged, "https://a.example/x"))
    assert(IceliteBloom.mightContainString(merged, "https://b.example/y"))
    assert(!IceliteBloom.mightContainString(merged, "https://c.example/z"))
    // size mismatch refuses to merge (pruning disabled — safe)
    assert(IceliteBloom.merge(IceliteBloom.encode(a),
      IceliteBloom.encode(new Array[Long](32))).isEmpty)
  }

  // ------------------------------------------------- write + point read

  test("point lookup prunes to a handful of buckets and matches full scan") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-bloom").toString
    // 64 buckets x 250 rows; doc_id unsorted across buckets, so the
    // per-bucket [min,max] ranges all span ~the whole domain and range
    // stats alone cannot prune a point predicate.
    val df = (0 until 16000).map { i =>
      val id = (i.toLong * 2654435761L) % 1000003L
      (i % 64, id, s"https://h-${id % 97}.example/p$id")
    }.toDF("bucket", "doc_id", "url")
    Icelite.writeResumable(spark, df, root, "bucket",
      bloomCols = Seq("doc_id", "url"))

    val all = Icelite.read(spark, root)
      .select("doc_id").collect().map(_.getLong(0))
    val probe = all(12345 % all.length)

    // pruning: the present value's bucket set is small and correct
    val buckets = Icelite.bucketsForPointLong(root, "doc_id", probe)
    assert(buckets.nonEmpty && buckets.size <= 8,
      s"expected <=8 of 64 buckets, got ${buckets.size}")
    val got = Icelite.readWherePointLong(spark, root, "doc_id", probe)
      .filter(col("doc_id") === probe)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("doc_id")))
      .sorted.toSeq
    val expected = Icelite.read(spark, root)
      .filter(col("doc_id") === probe)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("doc_id")))
      .sorted.toSeq
    assert(got == expected && got.nonEmpty)

    // absent value: nearly everything pruned, empty frame returned
    val absent = 1000003L + 17L // outside the residue domain
    assert(Icelite.bucketsForPointLong(root, "doc_id", absent).size <= 8)
    assert(Icelite.readWherePointLong(spark, root, "doc_id", absent)
      .filter(col("doc_id") === absent).isEmpty)

    // string point lookup prunes too and agrees with the full scan
    val urlProbe = s"https://h-${probe % 97}.example/p$probe"
    val gotUrl = Icelite.readWherePointString(spark, root, "url", urlProbe)
      .filter(col("url") === urlProbe).count()
    val expUrl = Icelite.read(spark, root)
      .filter(col("url") === urlProbe).count()
    assert(gotUrl == expUrl && gotUrl > 0)
    Icelite.drop(root)
  }

  test("append composes blooms; un-bloomed append drops them (never lies)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-bloom-ap").toString
    val mk = (lo: Int, hi: Int) => (lo until hi)
      .map(i => (i % 8, i.toLong * 7919L % 100003L))
      .toDF("bucket", "doc_id")
    Icelite.writeResumable(spark, mk(0, 2000), root, "bucket",
      bloomCols = Seq("doc_id"))
    Icelite.appendResumable(spark, mk(2000, 4000), root, "bucket",
      runId = "ap1", bloomCols = Seq("doc_id"))
    // a value only in the appended batch must still be found
    val v = 3999L * 7919L % 100003L
    val got = Icelite.readWherePointLong(spark, root, "doc_id", v)
      .filter(col("doc_id") === v).count()
    assert(got == Icelite.read(spark, root).filter(col("doc_id") === v).count()
      && got > 0)
    assert(Icelite.currentSnapshot(root).get.entries
      .forall(_.blooms.contains("doc_id")))

    // an append WITHOUT bloomCols must DROP the touched buckets' blooms
    Icelite.appendResumable(spark, mk(4000, 4100), root, "bucket",
      runId = "ap2")
    val entries = Icelite.currentSnapshot(root).get.entries
    assert(entries.filter(_.lineage == "ap2").forall(_.blooms.isEmpty))
    // and the un-bloomed value is still found (no bucket falsely pruned)
    val v2 = 4099L * 7919L % 100003L
    assert(Icelite.readWherePointLong(spark, root, "doc_id", v2)
      .filter(col("doc_id") === v2).count() > 0)
    Icelite.drop(root)
  }

  test("blooms survive delete + compaction as a valid superset") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-bloom-dc").toString
    val df = (0 until 4000).map(i => (i % 8, i.toLong))
      .toDF("bucket", "doc_id")
    Icelite.writeResumable(spark, df, root, "bucket",
      bloomCols = Seq("doc_id"))
    // delete the multiples of 10, then compact them away physically
    val dels = (0 until 4000 by 10).map(i => (i % 8, i.toLong))
      .toDF("bucket", "doc_id")
    Icelite.deleteRowsResumable(spark, dels, root, "bucket",
      Seq("doc_id"), runId = "del1")
    Icelite.compactBuckets(spark, root)
    val entries = Icelite.currentSnapshot(root).get.entries
    assert(entries.forall(_.blooms.contains("doc_id")))
    // surviving rows still found via the (superset) bloom
    val got = Icelite.readWherePointLong(spark, root, "doc_id", 1234L)
      .filter(col("doc_id") === 1234L).count()
    assert(got == 1)
    // deleted rows are gone even though the bloom still says "maybe"
    assert(Icelite.readWherePointLong(spark, root, "doc_id", 1230L)
      .filter(col("doc_id") === 1230L).isEmpty)
    Icelite.drop(root)
  }

  test("bloomBits sizing: saturated filter stays correct, sized one prunes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-bloom-sz").toString
    // 500 rows/bucket vs a deliberately tiny 128-bit filter: saturated.
    val df = (0 until 4000).map(i => (i % 8, (i.toLong * 7919L) % 99991L))
      .toDF("bucket", "doc_id")
    Icelite.writeResumable(spark, df, root, "bucket",
      bloomCols = Seq("doc_id"), bloomBits = 128)
    // Under saturation both paths stay exact: a PRESENT value (row
    // i=1234's doc_id) is found, and an in-range ABSENT value (50000:
    // its unique preimage mod 99991 is 70173 >= 4000) returns empty.
    val v = 1234L * 7919L % 99991L
    assert(Icelite.readWherePointLong(spark, root, "doc_id", v)
      .filter(col("doc_id") === v).count() ==
      Icelite.read(spark, root).filter(col("doc_id") === v).count())
    assert(Icelite.readWherePointLong(spark, root, "doc_id", 50000L)
      .filter(col("doc_id") === 50000L).isEmpty)
    Icelite.drop(root)

    // same data with a ~10-bits/row filter: absent in-range values prune
    val root2 = java.nio.file.Files.createTempDirectory("icelite-bloom-sz2").toString
    Icelite.writeResumable(spark, df, root2, "bucket",
      bloomCols = Seq("doc_id"), bloomBits = 8192)
    // 50000 not in the residue set but inside [min,max]
    val opened = Icelite.bucketsForPointLong(root2, "doc_id", 50000L)
    assert(opened.size <= 2, s"expected <=2 of 8 buckets, got ${opened.size}")
    Icelite.drop(root2)
  }

  test("manifest round-trips blooms byte-exactly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icelite-bloom-rt").toString
    val df = (0 until 100).map(i => (i % 2, i.toLong)).toDF("bucket", "doc_id")
    Icelite.writeResumable(spark, df, root, "bucket",
      bloomCols = Seq("doc_id"))
    val a = Icelite.currentSnapshot(root).get.entries
      .map(e => e.value -> e.blooms).toMap
    // force a new snapshot (append to one bucket), re-parse everything
    Icelite.appendResumable(spark, Seq((0, 1000L)).toDF("bucket", "doc_id"),
      root, "bucket", runId = "rt", bloomCols = Seq("doc_id"))
    val b = Icelite.currentSnapshot(root).get.entries
      .map(e => e.value -> e.blooms).toMap
    assert(b("1") == a("1")) // untouched bucket byte-identical
    assert(b("0") != a("0")) // touched bucket composed
    Icelite.drop(root)
  }
}
