package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style table layer over Parquet ("icelite"): snapshot
  * manifests with per-partition lineage + metrics, atomic commits via
  * temp-file rename, and manifest-driven resumable writes.
  *
  * Layout:
  * {{{
  *   <root>/data/<part>=<value>/part-*.parquet
  *   <root>/manifest/snapshot-<n>.json      (atomic rename commit)
  *   <root>/manifest/CURRENT                (points at latest snapshot)
  * }}}
  *
  * A resumable job processes one bucket (partition value) at a time; each
  * completed bucket is recorded in the manifest with row counts and a
  * content checksum. Restarting skips every bucket already present —
  * the kill/restart test in IceliteSpec asserts identical output and no
  * recomputation.
  */
object Icelite {

  final case class PartitionEntry(value: String, rows: Long, checksum: Long,
                                  files: Seq[String], durationMs: Long = 0,
                                  lineage: String = "")

  final case class Snapshot(id: Long, partitionCol: String,
                            entries: Seq[PartitionEntry])

  private def manifestDir(root: String): Path = Paths.get(root, "manifest")
  private def dataDir(root: String): Path = Paths.get(root, "data")

  def currentSnapshot(root: String): Option[Snapshot] = {
    val cur = manifestDir(root).resolve("CURRENT")
    if (!Files.exists(cur)) return None
    val name = new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim
    val p = manifestDir(root).resolve(name)
    if (!Files.exists(p)) None else Some(parseSnapshot(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  /** Completed partition values in the latest snapshot. */
  def completedPartitions(root: String): Set[String] =
    currentSnapshot(root).map(_.entries.map(_.value).toSet).getOrElse(Set.empty)

  /** Writes `df` partitioned by `partitionCol`, one commit per bucket group,
    * skipping buckets already in the manifest (resume). Returns the number
    * of buckets actually computed this run.
    *
    * `bucketExpr` must be a deterministic, coarse (<= ~100 values at test
    * scale) partitioning expression; at production scale this is the
    * `cell_p` H3 prefix.
    */
  def writeResumable(spark: SparkSession, df: DataFrame, root: String,
                     partitionCol: String,
                     failAfter: Int = Int.MaxValue,
                     lineage: String = ""): Int = {
    Files.createDirectories(manifestDir(root))
    Files.createDirectories(dataDir(root))

    val done = completedPartitions(root)
    val values = df.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val todo = values.filterNot(done)

    var entries = currentSnapshot(root).map(_.entries.toVector).getOrElse(Vector.empty)
    var computed = 0
    for (v <- todo) {
      if (computed >= failAfter)
        throw new RuntimeException(s"icelite: injected failure after $failAfter buckets")
      val t0 = System.nanoTime()
      val part = df.filter(col(partitionCol).cast("string") === v)
      val target = dataDir(root).resolve(s"$partitionCol=$v")
      // Write bucket to a temp dir, then atomically move into place.
      val tmp = Paths.get(root, s".tmp-$v-${System.nanoTime()}")
      part.write.mode("overwrite").parquet(tmp.toString)
      if (Files.exists(target)) deleteRecursively(target)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)

      val stats = spark.read.parquet(target.toString)
        .agg(count(lit(1)), expr(
          "bit_xor(xxhash64(struct(" +
            df.columns.filterNot(_ == partitionCol).map(c => s"`$c`").mkString(",") + ")))"))
        .collect()(0)
      val rows = stats.getLong(0)
      val checksum = if (stats.isNullAt(1)) 0L else stats.getLong(1)
      val files = Files.list(target).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq

      entries :+= PartitionEntry(v, rows, checksum, files,
        durationMs = (System.nanoTime() - t0) / 1000000, lineage = lineage)
      commitSnapshot(root, partitionCol, entries)
      computed += 1
    }
    computed
  }

  /** Reads the table back (all committed partitions). */
  def read(spark: SparkSession, root: String): DataFrame =
    readWhere(spark, root, _ => true)

  /** Manifest-driven partition pruning: only partitions whose value passes
    * the predicate are ever listed or opened (Iceberg-style scan planning
    * without touching the file system for pruned buckets). */
  def readWhere(spark: SparkSession, root: String,
                predicate: String => Boolean): DataFrame = {
    val snap = currentSnapshot(root).getOrElse(
      throw new IllegalStateException(s"no snapshot at $root"))
    val paths = snap.entries.filter(e => predicate(e.value)).map(e =>
      dataDir(root).resolve(s"${snap.partitionCol}=${e.value}").toString)
    if (paths.isEmpty)
      throw new IllegalArgumentException("no partitions match the predicate")
    spark.read.parquet(paths: _*)
  }

  private def commitSnapshot(root: String, partitionCol: String,
                             entries: Seq[PartitionEntry]): Unit = {
    val id = currentSnapshot(root).map(_.id + 1).getOrElse(0L)
    val json = renderSnapshot(Snapshot(id, partitionCol, entries))
    val name = f"snapshot-$id%06d.json"
    val tmp = manifestDir(root).resolve(s".$name.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    // REPLACE_EXISTING: a crash between this rename and the CURRENT update
    // leaves an orphaned snapshot file with the same next-id; the orphan is
    // dead data (CURRENT is the commit point), so overwrite it on resume.
    Files.move(tmp, manifestDir(root).resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val curTmp = manifestDir(root).resolve(".CURRENT.tmp")
    Files.write(curTmp, name.getBytes(StandardCharsets.UTF_8))
    Files.move(curTmp, manifestDir(root).resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // -- tiny JSON render/parse (schema is fixed and self-authored) --

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def renderSnapshot(s: Snapshot): String = {
    val es = s.entries.map { e =>
      s"""{"value":"${esc(e.value)}","rows":${e.rows},"checksum":${e.checksum},"durationMs":${e.durationMs},"lineage":"${esc(e.lineage)}","files":[${e.files.map(f => "\"" + esc(f) + "\"").mkString(",")}]}"""
    }.mkString(",")
    s"""{"id":${s.id},"partitionCol":"${esc(s.partitionCol)}","entries":[$es]}"""
  }

  private def parseSnapshot(json: String): Snapshot = {
    val v = graft.h3.Geo.Json.parse(json).asInstanceOf[Map[String, Any]]
    val entries = v("entries").asInstanceOf[List[Any]].map { e =>
      val m = e.asInstanceOf[Map[String, Any]]
      PartitionEntry(
        m("value").toString,
        m("rows") match { case l: Long => l; case d: Double => d.toLong },
        m("checksum") match { case l: Long => l; case d: Double => d.toLong },
        m("files").asInstanceOf[List[Any]].map(_.toString),
        m.get("durationMs").map {
          case l: Long => l; case d: Double => d.toLong; case _ => 0L
        }.getOrElse(0L),
        m.get("lineage").map(_.toString).getOrElse(""))
    }
    Snapshot(
      v("id") match { case l: Long => l; case d: Double => d.toLong },
      v("partitionCol").toString, entries)
  }
}
