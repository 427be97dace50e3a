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
  * Layout (Iceberg-style manifest list + append-only manifest segments):
  * {{{
  *   <root>/data/<part>=<value>/part-*.parquet
  *   <root>/manifest/seg-<n>.json           (immutable entry batch)
  *   <root>/manifest/snapshot-<n>.json      (lists its segment files)
  *   <root>/manifest/CURRENT                (points at latest snapshot)
  * }}}
  *
  * Commits append a NEW segment and write a snapshot that lists all
  * segment names — entry data is never rewritten, so total manifest I/O
  * is O(buckets), not O(buckets^2) as an inline-entries snapshot would be
  * at ~41k buckets.
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

  /** Snapshot header only: id + segment list (entries not loaded). */
  private final case class SnapshotMeta(id: Long, partitionCol: String,
                                        segments: Seq[String])

  private def manifestDir(root: String): Path = Paths.get(root, "manifest")
  private def dataDir(root: String): Path = Paths.get(root, "data")

  /** Partition values appear in directory names escaped exactly the way
    * Spark's partitionBy escapes them (':', '%', '=', ... are
    * percent-encoded), so staged-dir resolution and read-back work for
    * arbitrary string values, not just alphanumerics. */
  private def escapePart(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)

  private def readFile(p: Path): String =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)

  /** Files.list holds an fd until the STREAM is closed — iterating without
    * closing leaks one fd per call, which at 10^4+ buckets exhausts the
    * process limit mid-promote (observed at sf0.1). */
  private def listDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }

  private def currentMeta(root: String): Option[SnapshotMeta] = {
    val cur = manifestDir(root).resolve("CURRENT")
    if (!Files.exists(cur)) return None
    val p = manifestDir(root).resolve(readFile(cur).trim)
    if (!Files.exists(p)) None else Some(parseMeta(readFile(p)))
  }

  private def loadSnapshot(root: String, meta: SnapshotMeta): Snapshot =
    Snapshot(meta.id, meta.partitionCol,
      meta.segments.flatMap(seg =>
        parseEntries(readFile(manifestDir(root).resolve(seg)))))

  def currentSnapshot(root: String): Option[Snapshot] =
    currentMeta(root).map(loadSnapshot(root, _))

  /** Loads a historical snapshot by id (for incremental reads). */
  def snapshotById(root: String, id: Long): Option[Snapshot] = {
    val p = manifestDir(root).resolve(f"snapshot-$id%06d.json")
    if (!Files.exists(p)) None
    else Some(loadSnapshot(root, parseMeta(readFile(p))))
  }

  /** Completed partition values in the latest snapshot. */
  def completedPartitions(root: String): Set[String] =
    currentSnapshot(root).map(_.entries.map(_.value).toSet).getOrElse(Set.empty)

  /** Writes `df` partitioned by `partitionCol`, skipping buckets already in
    * the manifest (resume). Returns the number of buckets computed this run.
    *
    * Scale shape: ALL remaining buckets are written in ONE Spark job
    * (`partitionBy` into a staging dir) plus one stats job — the input is
    * scanned exactly twice regardless of bucket count (the previous design
    * ran one full job per bucket: 41k sequential scans at 100 TB). Each
    * staged bucket directory is then promoted into place with an atomic
    * rename and committed to the manifest incrementally, so a crash
    * mid-promote resumes at bucket granularity with no partial data.
    *
    * `partitionCol` must be a deterministic, coarse partitioning column;
    * at production scale this is the `cell_p` H3 prefix (~41k buckets).
    */
  def writeResumable(spark: SparkSession, df: DataFrame, root: String,
                     partitionCol: String,
                     failAfter: Int = Int.MaxValue,
                     lineage: String = "",
                     statsFromStaged: Boolean = true): Int = {
    Files.createDirectories(manifestDir(root))
    Files.createDirectories(dataDir(root))
    // Abandoned staging dirs from a crashed run are dead data.
    listDir(Paths.get(root))(_.filter(
        _.getFileName.toString.startsWith(".staging-")).toList)
      .foreach(deleteRecursively)

    val done = completedPartitions(root)
    // `__part` drives partitionBy so the original column stays in the data
    // files (partitionBy consumes its column) and read-back schemas match.
    val remaining0 = df.withColumn("__part", col(partitionCol).cast("string"))
    val remaining =
      if (done.isEmpty) remaining0
      else remaining0.filter(!col("__part").isInCollection(done))

    // Job 1: stage every remaining bucket at once. Clustered by the
    // partition value first: without it every task writes one file per
    // bucket it happens to see (tasks x buckets small files — at 41k
    // buckets and 10^4 tasks that is 10^8 files); clustered, file count
    // equals bucket count. AQE's shuffle coalescing keeps tiny buckets
    // from wasting tasks.
    val staging = Paths.get(root, s".staging-${System.nanoTime()}")
    remaining.repartition(col("__part"))
      .write.mode("overwrite").partitionBy("__part").parquet(staging.toString)

    // A null partition value stages as Hive's default-partition dir and
    // would break resume identity — reject before any promote (free
    // check: the dir either exists or it doesn't).
    if (Files.exists(staging.resolve("__part=__HIVE_DEFAULT_PARTITION__")))
      throw new IllegalArgumentException(
        s"icelite: partition column '$partitionCol' contains NULL values; " +
          "map nulls to an explicit sentinel before writeResumable")

    // Job 2: per-bucket row counts + content checksums, computed from the
    // STAGED files — not by re-running the input pipeline. This halves
    // the input-side work (the input may be an arbitrarily expensive
    // query) and, more importantly, the manifest then describes exactly
    // the bytes that were staged: a nondeterministic input would
    // otherwise commit checksums that do not match its own data.
    val dataCols = df.columns.filterNot(_ == partitionCol).map(c => s"`$c`")
    // Explicit schema pins __part as STRING: partition-dir type inference
    // would otherwise read numeric-looking values as longs and corrupt
    // e.g. leading-zero keys ("007" -> "7"). `statsFromStaged = false`
    // recomputes the input instead — cheaper only when the input pipeline
    // is trivial relative to re-reading many small staged files.
    val statsSrc =
      if (statsFromStaged)
        spark.read.schema(remaining0.schema).parquet(staging.toString)
      else remaining
    val stats = statsSrc
      .groupBy("__part")
      .agg(count(lit(1)).as("rows"),
        expr(s"bit_xor(xxhash64(struct(${dataCols.mkString(",")})))").as("checksum"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .sortBy(_._1)

    // Promote loop: atomic rename per bucket + batched manifest commits
    // (driver-side only — no further Spark jobs). Each commit appends one
    // immutable segment file; the batch size adapts so a run makes at most
    // ~64 commits regardless of bucket count (per-bucket at test scale).
    // A crash between a promote and its commit only re-stages the
    // uncommitted buckets of the open batch on resume (idempotent
    // overwrite on promote).
    val batchSize = math.max(1, stats.length / 64)
    val pending = mutable.ArrayBuffer.empty[PartitionEntry]
    var computed = 0
    def flush(): Unit = if (pending.nonEmpty) {
      commitSegment(root, partitionCol, pending.toSeq)
      pending.clear()
    }
    for ((v, (rows, checksum)) <- stats) {
      if (computed >= failAfter)
        // Simulated crash: pending (promoted-but-uncommitted) buckets are
        // deliberately NOT flushed — resume re-stages and re-promotes them
        // idempotently, exactly as after a real crash.
        throw new RuntimeException(s"icelite: injected failure after $failAfter buckets")
      val tBucket = System.nanoTime()
      val staged = staging.resolve(s"__part=${escapePart(v)}")
      val target = dataDir(root).resolve(s"$partitionCol=${escapePart(v)}")
      if (Files.exists(target)) deleteRecursively(target)
      Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
      val files = listDir(target)(_.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq)
      // durationMs is the per-bucket promote time (staging is one shared
      // job and is not attributable to a single bucket).
      pending += PartitionEntry(v, rows, checksum, files,
        durationMs = (System.nanoTime() - tBucket) / 1000000, lineage = lineage)
      if (pending.length >= batchSize) flush()
      computed += 1
    }
    flush()
    deleteRecursively(staging)
    computed
  }

  /** Partitions committed after snapshot `sinceId` (exclusive) — the
    * incremental-scan primitive: reading only what a downstream consumer
    * has not yet seen. */
  def readIncremental(spark: SparkSession, root: String,
                      sinceId: Long): DataFrame = {
    val old = snapshotById(root, sinceId)
      .map(_.entries.map(_.value).toSet).getOrElse(Set.empty)
    readWhere(spark, root, v => !old(v))
  }

  /** Reads the table back (all committed partitions). */
  def read(spark: SparkSession, root: String): DataFrame =
    readWhere(spark, root, _ => true)

  /** Time travel: reads the table AS OF snapshot `id` — exactly the
    * partitions that snapshot committed. Sound at bucket granularity
    * because committed buckets are immutable (writeResumable skips every
    * bucket already in the manifest, so later snapshots only ADD buckets;
    * historical data files are never rewritten). */
  def readAsOf(spark: SparkSession, root: String, id: Long): DataFrame = {
    val snap = snapshotById(root, id).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $id at $root"))
    val paths = snap.entries.map(e =>
      dataDir(root).resolve(s"${snap.partitionCol}=${escapePart(e.value)}").toString)
    if (paths.isEmpty)
      throw new IllegalArgumentException(s"snapshot $id has no partitions")
    spark.read.parquet(paths: _*)
  }

  /** Drops the table: data, manifests, any staging leftovers. */
  def drop(root: String): Unit = deleteRecursively(Paths.get(root))

  /** Manifest-driven partition pruning: only partitions whose value passes
    * the predicate are ever listed or opened (Iceberg-style scan planning
    * without touching the file system for pruned buckets). */
  def readWhere(spark: SparkSession, root: String,
                predicate: String => Boolean): DataFrame = {
    val snap = currentSnapshot(root).getOrElse(
      throw new IllegalStateException(s"no snapshot at $root"))
    val paths = snap.entries.filter(e => predicate(e.value)).map(e =>
      dataDir(root).resolve(s"${snap.partitionCol}=${escapePart(e.value)}").toString)
    if (paths.isEmpty)
      throw new IllegalArgumentException("no partitions match the predicate")
    spark.read.parquet(paths: _*)
  }

  /** Appends one immutable segment of new entries and commits a snapshot
    * listing every segment (CURRENT update is the commit point; orphans
    * from crashes between renames are overwritten on the next commit). */
  private def commitSegment(root: String, partitionCol: String,
                            newEntries: Seq[PartitionEntry]): Unit = {
    val meta = currentMeta(root)
    val id = meta.map(_.id + 1).getOrElse(0L)
    val segName = f"seg-$id%06d.json"
    atomicWrite(root, segName, s"""{"entries":[${renderEntries(newEntries)}]}""")
    val segments = meta.map(_.segments).getOrElse(Nil) :+ segName
    val snapJson = s"""{"id":$id,"partitionCol":"${esc(partitionCol)}","segments":[${
      segments.map(n => "\"" + esc(n) + "\"").mkString(",")}]}"""
    val snapName = f"snapshot-$id%06d.json"
    atomicWrite(root, snapName, snapJson)
    atomicWrite(root, "CURRENT", snapName)
  }

  private def atomicWrite(root: String, name: String, content: String): Unit = {
    val tmp = manifestDir(root).resolve(s".$name.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestDir(root).resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      listDir(p)(_.toList).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // -- tiny JSON render/parse (schema is fixed and self-authored) --

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def renderEntries(entries: Seq[PartitionEntry]): String =
    entries.map { e =>
      s"""{"value":"${esc(e.value)}","rows":${e.rows},"checksum":${e.checksum},"durationMs":${e.durationMs},"lineage":"${esc(e.lineage)}","files":[${e.files.map(f => "\"" + esc(f) + "\"").mkString(",")}]}"""
    }.mkString(",")

  private def parseEntries(json: String): Seq[PartitionEntry] = {
    val v = graft.h3.Geo.Json.parse(json).asInstanceOf[Map[String, Any]]
    v("entries").asInstanceOf[List[Any]].map { e =>
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
  }

  private def parseMeta(json: String): SnapshotMeta = {
    val v = graft.h3.Geo.Json.parse(json).asInstanceOf[Map[String, Any]]
    SnapshotMeta(
      v("id") match { case l: Long => l; case d: Double => d.toLong },
      v("partitionCol").toString,
      v("segments").asInstanceOf[List[Any]].map(_.toString))
  }
}
