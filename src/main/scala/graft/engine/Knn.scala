package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.H3Functions

/** kNN join via H3 gridDisk expansion with resolution-coarsening
  * escalation.
  *
  * Round 0 buckets both sides at `res` and joins each query's k-ring disk
  * against the points (query disks are broadcast — points never shuffle).
  * A query's result is provably complete when it has K candidates and its
  * K-th distance is below the minimum possible distance to anything
  * outside the explored disk. Unsettled queries escalate to a coarser
  * resolution (res-4, then 0), whose ring-2 disk covers hemispheric
  * distances, so even isolated mid-ocean queries resolve without a
  * cross join; a brute-force pass remains as a final guard for corpora
  * with fewer than K points in half the globe.
  *
  * Two call shapes:
  *  - [[knnJoin]] — one-shot: the corpus is scanned as needed and cached
  *    only if the ladder escalates; every cache taken is released before
  *    returning. Right for single batches over a corpus too large to pin
  *    (at 10^12 points the projected corpus is ~50 TB).
  *  - [[prepareCorpus]] + [[knnJoinPrepared]] — the repeated-query
  *    service shape: the per-level cell columns are computed ONCE and
  *    written to a bucketed Icelite table; each query batch prunes its
  *    round-0 scan to the buckets its disks intersect (file-precise
  *    manifest pruning, stats-driven — see [[CorpusStore]]), falling
  *    back to a cached full scan only for batches that genuinely touch
  *    most of the corpus. (Round 3 accidentally measured this shape
  *    through a cache leak; round 4's explicit API scanned the full
  *    cached corpus every batch — at 10^12 points a ~50 TB scan per
  *    batch. The bucketed store closes that.) Caller releases with
  *    [[PreparedCorpus.release]].
  */
object Knn {

  /** Conservative lower bound (meters) on the distance from ANY point of
    * the query cell (worst case: a boundary vertex) to any point outside
    * disk(ring) at `res`, for ring >= 2.
    *
    * Derivation: a segment leaving the origin cell and exiting disk(ring)
    * crosses each of rings 1..ring, so its length is at least ring x the
    * minimum cell width. The 0.75 factor is calibrated against an
    * exhaustive boundary-vertex-to-boundary-vertex sweep over ALL pentagon
    * neighborhoods (the maximal grid distortion) at res 0..11 plus global
    * random sampling, whose observed worst ratio is 0.925 x ring x avgEdge
    * (KnnBoundSpec re-runs a subset); ring < 2 is rejected because the
    * single-ring margin is not covered by the calibration. */
  def safeRadiusM(res: Int, ring: Int): Double = {
    require(ring >= 2, s"safeRadiusM requires ring >= 2, got $ring")
    // Res 0 admits NO positive bound: with only 122 cells the ring-2 shell
    // wraps around and can touch the origin cell (observed d = 0), so
    // settlement is rejected there — the ladder floors at res 1 and the
    // brute-force guard covers whatever cannot settle.
    require(res >= 1, s"safeRadiusM requires res >= 1, got $res")
    val edgeM = graft.h3.Tables.EdgeLengthRads(res) * graft.h3.H3.EarthRadiusKm * 1000.0
    ring.toDouble * edgeM * 0.75
  }

  /** Escalation ladder: native res, res-4, res 1 (near-hemispheric reach;
    * res 0 cannot soundly settle — see safeRadiusM). */
  private def ladder(res: Int, maxRounds: Int): List[Int] = {
    require(res >= 1, s"knnJoin requires res >= 1, got $res")
    require(maxRounds >= 1, s"knnJoin requires maxRounds >= 1, got $maxRounds")
    (List(res) ++ List(math.max(res - 4, 1), 1)).distinct.take(maxRounds)
  }

  /** Corpus projected to (id, plat, plng, one bit-parent cell column per
    * ladder level) — all levels derived from the finest by cheap bit
    * truncation. */
  private def corpusFrame(points: DataFrame, levels: List[Int]): DataFrame = {
    var pts = points
      .withColumn(s"__pcell${levels.head}",
        expr(s"h3_latlng_to_cell(lat, lng, ${levels.head})"))
    for (l <- levels.tail)
      pts = pts.withColumn(s"__pcell$l",
        expr(s"h3_cell_to_parent(__pcell${levels.head}, $l)"))
    pts.select((Seq(col("id"), col("lat").as("plat"), col("lng").as("plng")) ++
      levels.map(l => col(s"__pcell$l"))): _*)
  }

  /** Re-derives the escalation-level parent columns from the stored
    * finest cell (3 bit ops per row at read) — the bucketed table only
    * persists the finest cell, which cuts the one-time prepare write
    * (and its stats job) by two long columns. */
  private def withParents(df: DataFrame, levels: List[Int]): DataFrame = {
    var out = df
    for (l <- levels.tail)
      out = out.withColumn(s"__pcell$l",
        expr(s"h3_cell_to_parent(__pcell${levels.head}, $l)"))
    out
  }

  /** The bucketed storage behind a [[PreparedCorpus]]: an Icelite table
    * partitioned by the res-`bucketRes` bit-parent of the corpus cell,
    * with per-bucket row counts from the manifest. Query batches prune
    * their round-0 scan to exactly the buckets their disks intersect
    * (file-precise manifest pruning) whenever the selected row mass is
    * under `pruneMaxRowFraction` of the table; above it the full scan
    * (cache-backed) is the cheaper plan and is kept. At 10^12 points any
    * real batch touches a tiny row fraction, so the service shape reads
    * a few buckets' files instead of a ~50 TB corpus scan per batch. */
  final case class CorpusStore private[engine] (
      root: String, bucketRes: Int, ownsRoot: Boolean,
      rowsByBucket: Map[String, Long], filesByBucket: Map[String, Int],
      totalRows: Long, pruneMaxRowFraction: Double)

  /** A corpus indexed once for repeated [[knnJoinPrepared]] batches:
    * written to a bucketed Icelite table (the prune-able scan source)
    * plus a lazily-cached full frame for escalation rounds and batches
    * too dispersed to prune. `release()` drops the cache and, when the
    * store root was self-allocated, the table. */
  final case class PreparedCorpus private[engine] (
      ptsC: DataFrame, levels: List[Int], res: Int,
      store: Option[CorpusStore]) {
    def release(): Unit = {
      ptsC.unpersist(blocking = false)
      store.foreach(s => if (s.ownsRoot) Icelite.drop(s.root))
    }
  }

  /** Test/diagnostic probe: how the last prepared round-0 corpus scan was
    * planned — ("pruned", nFiles) for a manifest-pruned file scan,
    * ("full", -1) for the full-corpus scan. */
  private[graft] var lastPreparedScan: Option[(String, Int)] = None

  /** Index `points` (columns: id, lat, lng) for repeated query batches:
    * computes the ladder cell columns and writes them to a bucketed
    * Icelite table (partitioned by the res-`bucketRes` cell prefix,
    * rows sorted by the finest cell inside each bucket so parquet
    * row-group stats stay tight). Each [[knnJoinPrepared]] batch then
    * prunes its scan to the buckets its disks intersect instead of
    * scanning the whole corpus — the difference between a few file reads
    * and a full-corpus pass per batch at production scale.
    *
    * @param root      storage root for the bucketed table; null (default)
    *                  allocates a temp dir owned (and dropped) by
    *                  `release()`. A caller-provided root is resumable:
    *                  re-preparing over it skips buckets already written.
    * @param bucketRes bucket (directory) granularity; default res-7 —
    *                  coarse on purpose: at most 842 directories
    *                  globally keeps the one-time table write fast, and
    *                  the FINE pruning happens below the directory
    *                  level anyway (rows are sorted by the finest cell
    *                  inside 8 MB parquet row groups, and each batch
    *                  pushes its disk-cell range as a filter, so the
    *                  scan skips row groups outside the batch's
    *                  locality even inside a kept bucket). */
  def prepareCorpus(spark: SparkSession, points: DataFrame, res: Int,
                    maxRounds: Int = 4, root: String = null,
                    bucketRes: Int = -1,
                    pruneMaxRowFraction: Double = 0.5): PreparedCorpus = {
    H3Functions.register(spark)
    val levels = ladder(res, maxRounds)
    val bRes = if (bucketRes >= 0) bucketRes else math.max(1, res - 7)
    require(bRes <= levels.head, s"bucketRes=$bRes above corpus res ${levels.head}")
    val owns = root == null
    val tableRoot =
      if (owns) java.nio.file.Files.createTempDirectory("graft-knn-corpus").toString
      else root
    // Only the finest cell column is persisted (escalation parents are
    // re-derived by bit ops at read via withParents) — two fewer long
    // columns through the staging shuffle, the parquet encode and the
    // stats job of the one-time build.
    val frame = points
      .withColumn(s"__pcell${levels.head}",
        expr(s"h3_latlng_to_cell(lat, lng, ${levels.head})"))
      // Null cells (invalid coordinates) can never match a disk and would
      // poison the partition key; at the table boundary they are dropped.
      .filter(col(s"__pcell${levels.head}").isNotNull)
      .select(col("id"), col("lat").as("plat"), col("lng").as("plng"),
        col(s"__pcell${levels.head}"))
      .withColumn("__bucket",
        expr(s"h3_cell_to_parent(__pcell${levels.head}, $bRes)"))
    Icelite.writeResumable(spark, frame, tableRoot, "__bucket",
      sortCols = Seq(s"__pcell${levels.head}"),
      parquetBlockBytes = 8L * 1024 * 1024)
    Icelite.currentSnapshot(tableRoot) match {
      case Some(snap) =>
        val rows = snap.entries.map(e => e.value -> e.rows).toMap
        val files = snap.entries.map(e => e.value -> e.files.length).toMap
        // Lazy cache: materialized only if a batch actually needs the
        // full scan (dispersed batch or escalation round).
        val ptsC = withParents(Icelite.read(spark, tableRoot), levels).cache()
        PreparedCorpus(ptsC, levels, res,
          Some(CorpusStore(tableRoot, bRes, owns, rows, files,
            rows.valuesIterator.sum, pruneMaxRowFraction)))
      case None =>
        // Empty corpus: nothing was staged, so no snapshot exists — fall
        // back to an (empty) in-memory frame with no store.
        if (owns) Icelite.drop(tableRoot)
        PreparedCorpus(withParents(frame.drop("__bucket"), levels).cache(),
          levels, res, None)
    }
  }

  /** One-shot kNN join (see object doc for the call-shape trade-off).
    *
    * @param points  columns: id, lat, lng (degrees)
    * @param queries columns: qid, lat, lng (degrees)
    * @param broadcastMaxDisks max exploded disk rows (queries x disk size)
    *        broadcast per round; above it the disk join falls back to a
    *        shuffle join so huge query sets cannot blow the driver.
    * @return columns: qid, id, dist_m, rank (rank 1..k)
    */
  def knnJoin(spark: SparkSession, points: DataFrame, queries: DataFrame,
              k: Int, res: Int, initialRing: Int = 2,
              maxRounds: Int = 4,
              broadcastMaxDisks: Long = 2L * 1000 * 1000): DataFrame = {
    H3Functions.register(spark)
    val levels = ladder(res, maxRounds)
    run(spark, corpusFrame(points, levels), corpusOwned = true,
      levels, queries, k, initialRing, broadcastMaxDisks, store = None)
  }

  /** kNN join of one query batch against a [[prepareCorpus]] result.
    * Round-0 scan planning is stats-driven: the batch's disk buckets are
    * derived from the (tiny, cached) query frame, their row mass summed
    * from the manifest, and the scan reads only those buckets' files
    * when the mass is under the store's prune fraction — the full
    * (cached) scan is kept only for batches genuinely touching most of
    * the corpus. */
  def knnJoinPrepared(spark: SparkSession, corpus: PreparedCorpus,
                      queries: DataFrame, k: Int, initialRing: Int = 2,
                      broadcastMaxDisks: Long = 2L * 1000 * 1000): DataFrame =
    run(spark, corpus.ptsC, corpusOwned = false,
      corpus.levels, queries, k, initialRing, broadcastMaxDisks, corpus.store)

  private def run(spark: SparkSession, corpus: DataFrame, corpusOwned: Boolean,
                  levels: List[Int], queries: DataFrame, k: Int,
                  initialRing: Int, broadcastMaxDisks: Long,
                  store: Option[CorpusStore]): DataFrame = {
    // Rings below 2 are rejected: the settlement bound is only calibrated
    // for ring >= 2.
    val rings = levels.zipWithIndex.map { case (_, i) =>
      if (i == 0) math.max(initialRing, 2) else 2
    }
    // When this call owns the corpus, it is NOT cached upfront: if round 0
    // settles every query (the common case), caching would materialize the
    // full projected corpus for nothing. The cache is installed lazily the
    // first time a round leaves unsettled queries, so escalation rounds
    // still reuse one materialization.
    var ptsC = corpus
    var ptsCached = false

    // Every cache taken below is recorded and released before returning —
    // long escalation ladders must not leak cached partitions for the
    // session lifetime (the result is materialized first, see the tail).
    val cachedFrames = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var remaining = queries
      .withColumn("__qcell", expr(s"h3_latlng_to_cell(lat, lng, ${levels.head})"))
      .select(col("qid"), col("lat").as("qlat"), col("lng").as("qlng"), col("__qcell"))
      .cache()
    cachedFrames += remaining

    // Per-query top-k via the typed aggregator: partial top-k runs
    // map-side, so each round's shuffle carries at most k rows per query
    // per partition instead of every candidate (a Window would shuffle the
    // full candidate set). Score = -distance so "largest" = nearest, with
    // ties broken by smaller id exactly like ORDER BY dist, id.
    def rank(cand: DataFrame): DataFrame = {
      val scored = cand
        .withColumn("dist_m", expr("h3_great_circle_distance_m(qlat, qlng, plat, plng)"))
        .withColumn("negd", -col("dist_m"))
      graft.ops.TopK.topKPerGroup(spark, scored, "qid", "negd", "id", k)
        .select(col("qid"), col("id"), (-col("negd")).as("dist_m"), col("rank"))
    }

    var result: DataFrame = null
    var done = false
    var round = 0
    val totalRounds = levels.length + 1 // + brute guard
    var remainingCount = queries.count()

    while (!done) {
      val bruteRound = round == totalRounds - 1
      val cand =
        if (bruteRound) remaining.crossJoin(ptsC)
        else {
          val level = levels(round)
          val ring = rings(round)
          val disks = remaining
            .select(col("qid"), col("qlat"), col("qlng"),
              expr(s"h3_grid_disk(h3_cell_to_parent(__qcell, $level), $ring)")
                .as("__cell"))
          // Broadcast only while the exploded disk set is provably small;
          // otherwise shuffle both sides on the disk cell (query sets in
          // the millions would blow the driver through the broadcast).
          val diskRows = remainingCount * graft.h3.H3.maxGridDiskSize(ring)
          // Stats-driven scan planning over a bucketed store: derive the
          // batch's bucket set from the (cached, tiny) remaining-query
          // frame, sum its row mass from the manifest, and scan only the
          // matching buckets' files when the mass is a small fraction of
          // the corpus (at 10^12 points every real batch is). Disks at
          // `level` truncate exactly to the store's bucket (pure bit
          // parentage — no geometric protrusion), so the prune loses no
          // candidate. A batch touching most of the corpus (or an
          // escalation below bucketRes) keeps the full cached scan.
          val roundCorpus = store match {
            case Some(st) if level >= st.bucketRes &&
                diskRows <= broadcastMaxDisks =>
              // One tiny job over the (cached) remaining queries yields
              // the bucket set AND the disk-cell range of the batch.
              val bRows = remaining
                .select(expr(
                  s"h3_grid_disk(h3_cell_to_parent(__qcell, $level), $ring)")
                  .as("__c"))
                .selectExpr(
                  s"cast(h3_cell_to_parent(__c, ${st.bucketRes}) as string) AS b",
                  "min(__c) OVER () AS lo", "max(__c) OVER () AS hi")
                .distinct().collect()
              val bSet = bRows.map(_.getString(0)).toSet
              val mass = bSet.iterator.map(st.rowsByBucket.getOrElse(_, 0L)).sum
              if (mass <= st.pruneMaxRowFraction * st.totalRows && bRows.nonEmpty) {
                // Two-level scan pruning: manifest file pruning to the
                // disk buckets, then the batch's [min,max] disk-cell
                // range pushed into the parquet scan — rows are sorted
                // by the finest cell in 8 MB row groups, so a localized
                // batch skips most of a kept bucket's bytes too. Cells
                // share one resolution, so raw-long order is total and
                // the BETWEEN is a semantic no-op over the equi-join.
                val (lo, hi) = (bRows.head.getLong(1), bRows.head.getLong(2))
                // Stored schema carries only the finest cell; re-derive
                // the ladder parents (bit ops) AFTER the range filter so
                // the finest-cell BETWEEN still pushes into the parquet
                // scan. For level == levels.head the filter column IS the
                // stored one (the common round-0 case); for escalation
                // levels the equivalent stored-column range is the same
                // [lo, hi] mapped through bit parentage — conservatively
                // filter on the derived column post-read there.
                val raw = Icelite.readWhereOpt(spark, st.root, bSet.contains)
                val pruned = raw
                  .map { df =>
                    val dressed = withParents(df, levels)
                    dressed.filter(col(s"__pcell$level").between(lo, hi))
                  }
                  .getOrElse(ptsC.limit(0))
                lastPreparedScan = Some(("pruned",
                  bSet.iterator.map(st.filesByBucket.getOrElse(_, 0)).sum))
                pruned
              } else {
                lastPreparedScan = Some(("full", -1))
                ptsC
              }
            case _ =>
              if (store.isDefined) lastPreparedScan = Some(("full", -1))
              ptsC
          }
          if (diskRows <= broadcastMaxDisks)
            roundCorpus.join(broadcast(disks), col("__cell") === col(s"__pcell$level"))
          else
            roundCorpus.join(disks, col("__cell") === col(s"__pcell$level"))
        }

      val ranked = rank(cand).cache()
      cachedFrames += ranked

      if (bruteRound) {
        result = if (result == null) ranked else result.unionByName(ranked)
        done = true
      } else {
        val safe = safeRadiusM(levels(round), rings(round))
        // okQids is tiny (<= one row per remaining query); caching it and
        // counting it replaces the old second materialization
        // (remaining.count() after a left_anti join) — one small job per
        // round instead of two.
        val okQids = ranked.groupBy("qid")
          .agg(count(lit(1)).as("n"), max("dist_m").as("kth"))
          .filter(col("n") === k && col("kth") <= lit(safe))
          .select("qid")
          .cache()
        cachedFrames += okQids
        val nOk = okQids.count()
        val settled = ranked.join(okQids, "qid")
        result = if (result == null) settled else result.unionByName(settled)
        if (nOk == remainingCount) done = true
        else {
          remainingCount -= nOk
          remaining = remaining.join(okQids, Seq("qid"), "left_anti")
          // Entering an escalation round: every later round rescans the
          // full point set, so NOW the one-time cache pays for itself
          // (only when this call owns the corpus — a prepared corpus is
          // already hot).
          if (corpusOwned && !ptsCached) { ptsC = ptsC.cache(); ptsCached = true }
        }
      }
      round += 1
    }
    // The per-round caches stay hot for the whole call (an eager per-round
    // checkpoint instead costs ~3x wall on the common settle-in-round-0
    // path — measured), but must not outlive it: the FINAL result — tiny,
    // <= k rows per query — is cached and materialized from the hot
    // caches, then every per-round cache is released (unpersisting a
    // parent does not invalidate a child's own cache). The caller owns
    // the returned frame's cache.
    val out = result.cache()
    out.count()
    cachedFrames.foreach(_.unpersist(blocking = false))
    if (ptsCached) ptsC.unpersist(blocking = false)
    out
  }
}
