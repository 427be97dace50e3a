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
  *    service shape: the per-level cell columns are computed and cached
  *    ONCE, then every query batch joins against the hot corpus. (Round 3
  *    accidentally measured this shape through a cache leak — per-call
  *    caches were never released, so identical-plan reps reused them;
  *    the explicit API replaces the leak.) Caller releases with
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

  /** A corpus indexed once for repeated [[knnJoinPrepared]] batches.
    * `release()` drops the cache. Only for corpora that fit the cluster's
    * cache tier — one-shot callers over an unpinnable corpus use
    * [[knnJoin]]. */
  final case class PreparedCorpus private[engine] (
      ptsC: DataFrame, levels: List[Int], res: Int) {
    def release(): Unit = ptsC.unpersist(blocking = false)
  }

  /** Index `points` (columns: id, lat, lng) for repeated query batches:
    * computes the ladder cell columns, caches, and materializes them. */
  def prepareCorpus(spark: SparkSession, points: DataFrame, res: Int,
                    maxRounds: Int = 4): PreparedCorpus = {
    H3Functions.register(spark)
    val levels = ladder(res, maxRounds)
    val ptsC = corpusFrame(points, levels).cache()
    ptsC.count()
    PreparedCorpus(ptsC, levels, res)
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
      levels, queries, k, initialRing, broadcastMaxDisks)
  }

  /** kNN join of one query batch against a [[prepareCorpus]] result. */
  def knnJoinPrepared(spark: SparkSession, corpus: PreparedCorpus,
                      queries: DataFrame, k: Int, initialRing: Int = 2,
                      broadcastMaxDisks: Long = 2L * 1000 * 1000): DataFrame =
    run(spark, corpus.ptsC, corpusOwned = false,
      corpus.levels, queries, k, initialRing, broadcastMaxDisks)

  private def run(spark: SparkSession, corpus: DataFrame, corpusOwned: Boolean,
                  levels: List[Int], queries: DataFrame, k: Int,
                  initialRing: Int, broadcastMaxDisks: Long): DataFrame = {
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
          if (diskRows <= broadcastMaxDisks)
            ptsC.join(broadcast(disks), col("__cell") === col(s"__pcell$level"))
          else
            ptsC.join(disks, col("__cell") === col(s"__pcell$level"))
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
