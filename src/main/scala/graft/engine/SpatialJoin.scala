package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import graft.h3.{Geo, H3}
import graft.spark.H3Functions

/** H3-bucketed point-in-polygon spatial join.
  *
  * Strategy: polygons are tiled into an annotated cover (fully-contained
  * cells, compacted; boundary cells at the probe resolution). The probe side
  * joins on its cell's ancestor at each cover resolution. Rows landing on a
  * fully-contained cover cell are accepted without further work; rows on
  * boundary cells pass through an exact ray-cast PIP filter.
  *
  * Scale notes: the cover is broadcast when small (the usual case — a
  * compacted country cover at res 9 is ~10^4-10^5 rows); for continent-scale
  * covers pass `broadcastCover = false` to shuffle both sides partitioned by
  * the cover cell. AQE handles residual skew; deliberate hot-cell salting is
  * applied on the probe side for the top-N hottest cells when
  * `saltHotCells > 0`.
  */
object SpatialJoin {

  /** One polygon with an id; rings in radians. */
  final case class Poly(id: Long, geo: Geo.GeoPolygon)

  /** Maximum cells we allow in one polygon's (uncompacted) cover — the
    * single sizing policy shared with the polygon-TABLE path
    * ([[Geo.DefaultMaxCoverCells]]): the cover resolution per polygon
    * adapts so this bound holds, keeping the broadcast small regardless of
    * polygon size. Boundary cells at a coarser cover resolution simply
    * shift more rows to the exact-PIP filter, which stays correct. */
  def MaxCoverCells: Long = Geo.DefaultMaxCoverCells

  /** Cover resolution for one polygon: the finest ladder res <= pointRes
    * whose size estimate stays under [[MaxCoverCells]] — the same policy
    * ([[Geo.adaptiveCoverRes]]) the distributed polygon-table generator
    * applies, so broadcast and table paths pick identical covers. */
  def coverResFor(poly: Geo.GeoPolygon, pointRes: Int): Int =
    Geo.adaptiveCoverRes(Array(poly), pointRes)

  /** Annotated cover rows (polyId, cell, cellRes, full) for a set of
    * polygons.
    *
    * By default each polygon's cover stays at a single resolution (its
    * adaptive coverRes): the probe side then computes one ancestor per
    * distinct coverRes instead of one per compaction level, which is the
    * cheaper plan when the cover is bounded by [[MaxCoverCells]] anyway.
    * Pass `compactFull = true` to compact fully-contained cells to mixed
    * resolutions (smallest broadcast payload; more probe ancestors). */
  def cover(polys: Seq[Poly], res: Int,
            compactFull: Boolean = false): Seq[(Long, Long, Int, Boolean)] =
    polys.flatMap { p =>
      val coverRes = coverResFor(p.geo, res)
      // Buffered + eroded cover so the cheap bit-parent probe key stays
      // exact under child protrusion (see Geo.bufferedAnnotatedCover).
      val (cells, flags) =
        if (coverRes == res)
          Geo.polygonToCellsAnnotated(Array(p.geo), coverRes, Geo.IntersectsBoundary)
        else Geo.bufferedAnnotatedCover(Array(p.geo), coverRes)
      if (compactFull) {
        val full = cells.indices.filter(flags).map(cells).toArray.sortBy(H3.orderKey)
        val partial = cells.indices.filterNot(flags).map(cells)
        H3.compactSorted(full).map(c => (p.id, c, H3.getResolution(c), true)) ++
          partial.map(c => (p.id, c, coverRes, false))
      } else {
        cells.indices.map(i => (p.id, cells(i), coverRes, flags(i)))
      }
    }

  /** PIP join: returns `points` columns + `poly_id`.
    *
    * @param points    probe side; must contain `lat`, `lng` (degrees) and a
    *                  `cell` column at resolution `res`.
    * @param polys     polygon set (broadcast with the plan).
    * @param res       probe/boundary cell resolution.
    */
  def pipJoin(spark: SparkSession, points: DataFrame, polys: Seq[Poly],
              res: Int, cellCol: String = "cell9",
              broadcastCover: Boolean = true,
              saltBuckets: Int = 8): DataFrame = {
    H3Functions.register(spark)
    import spark.implicits._

    val coverRows = cover(polys, res)
    val coverResolutions = coverRows.map(_._3).distinct.sorted

    val coverDf = coverRows.toDF("poly_id", "cover_cell", "cover_res", "full")

    // Probe ancestors, one cheap bit-parent per distinct cover resolution.
    //
    // CORRECTNESS: H3 children protrude beyond their parents, so a point's
    // bit-ancestor can differ from its geometric cell at a coarse cover
    // resolution (observed ~1 per 10^6 matched rows as a lost inside point
    // and a falsely full-accepted outside point). Rather than computing
    // geometric cells per point (a full latLngToCell per cover resolution
    // on the hot path), coarse covers are BUFFERED by one ring for
    // completeness and their full flags ERODED by one ring for sound
    // acceptance (Geo.bufferedAnnotatedCover) — the probe stays a 3-bit-op
    // parent truncation.
    // Single cover resolution (the common case — all polygons fit the cap
    // at one ladder res): no Generate node, the probe key is one bit-op
    // column and the join stage stays one straight codegen pipeline.
    val probe =
      if (coverResolutions.size == 1) {
        points.withColumn("__anc",
          expr(s"h3_cell_to_parent($cellCol, ${coverResolutions.head})"))
      } else {
        val ancestors = array(coverResolutions.map { r =>
          expr(s"h3_cell_to_parent($cellCol, $r)")
        }: _*)
        points.withColumn("__anc", explode(ancestors))
      }

    val joined =
      if (broadcastCover)
        probe.join(broadcast(coverDf), probe("__anc") === coverDf("cover_cell"))
      else {
        // Shuffle path for covers too large to broadcast. Hot probe cells
        // (city-cluster skew) are salted: the cover side is replicated per
        // salt bucket, the probe side picks a deterministic per-row salt,
        // so one hot cover cell spreads over `saltBuckets` reducers. AQE's
        // skew-join is the backstop for residual imbalance.
        val saltedCover = coverDf.withColumn("__salt",
          explode(array((0 until saltBuckets).map(lit): _*)))
        val saltedProbe = probe.withColumn("__salt",
          pmod(xxhash64(col(cellCol), col("lat"), col("lng")),
            lit(saltBuckets)).cast("int"))
        saltedProbe.join(saltedCover,
          saltedProbe("__anc") === saltedCover("cover_cell") &&
            saltedProbe("__salt") === saltedCover("__salt"))
          .drop("__salt")
      }

    val polyMap = polys.map(p => p.id -> p.geo).toMap
    val pip = org.apache.spark.sql.GraftBridge.column(PointInPolygonSet(
      org.apache.spark.sql.GraftBridge.expression(col("poly_id")),
      org.apache.spark.sql.GraftBridge.expression(col("lat")),
      org.apache.spark.sql.GraftBridge.expression(col("lng")),
      polyMap))

    joined
      .filter(col("full") || pip)
      .drop("__anc", "cover_cell", "cover_res", "full")
  }

  /** Loads the reference shape fixtures as polygons (degrees GeoJSON). */
  def loadShape(path: String): Array[Geo.GeoPolygon] =
    Geo.parseGeoJson(scala.io.Source.fromFile(path).mkString)

  /** PIP join against a polygon TABLE — the shape for thousands/millions
    * of geofences, where a driver-side Seq[Poly] cannot hold them.
    *
    * Scale design: covers are computed ON EXECUTORS by the annotated
    * generator (one row per cover cell, full/boundary flagged); the
    * candidate join carries (poly_id, cell, full) ids only; rows on fully
    * contained cells are accepted outright, and the geometry string joins
    * back exactly once — only for boundary-cell rows — before the exact
    * ray-cast filter (memoized parse per executor).
    *
    * @param polygons columns: poly_id (long), geojson (string)
    * @param broadcastPolygons true (default) broadcasts covers + geometry
    *                 (single-pass plan); false takes the shuffle path for
    *                 polygon tables too large to broadcast. */
  def pipJoinPolygonTable(spark: SparkSession, points: DataFrame,
                          polygons: DataFrame, res: Int,
                          cellCol: String = "cell9",
                          broadcastPolygons: Boolean = true): DataFrame = {
    H3Functions.register(spark)
    // Each polygon adapts its cover resolution down Geo.coverLadder(res)
    // (a continental polygon must not tile at the point resolution),
    // emitting a protrusion-robust cover (Geo.bufferedAnnotatedCover) so
    // the probe can use cheap bit-parent keys at every ladder resolution.
    // Cell values at different resolutions never collide (the res nibble
    // differs), so one join key column serves the whole ladder.
    def ancAt(r: Int): Column =
      if (r == res) col(cellCol) else expr(s"h3_cell_to_parent($cellCol, $r)")
    def probeFor(ladder: Seq[Int]): DataFrame =
      // Single present resolution (the common case): one bit-op column,
      // no Generate node — the join stage stays a straight codegen
      // pipeline (mirrors pipJoin).
      if (ladder.size == 1) points.withColumn("__anc", ancAt(ladder.head))
      else points.withColumn("__anc", explode(array(ladder.map(ancAt): _*)))
    if (broadcastPolygons) {
      // ONE scan of the polygon table, and it is CHEAP: geometry plus the
      // h3_cover_res ladder hint (a size-only policy evaluation, no
      // tiling) are collected together — the same geometry a broadcast
      // build would pin on the driver anyway. The expensive part — the
      // annotated-cover tiling — is NOT collected through the driver:
      // materializing ~10^5 cover rows as external Rows and re-encoding
      // them into a local relation costs more than the tiling itself
      // (measured 2x on the bench phase). Instead the covers broadcast
      // runs the generator over an RDD-parallelized rebuild of the
      // collected geometry: tiling executes distributed at broadcast
      // build time, emits InternalRows directly, and never rescans the
      // user's table (RDD rebuild, not the original source).
      import spark.implicits._
      val polyRows = polygons
        .filter(col("geojson").isNotNull)
        .select(col("poly_id"), col("geojson"),
          expr(s"h3_cover_res(geojson, $res)").as("__r"))
        .collect()
      val ladder = polyRows.filter(!_.isNullAt(2)).map(_.getInt(2))
        .distinct.sorted.toSeq
      if (ladder.isEmpty)
        return points.limit(0).withColumn("poly_id", lit(0L))
      val geoPairs = polyRows.map(r => (r.getLong(0), r.getString(1))).toSeq
      // parallelize (not a local relation + repartition): distributes the
      // tiling without a shuffle job and cannot be folded onto the driver
      // by ConvertToLocalRelation.
      val geoRdd = spark.sparkContext.parallelize(
        geoPairs, Math.min(spark.sparkContext.defaultParallelism, Math.max(1, geoPairs.size)))
      val coversDf = geoRdd.toDF("poly_id", "geojson")
        .select(col("poly_id"), expr(s"h3_polygon_to_cells_annotated(geojson, $res)"))
        .select("poly_id", "cell", "full")
      val geoDf = geoPairs.toDF("poly_id", "geojson")
      // Candidate join and geometry lookup are both broadcasts: points are
      // scanned once and the || short-circuits the ray cast on
      // fully-contained cells.
      probeFor(ladder)
        .join(broadcast(coversDf), col("__anc") === coversDf("cell"))
        .join(broadcast(geoDf), "poly_id")
        .filter(col("full") || expr("h3_point_in_polygon(lat, lng, geojson)"))
        .drop("__anc", "cell", "full", "geojson")
    } else {
      // Huge polygon tables (too big to collect/broadcast): distributed
      // covers via the generator, shuffled id-only candidate join, full
      // cells accepted outright, geometry shuffled onto boundary rows
      // only. The ladder probe is a separate size-hint-only scan
      // (h3_cover_res, no tiling) — 3 passes over the table total, the
      // price of never materializing it on the driver.
      val covers = polygons
        .select(col("poly_id"),
          expr(s"h3_polygon_to_cells_annotated(geojson, $res)"))
        .select("poly_id", "cell", "full")
      val ladder = polygons
        .filter(col("geojson").isNotNull)
        .select(expr(s"h3_cover_res(geojson, $res)").as("r"))
        .distinct().collect().map(_.getInt(0)).sorted.toSeq
      if (ladder.isEmpty)
        return points.limit(0).withColumn("poly_id", lit(0L))
      val geo = polygons.select(col("poly_id"), col("geojson"))
      val cand = probeFor(ladder)
        .join(covers, col("__anc") === covers("cell"))
      val fullHits = cand.filter(col("full")).drop("__anc", "cell", "full")
      val boundary = cand.filter(!col("full"))
        .join(geo, "poly_id")
        .filter(expr("h3_point_in_polygon(lat, lng, geojson)"))
        .drop("__anc", "cell", "full", "geojson")
      fullHits.unionByName(boundary)
    }
  }
}

/** Serializable PIP tester shipped into generated code via a plan
  * reference object (keeps whole-stage codegen intact). */
final class PipTester(polys: Map[Long, Geo.GeoPolygon]) extends Serializable {
  private val ids: Array[Long] = polys.keys.toArray.sorted
  private val geos: Array[Geo.GeoPolygon] = ids.map(polys)

  def test(polyId: Long, latDeg: Double, lngDeg: Double): Boolean = {
    val idx = java.util.Arrays.binarySearch(ids, polyId)
    if (idx < 0) false
    else geos(idx).containsCentroid(
      Math.toRadians(latDeg), Math.toRadians(lngDeg))
  }
}

/** Exact ray-cast point-in-polygon test against a broadcast polygon map.
  * Only evaluated for probe rows landing on boundary cover cells; fully
  * codegen-compatible so the join stage stays inside WSCG. */
case class PointInPolygonSet(polyId: Expression, lat: Expression, lng: Expression,
                             polys: Map[Long, Geo.GeoPolygon])
    extends TernaryExpression {
  override def first: Expression = polyId
  override def second: Expression = lat
  override def third: Expression = lng
  override def dataType: DataType = BooleanType
  override def prettyName: String = "h3_point_in_polygon"

  @transient private lazy val tester = new PipTester(polys)

  override protected def nullSafeEval(id: Any, la: Any, ln: Any): Any =
    tester.test(id.asInstanceOf[Long], la.asInstanceOf[Double], ln.asInstanceOf[Double])

  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                         ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pipTester", new PipTester(polys),
      classOf[PipTester].getName)
    nullSafeCodeGen(ctx, ev, (id, la, ln) =>
      s"${ev.value} = $ref.test($id, $la, $ln);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(polyId = f, lat = s, lng = t)
}
