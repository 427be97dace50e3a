package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes the Common-Crawl-style `pages` fact table mandated by the
  * north rule — pages(url, warc_ts, html, text, lang) — deterministically
  * from the driver-provided `documents` table, plus a deterministic geotag
  * (lat/lng) derived from doc_id only.
  *
  * Every derivation below is plain arithmetic that is expressible 1:1 in
  * DuckDB SQL, so the driver's oracle can re-derive the exact same table.
  * [[geoSql]] emits that SQL from the same constants (single source of
  * truth).
  */
object Pages {

  /** City centers (lat, lng). Cities 0-3 sit in the Paris region and receive
    * ~2/5 of clustered traffic, creating deliberately hot H3 cells for the
    * skew-handling paths. */
  val CityLat: Array[Double] = Array(
    48.8566, 48.8666, 48.8466, 48.8766, // Paris cluster (hot cells)
    40.7128, 34.0522, 51.5074, 35.6762, 19.4326, -23.5505,
    55.7558, 39.9042, 28.6139, -33.8688, 37.7749, 41.8781,
    52.5200, 45.4642, 40.4168, 59.3293, 50.0755, 47.4979,
    38.7223, 53.3498, 59.9139, 60.1699, 64.1466, -34.6037,
    -12.0464, 4.7110, 31.2304, 22.3193, 1.3521, -6.2088,
    13.7563, 14.5995, 30.0444, 6.5244, -1.2921, -26.2041)

  val CityLng: Array[Double] = Array(
    2.3522, 2.3622, 2.3422, 2.3722, // Paris cluster
    -74.0060, -118.2437, -0.1278, 139.6503, -99.1332, -46.6333,
    37.6173, 116.4074, 77.2090, 151.2093, -122.4194, -87.6298,
    13.4050, 9.1900, -3.7038, 18.0686, 14.4378, 19.0402,
    -9.1393, -6.2603, 10.7522, 24.9384, -21.9426, -58.3816,
    -77.0428, -74.0721, 121.4737, 114.1694, 103.8198, 106.8456,
    100.5018, 120.9842, 31.2357, 3.3792, 36.8219, 28.0473)

  // Deterministic pseudo-random doubles in [0,1) from doc_id.
  // u1 = ((doc_id * 1103515245 + 12345) % 2147483648) / 2147483648.0
  // u2 = ((doc_id * 69069 + 1) % 2147483648) / 2147483648.0

  /** Spark SQL / DuckDB shared expression strings for the geotag. */
  // Two LCG rounds so small ids are well mixed (one round leaves
  // id*mult < 2^31 unmixed); all intermediates fit in int64.
  def u1Sql(id: String): String =
    s"((((($id * 1103515245 + 12345) % 2147483648) * 1103515245 + 12345) % 2147483648) / CAST(2147483648 AS DOUBLE))"
  def u2Sql(id: String): String =
    s"((((($id * 69069 + 12345) % 2147483648) * 69069 + 1) % 2147483648) / CAST(2147483648 AS DOUBLE))"

  /** City index: 2/5 of clustered docs land in cities 0-3 (hot cells). */
  def citySql(id: String): String =
    s"(CASE WHEN $id % 5 < 2 THEN CAST($id % 4 AS INT) ELSE CAST($id % 40 AS INT) END)"

  private def cityArraySql(vals: Array[Double], duck: Boolean): String =
    if (duck) vals.mkString("[", ", ", "]")
    else vals.mkString("array(", ", ", ")")

  /** lat/lng SQL (identical semantics in Spark SQL and DuckDB; both use
    * 1-based list indexing via the element_at/list_extract shims below). */
  def latSql(id: String, duck: Boolean): String = {
    val cityLat =
      if (duck) s"list_extract(${cityArraySql(CityLat, duck)}, ${citySql(id)} + 1)"
      else s"element_at(${cityArraySql(CityLat, duck)}, ${citySql(id)} + 1)"
    s"""(CASE
      WHEN $id % 100 < 80 THEN CAST($cityLat AS DOUBLE) + (${u1Sql(id)} - 0.5) * 0.4
      WHEN $id % 100 < 95 THEN degrees(asin(2 * ${u1Sql(id)} - 1))
      ELSE (${u1Sql(id)} - 0.5) * 160.0
    END)"""
  }

  def lngSql(id: String, duck: Boolean): String = {
    val cityLng =
      if (duck) s"list_extract(${cityArraySql(CityLng, duck)}, ${citySql(id)} + 1)"
      else s"element_at(${cityArraySql(CityLng, duck)}, ${citySql(id)} + 1)"
    s"""(CASE
      WHEN $id % 100 < 80 THEN CAST($cityLng AS DOUBLE) + (${u2Sql(id)} - 0.5) * 0.4
      WHEN $id % 100 < 95 THEN ${u2Sql(id)} * 360.0 - 180.0
      WHEN $id % 2 = 0 THEN 179.999 - ${u2Sql(id)} * 0.002
      ELSE -179.999 + ${u2Sql(id)} * 0.002
    END)"""
  }

  def urlSql(id: String, source: String, duck: Boolean): String = {
    val st = if (duck) "VARCHAR" else "STRING"
    s"concat('https://host-', CAST($id % 1000 AS $st), '.example/', $source, '/', CAST($id AS $st))"
  }

  /** The pages table — one page per event (scales with sf), text payload
    * joined from documents so the byte-identical-text invariant is anchored
    * to driver data. Columns: page_id, url, warc_ts, html, text, lang,
    * lat, lng. */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    // Stratum-aware like every other documents read: the DuckDB oracle's
    // view carries the identical predicate AND its count(*) subquery sees
    // the same stratum, so pages-derived queries stay bit-exact in
    // sampled-oracle runs too.
    val docs = graft.Stratum(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")
    // Inlined as a literal: a scalar subquery in a broadcast join key trips
    // plan-reuse ("Subquery has not finished"); parquet-metadata count is
    // free. The DuckDB oracle computes the same value with a subquery.
    val nDocs = docs.count()
    events.createOrReplaceTempView("__events")
    docs.createOrReplaceTempView("__documents")
    spark.sql(s"""
      SELECT e.event_id AS page_id,
             ${urlSql("e.event_id", "d.source", duck = false)} AS url,
             e.ts AS warc_ts,
             cast(concat('<html><body>', d.text, '</body></html>') as binary) AS html,
             d.text AS text,
             d.lang AS lang,
             ${latSql("e.event_id", duck = false)} AS lat,
             ${lngSql("e.event_id", duck = false)} AS lng
      FROM __events e
      JOIN __documents d
        ON d.doc_id = e.event_id % $nDocs
    """)
  }

  /** pages + cell9 (H3 res-9 index) + cell_p (res-3 partition prefix). */
  def indexedPages(spark: SparkSession, sfDir: String, res: Int = 9): DataFrame = {
    graft.spark.H3Functions.register(spark)
    pages(spark, sfDir).selectExpr(
      "*",
      s"h3_latlng_to_cell(lat, lng, $res) AS cell9",
      s"h3_cell_to_parent(h3_latlng_to_cell(lat, lng, $res), 3) AS cell_p")
  }

  /** DuckDB-side derivation of the same pages table (oracle side). */
  def duckPagesCte: String =
    s"""pages AS (
      SELECT e.event_id AS page_id,
             ${urlSql("e.event_id", "d.source", duck = true)} AS url,
             d.text AS text,
             d.lang AS lang,
             ${latSql("e.event_id", duck = true)} AS lat,
             ${lngSql("e.event_id", duck = true)} AS lng
      FROM events e
      JOIN documents d
        ON d.doc_id = e.event_id % (SELECT count(*) FROM documents)
    )"""
}
