package graft.h3.tools

import graft.h3.{Geo, H3}
import scala.io.Source

/** Dev harness: tiler vs reference Paris covers + golden counts. */
object TilerCheck {
  def load(name: String): Array[Geo.GeoPolygon] = {
    val text = Source.fromFile(s"/root/reference/dataset/shapes/$name.geojson").mkString
    Geo.parseGeoJson(text)
  }

  def main(args: Array[String]): Unit = {
    val paris = load("Paris")

    // Paris covers res 5..11 vs fixture files (ContainsCentroid).
    for (res <- 5 to 11) {
      val expected = Source.fromFile(s"/root/reference/dataset/Paris/cells-res$res.txt")
        .getLines().filter(_.nonEmpty)
        .map(l => java.lang.Long.parseUnsignedLong(l.trim, 16)).toSet
      val got = Geo.polygonToCells(paris, res, Geo.ContainsCentroid).toSet
      val missing = expected -- got
      val extra = got -- expected
      println(s"Paris res$res: expected=${expected.size} got=${got.size} missing=${missing.size} extra=${extra.size}")
      if (missing.nonEmpty) println("  missing ex: " + missing.take(3).map(java.lang.Long.toHexString).mkString(","))
      if (extra.nonEmpty) println("  extra ex: " + extra.take(3).map(java.lang.Long.toHexString).mkString(","))
    }

    // Golden counts per mode.
    def count(name: String, res: Int, mode: Int): Int =
      Geo.polygonToCells(load(name), res, mode).length
    println(s"Paris res8 centroid=${count("Paris", 8, Geo.ContainsCentroid)} (want 164)")
    println(s"Paris res8 containsB=${count("Paris", 8, Geo.ContainsBoundary)} (want 118)")
    println(s"Paris res8 intersects=${count("Paris", 8, Geo.IntersectsBoundary)} (want 203)")
    println(s"Rabi res8 centroid=${count("Rabi", 8, Geo.ContainsCentroid)} (want 163)")
    println(s"Rabi res8 containsB=${count("Rabi", 8, Geo.ContainsBoundary)} (want 132)")
    println(s"Rabi res8 intersects=${count("Rabi", 8, Geo.IntersectsBoundary)} (want 193)")
    println(s"Holes res4 centroid=${count("Holes", 4, Geo.ContainsCentroid)} (want 233)")
    println(s"Holes res4 containsB=${count("Holes", 4, Geo.ContainsBoundary)} (want 170)")
    println(s"Holes res4 intersects=${count("Holes", 4, Geo.IntersectsBoundary)} (want 285)")
  }
}
