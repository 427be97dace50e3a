package graft.h3.tools

import graft.h3.H3
import scala.io.Source

/** Dev harness: checks the pure-JVM kernel against the H3 conformance
  * fixture files without spinning up Spark. */
object FixtureCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/reference/dataset"

    // latLngToCell: each line "<cell_hex> <lat_deg> <lng_deg[0,360)>"
    var total = 0
    var pass = 0
    var firstFails = List.empty[String]
    val src = Source.fromFile(s"$dir/latLngToCell.txt")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val parts = line.trim.split("\\s+")
        val cell = java.lang.Long.parseUnsignedLong(parts(0), 16)
        val lat = parts(1).toDouble
        var lng = parts(2).toDouble
        if (lng > 180.0) lng -= 360.0
        val res = H3.getResolution(cell)
        val got = H3.latLngToCell(lat, lng, res)
        total += 1
        if (got == cell) pass += 1
        else if (firstFails.size < 5)
          firstFails ::= s"want=${parts(0)} got=${java.lang.Long.toHexString(got)} lat=$lat lng=$lng"
      }
    } finally src.close()
    println(s"latLngToCell: $pass/$total")
    firstFails.foreach(f => println(s"  FAIL $f"))

    // Round-trip: cellToLatLng(cell) -> latLngToCell == cell, plus boundary
    // shape invariants, on the cellToBoundary fixture ids.
    var rtTotal = 0
    var rtPass = 0
    var bTotal = 0
    var bPass = 0
    var rtFails = List.empty[String]
    val src2 = Source.fromFile(s"$dir/cellToBoundary.txt")
    try {
      for (line <- src2.getLines() if line.nonEmpty) {
        val cell = java.lang.Long.parseUnsignedLong(line.trim, 16)
        val res = H3.getResolution(cell)
        val c = H3.cellToLatLng(cell)
        val back = H3.latLngToCell(c(0), c(1), res)
        rtTotal += 1
        if (back == cell) rtPass += 1
        else if (rtFails.size < 5)
          rtFails ::= s"cell=${line.trim} center=(${c(0)},${c(1)}) back=${java.lang.Long.toHexString(back)}"
        val b = H3.cellToBoundary(cell)
        val nv = b.length / 2
        bTotal += 1
        val expMin = if (H3.isPentagon(cell)) 5 else 6
        if (nv >= expMin && nv <= 10) bPass += 1
      }
    } finally src2.close()
    println(s"centerRoundTrip: $rtPass/$rtTotal")
    rtFails.foreach(f => println(s"  FAIL $f"))
    println(s"boundaryShape: $bPass/$bTotal")

    // Validity: all fixture ids valid; a few mutated ones invalid.
    val v1 = H3.isValidCell(0x8a1fb46622dffffL)
    val v2 = H3.isValidCell(0x8a1fb46622dfff0L)
    println(s"validity: valid=$v1 corrupted=$v2")
  }
}
