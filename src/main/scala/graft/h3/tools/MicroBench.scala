package graft.h3.tools

import graft.h3.{Geo, H3}

/** Single-threaded kernel micro-benchmarks (ns/op), comparable to the
  * reference's criterion benches. No Spark involved. */
object MicroBench {
  def timeNs(n: Int)(f: Int => Long): Double = {
    var sink = 0L
    var i = 0
    while (i < n) { sink += f(i); i += 1 } // warmup
    val t0 = System.nanoTime()
    i = 0
    while (i < n) { sink += f(i); i += 1 }
    val dt = (System.nanoTime() - t0).toDouble / n
    if (sink == 42) println("")
    dt
  }

  def main(args: Array[String]): Unit = {
    val n = 2000000
    // Deterministic scattered points.
    val lats = Array.tabulate(4096)(i => (graft.ops.TextKernel.mix64(i) % 1600000) / 10000.0)
    val lngs = Array.tabulate(4096)(i => (graft.ops.TextKernel.mix64(i + 7) % 3600000) / 10000.0)
    val cells = Array.tabulate(4096)(i => H3.latLngToCell(lats(i) / 2, lngs(i) / 2, 9))

    println(f"latLngToCell(res 9):  ${timeNs(n)(i => H3.latLngToCell(lats(i & 4095) / 2, lngs(i & 4095) / 2, 9))}%.0f ns/op")
    println(f"latLngToCell(res 15): ${timeNs(n)(i => H3.latLngToCell(lats(i & 4095) / 2, lngs(i & 4095) / 2, 15))}%.0f ns/op")
    println(f"cellToLatLng:         ${timeNs(n)(i => H3.cellToLatLng(cells(i & 4095))(0).toLong)}%.0f ns/op")
    println(f"cellToBoundary:       ${timeNs(n / 2)(i => H3.cellToBoundary(cells(i & 4095)).length.toLong)}%.0f ns/op")
    println(f"cellToParent:         ${timeNs(n)(i => H3.cellToParent(cells(i & 4095), 5))}%.0f ns/op")
    println(f"isValidCell:          ${timeNs(n)(i => if (H3.isValidCell(cells(i & 4095))) 1L else 0L)}%.0f ns/op")
    println(f"gridDisk(k=1):        ${timeNs(n / 4)(i => H3.gridDisk(cells(i & 4095), 1).length.toLong)}%.0f ns/op")
    println(f"gridDisk(k=5):        ${timeNs(n / 20)(i => H3.gridDisk(cells(i & 4095), 5).length.toLong)}%.0f ns/op")
    println(f"cellsToChildren(+2):  ${timeNs(n / 20)(i => H3.cellToChildren(H3.cellToParent(cells(i & 4095), 7), 9).length.toLong)}%.0f ns/op")

    val paris = Geo.parseGeoJson(scala.io.Source.fromFile(
      "/root/reference/dataset/shapes/Paris.geojson").mkString)
    for (res <- Seq(8, 9, 10)) {
      val t0 = System.nanoTime()
      var reps = 0
      var cellsOut = 0
      while (System.nanoTime() - t0 < 2e9) {
        cellsOut = Geo.polygonToCells(paris, res, Geo.ContainsCentroid).length
        reps += 1
      }
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"polygonToCells(Paris res $res, $cellsOut cells): $ms%.2f ms")
    }
  }
}
