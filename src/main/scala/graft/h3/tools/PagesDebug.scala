package graft.h3.tools
import org.apache.spark.sql.SparkSession
object PagesDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = graft.engine.Pages.indexedPages(spark, "/root/testdata/sf0.01")
      df.show(3, false)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
