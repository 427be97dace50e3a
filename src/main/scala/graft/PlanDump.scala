package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` output for declared queries to
  * plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence the
  * optimization round commits. Usage (env):
  *   SPARK_GRAFT_PLAN_QUERIES=dedup_spans,pack_sequences  (comma list)
  *   SPARK_GRAFT_PLAN_TAG=r06   SPARK_GRAFT_PLAN_SUFFIX=before
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r06")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val names = sys.env.get("SPARK_GRAFT_PLAN_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    for (n <- names) {
      SparkEntry.queries.get(n) match {
        case None => println(s"## no such query: $n")
        case Some(q) =>
          try {
            val df = q(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(dir.resolve(s"${n}_$suffix.txt"),
              plan.getBytes("UTF-8"))
            println(s"## wrote ${n}_$suffix.txt")
          } catch {
            case e: Exception =>
              println(s"## FAILED $n: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
