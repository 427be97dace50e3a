package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object P1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    println("=== PLAN dedup_spans ===")
    println(graft.ops.Ops.dedupSpans(spark, docs, window = 5)
      .queryExecution.executedPlan.toString)
    println("=== PLAN decontaminate fast ===")
    println(graft.ops.Ops.decontaminate(spark, docs,
        docs.filter(col("doc_id") % 97 === 0))
      .queryExecution.executedPlan.toString)
    println("=== PLAN pack_sequences ===")
    println(graft.ops.Ops.packSequences(spark, docs, seqLen = 256, nShards = 8)
      .queryExecution.executedPlan.toString)
    println("=== PLAN mixture_sample ===")
    println(graft.ops.Ops.mixtureSample(spark, docs,
        Map("src0" -> 2.5, "src1" -> 0.5))
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
