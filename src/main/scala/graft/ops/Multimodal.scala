package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, plus batched decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-aligned batching via
  * mapPartitions on typed Datasets, deterministic output shapes — is real
  * and tested. The codec itself is a STUB (this container has no
  * image/audio libraries): [[FakeCodec]] produces deterministic pseudo
  * features from the payload bytes, so pipelines are reproducible and the
  * decode stage can be swapped for a real codec without touching the
  * dataflow.
  */
object Multimodal {

  final case class MediaBlob(doc_id: Long, kind: String, payload: Array[Byte],
                             width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, kind: String,
                                 feature: Array[Float], frames: Int)

  /** STUB decoder: deterministic features from payload bytes. Replace with
    * a real codec (JPEG/PNG/PCM decode) in a full deployment. */
  object FakeCodec {
    def decodeToFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      i = 0
      while (i < dim) {
        h = TextKernel.mix64(h + i)
        out(i) = ((h >>> 40).toInt.toFloat / (1 << 24).toFloat) - 0.5f
        i += 1
      }
      out
    }

    /** STUB frame sampler: frame count derived from payload size. */
    def frameCount(payload: Array[Byte], kind: String): Int = kind match {
      case "video" => Math.max(1, payload.length / 4096)
      case "audio" => Math.max(1, payload.length / 1024)
      case _ => 1
    }
  }

  /** Synthesizes a media table from the documents table (html bytes play
    * the role of the opaque payload). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaBlob(id, kind, text.getBytes("UTF-8"),
          width = 64 + (id % 8).toInt * 32, height = 64,
          sample_rate = 16000)
      }
  }

  final case class ResizedBlob(doc_id: Long, kind: String, width: Int,
                               height: Int, payload: Array[Byte])

  final case class Frame(doc_id: Long, frame_idx: Int, feature: Array[Float])

  /** STUB resize: deterministic re-encode to the target dimensions (real
    * deployments swap in an image codec; the dataflow — schema, typed map,
    * partition preservation — is what this stage pins down). */
  def resize(spark: SparkSession, media: Dataset[MediaBlob],
             width: Int, height: Int): Dataset[ResizedBlob] = {
    import spark.implicits._
    media.map { blob =>
      val out = new Array[Byte](math.min(blob.payload.length, width * height / 8))
      var i = 0
      while (i < out.length) {
        out(i) = blob.payload(i * math.max(1, blob.payload.length / math.max(out.length, 1)) % blob.payload.length)
        i += 1
      }
      ResizedBlob(blob.doc_id, blob.kind, width, height, out)
    }
  }

  /** STUB frame sampling: one deterministic feature vector per sampled
    * frame (every `stride`-th frame), rows exploded via flatMap. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaBlob],
                   stride: Int = 2, featureDim: Int = 16): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { blob =>
      val n = FakeCodec.frameCount(blob.payload, blob.kind)
      (0 until n by stride).map { f =>
        Frame(blob.doc_id, f,
          FakeCodec.decodeToFeatures(blob.payload :+ f.toByte, featureDim))
      }
    }
  }

  /** Decode + feature-extract stage: batched per partition; output shape is
    * fixed (dim-`featureDim` vectors), partitioning preserved. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaBlob],
                      featureDim: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { blob =>
        MediaFeatures(blob.doc_id, blob.kind,
          FakeCodec.decodeToFeatures(blob.payload, featureDim),
          FakeCodec.frameCount(blob.payload, blob.kind))
      }
    }
  }
}
