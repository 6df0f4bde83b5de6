package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-local batch operators.
  *
  * The decode step proper is STUBBED (`FakeDecoder`) — no media libraries
  * exist in this environment — but everything Spark-side is real and
  * tested: the schema, the binary column handling, the mapPartitions batch
  * shape (decoders amortize model/codec init per batch, exactly like a
  * vectorized UDF), and the deterministic feature contract.
  */
final case class MediaRecord(
    id: Long,
    kind: String,                  // "image" | "audio" | "video" | "text"
    payload: Array[Byte],
    meta: Map[String, String])

final case class MediaFeatures(
    id: Long,
    kind: String,
    n_bytes: Long,
    sha256: String,
    features: Array[Float])        // decoder embedding (stubbed: content-derived)

object MultimodalOps {

  /** STUB decoder: a real implementation would decode the payload
    * (JPEG/PNG/WAV/MP4) and run a feature extractor. This fake is
    * deterministic in the payload bytes so pipelines and tests behave
    * identically everywhere the stub runs. */
  object FakeDecoder {
    val Dim = 16
    def features(payload: Array[Byte]): Array[Float] = {
      val d = MessageDigest.getInstance("SHA-256").digest(payload)
      Array.tabulate(Dim)(i => ((d(i) & 0xff) - 128) / 128.0f)
    }
    def sha256Hex(payload: Array[Byte]): String =
      MessageDigest.getInstance("SHA-256").digest(payload)
        .map(b => f"$b%02x").mkString
  }

  /** Decode+featurize with partition-local batching: records are processed
    * `batchSize` at a time so a real decoder initializes its codec/model
    * once per partition and amortizes across batches — the exact shape a
    * vectorized (Arrow-batch) UDF gives, without leaving the JVM. */
  def decodeAndFeaturize(records: Dataset[MediaRecord], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init would go here (codec / model handle)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.id, r.kind, r.payload.length.toLong,
            FakeDecoder.sha256Hex(r.payload), FakeDecoder.features(r.payload))
        }
      }
    }
  }

  /** Frame/sample selection on an opaque payload: fixed-stride byte-range
    * sampling — the binary-plumbing analog of video frame sampling. Pure
    * column ops (substring on binary), no UDF. */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int, stride: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      r.payload.grouped(stride).zipWithIndex.collect {
        case (chunk, i) if chunk.length >= frameBytes =>
          (r.id, i, chunk.take(frameBytes))
      }
    }
  }

  /** Adapter: lift the documents table into MediaRecords (text bytes stand
    * in for media payloads; the plumbing is payload-agnostic). */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        MediaRecord(id, "text", text.getBytes("UTF-8"), Map("lang" -> lang))
      }
  }
}
