package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media row: opaque bytes + typed metadata (the multimodal column
  * pattern — image/audio/video as `binary` with a metadata struct). */
final case class MediaRow(
    media_id: Long, kind: String, bytes: Array[Byte],
    mime: String, width: Int, height: Int, duration_ms: Long)

/** Extracted per-media features (decode output shape). */
final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Long, sha_prefix: String,
    frames_sampled: Int, embedding: Array[Float])

/** Multimodal-column operators for the training-data pipeline.
  *
  * The Spark-side plumbing is real — schemas, partitioning, batch
  * shape (mapPartitions = the JVM analog of mapInPandas batches) — but
  * the codec calls are STUBS: this container has no image/audio
  * libraries, so `decodeStub` derives deterministic fake features
  * from the bytes. Swap `decodeStub` for a real codec (JNI/ffmpeg/
  * ImageIO) without touching the pipeline: everything else is
  * codec-agnostic.
  *
  * Scale notes: media bytes never shuffle — features are extracted in
  * the scan stage (mapPartitions over the storage partitioning) and
  * only the small feature rows flow on. Metadata predicates
  * (kind/mime/size) are plain columns, so partition pruning and
  * pushdown work before any bytes are touched.
  */
object Multimodal {

  /** ---- STUB ---- deterministic fake "decode" of one media blob.
    * Real implementation: image decode + resize / audio resample /
    * video frame sampling. The fake derives stable pseudo-features
    * from the bytes so tests are exact. */
  private[multimodal] def decodeStub(bytes: Array[Byte], kind: String,
                                     frameEvery: Int): (Int, Array[Float]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    val nFrames = kind match {
      case "video" => math.max(1, bytes.length / math.max(frameEvery, 1))
      case _ => 1
    }
    val emb = Array.tabulate(8) { i =>
      ((d(i * 2 & 15) & 0xff) * 256 + (d(i * 2 + 1 & 15) & 0xff)) / 65535f
    }
    (nFrames, emb)
  }

  /** Decode/feature-extract pass: one partition-local batch walk, no
    * shuffle (the mapInPandas-equivalent batch shape). */
  def extractFeatures(media: Dataset[MediaRow], frameEvery: Int = 4096)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup cost amortized across the batch — where a
      // real codec would init its context once
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        val digest = sha.digest(m.bytes)
        val hex = digest.take(4).map(b => f"${b & 0xff}%02x").mkString
        val (frames, emb) = decodeStub(m.bytes, m.kind, frameEvery)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, hex,
          frames, emb)
      }
    }
  }

  /** ---- STUB ---- "resize": deterministic byte-level downsample
    * standing in for a real image resize / audio resample. Keeps
    * every k-th byte so output size and content are exact functions
    * of the input — the pipeline contract (metadata update + smaller
    * payload, partition-local, no shuffle) is the real part. */
  def resizeStub(media: Dataset[MediaRow], targetW: Int, targetH: Int,
                 keepEvery: Int = 4)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val out = m.bytes.grouped(keepEvery).map(_.head).toArray
        m.copy(bytes = out, width = targetW, height = targetH)
      }
    }
  }

  /** ---- STUB ---- video frame sampling: split the payload into
    * fixed-size "frames" and keep every `every`-th — the real version
    * seeks keyframes; batch shape and output schema identical. */
  def frameSampleStub(media: Dataset[MediaRow], frameBytes: Int,
                      every: Int)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "video") m
        else {
          val frames = m.bytes.grouped(frameBytes).toSeq
          val kept = frames.zipWithIndex.collect {
            case (f, i) if i % every == 0 => f
          }
          m.copy(bytes = kept.flatten.toArray)
        }
      }
    }
  }

  /** Metadata-only predicate pass (no byte access): the point of the
    * typed-metadata column — filters prune before decode. */
  def selectForDecode(media: DataFrame, kinds: Seq[String],
                      maxBytes: Long): DataFrame =
    media.filter(col("kind").isin(kinds: _*) &&
      length(col("bytes")) <= maxBytes)

  /** Test/bench helper: deterministic fake media derived from a text
    * table (doc_id, text) — bytes = UTF-8 text, kind round-robins. */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      element_at(array(lit("image/png"), lit("audio/wav"),
        lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      lit(0).as("width"), lit(0).as("height"),
      (length(col("text")) * 10L).as("duration_ms"))
}
