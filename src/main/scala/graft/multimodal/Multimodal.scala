package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery here is REAL (schema, batch iteration,
  * partitioning, deterministic output); the codec itself is a clearly-marked
  * STUB (`FakeCodec`) because no media libraries ship in this container —
  * swapping in a real JNI/JavaCV decoder changes only `decode()`'s body.
  * North-star addition; the reference has no binary surface.
  */
object Multimodal {

  /** Typed metadata extracted from a payload. */
  final case class MediaMeta(
      docId: Long, byteLen: Long, sha: String, kind: String,
      width: Int, height: Int, features: Array[Float])

  /** STUB codec: deterministic fake decode. Real implementation would parse
    * the container format; the fake derives stable pseudo-features from the
    * bytes so tests are reproducible.
    */
  object FakeCodec {
    /** FNV-1a constants — also used to GENERATE the DuckDB oracle SQL for
      * `q_multimodal_features` (QueryCatalog), so the sides cannot drift.
      */
    final val FnvOffset = 1469598103934665603L
    final val FnvPrime = 1099511628211L

    def kindOf(bytes: Array[Byte]): String =
      if (bytes.isEmpty) "empty"
      else if ((bytes(0) & 1) == 0) "image" else "audio"

    /** ??? in spirit — replace with a real decoder. Deterministic stand-in. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val h = bytes.foldLeft(FnvOffset)((a, b) => (a ^ (b & 0xff)) * FnvPrime)
      val w = 64 + math.abs(h % 193).toInt
      val ht = 64 + math.abs((h >> 8) % 193).toInt
      val feats = Array.tabulate(8)(i => (((h >> (i * 7)) & 0xff).toFloat) / 255f)
      (w, ht, feats)
    }

    /** STUB resample: real impl would decode → scale → re-encode. The fake
      * derives a (w*h)-proportional deterministic byte payload.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = math.max(1, math.min(w * h / 64, 4096))
      Array.tabulate(n)(i => bytes(i % math.max(bytes.length, 1)))
    }

    /** STUB demux: treats every 256-byte block as one "frame". */
    def frames(bytes: Array[Byte]): Iterator[Array[Byte]] =
      bytes.grouped(256)
  }

  /** Attach a binary payload column to any table (testdata has none, so the
    * documents' UTF-8 bytes stand in — the plumbing is payload-agnostic).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8").cast(BinaryType))

  /** Batch feature extraction over the binary column. `mapPartitions` is the
    * Scala analogue of `mapInPandas` batch processing: one codec instance per
    * partition, rows streamed through it — no per-row setup cost, scales as a
    * pure map stage.
    */
  def extractFeatures(withBinary: DataFrame): Dataset[MediaMeta] = {
    val enc = Encoders.product[MediaMeta]
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition codec setup would go here (model load, JNI init)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, feats) = FakeCodec.decode(bytes)
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(id, bytes.length.toLong, sha, FakeCodec.kindOf(bytes), w, h, feats)
        }
      }(enc)
  }

  /** Pure-SQL metadata pass (no codec): byte length + content hash — the
    * part of the multimodal pipeline that IS oracle-checkable.
    */
  def payloadMeta(withBinary: DataFrame): DataFrame =
    withBinary.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("sha"))

  /** Resized media record: same batch plumbing as [[extractFeatures]]; the
    * pixel resample inside `FakeCodec.resize` is the stub.
    */
  final case class ResizedMedia(docId: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize every payload to (w, h). Batch per partition; output schema is
    * fixed and typed so a downstream writer can bucket by (width, height).
    */
  def resize(withBinary: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    val enc = Encoders.product[ResizedMedia]
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = FakeCodec.resize(r.getAs[Array[Byte]](1), w, h)
          ResizedMedia(r.getLong(0), w, h, bytes)
        }
      }(enc)
  }

  /** One frame record per sampled frame of a (fake) video payload. */
  final case class Frame(docId: Long, frameIdx: Int, payload: Array[Byte])

  /** Frame sampling: every `stride`-th frame, exploded to one row per frame
    * — `flatMap` per partition, so a 2-hour video becomes rows without ever
    * materializing all frames in memory at once.
    */
  def sampleFrames(withBinary: DataFrame, stride: Int): Dataset[Frame] = {
    val enc = Encoders.product[Frame]
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          FakeCodec.frames(bytes).zipWithIndex.collect {
            case (f, i) if i % stride == 0 => Frame(id, i, f)
          }
        }
      }(enc)
  }
}
