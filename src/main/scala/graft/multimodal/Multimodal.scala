package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  *
  * Both halves are REAL now: the Spark-side machinery (schema, batch
  * iteration, partitioning, deterministic output) and the codec itself —
  * [[PixelCodec]] decodes PNG (Inflater + scanline unfilter), BMP pixel
  * arrays and WAV PCM in pure JVM; [[MediaHeaders]] parses the container
  * headers. Payloads that are none of the supported formats fall back to
  * deterministic byte-level features, so every function stays total.
  * North-star addition; the reference has no binary surface.
  */
object Multimodal {

  /** Typed metadata extracted from a payload. */
  final case class MediaMeta(
      docId: Long, byteLen: Long, sha: String, kind: String,
      width: Int, height: Int, features: Array[Float])

  /** Attach a binary payload column to any table (testdata has none, so the
    * documents' UTF-8 bytes stand in — the plumbing is payload-agnostic).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8").cast(BinaryType))

  /** Feature vector of a decoded media payload: value mean, min, max, spread
    * and the first channels' means — all scaled to [0, 1]-ish floats. For
    * audio the values are signed PCM samples, recentred by +32768.
    */
  private def mediaFeatures(m: PixelCodec.Media): Array[Float] = {
    val vs = m.values
    val shift = if (m.kind == "wav") 32768 else 0
    val scale = if (m.kind == "wav") 65535f else 255f
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    while (i < vs.length) {
      val v = vs(i) + shift
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    val n = math.max(vs.length, 1)
    val chans = math.max(if (m.kind == "wav") m.height else m.channels, 1)
    val chanMeans = Array.fill(4)(0L)
    i = 0
    while (i < vs.length) {
      chanMeans(i % chans min 3) += vs(i) + shift
      i += 1
    }
    Array(
      sum.toFloat / n / scale,
      (if (mn == Int.MaxValue) 0 else mn).toFloat / scale,
      (if (mx == Int.MinValue) 0 else mx).toFloat / scale,
      (mx - mn).max(0).toFloat / scale,
      chanMeans(0).toFloat / math.max(n / chans, 1) / scale,
      chanMeans(1).toFloat / math.max(n / chans, 1) / scale,
      chanMeans(2).toFloat / math.max(n / chans, 1) / scale,
      chanMeans(3).toFloat / math.max(n / chans, 1) / scale)
  }

  /** Deterministic byte-level fallback for unrecognized payloads: byte mean
    * / min / max / spread plus quartile-bucket mass — a real computation
    * over the real bytes, just not a container decode.
    */
  private def binFeatures(bytes: Array[Byte]): Array[Float] = {
    var sum = 0L; var mn = 256; var mx = -1
    val buckets = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      buckets(v >> 6) += 1
      i += 1
    }
    val n = math.max(bytes.length, 1)
    Array(sum.toFloat / n / 255f,
      (if (mn == 256) 0 else mn) / 255f, (if (mx == -1) 0 else mx) / 255f,
      buckets(0).toFloat / n, buckets(1).toFloat / n,
      buckets(2).toFloat / n, buckets(3).toFloat / n,
      math.max(mx - mn, 0) / 255f)
  }

  /** Batch feature extraction over the binary column. `mapPartitions` is the
    * Scala analogue of `mapInPandas` batch processing: one codec instance per
    * partition, rows streamed through it — no per-row setup cost, scales as a
    * pure map stage. Decodes real PNG/BMP/WAV payloads ([[PixelCodec]]); for
    * WAV, (width, height) carry (sample rate, channels), the
    * [[MediaHeaders.MediaInfo]] convention.
    */
  def extractFeatures(withBinary: DataFrame): Dataset[MediaMeta] = {
    val enc = Encoders.product[MediaMeta]
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition codec setup would go here (model load, JNI init)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          md.reset()
          val sha = md.digest(bytes).map("%02x".format(_)).mkString
          PixelCodec.decode(bytes) match {
            case Some(m) =>
              MediaMeta(id, bytes.length.toLong, sha, m.kind, m.width,
                m.height, mediaFeatures(m))
            case None =>
              MediaMeta(id, bytes.length.toLong, sha, "bin", 0, 0,
                binFeatures(bytes))
          }
        }
      }(enc)
  }

  /** Integer decode statistics over the binary column — the oracle-checkable
    * projection of a real payload decode. Per payload: kind, dims, channel
    * count, value count, sum, min, max, and the position-weighted sum
    * Σ (i+1)·vᵢ (catches any transposition/ordering bug a plain sum would
    * miss). Values are pixels (0..255) for images, signed PCM samples for
    * WAV. Same map-only partition shape as [[extractFeatures]].
    */
  def decodeStats(withBinary: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_vals", LongType, nullable = false),
      StructField("v_sum", LongType, nullable = false),
      StructField("v_min", LongType, nullable = false),
      StructField("v_max", LongType, nullable = false),
      StructField("v_wsum", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // null payload cells decode as an empty bin record — the fallback
          // must stay total too, not NPE on bytes.map
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val m = PixelCodec.decode(bytes).getOrElse(
            PixelCodec.Media("bin", 0, 0, 1,
              bytes.map(b => (b & 0xff): Int)))
          val vs = m.values
          var sum = 0L; var wsum = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var i = 0
          while (i < vs.length) {
            val v = vs(i).toLong
            sum += v; wsum += (i + 1) * v
            if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          if (vs.isEmpty) { mn = 0L; mx = 0L }
          org.apache.spark.sql.Row(id, m.kind, m.width, m.height, m.channels,
            vs.length.toLong, sum, mn, mx, wsum)
        }
      }(enc)
  }

  /** Pure-SQL metadata pass (no codec): byte length + content hash — the
    * part of the multimodal pipeline that needs no decode at all.
    */
  def payloadMeta(withBinary: DataFrame): DataFrame =
    withBinary.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("sha"))

  /** Resized media record: same batch plumbing as [[extractFeatures]]. */
  final case class ResizedMedia(docId: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize every payload to (w, h): real decode → nearest-neighbor
    * resample → PNG re-encode for supported image formats
    * ([[PixelCodec.resizeNearest]]); non-image payloads pass through a
    * deterministic byte downsample so the operator stays total. Batch per
    * partition; output schema is fixed and typed so a downstream writer can
    * bucket by (width, height).
    */
  def resize(withBinary: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    val enc = Encoders.product[ResizedMedia]
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val src =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val bytes = PixelCodec.decode(src) match {
            case Some(m) if m.kind != "wav" =>
              val rs = PixelCodec.resizeNearest(m, w, h)
              PixelCodec.encodePng(w, h, rs.channels,
                rs.values.map(v => (v & 0xff).toByte))
            case _ if src.isEmpty =>
              // empty/null payload: nothing to downsample — stays total
              Array.emptyByteArray
            case _ =>
              val n = math.max(1, math.min(w * h / 64, 4096))
              Array.tabulate(n)(i => src(i % src.length))
          }
          ResizedMedia(r.getLong(0), w, h, bytes)
        }
      }(enc)
  }

  /** One frame record per sampled frame of a payload. */
  final case class Frame(docId: Long, frameIdx: Int, payload: Array[Byte])

  /** Frame sampling: every `stride`-th frame, exploded to one row per frame
    * — `flatMap` per partition, so a long payload becomes rows without ever
    * materializing all frames in memory at once. Frames are fixed 256-byte
    * blocks of the raw payload (a real video demux would slot in here; no
    * video container format is decodable without media libraries).
    */
  def sampleFrames(withBinary: DataFrame, stride: Int): Dataset[Frame] = {
    val enc = Encoders.product[Frame]
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          bytes.grouped(256).zipWithIndex.collect {
            case (f, i) if i % stride == 0 => Frame(id, i, f)
          }
        }
      }(enc)
  }
}
