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

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual fingerprint: integer luma (299r+587g+114b)/1000 per pixel,
    * nearest-neighbor resample onto a 9×8 grid (the same floor index map
    * as [[PixelCodec.resizeNearest]]), bit `y*8+x` set iff
    * `gray(x,y) > gray(x+1,y)`. Pure integer arithmetic — bit-exact on any
    * engine, so an oracle can replay it from pixel formulas.
    */
  def dHash64(m: PixelCodec.Media): Long = {
    val gray = new Array[Int](9 * 8)
    var y = 0
    while (y < 8) {
      val sy = (y.toLong * m.height / 8).toInt
      var x = 0
      while (x < 9) {
        val sx = (x.toLong * m.width / 9).toInt
        val base = (sy * m.width + sx) * m.channels
        gray(y * 9 + x) =
          if (m.channels >= 3)
            (299 * m.values(base) + 587 * m.values(base + 1) +
              114 * m.values(base + 2)) / 1000
          else m.values(base)
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      val (by, bx) = (b / 8, b % 8)
      if (gray(by * 9 + bx) > gray(by * 9 + bx + 1)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Per-document dHash signatures `(doc_id, sig)` over the binary column
    * — map-only decode + hash, 16-byte output rows; feed
    * [[graft.dedup.Dedup.hammingPairs]] for perceptual near-dup pairs
    * (visual twin of text SimHash, same quarter-blocking join). Audio and
    * undecodable payloads are dropped (an image operator, not a total
    * one — callers union other modalities explicitly).
    */
  def imageDhash(withBinary: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          PixelCodec.decode(bytes) match {
            case Some(m) if m.kind != "wav" =>
              Some(org.apache.spark.sql.Row(r.getLong(0), dHash64(m)))
            case _ => None
          }
        }
      }(enc)
  }

  /** Shot-boundary detection over demuxed video frames: consecutive-frame
    * pixel delta Σ|Δv| (sum of absolute channel differences), a cut
    * wherever the delta exceeds `threshold`, contiguous frames between
    * cuts becoming one shot row — the scene segmentation a video-curation
    * pipeline runs before sampling keyframes per shot. `entry_diff` is the
    * boundary's delta (0 for the first shot), integer-exact. Map-only:
    * each video's frames decode and diff inside one task; only shot rows
    * shuffle. Frame-count mismatches never occur because frames of one
    * payload decode in one place — no cross-frame shuffle to misalign.
    * Non-GIF payloads emit no rows.
    */
  def shotBoundaries(withBinary: DataFrame, threshold: Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("shot_idx", IntegerType, nullable = false),
      StructField("start_frame", IntegerType, nullable = false),
      StructField("end_frame", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("entry_diff", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val gif =
            if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
              bytes(2) == 'F' && bytes(3) == '8')
              PixelCodec.decodeGifFrames(bytes)
            else None
          gif match {
            case Some(frames) =>
              val shots = Seq.newBuilder[org.apache.spark.sql.Row]
              var shotStart = 0; var shotIdx = 0; var entryDiff = 0L
              var f = 1
              while (f <= frames.length) {
                val diff = if (f < frames.length) {
                  val a = frames(f - 1).values; val b = frames(f).values
                  if (a.length != b.length) Long.MaxValue // dims changed: cut
                  else {
                    var d = 0L; var i = 0
                    while (i < a.length) { d += math.abs(a(i) - b(i)); i += 1 }
                    d
                  }
                } else Long.MaxValue // end of video closes the last shot
                if (diff > threshold) {
                  shots += org.apache.spark.sql.Row(id, shotIdx, shotStart,
                    f - 1, f - shotStart, entryDiff)
                  shotIdx += 1; shotStart = f
                  if (f < frames.length) entryDiff = diff
                }
                f += 1
              }
              shots.result()
            case None => Nil
          }
        }
      }(enc)
  }

  /** Cross-video near-dup detection by keyframe overlap: fingerprint every
    * demuxed frame (SHA-256 of its canonical re-encoded bytes — equal
    * frames hash equal because the PNG re-encode is deterministic), then
    * pair documents sharing at least one frame via an equality join on the
    * fingerprint — the banded-join discipline of MinHash LSH, never
    * all-pairs. Shuffle rows are (doc_id, 32-byte sha): no pixel data moves
    * after the map-side fingerprint. A frame shared by k documents yields
    * k² pairs, so callers cap pathological stop-frames (intros, black
    * frames) upstream the same way `maxDocsPerAnchor` caps stop-grams in
    * exact-substring dedup.
    */
  def keyframeOverlap(frames: Dataset[Frame]): DataFrame = {
    val fps = frames.toDF()
      .select(col("docId").as("doc_id"), sha2(col("payload"), 256).as("frame_sha"))
      .distinct()
    fps.as("a").join(fps.as("b"), "frame_sha")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).cast("long").as("shared_frames"))
  }

  /** Integer-exact audio features over decoded WAV PCM — the
    * oracle-checkable acoustic profile of an audio payload: sample count,
    * energy Σs², peak |s|, zero-crossing count (strict sign flips), and
    * raw autocorrelation Σ s·s₊ₗ at lags 1/2/4 (the periodicity signal a
    * pitch/voicing filter keys on). All longs, no floats — bit-exact on any
    * engine. Non-WAV payloads yield a zeroed row (total function). Same
    * map-only partition shape as [[extractFeatures]].
    */
  def audioStats(withBinary: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false),
      StructField("ac_lag1", LongType, nullable = false),
      StructField("ac_lag2", LongType, nullable = false),
      StructField("ac_lag4", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          PixelCodec.decode(bytes) match {
            case Some(m) if m.kind == "wav" =>
              val s = m.values
              var energy = 0L; var peak = 0L; var zc = 0L
              var ac1 = 0L; var ac2 = 0L; var ac4 = 0L
              var i = 0
              while (i < s.length) {
                val v = s(i).toLong
                energy += v * v
                val a = math.abs(v); if (a > peak) peak = a
                if (i >= 1) {
                  if (s(i - 1).toLong * v < 0) zc += 1
                  ac1 += s(i - 1).toLong * v
                }
                if (i >= 2) ac2 += s(i - 2).toLong * v
                if (i >= 4) ac4 += s(i - 4).toLong * v
                i += 1
              }
              org.apache.spark.sql.Row(id, m.width, s.length.toLong, energy,
                peak, zc, ac1, ac2, ac4)
            case _ =>
              org.apache.spark.sql.Row(id, 0, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }(enc)
  }

  /** Image sharpness / brightness profile — the focus-measure filter of an
    * image-quality pipeline: integer luma per pixel, then the discrete
    * Laplacian `4g − g↑ − g↓ − g← − g→` over interior pixels. Emits exact
    * integer sums (`lap_sq_sum` is the variance-of-Laplacian numerator:
    * blurry images score low, sharp edges high; `gray_sum` the brightness
    * numerator) so thresholds divide downstream and any engine replays the
    * arithmetic bit-for-bit. Map-only decode + fold; one row per decodable
    * image, audio and undecodable payloads emit none.
    */
  def imageSharpness(withBinary: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("gray_sum", LongType, nullable = false),
      StructField("n_interior", LongType, nullable = false),
      StructField("lap_sum", LongType, nullable = false),
      StructField("lap_sq_sum", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          PixelCodec.decode(bytes) match {
            case Some(m) if m.kind != "wav" =>
              val (w, h, c) = (m.width, m.height, m.channels)
              val gray = new Array[Int](w * h)
              var p = 0
              while (p < w * h) {
                gray(p) =
                  if (c >= 3) (299 * m.values(p * c) + 587 * m.values(p * c + 1) +
                    114 * m.values(p * c + 2)) / 1000
                  else m.values(p * c)
                p += 1
              }
              var graySum = 0L; var lapSum = 0L; var lapSq = 0L
              var nInt = 0L
              p = 0
              while (p < w * h) { graySum += gray(p); p += 1 }
              var y = 1
              while (y < h - 1) {
                var x = 1
                while (x < w - 1) {
                  val l = 4 * gray(y * w + x) - gray(y * w + x - 1) -
                    gray(y * w + x + 1) - gray((y - 1) * w + x) -
                    gray((y + 1) * w + x)
                  lapSum += l; lapSq += l.toLong * l; nInt += 1
                  x += 1
                }
                y += 1
              }
              Some(org.apache.spark.sql.Row(r.getLong(0), w, h,
                (w * h).toLong, graySum, nInt, lapSum, lapSq))
            case _ => None
          }
        }
      }(enc)
  }

  /** Silence-aware audio segmentation over decoded WAV PCM: samples are
    * grouped into fixed `blockLen` blocks, a block is "speech" when its
    * energy Σs² meets `energyThreshold`, and contiguous speech blocks
    * become one segment row — the gaps-and-islands pass that turns raw
    * audio into trainable utterance spans. Integer-exact (energies and
    * bounds are longs/ints), map-only per partition: a document's segments
    * are computed inside one task, nothing shuffles but the emitted
    * segment rows. Non-WAV payloads emit no rows.
    */
  def audioSegments(withBinary: DataFrame, blockLen: Int,
      energyThreshold: Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("seg_idx", IntegerType, nullable = false),
      StructField("start_block", IntegerType, nullable = false),
      StructField("end_block", IntegerType, nullable = false),
      StructField("n_blocks", IntegerType, nullable = false),
      StructField("seg_energy", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          PixelCodec.decode(bytes) match {
            case Some(m) if m.kind == "wav" =>
              val s = m.values
              val nb = s.length / blockLen // trailing partial block dropped
              val segs = Seq.newBuilder[org.apache.spark.sql.Row]
              var segStart = -1; var segEnergy = 0L; var segIdx = 0
              var b = 0
              while (b <= nb) {
                val energy = if (b < nb) {
                  var e = 0L; var j = b * blockLen
                  val end = j + blockLen
                  while (j < end) { e += s(j).toLong * s(j); j += 1 }
                  e
                } else -1L // sentinel block closes any open segment
                if (b < nb && energy >= energyThreshold) {
                  if (segStart < 0) { segStart = b; segEnergy = 0L }
                  segEnergy += energy
                } else if (segStart >= 0) {
                  segs += org.apache.spark.sql.Row(id, segIdx, segStart,
                    b - 1, b - segStart, segEnergy)
                  segIdx += 1; segStart = -1
                }
                b += 1
              }
              segs.result()
            case _ => Nil
          }
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
    * materializing all sampled frames of a partition at once.
    *
    * Animated GIF payloads get a REAL demux: each sampled frame is LZW
    * decoded + de-interlaced + palette-resolved by
    * [[PixelCodec.decodeGifFrames]] and re-encoded as a standalone PNG —
    * the shape a downstream vision model consumes. Payloads in any other
    * container fall back to fixed 256-byte blocks of the raw bytes (a demux
    * for closed formats like MP4 would slot in here), so the operator stays
    * total.
    */
  def sampleFrames(withBinary: DataFrame, stride: Int): Dataset[Frame] = {
    val enc = Encoders.product[Frame]
    withBinary.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val gif =
            if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
              bytes(2) == 'F' && bytes(3) == '8')
              PixelCodec.decodeGifFrames(bytes)
            else None
          gif match {
            case Some(frames) =>
              frames.iterator.zipWithIndex.collect {
                case (m, i) if i % stride == 0 =>
                  Frame(id, i, PixelCodec.encodePng(m.width, m.height,
                    m.channels, m.values.map(v => (v & 0xff).toByte)))
              }
            case None =>
              bytes.grouped(256).zipWithIndex.collect {
                case (f, i) if i % stride == 0 => Frame(id, i, f)
              }
          }
        }
      }(enc)
  }
}
