package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Protobuf wire-format source/sink — schema-driven encode/decode of the
  * standard protobuf encoding (varint / zigzag / fixed64 /
  * length-delimited), with records framed as a length-delimited stream
  * (each message prefixed by its varint byte length, the
  * `writeDelimitedTo` convention). This is the row-interchange format of
  * RPC-fed ingestion pipelines, completing the alternate-format surface
  * (SURVEY §2.1 S10) alongside ORC/parquet/CSV/JSONL/SequenceFile/WARC/
  * Avro — built directly on the public wire spec, no protobuf runtime
  * needed.
  *
  * Field numbers are positional: StructType field i ↔ proto field i+1.
  * Wire mapping: Long/Int/Boolean → varint (zigzag for the integer types,
  * so negatives stay small); Double → fixed64 (little-endian IEEE-754);
  * Float → fixed32; String/Binary → length-delimited. Repeated fields:
  * Array[Long/Int/Float/Double] writes one PACKED length-delimited payload
  * (the proto3 default for numeric repeateds — 1 tag for n elements, the
  * layout that makes embedding vectors cheap on the wire) and the decoder
  * also accepts unpacked per-element occurrences, per the spec's decoder
  * rule; Array[String] is one length-delimited occurrence per element.
  * Proto3 semantics hold end to end:
  * null values are OMITTED on the wire and decode to the proto3 default
  * (0 / 0.0 / false / "" / empty bytes); unknown field numbers are
  * SKIPPED by wire type, so a reader with an older schema tolerates a
  * writer with a newer one (forward compatibility), and a reader with a
  * newer schema defaults fields an older writer never emitted (backward
  * compatibility). Both directions are exercised in ProtoWireSpec.
  *
  * Scale shape matches the WARC/Avro paths: one gzip'd container per
  * input partition (non-splittable member, file-granular parallelism —
  * at ingest scale file count >> executor count), distributed `binaryFile`
  * listing on read, per-task memory bounded by the largest single
  * container.
  */
object ProtoWire {

  private val WireVarint = 0
  private val WireFixed64 = 1
  private val WireLenDelim = 2
  private val WireFixed32 = 5

  private def wireTypeOf(dt: DataType): Int = dt match {
    case LongType | IntegerType | BooleanType => WireVarint
    case DoubleType => WireFixed64
    case FloatType => WireFixed32
    case StringType | BinaryType => WireLenDelim
    // repeated fields arrive length-delimited: packed payloads for numeric
    // element types, one len-delim occurrence per element for strings
    case ArrayType(LongType | IntegerType | FloatType | DoubleType, _) =>
      WireLenDelim
    case ArrayType(StringType, _) => WireLenDelim
    case t => throw new IllegalArgumentException(s"unsupported: $t")
  }

  // ---- primitive wire codecs -------------------------------------------

  private[graft] def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7f)
  }

  private[graft] def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  private[graft] def unzigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private def readVarint(in: InputStream): Long = {
    var shift = 0
    var acc = 0L
    while (shift < 64) {
      val b = in.read()
      if (b < 0) throw new EOFException("varint truncated")
      acc |= (b.toLong & 0x7f) << shift
      if ((b & 0x80) == 0) return acc
      shift += 7
    }
    throw new IllegalArgumentException("varint longer than 10 bytes")
  }

  /** Returns -1 at a clean end-of-stream (between messages), else the
    * varint — frame boundaries are the only place EOF is legal.
    */
  private def readVarintOrEof(in: InputStream): Long = {
    val first = in.read()
    if (first < 0) return -1L
    var acc = first.toLong & 0x7f
    if ((first & 0x80) == 0) return acc
    var shift = 7
    while (shift < 64) {
      val b = in.read()
      if (b < 0) throw new EOFException("varint truncated")
      acc |= (b.toLong & 0x7f) << shift
      if ((b & 0x80) == 0) return acc
      shift += 7
    }
    throw new IllegalArgumentException("varint longer than 10 bytes")
  }

  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeFixed32(out: ByteArrayOutputStream, bits: Int): Unit = {
    var i = 0
    while (i < 4) { out.write((bits >>> (8 * i)) & 0xff); i += 1 }
  }

  private def readFixed32(in: InputStream): Int = {
    var acc = 0
    var i = 0
    while (i < 4) {
      val b = in.read()
      if (b < 0) throw new EOFException("fixed32 truncated")
      acc |= (b & 0xff) << (8 * i)
      i += 1
    }
    acc
  }

  private def readFixed64(in: InputStream): Long = {
    var acc = 0L
    var i = 0
    while (i < 8) {
      val b = in.read()
      if (b < 0) throw new EOFException("fixed64 truncated")
      acc |= (b.toLong & 0xff) << (8 * i)
      i += 1
    }
    acc
  }

  private def readNBytes(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException("length-delimited field truncated")
      off += r
    }
    buf
  }

  // ---- message codec ----------------------------------------------------

  /** Encode one row as a protobuf message (no length prefix). Null fields
    * are omitted — proto3 presence semantics.
    */
  private[graft] def encodeMessage(row: Row, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val f = schema(i)
        val key = ((i + 1).toLong << 3) | wireTypeOf(f.dataType)
        f.dataType match {
          case LongType =>
            writeVarint(out, key); writeVarint(out, zigzag(row.getLong(i)))
          case IntegerType =>
            writeVarint(out, key); writeVarint(out, zigzag(row.getInt(i).toLong))
          case BooleanType =>
            writeVarint(out, key)
            writeVarint(out, if (row.getBoolean(i)) 1L else 0L)
          case DoubleType =>
            writeVarint(out, key)
            writeFixed64(out, java.lang.Double.doubleToLongBits(row.getDouble(i)))
          case FloatType =>
            writeVarint(out, key)
            writeFixed32(out, java.lang.Float.floatToIntBits(row.getFloat(i)))
          case StringType =>
            val b = row.getString(i).getBytes(UTF_8)
            writeVarint(out, key); writeVarint(out, b.length.toLong); out.write(b)
          case BinaryType =>
            val b = row.getAs[Array[Byte]](i)
            writeVarint(out, key); writeVarint(out, b.length.toLong); out.write(b)
          case ArrayType(et, _) =>
            val xs = row.getSeq[Any](i)
            et match {
              case StringType => // repeated len-delim, one occurrence each
                xs.foreach { x =>
                  val b = x.asInstanceOf[String].getBytes(UTF_8)
                  writeVarint(out, key); writeVarint(out, b.length.toLong)
                  out.write(b)
                }
              case _ => // packed payload in one len-delim field
                val packed = new ByteArrayOutputStream(xs.length * 4)
                et match {
                  case LongType =>
                    xs.foreach(x => writeVarint(packed, zigzag(x.asInstanceOf[Long])))
                  case IntegerType =>
                    xs.foreach(x => writeVarint(packed, zigzag(x.asInstanceOf[Int].toLong)))
                  case FloatType =>
                    xs.foreach(x => writeFixed32(packed,
                      java.lang.Float.floatToIntBits(x.asInstanceOf[Float])))
                  case DoubleType =>
                    xs.foreach(x => writeFixed64(packed,
                      java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])))
                  case t => throw new IllegalArgumentException(s"unsupported: $t")
                }
                val b = packed.toByteArray
                writeVarint(out, key); writeVarint(out, b.length.toLong)
                out.write(b)
            }
          case t => throw new IllegalArgumentException(s"unsupported: $t")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  private def proto3Default(dt: DataType): Any = dt match {
    case LongType => 0L
    case IntegerType => 0
    case BooleanType => false
    case DoubleType => 0.0
    case FloatType => 0.0f
    case StringType => ""
    case BinaryType => Array.emptyByteArray
    case ArrayType(_, _) => Seq.empty[Any]
    case t => throw new IllegalArgumentException(s"unsupported: $t")
  }

  /** Decode one message against `schema`. Unknown field numbers are
    * skipped by wire type; fields absent from the wire get proto3
    * defaults.
    */
  private[graft] def decodeMessage(bytes: Array[Byte], schema: StructType): Row = {
    val in = new ByteArrayInputStream(bytes)
    val vals = Array.tabulate[Any](schema.length)(i => proto3Default(schema(i).dataType))
    var key = readVarintOrEof(in)
    while (key >= 0) {
      val fieldNo = (key >>> 3).toInt
      val wire = (key & 7).toInt
      val slot = fieldNo - 1
      // repeated numeric fields also accept unpacked scalar occurrences
      // (wire 0/5/1 per element), per the proto spec's decoder rule
      val matches = slot >= 0 && slot < schema.length &&
        (wireTypeOf(schema(slot).dataType) == wire ||
          (schema(slot).dataType match {
            case ArrayType(LongType | IntegerType, _) => wire == WireVarint
            case ArrayType(FloatType, _) => wire == WireFixed32
            case ArrayType(DoubleType, _) => wire == WireFixed64
            case _ => false
          }))
      if (matches) {
        schema(slot).dataType match {
          case LongType => vals(slot) = unzigzag(readVarint(in))
          case IntegerType => vals(slot) = unzigzag(readVarint(in)).toInt
          case BooleanType => vals(slot) = readVarint(in) != 0L
          case DoubleType =>
            vals(slot) = java.lang.Double.longBitsToDouble(readFixed64(in))
          case FloatType =>
            vals(slot) = java.lang.Float.intBitsToFloat(readFixed32(in))
          case StringType =>
            vals(slot) = new String(readNBytes(in, readVarint(in).toInt), UTF_8)
          case BinaryType => vals(slot) = readNBytes(in, readVarint(in).toInt)
          case ArrayType(et, _) =>
            // repeated slots accumulate into a builder during the parse
            // (converted to Seq once, at the end) — appending to an
            // immutable Seq per occurrence would be quadratic for long
            // unpacked runs
            val buf = vals(slot) match {
              case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] => b
              case _ =>
                val b = scala.collection.mutable.ArrayBuffer[Any]()
                vals(slot) = b
                b
            }
            et match {
              case StringType =>
                buf += new String(readNBytes(in, readVarint(in).toInt), UTF_8)
              case LongType if wire == WireVarint => buf += unzigzag(readVarint(in))
              case IntegerType if wire == WireVarint =>
                buf += unzigzag(readVarint(in)).toInt
              case FloatType if wire == WireFixed32 =>
                buf += java.lang.Float.intBitsToFloat(readFixed32(in))
              case DoubleType if wire == WireFixed64 =>
                buf += java.lang.Double.longBitsToDouble(readFixed64(in))
              case _ => // packed payload: element encodings until exhausted
                val payload = readNBytes(in, readVarint(in).toInt)
                val pin = new ByteArrayInputStream(payload)
                et match {
                  case LongType =>
                    while (pin.available() > 0) buf += unzigzag(readVarint(pin))
                  case IntegerType =>
                    while (pin.available() > 0) buf += unzigzag(readVarint(pin)).toInt
                  case FloatType =>
                    while (pin.available() > 0)
                      buf += java.lang.Float.intBitsToFloat(readFixed32(pin))
                  case DoubleType =>
                    while (pin.available() > 0)
                      buf += java.lang.Double.longBitsToDouble(readFixed64(pin))
                  case t =>
                    throw new IllegalArgumentException(s"unsupported: $t")
                }
            }
          case t => throw new IllegalArgumentException(s"unsupported: $t")
        }
      } else wire match { // unknown or re-typed field: skip by wire type
        case WireVarint => readVarint(in)
        case WireFixed64 => readFixed64(in)
        case WireLenDelim => readNBytes(in, readVarint(in).toInt)
        case WireFixed32 => readNBytes(in, 4)
        case w => throw new IllegalArgumentException(s"bad wire type $w")
      }
      key = readVarintOrEof(in)
    }
    Row.fromSeq(vals.toIndexedSeq.map {
      case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] => b.toSeq
      case v => v
    })
  }

  // ---- container source/sink ---------------------------------------------

  /** Write `df` as `numFiles` length-delimited protobuf containers
    * (gzip'd whole-file members when `gzip`).
    */
  def write(df: DataFrame, path: String, numFiles: Int,
      gzip: Boolean = true): Unit = {
    val schema = df.schema
    schema.fields.foreach(f => wireTypeOf(f.dataType)) // fail on the driver
    df.repartition(numFiles).foreachPartition { rows: Iterator[Row] =>
      val suffix = if (gzip) ".pb.gz" else ".pb"
      val p = new Path(f"$path/part-${TaskContext.getPartitionId()}%05d$suffix")
      val fs = p.getFileSystem(new Configuration())
      val raw = fs.create(p, true)
      val out = if (gzip) new GZIPOutputStream(raw, 64 * 1024) else raw
      try {
        val frame = new ByteArrayOutputStream(16)
        rows.foreach { r =>
          val msg = encodeMessage(r, schema)
          frame.reset()
          writeVarint(frame, msg.length.toLong)
          out.write(frame.toByteArray)
          out.write(msg)
        }
      } finally out.close()
    }
  }

  /** Parse one container's bytes into rows of `schema`. */
  private[graft] def parse(bytes: Array[Byte], schema: StructType): Iterator[Row] =
    new Iterator[Row] {
      private val in = new ByteArrayInputStream(bytes)
      private var nextLen = readVarintOrEof(in)
      def hasNext: Boolean = nextLen >= 0
      def next(): Row = {
        if (nextLen < 0) throw new NoSuchElementException
        val row = decodeMessage(readNBytes(in, nextLen.toInt), schema)
        nextLen = readVarintOrEof(in)
        row
      }
    }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def decodeFiles(files: DataFrame, schema: StructType): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    import files.sparkSession.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, content) =>
        parse(if (p.endsWith(".gz")) gunzip(content) else content, schema)
      }(encoder)
  }

  /** Read a directory of protobuf containers with an explicit expected
    * schema (no inference — the S7/S10 discipline). One task per file.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    decodeFiles(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb*")
      .option("recursiveFileLookup", "true").load(path), schema)

  /** Continuous ingest: the same containers as a STREAMING source — each
    * newly-landed archive becomes a micro-batch (the binaryFile file
    * source tracks processed files in the checkpoint, so a restart never
    * re-ingests). This is the RPC-feed shape: producers drop sealed
    * containers into the landing dir; decode is the identical map-only
    * path as the batch reader.
    */
  def readStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    // streaming file sources require the source schema up front; the
    // binaryFile layout is fixed by the format
    val fileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    decodeFiles(spark.readStream.format("binaryFile").schema(fileSchema)
      .option("pathGlobFilter", "*.pb*")
      .option("recursiveFileLookup", "true").load(path), schema)
  }
}
