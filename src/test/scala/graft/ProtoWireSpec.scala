package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.ProtoWire

class ProtoWireSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("b", BooleanType),
    StructField("s", StringType)))

  test("wire round-trip: all supported types, negatives, unicode, -0.0") {
    import spark.implicits._
    val df = Seq(
      (1L, 7, 3.5, true, "plain"),
      (-2L, -7, -0.0, false, "éü中文 😀"),
      (Long.MaxValue, Int.MinValue, Double.MinPositiveValue, true, ""),
      (Long.MinValue, 0, Double.NaN, false, "x" * 300)
    ).toDF("k", "i", "d", "b", "s")
    val tmp = java.nio.file.Files.createTempDirectory("proto-t1").toString
    ProtoWire.write(df, s"$tmp/p", numFiles = 2)
    val back = ProtoWire.read(spark, s"$tmp/p", df.schema)
    // NaN != NaN under ===; compare through bit patterns for doubles
    def canon(r: Row): (Long, Int, Long, Boolean, String) =
      (r.getLong(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        r.getBoolean(3), r.getString(4))
    assert(back.orderBy("k").collect().toSeq.map(canon) ===
      df.orderBy("k").collect().toSeq.map(canon))
    assert(back.schema === df.schema)
    // container magic: gzip members start with 1f 8b
    val f = new java.io.File(s"$tmp/p").listFiles()
      .filter(_.getName.endsWith(".pb.gz")).head
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(2)
    assert(head.toSeq === Seq(0x1f.toByte, 0x8b.toByte))
  }

  test("zigzag keeps small negatives small on the wire") {
    assert(ProtoWire.zigzag(0L) === 0L)
    assert(ProtoWire.zigzag(-1L) === 1L)
    assert(ProtoWire.zigzag(1L) === 2L)
    assert(ProtoWire.zigzag(Long.MinValue) === -1L) // all bits set, 10 bytes
    for (n <- Seq(0L, -1L, 1L, 63L, -64L, Long.MaxValue, Long.MinValue))
      assert(ProtoWire.unzigzag(ProtoWire.zigzag(n)) === n)
    // a small negative must cost 1 varint byte, not 10
    val out = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out, ProtoWire.zigzag(-1L))
    assert(out.size === 1)
  }

  test("proto3 presence: nulls omitted on the wire, decode to defaults") {
    val row = Row(null, null, null, null, null)
    val msg = ProtoWire.encodeMessage(row, schema)
    assert(msg.isEmpty) // nothing emitted for an all-null row
    val back = ProtoWire.decodeMessage(msg, schema)
    assert(back === Row(0L, 0, 0.0, false, ""))
  }

  test("forward compatibility: unknown fields skipped by wire type") {
    // writer has extra fields of every wire type beyond the reader schema
    val wide = StructType(schema.fields ++ Seq(
      StructField("extra_v", LongType),    // varint
      StructField("extra_f", DoubleType),  // fixed64
      StructField("extra_s", StringType))) // length-delimited
    val msg = ProtoWire.encodeMessage(
      Row(5L, 6, 7.5, true, "keep", -99L, 2.25, "dropped"), wide)
    val back = ProtoWire.decodeMessage(msg, schema)
    assert(back === Row(5L, 6, 7.5, true, "keep"))
  }

  test("backward compatibility: fields the writer never emitted default") {
    val narrow = StructType(schema.fields.take(2))
    val msg = ProtoWire.encodeMessage(Row(5L, 6), narrow)
    val back = ProtoWire.decodeMessage(msg, schema)
    assert(back === Row(5L, 6, 0.0, false, ""))
  }

  test("repeated fields: packed numerics and per-element strings round-trip") {
    val rs = StructType(Seq(
      StructField("k", LongType),
      StructField("ls", ArrayType(LongType)),
      StructField("fs", ArrayType(FloatType)),
      StructField("ss", ArrayType(StringType))))
    val row = Row(7L, Seq(-1L, 0L, Long.MaxValue), Seq(1.5f, -0.0f, Float.NaN),
      Seq("a", "", "中文"))
    val back = ProtoWire.decodeMessage(ProtoWire.encodeMessage(row, rs), rs)
    assert(back.getLong(0) === 7L)
    assert(back.getSeq[Long](1) === Seq(-1L, 0L, Long.MaxValue))
    val fs = back.getSeq[Float](2)
    assert(fs.length === 3 && fs(0) === 1.5f &&
      java.lang.Float.floatToIntBits(fs(1)) ===
        java.lang.Float.floatToIntBits(-0.0f) && fs(2).isNaN)
    assert(back.getSeq[String](3) === Seq("a", "", "中文"))
    // empty arrays decode to empty (proto3 default), not null
    val empty = ProtoWire.decodeMessage(
      ProtoWire.encodeMessage(Row(1L, Seq(), Seq(), Seq()), rs), rs)
    assert(empty === Row(1L, Seq(), Seq(), Seq()))
  }

  test("repeated numerics: decoder accepts unpacked per-element occurrences") {
    val rs = StructType(Seq(StructField("ls", ArrayType(LongType))))
    // hand-encode three unpacked occurrences of field 1 (wire 0 varint)
    val out = new java.io.ByteArrayOutputStream()
    for (v <- Seq(5L, -6L, 7L)) {
      ProtoWire.writeVarint(out, (1L << 3) | 0)
      ProtoWire.writeVarint(out, ProtoWire.zigzag(v))
    }
    val back = ProtoWire.decodeMessage(out.toByteArray, rs)
    assert(back.getSeq[Long](0) === Seq(5L, -6L, 7L))
  }

  test("embedding vectors survive the wire bit-for-bit through Spark") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.1f, -2.5f, 3e-8f)),
      (2L, Array[Float]()),
      (3L, Array(Float.MinPositiveValue, 1e30f))
    ).toDF("vec_id", "vec")
    val tmp = java.nio.file.Files.createTempDirectory("proto-vec").toString
    ProtoWire.write(df, s"$tmp/v", numFiles = 2)
    val back = ProtoWire.read(spark, s"$tmp/v", df.schema)
      .orderBy("vec_id").collect()
    val want = df.orderBy("vec_id").collect()
    assert(back.length === want.length)
    back.zip(want).foreach { case (b, w) =>
      assert(b.getLong(0) === w.getLong(0))
      assert(b.getSeq[Float](1).map(java.lang.Float.floatToIntBits) ===
        w.getSeq[Float](1).map(java.lang.Float.floatToIntBits))
    }
  }

  test("truncated container fails loudly, not silently") {
    val msg = ProtoWire.encodeMessage(Row(1L, 2, 3.0, true, "abcdef"), schema)
    val framed = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarint(out, msg.length.toLong)
      out.write(msg); out.toByteArray
    }
    val cut = framed.take(framed.length - 3)
    intercept[Exception] {
      ProtoWire.parse(cut, schema).toVector
    }
  }

  test("unsupported column type fails loudly, not silently") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1))).toDF("k", "m")
    intercept[IllegalArgumentException] {
      ProtoWire.write(df, "/tmp/proto-unsupported", numFiles = 1)
    }
  }
}
