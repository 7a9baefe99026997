package graft

import org.apache.spark.sql.functions._

import graft.sources.Avro

class AvroSpec extends SparkSpec {

  test("Avro container round-trip: all supported types, unicode strings") {
    import spark.implicits._
    val df = Seq(
      (1L, 7, 3.5, true, "plain"),
      (2L, -7, -0.0, false, "éü中文 😀"),
      (3L, 0, Double.MaxValue, true, "")
    ).toDF("k", "i", "d", "b", "s")
    val tmp = java.nio.file.Files.createTempDirectory("avro-t1").toString
    Avro.write(df, s"$tmp/a", numFiles = 2)
    val back = Avro.read(spark, s"$tmp/a", df.schema)
    assert(back.orderBy("k").collect().toSeq === df.orderBy("k").collect().toSeq)
    assert(back.schema === df.schema)
    // container magic: Avro OCF starts with Obj\x01
    val f = new java.io.File(s"$tmp/a").listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(4)
    assert(head.toSeq === Seq[Byte]('O', 'b', 'j', 1))
  }

  test("nullable columns encode as null-unions and round-trip nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, None),
      (3L, Some(""), Some(-1.0))
    ).toDF("k", "s", "d") // Option columns => nullable fields
    assert(df.schema("s").nullable && df.schema("d").nullable)
    val tmp = java.nio.file.Files.createTempDirectory("avro-t2").toString
    Avro.write(df, s"$tmp/n", numFiles = 1)
    val back = Avro.read(spark, s"$tmp/n", df.schema)
    assert(back.orderBy("k").collect().toSeq === df.orderBy("k").collect().toSeq)
    assert(back.filter(col("s").isNull && col("d").isNull).count() === 1L)
  }

  test("unsupported column type fails loudly, not silently") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("k", "arr")
    intercept[IllegalArgumentException] {
      Avro.write(df, "/tmp/avro-unsupported", numFiles = 1)
    }
  }
}
