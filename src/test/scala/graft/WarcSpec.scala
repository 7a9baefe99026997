package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

class WarcSpec extends SparkSpec {

  private def adversarialDocs = {
    import spark.implicits._
    Seq(
      // payload containing the record marker itself + CRLFs + empty-line
      // framing bytes — survives because parsing is Content-Length-driven
      Warc.WarcDoc(1L, "en", "web", "WARC/1.0\r\n\r\nContent-Length: 99\r\nnot a header"),
      Warc.WarcDoc(2L, "de", "web", ""), // empty payload
      Warc.WarcDoc(3L, "fr", "books", "unicode éü中文 😀 end"),
      Warc.WarcDoc(4L, "en", "books", "plain text")
    ).toDS().toDF()
  }

  test("WARC round-trip: adversarial payloads, gzip") {
    val tmp = java.nio.file.Files.createTempDirectory("warc-t1").toString
    Warc.write(adversarialDocs, s"$tmp/w", numFiles = 2)
    val back = Warc.read(spark, s"$tmp/w")
    val a = adversarialDocs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(b === a)
    // layout: 2 gzip'd archives, Common Crawl-style
    val files = new java.io.File(s"$tmp/w").listFiles().map(_.getName)
      .filter(_.endsWith(".warc.gz"))
    assert(files.length === 2)
  }

  test("WARC round-trip: uncompressed, documents table") {
    val tmp = java.nio.file.Files.createTempDirectory("warc-t2").toString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    Warc.write(docs, s"$tmp/w", numFiles = 3, gzip = false)
    val back = Warc.read(spark, s"$tmp/w")
    assert(back.count() === docs.count())
    // order-free content equality: per-source xor of text hashes
    import org.apache.spark.sql.graftx.RollingHash.rolling_hash
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("source")
      .agg(expr("bit_xor(doc_id)").as("idx"),
        expr("bit_xor(fp)").as("tx"))
      .orderBy("source").collect().toSeq
    assert(fp(back.withColumn("fp", rolling_hash(col("text")))) ===
      fp(docs.withColumn("fp", rolling_hash(col("text")))))
  }

  test("WARC parse rejects a corrupt header") {
    val bogus = "HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
      .getBytes("UTF-8")
    intercept[IllegalArgumentException] {
      Warc.parse(bogus).toList
    }
  }
}
