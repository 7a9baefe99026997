package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (Web ARChive, ISO 28500) source/sink — the interchange format of
  * web-crawl corpora, the canonical 100 TB training-data input (Common
  * Crawl ships ~64k gzip'd WARC files per monthly snapshot).
  *
  * Scale shape mirrors how crawl archives are actually processed: each
  * `.warc.gz` member is a non-splittable unit, so parallelism is
  * file-granular — one task per archive file, tens of thousands of files
  * per snapshot. The writer emits one archive per input partition
  * (`numFiles` bounds archive size the same way OrcSink's numMappers knob
  * bounds stripe files); the reader lists the directory through Spark's
  * `binaryFile` source (distributed listing, one row per file) and parses
  * records in parallel per file. Per-task memory is bounded by the largest
  * single archive, so size archives to O(100 MB)–O(1 GB) like Common
  * Crawl does — NOT by total corpus size.
  *
  * Parsing is Content-Length-driven (the WARC framing rule), never
  * split-on-marker: a payload containing the literal bytes `WARC/1.0`
  * round-trips correctly.
  *
  * The reference's extract surface is JDBC/CSV/ORC (sqoop_etl.py); WARC is
  * the north-star ingest format a training-data pipeline adds on top.
  */
object Warc {

  /** One parsed WARC `resource` record. */
  final case class WarcDoc(doc_id: Long, lang: String, source: String, text: String)

  private val CRLF = "\r\n"

  /** Serialize one record: WARC/1.0 header block + Content-Length payload.
    * Package-visible so PropertySpec can round-trip it against [[parse]].
    */
  private[graft] def record(doc: WarcDoc): Array[Byte] = {
    val payload = doc.text.getBytes(UTF_8)
    val header =
      s"""WARC/1.0${CRLF}WARC-Type: resource${CRLF}WARC-Record-ID: <urn:graft:doc:${doc.doc_id}>${CRLF}WARC-Target-URI: urn:graft:${doc.source}:${doc.doc_id}${CRLF}WARC-Graft-Lang: ${doc.lang}${CRLF}WARC-Graft-Source: ${doc.source}${CRLF}Content-Type: text/plain${CRLF}Content-Length: ${payload.length}${CRLF}${CRLF}"""
    val out = new ByteArrayOutputStream(header.length + payload.length + 4)
    out.write(header.getBytes(UTF_8))
    out.write(payload)
    out.write(s"${CRLF}${CRLF}".getBytes(UTF_8))
    out.toByteArray
  }

  /** Write `docs` (doc_id, lang, source, text) as `numFiles` WARC archives
    * under `path` — gzip'd whole-file members when `gzip` (the Common
    * Crawl layout; trades splittability for the ~5× text compression that
    * makes crawl-scale storage viable).
    */
  def write(docs: DataFrame, path: String, numFiles: Int,
      gzip: Boolean = true): Unit = {
    import docs.sparkSession.implicits._
    val ds = docs.select(col("doc_id").cast("long"), col("lang"),
      col("source"), col("text")).as[WarcDoc]
    val dir = path
    ds.repartition(numFiles).foreachPartition { it: Iterator[WarcDoc] =>
      val pid = TaskContext.getPartitionId()
      val suffix = if (gzip) ".warc.gz" else ".warc"
      val p = new Path(f"$dir/part-$pid%05d$suffix")
      // executor-local conf: local/default FS resolution, same as any
      // Hadoop output committer's task-side writes
      val fs = p.getFileSystem(new Configuration())
      val raw = fs.create(p, true)
      val out = if (gzip) new GZIPOutputStream(raw, 64 * 1024) else raw
      try it.foreach(d => out.write(record(d)))
      finally out.close()
    }
  }

  /** Parse one archive's bytes into records. Content-Length framing:
    * header lines to the first empty line, `Content-Length` bytes of
    * payload, CRLF CRLF separator, repeat.
    */
  def parse(bytes: Array[Byte]): Iterator[WarcDoc] =
    new Iterator[WarcDoc] {
      private var pos = 0
      private def more(): Boolean = {
        // skip inter-record CRLFs; a well-formed archive ends after them
        while (pos < bytes.length &&
            (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        pos < bytes.length
      }
      def hasNext: Boolean = more()
      def next(): WarcDoc = {
        if (!more()) throw new NoSuchElementException
        // header block: lines until the empty line
        var headerEnd = pos
        while (!(bytes(headerEnd) == '\r' && bytes(headerEnd + 1) == '\n' &&
            bytes(headerEnd + 2) == '\r' && bytes(headerEnd + 3) == '\n'))
          headerEnd += 1
        val header = new String(bytes, pos, headerEnd - pos, UTF_8)
        val fields = header.split("\r\n").iterator.collect {
          case l if l.contains(": ") =>
            val i = l.indexOf(": "); l.substring(0, i) -> l.substring(i + 2)
        }.toMap
        require(header.startsWith("WARC/1.0"), s"bad record at $pos")
        val len = fields("Content-Length").toInt
        val payloadStart = headerEnd + 4
        val text = new String(bytes, payloadStart, len, UTF_8)
        pos = payloadStart + len
        val id = fields("WARC-Record-ID")
          .stripPrefix("<urn:graft:doc:").stripSuffix(">").toLong
        WarcDoc(id, fields("WARC-Graft-Lang"), fields("WARC-Graft-Source"), text)
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

  /** Read a directory of WARC archives → (doc_id, lang, source, text).
    * One task per archive file (binaryFile listing is distributed; Spark
    * packs many small files per task via maxPartitionBytes bin-packing).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, content) =>
        parse(if (p.endsWith(".gz")) gunzip(content) else content)
      }
      .toDF()
  }
}
