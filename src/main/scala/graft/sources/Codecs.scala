package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream, OutputStream}

/** Stream codecs for shard-granular container formats ([[TarShards]],
  * [[Warc]], `Sources.jsonlZst*`). Two codecs matter for training-data
  * shards in practice: gzip (the `.warc.gz` / legacy crawl convention) and
  * zstandard (the modern corpus convention — `.jsonl.zst` is the de-facto
  * interchange format for large public text corpora, and `.tar.zst` its
  * WebDataset sibling). zstd decompresses several× faster than gzip at
  * better ratios, which at 100 TB is the difference between CPU-bound and
  * I/O-bound ingest; the JNI binding ships with Spark (zstd-jni, used by
  * Spark's own shuffle/event-log compression), so no new dependency.
  *
  * A compressed shard is a NON-SPLITTABLE unit either way — parallelism is
  * per-file, so writers size shards (O(100 MB)–O(1 GB)) rather than rely
  * on intra-file splits. The reference's extract surface is uncompressed
  * CSV/ORC over JDBC (sqoop_etl.py:31-53); shard codecs are the north-star
  * addition its Hadoop-era design predates.
  */
object Codecs {

  /** Codec names accepted by the shard writers. */
  val Names: Set[String] = Set("none", "gzip", "zstd")

  /** File suffix appended to a shard's base extension ("" for none). */
  def suffix(codec: String): String = codec match {
    case "none" => ""
    case "gzip" => ".gz"
    case "zstd" => ".zst"
    case other => throw new IllegalArgumentException(
      s"unknown codec '$other' (expected one of ${Names.mkString("/")})")
  }

  /** Wrap a raw sink with the codec's compressor. */
  def compress(codec: String, raw: OutputStream): OutputStream = codec match {
    case "none" => raw
    case "gzip" => new java.util.zip.GZIPOutputStream(raw, 64 * 1024)
    // level 3 = zstd's default: the ratio/speed point corpus pipelines use
    case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw, 3)
    case other => throw new IllegalArgumentException(s"unknown codec '$other'")
  }

  /** Decompressor picked from the file name (the reader never needs the
    * writer's codec argument — mixed directories decode per file).
    */
  def decompressFor(path: String, raw: InputStream): InputStream =
    if (path.endsWith(".gz"))
      new java.util.zip.GZIPInputStream(raw, 64 * 1024)
    else if (path.endsWith(".zst"))
      new com.github.luben.zstd.ZstdInputStream(raw)
    else raw

  /** Decode a whole in-memory shard (the binaryFile read path). */
  def decodeBytes(path: String, bytes: Array[Byte]): Array[Byte] =
    if (!path.endsWith(".gz") && !path.endsWith(".zst")) bytes
    else {
      val in = decompressFor(path, new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
}
