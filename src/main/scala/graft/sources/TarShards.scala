package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded tar source/sink — the WebDataset layout multimodal training
  * loaders stream: a corpus is a directory of `.tar` shards, a SAMPLE is
  * the group of member files sharing one basename (`000123.txt`,
  * `000123.bin`, …), one extension per modality, and loaders read shards
  * sequentially (tar's whole point: large sequential I/O, no per-sample
  * seeks — the POSIX-tar convention popularized by WebDataset).
  *
  * Scale shape mirrors [[Warc]]: a shard is the non-splittable unit, so
  * parallelism is shard-granular — the writer emits one tar per input
  * partition (`numShards` sizes them), the reader lists shards through the
  * distributed `binaryFile` source and parses members per file.
  * Determinism: headers carry fixed mtime/uid/gid, so re-running an export
  * produces byte-identical shards (the re-run ⇒ same bytes discipline of
  * `pipeline.Sharding`).
  *
  * The tar wire format here is USTAR (POSIX.1-1988): 512-byte headers,
  * octal size field, 8-bit-sum checksum verified on read, content padded
  * to 512, two zero blocks as trailer. Pure JVM, no tar library.
  *
  * The reference's extract surface is JDBC/CSV/ORC (sqoop_etl.py:31-53);
  * sharded tar is the north-star EXPORT format a multimodal training
  * pipeline adds on top.
  */
object TarShards {

  /** One member file of a tar shard. */
  final case class Member(key: String, ext: String, content: Array[Byte])

  private val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - 1 - s.length)) + s
    (padded + "\u0000").getBytes(US_ASCII)
  }

  /** USTAR header for a regular file of `size` bytes. Fixed mtime/uid/gid
    * keep shards byte-identical across re-runs.
    */
  private def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](BlockSize)
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length <= 100, s"tar member name too long: $name")
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime: epoch, determinism
    // checksum computed with the field as 8 spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar\u000000".getBytes(US_ASCII), 0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    val chk = java.lang.Long.toOctalString(sum)
    val chkPadded = ("0" * (6 - chk.length)) + chk
    System.arraycopy((chkPadded + "\u0000 ").getBytes(US_ASCII), 0, h, 148, 8)
    h
  }

  /** Serialize members into one tar archive (in member order). */
  private[graft] def archive(members: Iterator[Member]): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 << 16)
    members.foreach { m =>
      out.write(header(s"${m.key}.${m.ext}", m.content.length.toLong))
      out.write(m.content)
      val pad = (BlockSize - m.content.length % BlockSize) % BlockSize
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize))
    out.toByteArray
  }

  /** Parse one tar archive into members. Checksum-verified; stops at the
    * zero trailer; malformed archives throw (a corrupt shard should fail
    * the task loudly, not yield silently truncated samples).
    */
  private[graft] def parse(bytes: Array[Byte]): Iterator[Member] = {
    val raw = new Iterator[(Byte, Member)] {
      private var pos = 0
      private def atTrailer: Boolean =
        pos + BlockSize > bytes.length ||
          (0 until BlockSize).forall(i => bytes(pos + i) == 0)
      def hasNext: Boolean = !atTrailer
      def next(): (Byte, Member) = {
        if (atTrailer) throw new NoSuchElementException
        var nameEnd = pos
        while (nameEnd < pos + 100 && bytes(nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, pos, nameEnd - pos, UTF_8)
        def field(off: Int, len: Int): String =
          new String(bytes, pos + off, len, US_ASCII)
            .takeWhile(c => c != '\u0000' && c != ' ')
        val size = java.lang.Long.parseLong(field(124, 12), 8)
        val stored = java.lang.Long.parseLong(field(148, 8), 8)
        var sum = 0L
        var i = 0
        while (i < BlockSize) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xff)
          i += 1
        }
        require(sum == stored, s"tar checksum mismatch at offset $pos")
        val typeflag = bytes(pos + 156)
        val start = pos + BlockSize
        require(start.toLong + size <= bytes.length, s"truncated tar member $name")
        val content = java.util.Arrays.copyOfRange(bytes, start,
          start + size.toInt)
        pos = start + size.toInt +
          ((BlockSize - size.toInt % BlockSize) % BlockSize)
        val dot = name.lastIndexOf('.')
        val m = if (dot < 0) Member(name, "", content)
          else Member(name.substring(0, dot), name.substring(dot + 1), content)
        (typeflag, m)
      }
    }
    // only regular files are samples; directories/links in foreign tars skip
    raw.collect { case (t, m) if t == '0'.toByte || t == 0.toByte => m }
  }

  /** Write samples as `numShards` tar shards under `path`. Input columns:
    * `key` (string, the sample basename — zero-padded doc ids sort
    * nicely), `ext`, `content` (binary) — one row per member file. Members
    * of one sample MUST share a shard for loaders to group them, so rows
    * are repartitioned BY KEY (hash) and sorted (key, ext) within the
    * shard — sequential samples, deterministic member order.
    */
  def write(members: DataFrame, path: String, numShards: Int,
      codec: String = "none"): Unit = {
    import members.sparkSession.implicits._
    val suffix = Codecs.suffix(codec) // validate on the driver, not in tasks
    val ds = members.select(col("key"), col("ext"), col("content"))
      .repartition(numShards, col("key"))
      .sortWithinPartitions("key", "ext")
      .as[(String, String, Array[Byte])]
    ds.foreachPartition { it: Iterator[(String, String, Array[Byte])] =>
      val pid = TaskContext.getPartitionId()
      val p = new Path(f"$path/shard-$pid%05d.tar$suffix")
      val fs = p.getFileSystem(new Configuration())
      val out = Codecs.compress(codec, fs.create(p, true))
      try out.write(archive(it.map { case (k, e, c) => Member(k, e, c) }))
      finally out.close()
    }
  }

  /** Read a shard directory → one row per member (key, ext, content).
    * Shard-granular parallelism via the distributed binaryFile listing;
    * `.tar.gz`/`.tar.zst` shards decompress per task (the `.warc.gz`
    * discipline — a compressed shard is a non-splittable unit either way).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar*").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, content) => parse(Codecs.decodeBytes(p, content)) }
      .toDF()
  }

  /** Read and regroup into SAMPLES: one row per key, members as an
    * ext→content map — what a training loader iterates.
    */
  def readSamples(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .groupBy("key")
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("ext"), col("content"))))).as("members"))
}
