package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector tier (the one extension point the expression /
  * rule / strategy / generator / aggregator surface doesn't cover): a
  * deterministic synthetic-documents TABLE with
  *
  *  - `SupportsPushDownRequiredColumns`: generation is per-column, so a
  *    `select doc_id, lang` scan never materializes text — the analogue of
  *    column pruning reaching a parquet scan;
  *  - `SupportsPushDownFilters`: range predicates on `doc_id` prune whole
  *    input partitions (each partition owns a contiguous id range), the
  *    analogue of partition pruning;
  *  - deterministic content: every cell is a pure function of
  *    (doc_id, seed) — splitmix64 — so reads are reproducible across
  *    retries, executors, and partition counts (the same discipline as
  *    every other graft operator).
  *
  * Usage: `spark.read.format(classOf[SynthDocsSource].getName)
  *   .option("rows", n).option("partitions", p).option("seed", s).load()`
  */
class SynthDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("seed", "42").toLong)
}

object SynthDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  // public: the oracle-SQL generator derives its lookup lists from these,
  // so the SQL cannot drift from the generator
  val Langs = Array("en", "de", "fr", "es", "zh")
  val Words = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi")

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def lang(docId: Long, seed: Long): String =
    Langs(java.lang.Math.floorMod(splitmix64(docId ^ seed), Langs.length.toLong).toInt)

  def text(docId: Long, seed: Long): String = {
    val h = splitmix64(docId * 31 + seed)
    val n = 8 + java.lang.Math.floorMod(h, 25L).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Words(java.lang.Math.floorMod(splitmix64(h + i), Words.length.toLong).toInt))
      i += 1
    }
    sb.toString
  }
}

final class SynthDocsTable(rows: Long, partitions: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"synth_docs($rows)"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, seed)
}

final class SynthScanBuilder(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = SynthDocs.schema
  private var lo = 0L // inclusive doc_id bound
  private var hi = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var aggOps: Seq[String] = Nil // "count" | "min" | "max", in order

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept doc_id range filters; they clip the generated id range exactly
    * (rows outside [lo, hi) are never produced), so they are FULLY handled
    * here and not returned as residual — which is what lets Spark push a
    * following aggregation down too. Everything else stays with Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); false
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); false
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); false
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1); false
      case _ => true
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) / MIN(doc_id) / MAX(doc_id) have closed forms over an id
    * range — the source answers them per input partition WITHOUT generating
    * any row (partial pushdown: Spark still folds the per-partition rows).
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions().nonEmpty) return false
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression) = e match {
      case f: NamedReference => f.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }
    val ops = aggregation.aggregateExpressions().toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if isDocId(m.column) => Some("min")
      case m: Max if isDocId(m.column) => Some("max")
      case _ => None
    }
    if (ops.exists(_.isEmpty)) false
    else {
      aggOps = ops.flatten
      required = StructType(aggOps.zipWithIndex.map { case (op, i) =>
        StructField(s"${op}_$i", LongType, nullable = false)
      })
      true
    }
  }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def build(): Scan =
    new SynthScan(rows, partitions, seed, required, lo, hi, pushed, aggOps)
}

final case class SynthInputPartition(start: Long, end: Long, seed: Long)
    extends InputPartition

final class SynthScan(rows: Long, partitions: Int, seed: Long,
    required: StructType, lo: Long, hi: Long, pushed: Array[Filter],
    aggOps: Seq[String] = Nil)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SynthDocs rows=$rows PushedFilters=[${pushed.mkString(", ")}] " +
      s"PushedAggregates=[${aggOps.mkString(", ")}] " +
      s"ReadSchema=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(rows / partitions, 1L)
    (0 until partitions).iterator
      .map { p =>
        val s = p * per
        val e = if (p == partitions - 1) rows else math.min((p + 1) * per, rows)
        SynthInputPartition(math.max(s, lo), math.min(e, hi), seed)
      }
      .filter(ip => ip.start < ip.end) // pruned partitions never reach executors
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required, aggOps)
}

final class SynthReaderFactory(required: StructType, aggOps: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthInputPartition]
    if (aggOps.nonEmpty) {
      // pushed aggregation: one closed-form partial row per partition,
      // zero rows generated (count = range length, min/max = range ends)
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow = InternalRow.fromSeq(aggOps.map {
          case "count" => p.end - p.start
          case "min" => p.start
          case "max" => p.end - 1
        })
        override def close(): Unit = ()
      }
    } else new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        // generate only the requested columns — text (the expensive one)
        // is never built for a pruned scan
        val values = required.fields.map { f =>
          f.name match {
            case "doc_id" => id
            case "lang" => UTF8String.fromString(SynthDocs.lang(id, p.seed))
            case "text" => UTF8String.fromString(SynthDocs.text(id, p.seed))
            case "n_chars" => SynthDocs.text(id, p.seed).length.toLong
          }
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
