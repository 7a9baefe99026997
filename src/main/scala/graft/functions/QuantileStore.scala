package graft.functions

import scala.collection.mutable

import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Mergeable quantile-sketch store (Apache DataSketches KLL) — the quantile
  * analogue of [[SketchStore]]: per-partition sketches are computed ONCE at
  * ingest and persisted as binary columns; any later "percentile over a
  * partition subset" question is answered by merging the stored sketches
  * (KBs each) instead of re-sorting the fact data. KLL merge is associative
  * and rank error is preserved under merge, so a month-range p95 at 100 TB
  * costs a scan of one sketch row per month.
  *
  * Spark has no KLL SQL aggregate, so the build is the classic two-level
  * sketch shape done explicitly: `mapPartitions` builds one local sketch
  * per (input partition × group) — zero shuffle, the map-side combine —
  * then only the serialized sketches shuffle to a per-group merge. This is
  * a `mapPartitions` tier case per SURVEY §2.11: the carrier state is an
  * opaque mutable sketch no Catalyst expression can host.
  */
object QuantileStore {

  /** One mergeable sketch row per group: (g, n, sketch). `group` must cast
    * to long (partition ids: month sids, day sids, bucket ids).
    */
  def build(df: DataFrame, group: Column, value: Column, k: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(group.cast("long").as("g"), value.cast("float").as("v"))
      .as[(Long, Float)]
    val partial: Dataset[(Long, Array[Byte])] = src.mapPartitions { it =>
      val local = mutable.LongMap.empty[KllFloatsSketch]
      it.foreach { case (g, v) =>
        local.getOrElseUpdate(g, KllFloatsSketch.newHeapInstance(k)).update(v)
      }
      local.iterator.map { case (g, sk) => (g, sk.toByteArray) }
    }
    partial.groupByKey(_._1).mapGroups { (g, it) =>
      val merged = KllFloatsSketch.newHeapInstance(k)
      it.foreach { case (_, b) => merged.merge(heapify(b)) }
      (g, merged.getN, merged.toByteArray)
    }.toDF("g", "n", "sketch")
  }

  /** Union of the given sketch rows via a distributed associative reduce —
    * only sketch bytes move; nothing is re-scanned. The result lands on the
    * driver (KBs) where quantiles are read out.
    */
  def mergeAll(sketches: DataFrame, k: Int = 200): KllFloatsSketch = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val bytes = sketches.select("sketch").as[Array[Byte]].reduce { (a, b) =>
      val m = KllFloatsSketch.newHeapInstance(k)
      m.merge(heapify(a))
      m.merge(heapify(b))
      m.toByteArray
    }
    heapify(bytes)
  }

  def heapify(bytes: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(bytes))
}
