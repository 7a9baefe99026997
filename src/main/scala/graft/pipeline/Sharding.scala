package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic interleaved shard assignment for training-data export:
  * within each language, documents are ranked by a content-independent hash
  * of their id (layout- and partition-order-independent) and dealt
  * round-robin to `nShards` shards — every shard receives the same language
  * mixture to within one document per language, so data-parallel trainers
  * reading one shard each see identically distributed streams.
  *
  * Scale shape: one window per `lang` partition (same discipline as
  * [[TokenBudget]] — the running state is a rank, rows are (id, lang), the
  * text never shuffles). The assignment is a pure function of (id set,
  * nShards): re-running on the same corpus yields byte-identical shards,
  * which makes shard manifests diffable and resumable.
  */
object Sharding {

  /** @return one row per doc: doc_id, lang, rk (hash rank within lang),
    *         shard in [0, nShards)
    */
  def interleave(docs: DataFrame, nShards: Int): DataFrame = {
    val ord = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("shard", ((col("rk") - 1) % nShards).cast("long"))
  }
}
