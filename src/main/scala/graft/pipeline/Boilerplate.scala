package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal (the C4/Gopher "drop lines that
  * repeat across many pages" cleanup, over token chunks since the testdata
  * documents are single-line).
  *
  * Docs are split into consecutive `chunkLen`-token chunks; a chunk whose
  * document frequency exceeds `maxDf` is boilerplate and is dropped from
  * every doc; survivors are reassembled in order.
  *
  * Scale shape: two hash-partitioned shuffles, both on bounded keys — the
  * chunk-frequency groupBy (map-side partial counts; chunk cardinality ≪
  * chunk instances) and the doc reassembly groupBy doc_id. The
  * chunk→df join is a plain equi join Spark can broadcast when the
  * boilerplate table is small or shuffle when it isn't. Nothing is
  * quadratic and no driver-side state exists.
  */
object Boilerplate {

  /** Per-doc output: (doc_id, n_chunks, n_removed, kept_text). */
  def removeFrequentChunks(docs: DataFrame, chunkLen: Int = 2,
      maxDf: Int = 20): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(
        transform(
          sequence(lit(0), (ceil(size(col("toks")).cast("double") / chunkLen))
            .cast("int") - 1),
          i => concat_ws(" ", slice(col("toks"), i * chunkLen + 1, lit(chunkLen))))))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "chunk")
    val df = chunks.groupBy(col("chunk").as("f_chunk"))
      .agg(countDistinct(col("doc_id")).as("df"))
    chunks.join(df, col("chunk") === col("f_chunk"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("n_removed"),
        concat_ws(" ",
          transform(
            sort_array(collect_list(
              when(col("df") <= maxDf, struct(col("i"), col("chunk"))))),
            s => s("chunk"))).as("kept_text"))
  }
}
