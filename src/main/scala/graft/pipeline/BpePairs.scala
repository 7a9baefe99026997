package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The counting step of a BPE tokenizer-training round: adjacent symbol-pair
  * frequencies, weighted by word frequency.
  *
  * Scale shape: the corpus collapses to its VOCABULARY first (one word-count
  * aggregate with map-side partials — the wordcount shuffle carries tokens,
  * not documents), and the quadratic-ish pair explode runs over vocab rows
  * only. At 100 TB the vocabulary is millions of rows where the corpus is
  * trillions of positions; exploding pairs after the collapse is the
  * difference between a vocab-sized and a corpus-sized shuffle. The final
  * pair aggregate is again partial-agg'd (pair cardinality ≪ instances).
  *
  * One call = one merge-round's statistics; a full BPE train would loop
  * merges driver-side on the (small) vocab table, re-segmenting with the
  * learned merge each round.
  */
object BpePairs {

  /** Character-level vocabulary with word frequencies. */
  def vocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "" && length(col("token")) >= 2)
      .groupBy("token").agg(count(lit(1)).as("freq"))

  /** Adjacent character-pair counts over [[vocab]], weighted by word
    * frequency — the argmax row is the round's merge candidate.
    */
  def pairCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    vocab(docs, textCol)
      .select(col("token"), col("freq"),
        explode(sequence(lit(1), length(col("token")) - 1)).as("i"))
      .select(col("token").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).cast("long").as("cnt"))
}
