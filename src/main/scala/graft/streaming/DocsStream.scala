package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming document ingest: the classifier-gated quality filter applied
  * IN the stream — model inference (a codegen projection, no UDF, no
  * state) runs per micro-batch at scan speed, so corpus ingestion and
  * filtering happen in one pass as documents land. Drained with
  * AvailableNow (the reference's process-pending-then-stop loop,
  * sqoop_etl.py:77-83), output parquet — the batch/stream parity that
  * makes the result oracle-checkable.
  */
object DocsStream {

  /** Stream documents through the hashed-linear quality gate to parquet. */
  def classifyDrain(spark: SparkSession, sfDir: String, outDir: String,
      checkpoint: String): Unit = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$sfDir/documents*.parquet")
    val score = graft.quality.LinearScorer.score(col("text"))
    val q = stream
      .select(col("doc_id"), col("lang"), score.as("w_sum"))
      .filter(col("w_sum") > 0)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }
}
