package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The multimodal curation flow — the media twin of
  * [[TrainingDataPipeline]]: route payloads by decoded kind, gate each
  * modality on a quality signal, perceptually dedup the surviving images,
  * and account per modality. Every stage is one of the proven media
  * operators (decode stats, dHash + quarter-blocked Hamming pairs,
  * connected components, audio segmentation), so the whole flow stays
  * map-only per payload plus fingerprint-keyed joins — pixels and samples
  * never shuffle.
  *
  *   1. IMAGES: decode → brightness gate (`gray_sum ≥ minMeanGray·pixels`,
  *      an exact integer mean threshold — the degenerate-exposure filter);
  *      survivors dedup by dHash Hamming ≤ 3 → connected components →
  *      keep each cluster's min doc_id.
  *   2. AUDIO: decode → silence segmentation → keep clips with at least
  *      `minSpeechBlocks` speech blocks (the dead-air filter).
  *
  * Output: one accounting row per modality (kind, n_quality, n_kept,
  * units_kept, score_kept) — pixels/gray mass for images, speech blocks/
  * energy for audio. All exact longs, end-to-end oracle-replayable.
  */
object MultimodalPipeline {

  def curateSummary(payloads: DataFrame, minMeanGray: Long = 127L,
      minSpeechBlocks: Long = 8L, blockLen: Int = 32,
      energyThreshold: Long = 1000000L): DataFrame = {
    // ---- image lane
    val img = Multimodal.imageSharpness(payloads)
    val imgQ = img.filter(col("gray_sum") >= lit(minMeanGray) * col("n_pixels"))
    val sigs = Multimodal.imageDhash(
      payloads.join(imgQ.select("doc_id"), "doc_id"))
    val pairs = graft.dedup.Dedup.hammingPairs(sigs, maxHamming = 3)
    val drop = graft.operators.ConnectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"), lit(1).as("dropped"))
    val imgRow = imgQ.join(drop, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_quality"),
        sum(when(col("dropped").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("dropped").isNull, col("n_pixels")).otherwise(0L))
          .as("units_kept"),
        sum(when(col("dropped").isNull, col("gray_sum")).otherwise(0L))
          .as("score_kept"))
      .select(lit("image").as("kind"), col("n_quality"), col("n_kept"),
        col("units_kept"), col("score_kept"))
    // ---- audio lane
    val audRow = Multimodal.audioSegments(payloads, blockLen, energyThreshold)
      .groupBy("doc_id")
      .agg(sum(col("n_blocks").cast("long")).as("speech_blocks"),
        sum(col("seg_energy")).as("tot_energy"))
      .filter(col("speech_blocks") >= minSpeechBlocks)
      .agg(count(lit(1)).as("n_quality"),
        count(lit(1)).as("n_kept"),
        sum(col("speech_blocks")).as("units_kept"),
        sum(col("tot_energy")).as("score_kept"))
      .select(lit("audio").as("kind"), col("n_quality"), col("n_kept"),
        col("units_kept"), col("score_kept"))
    imgRow.unionByName(audRow).orderBy("kind")
  }
}
