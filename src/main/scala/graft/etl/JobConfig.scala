package graft.etl

/** Per-table job configuration — same keys as the reference's YAMLs
  * (`/root/reference/agg_geo_lucid_daily.yaml:1-12`,
  * `/root/reference/advertiser_dim.yaml`). `primaryId = ""` selects
  * full-snapshot mode (the `advertiser_dim` path, `sqoop_table.py:141-143`);
  * otherwise incremental partition-by-partition copy.
  */
final case class JobConfig(
    tableName: String,
    numMappers: Int = 8,             // NUM_MAPPERS   (agg_geo_lucid_daily.yaml:3)
    primaryId: String = "month_sid", // PRIMARY_ID    (agg_geo_lucid_daily.yaml:4)
    hiveDb: String = "legacy_tables",   // HIVE_DB
    dwDb: String = "legacy_tables",     // DW_DB
    compression: String = "snappy",     // SQOOP_COMPRESSION (agg_geo_lucid_daily.yaml:8)
    outputFileFormat: String = "orc",   // OUTPUT_FILE_FORMAT (at-rest format)
    skipLatestMonths: Int = 0,       // SKIP_LATEST_MONTHS (agg_geo_lucid_daily.yaml:10)
    orcStripeSize: Long = 268435456L, // ORC_STRIPE_SIZE (agg_geo_lucid_daily.yaml:11)
    orcIndexStride: Int = 500000,    // ORC_INDEX_STRIDE (agg_geo_lucid_daily.yaml:12)
    sequence: String = "",           // SEQUENCE (agg_geo_lucid_daily.yaml:5) — the
                                     // surrogate-key sequence the reference's temp-table
                                     // populate consumes; graft's analog is DictEncode
    // graft extensions (the reference's source is Vertica, where physical
    // partitioning does the pruning; a lake-resident source needs these):
    lakePath: String = "",           // LAKE_PATH — source is this parquet dir
    pruned: Boolean = false,         // PRUNED — manifest-pruned incremental drain
    maxParallel: Int = 1,            // MAX_PARALLEL — within-table copy concurrency
    manifestCheckpointEvery: Int = 8, // MANIFEST_CHECKPOINT_EVERY — fold the
                                     // log-structured manifest's deltas into a
                                     // checkpoint every k drains (also the
                                     // ingest-journal reconciliation cadence)
    pidEncoding: String = "") {      // PID_ENCODING — how manifest-pruned
                                     // discovery may enumerate candidate pid
                                     // values inside a file's [min, max]
                                     // interval: "yyyymm" steps calendar
                                     // months, "generic" enumerates integers
                                     // (bounded span), "" = auto (see
                                     // [[pidIsYyyymm]])

  def isFullSnapshot: Boolean = primaryId.isEmpty

  /** Whether discovery's candidate enumeration may step CALENDAR months.
    * An explicit DECLARATION, not a value sniff (the r9 ADVICE hazard: a
    * non-calendar encoding whose file bounds happen to end in 01..12 —
    * e.g. a sequential counter spanning 2408..2503 — took the calendar
    * branch and skipped real values in the 13..99 blocks, so files holding
    * them were never discovered). The auto default maps the reference's
    * own config language: `PRIMARY_ID: month_sid` means the Vertica
    * calendar-month surrogate (`agg_geo_lucid_daily.yaml:4`,
    * `sqoop_table.py:145` ranks it as a calendar month), so that NAME is
    * the declaration; any other key enumerates generically. A table whose
    * `month_sid` carries a different encoding sets `PID_ENCODING: generic`.
    */
  def pidIsYyyymm: Boolean = pidEncoding match {
    case "yyyymm"  => true
    case "generic" => false
    case ""        => primaryId == "month_sid"
    case other =>
      throw new IllegalArgumentException(s"unknown PID_ENCODING: $other")
  }
}
