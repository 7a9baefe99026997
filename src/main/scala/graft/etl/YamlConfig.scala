package graft.etl

import java.nio.file.{Files, Path, Paths}

/** Loader for the reference's per-table YAML job configs — the exact file
  * shape `sqoop_etl.py:24` (`config = yaml.load(open(sys.argv[1]))`) and
  * `:30` (`self.env = yaml.load(open(config['ENV']))`) consume, e.g.
  * `agg_geo_lucid_daily.yaml:1-12`. A reference deployment's config files
  * drop in unchanged: `EtlMain <sfDir> <root> orders.yaml customer.yaml`.
  *
  * The reference configs are FLAT SCALAR maps (`KEY : 'value'`), so this
  * parses exactly that YAML subset rather than pulling a full parser onto
  * the hot classpath: one `key : value` pair per line, single/double
  * quoted or bare scalars, full-line or trailing `#` comments (outside
  * quotes), blank lines. Anything outside the subset (nesting, lists,
  * multi-line scalars) fails loudly — a reference config never contains
  * them, so silence would only hide a typo.
  *
  * The `ENV` key is the reference's environment indirection
  * (`sqoop_etl.py:30`): a path to a second flat YAML holding endpoints
  * (`DSN`, `HIVE_HOST`, `USER_NAME`, `SET_SCHEMA_SQL`,
  * `HDFS_STORAGE_HOST`, `API_STORAGE_GRID_HOST` — `sqoop_table.py:21-23`,
  * `sqoop_pyhive.py:38`, `sqoop_json.py:41`). It is loaded when the file
  * exists and surfaced as [[EtlEnv]]; a missing env file degrades to an
  * empty env (local runs have no Vertica DSN to point at) instead of
  * failing the whole job the way the reference would.
  */
object YamlConfig {

  /** The env-yaml keys the reference reads, resolved or empty. */
  final case class EtlEnv(values: Map[String, String]) {
    def dsn: Option[String] = values.get("DSN")
    def hiveHost: Option[String] = values.get("HIVE_HOST")
    def userName: Option[String] = values.get("USER_NAME")
    def hdfsStorageHost: Option[String] = values.get("HDFS_STORAGE_HOST")
    def apiStorageGridHost: Option[String] = values.get("API_STORAGE_GRID_HOST")
    def setSchemaSql: Option[String] = values.get("SET_SCHEMA_SQL")
  }

  /** Parse the flat-scalar-map YAML subset (see object doc). */
  def parseFlat(text: String): Map[String, String] = {
    val pairs = text.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) None
      else {
        val colon = line.indexOf(':')
        require(colon > 0, s"line ${i + 1}: not a `key : value` pair: $raw")
        val key = line.substring(0, colon).trim
        require(key.nonEmpty && !key.exists(c => c == '{' || c == '[' || c == '-'),
          s"line ${i + 1}: key outside the flat-map subset: $raw")
        Some(key -> unquote(line.substring(colon + 1).trim, i + 1))
      }
    }.toSeq
    val dups = pairs.groupBy(_._1).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate keys: ${dups.mkString(", ")}")
    pairs.toMap
  }

  private def unquote(v: String, lineNo: Int): String =
    if (v.nonEmpty && (v.head == '\'' || v.head == '"')) {
      // Quoted scalar: find the CLOSING quote first, so a '#' inside the
      // quotes is literal and a trailing `# comment` after the close quote
      // is dropped. Anything else after the close quote is outside the
      // subset — fail loudly rather than silently truncating.
      val close = v.indexOf(v.head, 1)
      require(close > 0, s"line $lineNo: unterminated quoted value: $v")
      val rest = v.substring(close + 1).trim
      require(rest.isEmpty || rest.startsWith("#"),
        s"line $lineNo: trailing content after quoted value: $v")
      v.substring(1, close)
    } else {
      // bare scalar: strip a trailing comment, reject subset violations
      val bare = (v.indexOf('#') match {
        case -1 => v
        case h  => v.substring(0, h)
      }).trim
      require(!bare.exists(c => c == '{' || c == '[' || c == '|' || c == '>'),
        s"line $lineNo: value outside the flat-scalar subset: $v")
      bare
    }

  /** Sqoop's `--as-*file` enum → the Spark at-rest format the backup sink
    * writes (`sqoop_table.py` emits sqoop invocations with these names).
    */
  private[etl] def fileFormat(sqoopName: String): String =
    sqoopName.toUpperCase match {
      case "TEXT_FILE"                  => "csv"
      case "SEQUENCE_FILE"              => "csv" // no Writable schema at rest; closest splittable text
      case "AVRO_DATA_FILE"             => "avro"
      case "PARQUET_FILE" | "PARQUET"   => "parquet"
      case "ORC_FILE" | "ORC" | ""      => "orc"
      case other => sys.error(s"unknown OUTPUT_FILE_FORMAT: $other")
    }

  /** Load `<table>.yaml` into a [[JobConfig]] + its [[EtlEnv]]. The table
    * name is the file's basename minus `.yaml`, exactly the reference's
    * `sys.argv[1].replace('.yaml', '')` (`sqoop_etl.py` main). Every key
    * is optional with the reference config's own defaults; `PRIMARY_ID`
    * present-but-empty selects the full-snapshot dim path
    * (`advertiser_dim.yaml:4`, `sqoop_table.py:141-143`).
    */
  def load(yamlPath: String): (JobConfig, EtlEnv) = {
    val p = Paths.get(yamlPath)
    val name = p.getFileName.toString.stripSuffix(".yaml")
    val m = parseFlat(Files.readString(p))
    val cfg = JobConfig(
      tableName = name,
      numMappers = m.getOrElse("NUM_MAPPERS", "8").toInt,
      primaryId = m.getOrElse("PRIMARY_ID", "month_sid"),
      hiveDb = m.getOrElse("HIVE_DB", "legacy_tables"),
      dwDb = m.getOrElse("DW_DB", "legacy_tables"),
      compression = m.getOrElse("SQOOP_COMPRESSION", "SNAPPY").toLowerCase,
      outputFileFormat = fileFormat(m.getOrElse("OUTPUT_FILE_FORMAT", "ORC")),
      skipLatestMonths = m.getOrElse("SKIP_LATEST_MONTHS", "0").toInt,
      orcStripeSize = m.getOrElse("ORC_STRIPE_SIZE", "268435456").toLong,
      orcIndexStride = m.getOrElse("ORC_INDEX_STRIDE", "500000").toInt,
      sequence = m.getOrElse("SEQUENCE", ""),
      // graft extension keys (same flat-scalar style; absent in reference
      // configs, which therefore keep their exact behavior):
      lakePath = m.getOrElse("LAKE_PATH", ""),
      pruned = m.getOrElse("PRUNED", "false").toBoolean,
      maxParallel = m.getOrElse("MAX_PARALLEL", "1").toInt,
      manifestCheckpointEvery =
        m.getOrElse("MANIFEST_CHECKPOINT_EVERY", "8").toInt,
      pidEncoding = m.getOrElse("PID_ENCODING", "").toLowerCase)
    val env = m.get("ENV").map(Paths.get(_)) match {
      case Some(ep) if Files.isRegularFile(ep) =>
        EtlEnv(parseFlat(Files.readString(ep)))
      case _ => EtlEnv(Map.empty)
    }
    (cfg, env)
  }
}
