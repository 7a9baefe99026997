package graft.sources

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

import graft.etl.TypeMapping

/** Vertica `JdbcDialect`: the write-back half of the reference's
  * Vertica↔Hadoop type fidelity. The reference rewrites DDL text
  * (`/root/reference/sqoop_pyhive.py:33-34`: `numeric→decimal`,
  * `timestamp(6)→timestamp`) and builds staging tables from
  * `v_catalog.columns` strings (`sqoop_table.py:158-165`); registering this
  * dialect makes `df.write.jdbc` emit native Vertica DDL types directly —
  * `numeric(p,s)` with exact precision/scale, `timestamp` (µs precision is
  * Vertica's default), `varchar(n)` — and maps Vertica catalog types back to
  * Catalyst on read, sharing [[graft.etl.TypeMapping]] so the JDBC path and
  * the schema-introspection path (S5) can never disagree.
  *
  * Vertica-specific read mappings: every Vertica integer is 64-bit (`INT`
  * reports as `Types.BIGINT`), so LongType round-trips; `NUMERIC` with
  * Vertica's default precision 37 (reported when DDL said bare `numeric`)
  * maps through [[graft.etl.TypeMapping.verticaToSpark]]'s default. Identifier
  * quoting is ANSI double-quote, with embedded quotes doubled.
  */
object VerticaDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:vertica:")

  /** Spark → Vertica DDL (write path, CREATE TABLE generation). Delegates
    * the type-name spelling to [[graft.etl.TypeMapping.sparkToVertica]].
    */
  override def getJDBCType(dt: DataType): Option[JdbcType] = {
    val jdbcCode = dt match {
      case LongType | IntegerType | ShortType => Types.BIGINT // Vertica INT is 64-bit
      case DoubleType | FloatType => Types.DOUBLE
      case BooleanType => Types.BOOLEAN
      case DateType => Types.DATE
      case TimestampType => Types.TIMESTAMP
      case _: DecimalType => Types.NUMERIC
      case StringType => Types.VARCHAR
      case BinaryType => Types.VARBINARY
      case _ => return None
    }
    Some(JdbcType(TypeMapping.sparkToVertica(dt), jdbcCode))
  }

  /** Vertica catalog → Catalyst (read path). `typeName` is Vertica's
    * reported name (e.g. `Numeric`, `Varchar`, `Timestamp`); reconstruct
    * the parameterized spelling from the JDBC size/scale report and reuse
    * the one mapping.
    */
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = {
    val name = typeName.toLowerCase(Locale.ROOT)
    (sqlType, name) match {
      case (Types.BIGINT, "int" | "integer" | "int8" | "bigint") =>
        Some(LongType)
      case (Types.NUMERIC | Types.DECIMAL, _) if size > 0 =>
        val scale = Option(md).map(_.build())
          .filter(_.contains("scale")).map(_.getLong("scale").toInt)
          .getOrElse(0)
        Some(TypeMapping.verticaToSpark(s"numeric($size,$scale)"))
      case (_, "varchar" | "long varchar" | "char") => Some(StringType)
      case (_, "varbinary" | "long varbinary" | "binary") => Some(BinaryType)
      case _ => None // fall through to Spark's generic JDBC mapping
    }
  }

  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""

  /** Vertica TRUNCATE TABLE commits immediately and never cascades. */
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  // ---- pushdown declarations ------------------------------------------
  // The reference runs its probes INSIDE Vertica — filtered counts and
  // split bounds (`sqoop_table.py:54-57`), ordered-LIMIT status probes
  // (`:41`, `:50`, `:107`) — so the dialect must declare what the
  // warehouse can execute, or Spark's DSv2 JDBC scan silently fetches
  // rows and re-does the work cluster-side. Vertica accepts the default
  // `LIMIT n` / `OFFSET m` spellings in exactly the positions Spark
  // splices them (after ORDER BY, limit before offset).

  override def supportsLimit: Boolean = true

  override def supportsOffset: Boolean = true

  /** Aggregate functions Vertica evaluates natively (ANSI names, which is
    * what Spark's V2 expression compiler emits). The VAR_ and STDDEV_
    * variants exist in Vertica with these exact names and the same
    * sample/population split.
    */
  override def isSupportedFunction(funcName: String): Boolean =
    Set("SUM", "COUNT", "MIN", "MAX", "AVG",
      "VAR_POP", "VAR_SAMP", "STDDEV_POP", "STDDEV_SAMP",
      "ABS", "COALESCE", "GREATEST", "LEAST", "LN", "EXP", "POWER",
      "SQRT", "FLOOR", "CEIL", "ROUND", "UPPER", "LOWER", "TRIM",
      "SUBSTRING", "MOD").contains(funcName)
}

/** Registration hook: `VerticaDialect.register()` once per JVM (idempotent —
  * Spark keeps a set). Call before the first `read.jdbc`/`write.jdbc`
  * against a `jdbc:vertica:` URL.
  */
object VerticaDialectRegistration {
  @volatile private var done = false
  def register(): Unit = synchronized {
    if (!done) { JdbcDialects.registerDialect(VerticaDialect); done = true }
  }
}
