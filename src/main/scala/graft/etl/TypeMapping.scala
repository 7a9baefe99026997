package graft.etl

import org.apache.spark.sql.types._

/** Vertica ↔ Spark type mapping — the schema machinery the reference does
  * with string surgery on DDL text (`/root/reference/sqoop_pyhive.py:33-34`:
  * `numeric→decimal`, `timestamp(6)→timestamp`) and catalog queries
  * (`sqoop_table.py:116`,`:125`,`:132`). Here it is a real mapping over
  * `StructType`, so precision/scale survive exactly (SURVEY §7 hard part:
  * decimal/timestamp fidelity).
  */
object TypeMapping {

  private val Numeric = """numeric\((\d+)\s*,\s*(\d+)\)""".r
  private val NumericP = """numeric\((\d+)\)""".r
  private val VarcharN = """varchar\((\d+)\)""".r
  private val TimestampP = """timestamp\((\d+)\)""".r

  /** Parse one Vertica type name to a Spark DataType. */
  def verticaToSpark(t: String): DataType = t.trim.toLowerCase match {
    case "int" | "integer" | "bigint" | "int8" => LongType
    case "smallint" => ShortType
    case "float" | "float8" | "double precision" => DoubleType
    case "boolean" => BooleanType
    case "date" => DateType
    case "timestamp" => TimestampType
    case TimestampP(_) => TimestampType // µs precision: exact match (SURVEY §1.2)
    case Numeric(p, s) => DecimalType(p.toInt, s.toInt)
    case NumericP(p) => DecimalType(p.toInt, 0)
    case "numeric" => DecimalType(38, 15)
    case "varchar" | "long varchar" | "char" => StringType
    case VarcharN(_) => StringType
    case "varbinary" | "binary" | "long varbinary" => BinaryType
    case other => sys.error(s"unmapped Vertica type: $other")
  }

  /** Spark type → Vertica DDL type name (for JDBC write-back, S9). */
  def sparkToVertica(t: DataType): String = t match {
    case LongType | IntegerType => "int"
    case ShortType => "smallint"
    case DoubleType | FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamp"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case StringType => "varchar(65000)"
    case BinaryType => "varbinary(65000)"
    case other => sys.error(s"unmapped Spark type: $other")
  }

  /** `column_name || ' ' || data_type` catalog projection
    * (`sqoop_table.py:125-129`) — from a real schema instead of
    * `v_catalog.columns`.
    */
  def ddlFragments(schema: StructType): Seq[String] =
    schema.fields.map(f => s"${f.name} ${sparkToVertica(f.dataType)}").toSeq

  /** Full CREATE statement — replaces `export_objects` (`sqoop_table.py:132`). */
  def createTableDdl(table: String, schema: StructType): String =
    s"CREATE TABLE $table (${ddlFragments(schema).mkString(", ")})"
}
