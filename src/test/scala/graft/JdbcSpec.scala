package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** S1/S2 against a real JDBC database (embedded Derby, ships with Spark):
  * the reference's whole staging-table + sequence-modulo + Sqoop apparatus
  * (`sqoop_table.py:75-104`) reduces to one partitioned `spark.read.jdbc`.
  */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE warehouse_t (id BIGINT NOT NULL, month_sid BIGINT, amount DECIMAL(12,2), name VARCHAR(64))")
    val ps = conn.prepareStatement("INSERT INTO warehouse_t VALUES (?, ?, ?, ?)")
    (0 until 1000).foreach { i =>
      ps.setLong(1, i.toLong)
      ps.setLong(2, 199500L + (i % 12))
      ps.setBigDecimal(3, new java.math.BigDecimal(s"$i.25"))
      ps.setString(4, s"row-$i")
      ps.addBatch()
    }
    ps.executeBatch()
    conn.commit()
    conn.close()
    u
  }

  test("S1: partitioned JDBC read produces numPartitions splits covering all rows") {
    val df = Sources.jdbcPartitioned(spark, url, "warehouse_t", "id", 0L, 1000L, 8)
    assert(df.rdd.getNumPartitions == 8) // the NUM_MAPPERS contract
    assert(df.count() == 1000)
    // stripes are disjoint + exhaustive: ids unique
    assert(df.select(countDistinct(col("id"))).head().getLong(0) == 1000)
  }

  test("S2: full-table JDBC read with pushed filter") {
    val df = Sources.jdbcFull(spark, url, "warehouse_t")
      .filter(col("month_sid") === 199501L)
    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement()
      .executeQuery("SELECT COUNT(*) FROM warehouse_t WHERE month_sid = 199501")
    rs.next()
    assert(df.count() == rs.getLong(1))
    conn.close()
  }

  test("decimal fidelity round-trips the JDBC hop (SURVEY §7 hard part)") {
    val df = Sources.jdbcFull(spark, url, "warehouse_t")
    val total = df.agg(sum(col("amount"))).head().getDecimal(0)
    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement().executeQuery("SELECT SUM(amount) FROM warehouse_t")
    rs.next()
    assert(total.compareTo(rs.getBigDecimal(1)) == 0)
    conn.close()
  }

  test("boundary decimals and microsecond timestamps survive the JDBC hop") {
    import java.sql.Timestamp
    import graft.etl.TypeMapping
    import org.apache.spark.sql.types.{DecimalType, TimestampType}
    // decimal(38,s) is the Vertica-side shape (TypeMapping keeps p/s exact);
    // Derby's storage cap is DECIMAL(31,s), so the stored hop is exercised at
    // that bound with max-magnitude and 1-ulp values
    assert(TypeMapping.verticaToSpark("numeric(38,18)") == DecimalType(38, 18))
    assert(TypeMapping.sparkToVertica(DecimalType(38, 18)) == "numeric(38,18)")
    assert(TypeMapping.verticaToSpark("timestamp(6)") == TimestampType)
    val maxD = BigDecimal("999999999999999999999.9999999999") // DECIMAL(31,10) max
    val ulpD = BigDecimal("0.0000000001")
    val vals = Seq(
      (1L, maxD, Timestamp.valueOf("2024-01-15 23:59:59.999999")),
      (2L, -maxD, Timestamp.valueOf("1970-01-01 00:00:00.000001")),
      (3L, ulpD, Timestamp.valueOf("1905-06-30 12:34:56.654321")),
      (4L, -ulpD, Timestamp.valueOf("2262-04-11 23:47:16.854775")))
    // explicit schema: the tuple encoder's default Decimal(38,18) cannot hold
    // 21 integer digits
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DecimalType(31, 10)),
      StructField("ts", TimestampType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vals.map { case (i, d, t) =>
        Row(i, d.bigDecimal, t) }: _*), schema)
    df.write.mode("overwrite")
      .option("createTableColumnTypes", "id BIGINT, amount DECIMAL(31,10), ts TIMESTAMP")
      .jdbc(url, "boundary_t", new java.util.Properties())
    val back = Sources.jdbcFull(spark, url, "boundary_t")
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)), r.getTimestamp(2)))
      .sortBy(_._1)
    assert(back.length == vals.length)
    vals.zip(back).foreach { case ((id, d, ts), (bid, bd, bts)) =>
      assert(bid == id)
      assert(bd.compare(d) == 0, s"decimal drift at id=$id: wrote $d read $bd")
      assert(bts == ts, s"timestamp drift at id=$id: wrote $ts read $bts")
    }
  }

  test("VerticaDialect: df.write.jdbc would emit native Vertica DDL types") {
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    import graft.sources.{VerticaDialect, VerticaDialectRegistration}
    VerticaDialectRegistration.register()
    VerticaDialectRegistration.register() // idempotent
    val got = JdbcDialects.get("jdbc:vertica://dw-host:5433/warehouse")
    assert(got eq VerticaDialect)
    // the exact DDL df.write.jdbc generates through the dialect —
    // sqoop_table.py:158-165's staging-table shapes, natively typed
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DecimalType(38, 18)),
      StructField("ts", TimestampType),
      StructField("name", StringType),
      StructField("flag", BooleanType)))
    val ddl = JdbcUtils.schemaString(VerticaDialect, schema,
      caseSensitive = false, None)
    assert(ddl.contains("\"id\" int NOT NULL"))
    assert(ddl.contains("\"amount\" numeric(38,18)"))
    assert(ddl.contains("\"ts\" timestamp"))
    assert(ddl.contains("\"name\" varchar(65000)"))
    assert(ddl.contains("\"flag\" boolean"))
  }

  test("VerticaDialect: catalog types map back to exact Catalyst types") {
    import java.sql.Types
    import org.apache.spark.sql.types._
    import graft.sources.VerticaDialect
    def md(scale: Int) = new MetadataBuilder().putLong("scale", scale.toLong)
    // Vertica reports every integer column as 64-bit
    assert(VerticaDialect.getCatalystType(Types.BIGINT, "Integer", 19,
      new MetadataBuilder()) === Some(LongType))
    // boundary decimal keeps exact precision/scale through the read mapping
    assert(VerticaDialect.getCatalystType(Types.NUMERIC, "Numeric", 38,
      md(18)) === Some(DecimalType(38, 18)))
    assert(VerticaDialect.getCatalystType(Types.NUMERIC, "Numeric", 31,
      md(10)) === Some(DecimalType(31, 10)))
    assert(VerticaDialect.getCatalystType(Types.VARCHAR, "Varchar", 65000,
      new MetadataBuilder()) === Some(StringType))
    // unknown types fall through to Spark's generic mapping
    assert(VerticaDialect.getCatalystType(Types.TIMESTAMP, "Timestamp", 26,
      new MetadataBuilder()) === None)
    assert(VerticaDialect.quoteIdentifier("od\"d") === "\"od\"\"d\"")
    assert(VerticaDialect.isCascadingTruncateTable() === Some(false))
  }

  test("VerticaDialect: declares the pushdowns the warehouse executes natively") {
    import graft.sources.VerticaDialect
    // ordered-LIMIT status probes (sqoop_table.py:41/:50/:107) and the
    // count/bounds probes (:54-57) only run warehouse-side if the dialect
    // says so — otherwise DSv2 silently fetches rows and re-sorts
    assert(VerticaDialect.supportsLimit)
    assert(VerticaDialect.supportsOffset)
    assert(VerticaDialect.getLimitClause(5) === "LIMIT 5")
    Seq("SUM", "COUNT", "MIN", "MAX", "AVG").foreach { f =>
      assert(VerticaDialect.isSupportedFunction(f), f)
    }
    // never claim what Vertica might not accept verbatim
    assert(!VerticaDialect.isSupportedFunction("REGR_SLOPE"))
  }

  test("DerbyProbeDialect: sole claimant of derby URLs, FETCH FIRST spelling, full delegation") {
    import java.sql.Types
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    import graft.sources.{DerbyProbeDialect, DerbyProbeDialectRegistration}
    DerbyProbeDialectRegistration.register()
    DerbyProbeDialectRegistration.register() // idempotent
    val got = JdbcDialects.get("jdbc:derby:/tmp/x/db")
    // must be the wrapper itself, NOT an AggregatedDialect merge — a merge
    // forwards only type mapping and silently drops supportsLimit and
    // isSupportedFunction to defaults (no TopN pushdown, broken agg
    // pushdown, bare LIMIT emitted into Derby SQL)
    assert(got.isInstanceOf[DerbyProbeDialect],
      s"expected DerbyProbeDialect, got ${got.getClass.getName}")
    assert(got.supportsLimit)
    assert(!got.supportsOffset) // Derby wants OFFSET before FETCH — off
    assert(got.getLimitClause(1) === "FETCH FIRST 1 ROWS ONLY")
    // the aggregate-pushdown gate and type surface defer to the built-in
    assert(got.isSupportedFunction("COUNT") && got.isSupportedFunction("SUM"))
    assert(got.getCatalystType(Types.REAL, "REAL", 7,
      new MetadataBuilder()) === Some(FloatType))
    assert(got.getJDBCType(StringType).map(_.databaseTypeDefinition)
      === Some("CLOB"))
  }

  test("dialect DDL round-trips: generated Vertica types parse back to the same schema") {
    import org.apache.spark.sql.types._
    import graft.etl.TypeMapping
    import graft.sources.VerticaDialect
    val types = Seq(LongType, DecimalType(38, 18), DecimalType(12, 2),
      TimestampType, DateType, BooleanType, StringType, DoubleType)
    types.foreach { t =>
      val ddlName = VerticaDialect.getJDBCType(t).get.databaseTypeDefinition
      val back = TypeMapping.verticaToSpark(ddlName)
      val expect = t match {
        case DoubleType => DoubleType
        case StringType => StringType
        case other => other
      }
      assert(back === expect, s"$t -> $ddlName -> $back")
    }
  }

  test("JDBC write-back (the Vertica-external-table read-back role, S9)") {
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite")
      .jdbc(url, "nation_copy", new java.util.Properties())
    val back = Sources.jdbcFull(spark, url, "nation_copy")
    assert(back.count() == src.count())
    assert(back.select(sum(col("n_nationkey"))).head().getLong(0) ==
      src.select(sum(col("n_nationkey"))).head().getLong(0))
  }
}
