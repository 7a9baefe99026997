package graft.sources

import java.io.ByteArrayInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro object-container source/sink built directly on the Avro core API
  * (the `avro` jar ships with Spark; the separate `spark-avro` DataSource
  * module does not) — the row-interchange format of Kafka/Hadoop
  * pipelines, completing the alternate-format surface (SURVEY §2.1 S10)
  * alongside ORC/parquet/CSV/JSONL/SequenceFile/WARC.
  *
  * Supported column types: long, int, double, boolean, string — the
  * extract-table shape. The writer emits one deflate-compressed container
  * per partition (sync-marked blocks; Avro containers are splittable in
  * principle, this reader parallelizes per file like the WARC path — at
  * crawl scale the file count far exceeds the executor count, so
  * file-granular parallelism saturates the cluster either way).
  */
object Avro {

  private def avroSchema(schema: StructType): Schema = {
    val fields = SchemaBuilder.record("GraftRow").namespace("graft").fields()
    schema.fields.foldLeft(fields) { (b, f) =>
      // nullable StructFields map to the standard ["null", T] union (with
      // null default) so a null cell encodes instead of throwing mid-task
      (f.dataType, f.nullable) match {
        case (LongType, false)    => b.requiredLong(f.name)
        case (IntegerType, false) => b.requiredInt(f.name)
        case (DoubleType, false)  => b.requiredDouble(f.name)
        case (BooleanType, false) => b.requiredBoolean(f.name)
        case (StringType, false)  => b.requiredString(f.name)
        case (LongType, true)     => b.optionalLong(f.name)
        case (IntegerType, true)  => b.optionalInt(f.name)
        case (DoubleType, true)   => b.optionalDouble(f.name)
        case (BooleanType, true)  => b.optionalBoolean(f.name)
        case (StringType, true)   => b.optionalString(f.name)
        case (t, _) => throw new IllegalArgumentException(s"unsupported: $t")
      }
    }.endRecord()
  }

  /** Write as `numFiles` Avro containers (deflate). */
  def write(df: DataFrame, path: String, numFiles: Int): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    df.repartition(numFiles).foreachPartition { rows: Iterator[Row] =>
      val sch = new Schema.Parser().parse(schemaJson)
      val p = new Path(f"$path/part-${TaskContext.getPartitionId()}%05d.avro")
      val fs = p.getFileSystem(new Configuration())
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](sch))
        .setCodec(CodecFactory.deflateCodec(6))
        .create(sch, fs.create(p, true))
      try rows.foreach { r =>
        val rec = new GenericData.Record(sch)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, r.get(i))
        }
        w.append(rec)
      } finally w.close()
    }
  }

  /** Read a directory of Avro containers with an explicit expected schema
    * (no inference — the S7/S10 discipline). One task per container file.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select(col("content"))
    val names = schema.fields.map(_.name)
    bin.flatMap { row =>
      val in = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(row.getAs[Array[Byte]](0)),
        new GenericDatumReader[GenericRecord]())
      val out = in.iterator().asScala.map { rec =>
        Row.fromSeq(names.toIndexedSeq.map { n =>
          rec.get(n) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case v => v
          }
        })
      }.toVector
      in.close()
      out
    }(encoder)
  }
}
