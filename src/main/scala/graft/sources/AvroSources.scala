package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro source/sink (reference: eel-avro module). The image has no
  * spark-avro DataSource jar, but avro-mapred ships with Spark, so the
  * format boundary is AvroKeyInput/OutputFormat over RDDs with an
  * explicit StructType<->avro Schema mapping; everything downstream is
  * a DataFrame. Timestamps travel as long micros (timestamp-micros
  * semantics), matching spark-avro's default.
  */
object AvroSupport {

  def toAvroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case StringType => Schema.create(Schema.Type.STRING)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType => Schema.create(Schema.Type.LONG) // micros
        case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
      }
      val union = Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, java.util.List.of(fields: _*))
  }

  def toSparkType(s: Schema): DataType = {
    val nonNull = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL).head else s
    nonNull.getType match {
      case Schema.Type.STRING => StringType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
    }
  }

  def toStructType(s: Schema): StructType =
    StructType(s.getFields.asScala.map(f => StructField(f.name(), toSparkType(f.schema()))).toSeq)
}

final case class AvroSource(path: String) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path, classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable])
    // one record to discover the schema (files are self-describing)
    val schemaJson = rdd.map(_._1.datum().getSchema.toString).first()
    val structType = AvroSupport.toStructType(new Schema.Parser().parse(schemaJson))
    val rows = rdd.map { case (k, _) =>
      val rec = k.datum()
      Row.fromSeq(structType.fields.indices.map { i =>
        rec.get(i) match {
          case null => null
          case u: org.apache.avro.util.Utf8 => u.toString
          case bb: java.nio.ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case v => v
        }
      })
    }
    spark.createDataFrame(rows, structType)
  }
}

final case class AvroSink(path: String) extends Sink {
  def write(df: DataFrame): Unit = {
    val sparkSchema = df.schema
    val avroSchemaJson = AvroSupport.toAvroSchema(sparkSchema).toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroSchemaJson))
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(avroSchemaJson) // parse once per partition
      it.map { row =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = row.get(i) match {
            case null => null
            case t: java.sql.Timestamp => t.getTime / 1000 * 1000000L + t.getNanos / 1000
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case v => v
          }
          rec.put(f.name, v)
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }
}
