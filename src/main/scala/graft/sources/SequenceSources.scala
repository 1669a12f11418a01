package graft.sources

import org.apache.hadoop.io.{BytesWritable, IntWritable}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.nio.charset.StandardCharsets

/** Hadoop SequenceFile source/sink with eel's layout (reference:
  * eel-core/src/main/scala/io/eels/component/sequence/SequenceSupport
  * .scala): records are (IntWritable, BytesWritable) where the value
  * is a CSV-encoded row and a header record carries the field names;
  * all fields are strings, like the reference.
  *
  * Distribution: eel writes one file with the header as the first
  * record; a parallel writer can't have "first" across part files, so
  * every part file carries its own header record under key 0 and data
  * rows under key 1+ — readers of either layout (including eel's
  * single-file output) see the same relation. RDD API is used only at
  * the format boundary; everything downstream is a DataFrame.
  */
object SequenceSupport {
  // minimal CSV quoting: quote when a field contains comma/quote/newline
  def encode(values: Seq[String]): String = values.map { v =>
    if (v == null) ""
    else if (v.exists(c => c == ',' || c == '"' || c == '\n')) "\"" + v.replace("\"", "\"\"") + "\""
    else v
  }.mkString(",")

  def decode(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0; var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
        else if (c == '"') inQ = false
        else sb += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.result(); sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    out += sb.result()
    out.toArray
  }
}

final case class SequenceSource(path: String) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val rdd = spark.sparkContext
      .sequenceFile(path, classOf[IntWritable], classOf[BytesWritable])
      .map { case (k, v) => (k.get(), new String(v.copyBytes(), StandardCharsets.UTF_8)) }
    val header = SequenceSupport.decode(rdd.filter(_._1 == 0).first()._2)
    val schema = StructType(header.map(f => StructField(f, StringType)))
    val rows = rdd.filter(_._1 != 0).map { case (_, line) =>
      Row.fromSeq(SequenceSupport.decode(line).toSeq.padTo(header.length, null))
    }
    spark.createDataFrame(rows, schema)
  }
}

final case class SequenceSink(path: String) extends Sink {
  def write(df: DataFrame): Unit = {
    val names = df.columns.toSeq
    df.rdd
      .map(r => SequenceSupport.encode(r.toSeq.map(v => if (v == null) null else v.toString)))
      .mapPartitions { it =>
        val header = new BytesWritable(SequenceSupport.encode(names).getBytes(StandardCharsets.UTF_8))
        (Iterator((new IntWritable(0), header)) ++
          it.zipWithIndex.map { case (line, i) =>
            (new IntWritable(i + 1), new BytesWritable(line.getBytes(StandardCharsets.UTF_8)))
          })
      }
      .saveAsSequenceFile(path)
  }
}
