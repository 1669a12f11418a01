package graft

import graft.sources._
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  private def sample = Seq((1, "a", 1.5), (2, "b", -0.5), (3, null, 2.25))
    .toDF("k", "s", "v")

  test("parquet roundtrip preserves schema and values") {
    val p = tmp("parquet")
    ParquetSink(p).write(sample)
    val back = ParquetSource(p).read(spark)
    // parquet read-back marks everything nullable; compare names+types
    assert(back.schema.map(f => (f.name, f.dataType)) == sample.schema.map(f => (f.name, f.dataType)))
    assert(back.count == 3)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val p = tmp("part")
    ParquetSink(p, partitionCols = Seq("s")).write(sample.na.fill("z"))
    val pruned = ParquetSource(p).read(spark).filter(col("s") === "a")
    assert(pruned.count == 1)
    // partition pruning visible in the scan: only one directory read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange")) // scan+filter only, no shuffle
  }

  test("csv roundtrip with delimiter, header and nulls") {
    val p = tmp("csv")
    CsvSink(p, header = true, delimiter = ";").write(sample)
    val schema = StructType(Seq(StructField("k", IntegerType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = CsvSource(p, header = true, delimiter = ";", nullValue = "", schema = Some(schema)).read(spark)
    assert(back.count == 3)
    assert(back.filter(col("s").isNull).count == 1)
  }

  test("json roundtrip") {
    val p = tmp("json")
    JsonSink(p).write(sample)
    val back = JsonSource(p, schema = Some(sample.schema)).read(spark)
    assert(back.count == 3)
    assert(back.filter(col("k") === 2).head().getAs[Double]("v") == -0.5)
  }

  test("orc roundtrip") {
    val p = tmp("orc")
    OrcSink(p).write(sample)
    assert(OrcSource(p).read(spark).count == 3)
  }

  test("glob paths read multiple files (FilePattern semantics)") {
    val base = Files.createTempDirectory("graft_glob").toString
    ParquetSink(s"$base/d1").write(sample)
    ParquetSink(s"$base/d2").write(sample)
    assert(ParquetSource(s"$base/d*").read(spark).count == 6)
  }

  test("sequence file roundtrip with eel layout (header record, all-string fields)") {
    val p = tmp("seq")
    SequenceSink(p).write(sample)
    val back = SequenceSource(p).read(spark)
    assert(back.schema.fieldNames.toSeq == Seq("k", "s", "v"))
    assert(back.count == 3)
    val r2 = back.filter(col("k") === "2").head()
    assert(r2.getString(1) == "b" && r2.getString(2) == "-0.5")
  }

  test("sequence csv encoding round-trips commas, quotes, nulls") {
    val vals = Seq("plain", "with,comma", "with\"quote", null, "multi\nline")
    assert(SequenceSupport.decode(SequenceSupport.encode(vals)).toSeq ==
      Seq("plain", "with,comma", "with\"quote", "", "multi\nline"))
  }

  test("avro roundtrip preserves types and values") {
    val p = tmp("avro")
    AvroSink(p).write(sample)
    val back = AvroSource(p).read(spark)
    assert(back.schema.map(f => (f.name, f.dataType)) == sample.schema.map(f => (f.name, f.dataType)))
    assert(back.count == 3)
    assert(back.filter(col("k") === 2).head().getAs[Double]("v") == -0.5)
    assert(back.filter(col("s").isNull).count == 1)
  }

  test("jdbc source/sink construct reader recipes (no driver jar in image)") {
    val src = JdbcSource("jdbc:h2:mem:x", "SELECT 1", Some("c"), 0, 10, 4)
    assert(src.numPartitions == 4)
    assert(DevNullSink != null)
  }

  test("range-clustered parquet: each file covers a disjoint key range") {
    val p = tmp("rangecluster")
    val df = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    ParquetSink(p, rangeClusterCols = Seq("o_orderkey"), rangePartitions = Some(4))
      .write(df.repartition(8))
    // per-file min/max must not overlap if range clustering worked
    val files = new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1)
    val ranges = files.map { f =>
      val stats = spark.read.parquet(f.getPath)
        .agg(org.apache.spark.sql.functions.min("o_orderkey"),
          org.apache.spark.sql.functions.max("o_orderkey")).head()
      (stats.getLong(0), stats.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlapping file ranges")
      case _ =>
    }
  }

  test("bucketed tables join without an exchange") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    BucketedTableSink("graft_li_b", 4, Seq("l_orderkey")).write(li)
    BucketedTableSink("graft_ord_b", 4, Seq("o_orderkey")).write(ord)
    try {
      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_ord_b"), col("l_orderkey") === col("o_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty, s"expected exchange-free bucketed join:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == li.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_ord_b")
    }
  }

  test("append mode accumulates") {
    val p = tmp("append")
    ParquetSink(p, mode = SaveMode.Append).write(sample)
    ParquetSink(p, mode = SaveMode.Append).write(sample)
    assert(ParquetSource(p).read(spark).count == 6)
  }

  test("csv malformed-row modes: permissive captures, dropmalformed skips, failfast throws") {
    import org.apache.spark.sql.types._
    val p = tmp("badcsv") + "/rows.csv"
    new java.io.File(p).getParentFile.mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "id,n\n1,10\nnot-a-number,oops\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    // PERMISSIVE + corrupt column: bad row kept, fields nulled, raw line captured
    val perm = CsvSource(p, schema = Some(schema),
      corruptColumn = Some("_bad")).read(spark).collect()
    assert(perm.length == 3)
    val bad = perm.filter(r => !r.isNullAt(2))
    assert(bad.length == 1 && bad.head.getString(2) == "not-a-number,oops"
      && bad.head.isNullAt(0))
    // DROPMALFORMED: bad row gone
    val dropped = CsvSource(p, schema = Some(schema), mode = "DROPMALFORMED").read(spark)
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // FAILFAST: reading throws on the bad row
    intercept[org.apache.spark.SparkException] {
      CsvSource(p, schema = Some(schema), mode = "FAILFAST").read(spark).collect()
    }
    // corruptColumn must also work WITHOUT a declared schema (Spark's
    // inference never adds the column; the source probes the inferred
    // schema and re-reads with it). A wrong-arity row is the malformed
    // case inference can't paper over (a bad TYPE would just widen the
    // inferred column to string).
    val p2 = tmp("badcsv2") + "/rows.csv"
    new java.io.File(p2).getParentFile.mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p2),
      "id,n\n1,10\n2,20,extra\n3,30\n")
    val inferred = CsvSource(p2, inferSchema = true, corruptColumn = Some("_bad"))
      .read(spark)
    assert(inferred.schema.fieldNames.contains("_bad"))
    val bi = inferred.schema.fieldIndex("_bad")
    val infBad = inferred.collect().filter(r => !r.isNullAt(bi))
    assert(infBad.length == 1 && infBad.head.getString(bi) == "2,20,extra")
  }

  test("text source: line mode rows, whole-file mode one row per doc with path") {
    val base = java.nio.file.Files.createTempDirectory("graft_text").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/a.txt"),
      "line one\nline two\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/b.txt"),
      "doc two body\nwith newline\n".getBytes("UTF-8"))
    val lines = TextSource(base).read(spark).collect().map(_.getString(0)).sorted
    assert(lines.toSeq == Seq("doc two body", "line one", "line two", "with newline"))
    val docs = TextSource(base, wholeFile = true).read(spark)
      .collect().map(r => r.getString(1).split('/').last -> r.getString(0)).toMap
    assert(docs.keySet == Set("a.txt", "b.txt"))
    assert(docs("a.txt") == "line one\nline two\n") // whole file, newlines kept
    // sink roundtrip (line mode)
    val out = s"$base/out"
    TextSink(out).write(TextSource(base).read(spark))
    assert(TextSource(out).read(spark).count() == 4)
  }
}
