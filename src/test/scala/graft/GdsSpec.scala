package graft

import graft.core.Gds
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class GdsSpec extends SparkSpec {
  import spark.implicits._

  private def people = Gds(Seq(
    ("alice", 30, "london"), ("bob", 25, "paris"),
    ("carol", 35, "london"), ("dave", 25, null),
  ).toDF("name", "age", "city"))

  test("projection selects and orders columns") {
    val out = people.projection("city", "name")
    assert(out.schema.fieldNames.toSeq == Seq("city", "name"))
    assert(out.count == 4)
  }

  test("projectionExpression parses comma list") {
    assert(people.projectionExpression("name , age").schema.fieldNames.toSeq == Seq("name", "age"))
  }

  test("filter / filterNot / filter(field)") {
    assert(people.filter(col("age") > 26).count == 2)
    assert(people.filterNot(col("age") > 26).count == 2)
    assert(people.filter("age", _ === 25).count == 2)
    assert(people.filterRows(r => r.getAs[Int]("age") == 30).count == 1)
  }

  test("mapField rewrites in place, keeps schema order") {
    val out = people.mapField("name", upper _)
    assert(out.schema.fieldNames.toSeq == Seq("name", "age", "city"))
    assert(rows(out.projection("name").toDF).map(_.getString(0)).toSet.contains("ALICE"))
    assert(people.mapFieldIfExists("nope", upper _).count == 4)
  }

  test("replaceValue substitutes across any column") {
    val out = people.replaceValue("london", "LDN")
    assert(rows(out.toDF).count(_.getString(2) == "LDN") == 2)
  }

  test("addField / addFieldIfNotExists / require on duplicate") {
    assert(people.addField("x", lit(1)).schema.fieldNames.contains("x"))
    assert(people.addFieldIfNotExists("age", 99).projection("age").collect.map(_.getInt(0)).max == 35)
    intercept[IllegalArgumentException](people.addField("age", lit(1)))
  }

  test("addFieldFn computes from a row closure; dropFieldIfExists is a no-op on missing") {
    import org.apache.spark.sql.types.IntegerType
    val out = people.addFieldFn("name_len", IntegerType, r => r.getAs[String]("name").length)
    assert(rows(out.toDF).forall(r => r.getInt(r.fieldIndex("name_len")) ==
      r.getString(r.fieldIndex("name")).length))
    assert(people.dropFieldIfExists("nope").schema == people.schema)
    assert(!people.dropFieldIfExists("city").schema.fieldNames.contains("city"))
  }

  test("rename / remove / removeFields regex / case-insensitive remove") {
    assert(people.renameField("name", "nm").schema.fieldNames.contains("nm"))
    assert(!people.removeField("city").schema.fieldNames.contains("city"))
    assert(people.removeField("CITY", caseSensitive = false).schema.fieldNames.length == 2)
    // full-match semantics: "a.e" matches only "age", not "name"
    assert(people.removeFields("a.e".r).schema.fieldNames.toSeq == Seq("name", "city"))
    assert(people.removeFields(".*a.*".r).schema.fieldNames.toSeq == Seq("city"))
  }

  test("dropNullRows / replaceNullValues") {
    assert(people.dropNullRows().count == 3)
    val filled = people.replaceNullValues("unknown")
    assert(rows(filled.toDF).count(_.getString(2) == "unknown") == 1)
  }

  test("schema surgery: lowercase, strip, retype, align") {
    val df = Gds(Seq((1, "a")).toDF("Col_One", "COL_TWO"))
    assert(df.withLowerCaseSchema().schema.fieldNames.toSeq == Seq("col_one", "col_two"))
    assert(df.stripCharsFromFieldNames(Seq('_')).schema.fieldNames.toSeq == Seq("ColOne", "COLTWO"))
    val retyped = people.replaceFieldType("age", StringType)
    assert(retyped.schema("age").dataType == StringType)
    val aligned = people.align(StructType(Seq(
      StructField("age", LongType), StructField("name", StringType),
      StructField("extra", DoubleType))))
    assert(aligned.schema.fieldNames.toSeq == Seq("age", "name", "extra"))
    assert(aligned.schema("age").dataType == LongType)
    assert(rows(aligned.toDF).forall(_.isNullAt(2)))
  }

  test("take / dropRows with explicit order") {
    val out = people.take(2, col("age").asc, col("name").asc)
    assert(rows(out.toDF).map(_.getString(0)) == Seq("bob", "dave"))
    val dropped = people.dropRows(2, col("age").asc, col("name").asc)
    assert(dropped.count == 2)
  }

  test("takeWhile / dropWhile over an ordered key") {
    val nums = Gds((1 to 10).toDF("n"))
    assert(nums.takeWhile(col("n") < 4, col("n")).count == 3)
    assert(nums.dropWhile(col("n") < 4, col("n")).count == 7)
    // predicate never fails -> whole stream kept / nothing dropped
    assert(nums.takeWhile(col("n") < 99, col("n")).count == 10)
    assert(nums.dropWhile(col("n") < 99, col("n")).count == 0)
  }

  test("sampleEvery keeps every k-th by key") {
    val nums = Gds((0 until 100).toDF("n"))
    assert(nums.sampleEvery(10, col("n")).count == 10)
  }

  test("union / subtract / intersection / distinct") {
    val a = Gds(Seq(1, 2, 3).toDF("n"))
    val b = Gds(Seq(3, 4).toDF("n"))
    assert((a ++ b).count == 5)
    assert(a.subtract(b).collect.map(_.getInt(0)).toSet == Set(1, 2))
    assert(a.intersection(b).collect.map(_.getInt(0)).toSet == Set(3))
    assert(Gds(Seq(1, 1, 2).toDF("n")).distinct().count == 2)
  }

  test("cartesian / join with broadcast") {
    val dims = Gds(Seq(("london", "UK"), ("paris", "FR")).toDF("city", "country"))
    assert(people.cartesian(dims).count == 8)
    val joined = people.join("city", dims, broadcastOther = true)
    assert(joined.count == 3) // dave's null city drops
    assert(joined.schema.fieldNames.contains("country"))
  }

  test("zip joins positionally over explicit orders") {
    val l = Gds(Seq("a", "b", "c").toDF("x"))
    val r = Gds(Seq(1, 2, 3).toDF("y"))
    val z = rows(l.zip(r, col("x").asc, col("y").desc).toDF)
    assert(z.map(row => (row.getString(0), row.getInt(1))).toSet == Set(("a", 3), ("b", 2), ("c", 1)))
  }

  test("mapRows / explodeRows closure escape hatches") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("name", StringType), StructField("age", IntegerType)))
    val mapped = people.projection("name", "age")
      .mapRows(r => Row(r.getString(0).toUpperCase, r.getInt(1) + 1), schema)
    assert(mapped.find(col("name") === "ALICE").get.getInt(1) == 31)
    val exploded = people.projection("name", "age")
      .explodeRows(r => Seq.fill(2)(r), schema)
    assert(exploded.count == 8)
  }

  test("explodeCol flattens arrays") {
    val df = Gds(Seq((1, Seq("x", "y"))).toDF("id", "arr"))
    assert(df.explodeCol(col("arr"), "el").count == 2)
  }

  test("grouping: groupBy chains and whole-stream aggregated") {
    val g = people.groupBy("city").sum("age").count("name").toGds
    val london = rows(g.filter(col("city") === "london").toDF).head
    assert(london.getAs[Long]("sum_age") == 65L)
    val whole = people.aggregated().max("age").toGds
    assert(rows(whole.toDF).head.getAs[Int]("max_age") == 35)
  }

  test("actions: collect/count/head/exists/find/minBy/maxBy/iterator") {
    assert(people.count == 4 && people.size == 4)
    assert(people.collectValues.length == 4)
    assert(people.exists(col("name") === "bob"))
    assert(!people.exists(col("name") === "zed"))
    assert(people.find(col("age") === 35).get.getString(0) == "carol")
    assert(people.minBy(col("age")).getInt(1) == 25)
    assert(people.maxBy(col("age")).getString(0) == "carol")
    assert(people.iterator.size == 4)
  }

  test("constructors: fromValues / fromRows / fromIterator") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    assert(Gds.fromValues(spark, schema, Seq(Seq(1, "x"), Seq(2, "y"))).count == 2)
    assert(Gds.fromRows(spark, schema, Row(1, "x"), Row(2, "y")).count == 2)
    assert(Gds.fromIterator(spark, schema, Iterator(Row(3, "z"))).count == 1)
  }

  test("to(sink) writes and returns count; toDataTable materializes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_to").toString + "/out"
    assert(people.to(graft.sources.ParquetSink(dir)) == 4)
    assert(graft.sources.ParquetSource(dir).read(spark).count == 4)
    val dt = people.toDataTable
    assert(dt.size == 4 && dt.schema.fieldNames.length == 3)
  }

  test("predicate DSL builds pushable columns") {
    import graft.sources.Predicates
import graft.sources.Predicates._
    // SQL 3VL: dave's null city makes notEquals null -> dropped
    assert(people.filter(and(gte("age", 25), notEquals("city", "paris"))).count == 2)
    assert(people.filter(or(Predicates.equals("name", "bob"), isNull("city"))).count == 2)
    assert(people.filter(in("age", Seq(25, 35))).count == 3)
  }

  test("multiplex returns reusable handles over one plan") {
    val Seq(x, y) = people.multiplex(2)
    assert(x.count == y.count)
    x.toDF.unpersist()
  }

  test("replaceValueIn scopes to one field; replaceField renames+retypes in place") {
    val df = Gds(Seq(("x", "x", 1), ("y", "x", 2)).toDF("a", "b", "n"))
    val rep = df.replaceValueIn("a", "x", "z").toDF.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rep == Seq(("z", "x"), ("y", "x"))) // b untouched
    val rf = df.replaceField("n", "n_long", org.apache.spark.sql.types.LongType).toDF
    assert(rf.schema.fieldNames.toSeq == Seq("a", "b", "n_long")) // position kept
    assert(rf.schema("n_long").dataType.typeName == "long")
  }

  test("semiJoin/antiJoin/leftJoin variants") {
    val left = Gds(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    // duplicate key on the right: semi must NOT multiply row 1
    val right = Gds(Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("k", "w"))
    assert(left.semiJoin("k", right).toDF.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(left.antiJoin("k", right).toDF.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val lj = left.leftJoin("k", right).toDF
    assert(lj.count == 4) // 1 matches twice, 2 null-filled, 3 once
    assert(lj.filter(col("k") === 2L).head.isNullAt(2))
  }

  test("as[T]/loadAs[T] round-trip case classes (eel load[T] parity)") {
    // typed view stays distributed: map on the Dataset, then collect
    val ds = people.filter(col("age") > 26).as[GdsSpec.Person]
    assert(ds.map(_.name).collect().sorted.toSeq == Seq("alice", "carol"))
    // loadAs materializes at the driver, null column → null field
    val all = people.loadAs[GdsSpec.Person]
    assert(all.length == 4)
    assert(all.find(_.name == "dave").exists(_.city == null))
    // extra columns are dropped by the typed projection
    assert(people.addField("extra", lit(1)).loadAs[GdsSpec.Person].length == 4)
  }
}

object GdsSpec {
  // Encoders need the case class at a stable top-level path
  final case class Person(name: String, age: Int, city: String)
}
