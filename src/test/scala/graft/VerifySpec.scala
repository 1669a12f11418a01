package graft

import org.apache.spark.sql.functions._

/** The representation-portability gate that guards every Verify dump
  * (closes the r10 corpus_manifest class: a mathematically-correct
  * value that no portable representation carries exactly). */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  test("assertPortable: rejects decimal/double magnitudes >= 2^53, top-level and nested") {
    // the exact r10 shape: DECIMAL(38,0) sum landing ~4e19
    val bigDec = Seq(1L, 2L).toDF("id")
      .select(col("id"), lit("40000000000000000000").cast("decimal(38,0)").as("fp"))
    val e = intercept[IllegalStateException](Verify.assertPortable(bigDec, "q_dec"))
    assert(e.getMessage.contains("q_dec") && e.getMessage.contains("fp"))

    val bigDouble = Seq(1L).toDF("id").select(col("id"), lit(1.0e19).as("v"))
    intercept[IllegalStateException](Verify.assertPortable(bigDouble, "q_dbl"))

    val bigInArray = Seq(1L).toDF("id")
      .select(col("id"), array(lit(1.0), lit(2.0e17)).as("vs"))
    intercept[IllegalStateException](Verify.assertPortable(bigInArray, "q_arr"))

    val bigInStruct = Seq(1L).toDF("id")
      .select(col("id"), struct(lit(3.0e18).as("x"), lit("ok").as("s")).as("st"))
    intercept[IllegalStateException](Verify.assertPortable(bigInStruct, "q_struct"))

    // map KEYS are checked, not just values (a non-exact key escaping
    // would be the same defect class)
    val bigMapKey = Seq(1L).toDF("id")
      .select(col("id"), map(lit(9.1e15), lit(1L)).as("m"))
    intercept[IllegalStateException](Verify.assertPortable(bigMapKey, "q_mapkey"))
    val bigMapVal = Seq(1L).toDF("id")
      .select(col("id"), map(lit(1L), lit(9.1e15)).as("m"))
    intercept[IllegalStateException](Verify.assertPortable(bigMapVal, "q_mapval"))
    val okMap = Seq(1L).toDF("id")
      .select(col("id"), map(lit(1.5), lit(2.5)).as("m"))
    Verify.assertPortable(okMap, "q_mapok")
  }

  test("assertPortable: passes exact types at any magnitude and small floats/decimals") {
    // int64 above 2^53 is fine — integral columns are exact in every engine
    val bigLong = Seq(Long.MaxValue).toDF("id")
    Verify.assertPortable(bigLong, "q_long")
    val mixed = Seq((1L, "s", true)).toDF("id", "s", "b")
      .select(col("*"), lit(123.456).as("d"),
        lit("99999.999999").cast("decimal(18,6)").as("dec"),
        array(lit(1.5f), lit(-2.5f)).as("fs"),
        lit(null).cast("double").as("nd"))
    Verify.assertPortable(mixed, "q_mixed")
    // empty relation with a decimal column: no rows, no violation
    Verify.assertPortable(mixed.filter(lit(false)), "q_empty")
  }
}
