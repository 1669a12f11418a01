package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting.
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles
  * most skew at runtime; explicit salting remains the tool when one
  * side has a few pathological hot keys known in advance (the classic
  * null-key / default-value / celebrity-entity cases in web-scale
  * corpora).
  *
  * Shape: the skewed (big) side gets a uniform random salt in
  * [0, factor); the other side is replicated `factor` times with every
  * salt value. The join key becomes (key, salt), splitting each hot
  * key's rows across `factor` reducers. Replication multiplies the
  * small side by `factor` — keep it the dimension side.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // right/full outer would surface each unmatched replicated-side row
    // `factor` times — reject rather than silently multiply rows
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got $joinType")
    val salted = skewed.withColumn("__salt", (rand(42) * factor).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
