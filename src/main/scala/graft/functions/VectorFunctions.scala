package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order functions (`zip_with`/`aggregate`) so they run in
  * codegen with zero UDF/serialization cost and distribute trivially.
  *
  * Everything is computed in double (inputs cast up front): identical
  * accumulation order and precision as the DuckDB oracle's
  * `::DOUBLE[]` list functions.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd dot/cosine (VectorExpressions); the `*Hof`
    * variants keep the pure-built-in formulation for cross-checking. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  def cosineHof(a: Column, b: Column): Column = dotHof(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for stable cross-engine compare / rank ties. */
  def cosineRounded(a: Column, b: Column, decimals: Int = 6): Column =
    round(cosine(a, b), decimals)

  /** Sign bit of `v · plane` for one random hyperplane, as 0/1. */
  def hyperplaneBit(v: Column, plane: Array[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    when(dot(v, planeCol) >= 0, lit(1)).otherwise(lit(0))
  }

  /** Single-table `nBits`-bit bucket (HOF reference implementation —
    * the hot path is [[lshBuckets]]). */
  def lshBucket(v: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (p, i) =>
      hyperplaneBit(v, p).cast("long") * lit(1L << i)
    }.reduce(_ + _)
  }

  /** Multi-table LSH buckets: `nTables` independent `nBits`-bit hash
    * tables as an array column — a candidate is anything sharing a
    * bucket in ANY table. Standard recall/cost trade (single-table
    * sign-LSH recall decays as cos^nBits; OR-ing tables recovers it).
    * One native codegen'd pass over the vector for all tables. */
  def lshBuckets(v: Column, dim: Int, nBits: Int, nTables: Int, seed: Long = 42L): Column =
    VectorExpressions.lshBuckets(v, dim, nBits, nTables, seed)
}
