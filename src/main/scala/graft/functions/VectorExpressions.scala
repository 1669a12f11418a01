package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot paths.
  *
  * The higher-order-function formulations (`zip_with`/`aggregate`)
  * evaluate one interpreted lambda call per element; these generate a
  * tight primitive loop inside whole-stage codegen instead (~100× on
  * the LSH bucketing path in bench). Both float and double element
  * types are handled without an up-front `cast` copy.
  */
object VectorExpressions {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  private def getter(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  private def read(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** cosine(a, b) as one fused loop (dot, |a|, |b| in a single pass). */
  case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (tx, ty) = (elemType(left), elemType(right))
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xv = read(tx, x, i); val yv = read(ty, y, i)
        dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, dot, nx, ny, n) =
          (ctx.freshName("i"), ctx.freshName("dot"), ctx.freshName("nx"),
            ctx.freshName("ny"), ctx.freshName("n"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double xv = ${getter(elemType(left), a, i)};
           |  double yv = ${getter(elemType(right), b, i)};
           |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** dot(a, b) fused loop. */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (tx, ty) = (elemType(left), elemType(right))
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += read(tx, x, i) * read(ty, y, i); i += 1 }
      dot
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, dot, n) = (ctx.freshName("i"), ctx.freshName("dot"), ctx.freshName("n"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** All `nTables` random-hyperplane LSH bucket ids in ONE pass over
    * the vector. `planes` is flattened [table*nBits+bit][dim] row-major
    * and shipped as a reference object into the generated class.
    * Output: array<long> of length nTables. */
  case class LshSignBuckets(child: Expression, planes: Array[Double],
                            dim: Int, nBits: Int, nTables: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    private def compute(tx: DataType, v: ArrayData): Array[Long] = {
      val n = math.min(dim, v.numElements())
      val out = new Array[Long](nTables)
      var t = 0
      while (t < nTables) {
        var bucket = 0L; var b = 0
        while (b < nBits) {
          val base = (t * nBits + b) * dim
          var dot = 0.0; var d = 0
          while (d < n) { dot += read(tx, v, d) * planes(base + d); d += 1 }
          if (dot >= 0) bucket |= (1L << b)
          b += 1
        }
        out(t) = bucket; t += 1
      }
      out
    }

    override def nullSafeEval(a: Any): Any =
      new GenericArrayData(compute(elemType(child), a.asInstanceOf[ArrayData]))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
        val (out, t, b, d, dot, bucket, n) =
          (ctx.freshName("out"), ctx.freshName("t"), ctx.freshName("b"), ctx.freshName("d"),
            ctx.freshName("dot"), ctx.freshName("bucket"), ctx.freshName("n"))
        s"""
           |int $n = java.lang.Math.min($dim, $v.numElements());
           |long[] $out = new long[$nTables];
           |for (int $t = 0; $t < $nTables; $t++) {
           |  long $bucket = 0L;
           |  for (int $b = 0; $b < $nBits; $b++) {
           |    int base = ($t * $nBits + $b) * $dim;
           |    double $dot = 0.0;
           |    for (int $d = 0; $d < $n; $d++) {
           |      $dot += ${getter(elemType(child), v, d)} * $planesRef[base + $d];
           |    }
           |    if ($dot >= 0) $bucket |= (1L << $b);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The `nProbe` nearest centroids (by cosine) of the input vector,
    * as array<int> of centroid ids, nearest first. `centroids` is
    * flattened [c][dim] row-major. One codegen'd pass computing all C
    * cosines then a bounded selection — used both for IVF cell
    * assignment (nProbe=1) and query-side multi-probe. */
  case class NearestCentroids(child: Expression, centroids: Array[Double],
                              dim: Int, c: Int, nProbe: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    // shared by eval and the generated code (called reflectively is
    // messy — generated code calls this static-object method directly)
    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val et = elemType(child)
      val n = math.min(dim, v.numElements())
      val vv = new Array[Double](n)
      var i = 0
      while (i < n) { vv(i) = read(et, v, i); i += 1 }
      new GenericArrayData(NearestCentroidsImpl.select(vv, centroids, dim, c, nProbe))
    }

    // NOTE: targets the TOP-LEVEL NearestCentroidsImpl object so the
    // call is a plain Java static-forwarder invocation. The nested
    // object's Java name (`VectorExpressions$NearestCentroids$`) is not
    // resolvable by janino and silently killed whole-stage codegen for
    // every stage containing this expression.
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val centroidsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
        val (vv, i, n) = (ctx.freshName("vv"), ctx.freshName("i"), ctx.freshName("n"))
        s"""
           |int $n = java.lang.Math.min($dim, $v.numElements());
           |double[] $vv = new double[$n];
           |for (int $i = 0; $i < $n; $i++) { $vv[$i] = ${getter(elemType(child), v, i)}; }
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.NearestCentroidsImpl.select(
           |    $vv, $centroidsRef, $dim, $c, $nProbe));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Delegator kept for source compatibility (specs reference
    * `VectorExpressions.NearestCentroids.select`); implementation in
    * top-level [[NearestCentroidsImpl]] for codegen reachability. */
  object NearestCentroids {
    def select(v: Array[Double], centroids: Array[Double], dim: Int, c: Int, nProbe: Int): Array[Int] =
      NearestCentroidsImpl.select(v, centroids, dim, c, nProbe)
  }

  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a), Bridge.expression(b)))

  def nearestCentroids(v: Column, centroidsFlat: Array[Double], dim: Int,
                       c: Int, nProbe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(v), centroidsFlat, dim, c, nProbe))

  /** Engine-portable hyperplanes: component (t,b,d) is
    * lcg((t*nBits+b)*dim+d)/2^31 - 0.5 with the classic
    * a=1103515245, c=12345, m=2^31 LCG. Every value is an exactly
    * representable dyadic rational, so any engine that can do 64-bit
    * integer arithmetic rebuilds bit-identical planes (the DuckDB
    * oracle does exactly this). Sign-LSH only needs a symmetric
    * component distribution — uniform works as well as Gaussian. */
  def lcgPlanes(dim: Int, nBits: Int, nTables: Int): Array[Double] = {
    val flat = new Array[Double](nTables * nBits * dim)
    var idx = 0
    while (idx < flat.length) {
      val k = (1103515245L * idx + 12345L) % 2147483648L
      flat(idx) = k.toDouble / 2147483648.0 - 0.5
      idx += 1
    }
    flat
  }

  /** All pairwise products c_i·c_j (i ≤ j) of an integer code vector,
    * flattened row-major upper-triangular — the per-row term of a
    * distributed second-moment (Gram/covariance) aggregation. One
    * codegen'd pass, d(d+1)/2 longs out; downstream posexplode +
    * groupBy(pos) partial-aggregates them, so the shuffle carries
    * d(d+1)/2 rows PER MAP TASK, not per input row. Integer products
    * of int8-quantized codes: exact, order-free, engine-portable
    * (the fixed-point covariance recipe). */
  case class UpperTriProducts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      new GenericArrayData(UpperTriImpl.compute(a.asInstanceOf[ArrayData]))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.UpperTriImpl.compute($v));""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: upper-triangular self-products of an int code array. */
  def upperTriProducts(codes: Column): Column =
    Bridge.column(UpperTriProducts(Bridge.expression(codes)))

  /** LSH buckets with caller-supplied planes (flattened
    * [table*nBits+bit][dim] row-major, as in [[LshSignBuckets]]). */
  def lshBucketsWith(v: Column, planes: Array[Double], dim: Int, nBits: Int, nTables: Int): Column =
    Bridge.column(LshSignBuckets(Bridge.expression(v), planes, dim, nBits, nTables))

  def lshBuckets(v: Column, dim: Int, nBits: Int, nTables: Int, seed: Long = 42L): Column = {
    // identical plane generation to VectorFunctions.lshBucket: per-table
    // seeded RNG so single-table buckets are comparable across impls
    val flat = new Array[Double](nTables * nBits * dim)
    for (t <- 0 until nTables) {
      val rnd = new scala.util.Random(seed + t * 7919L)
      for (b <- 0 until nBits; d <- 0 until dim)
        flat((t * nBits + b) * dim + d) = rnd.nextGaussian()
    }
    Bridge.column(LshSignBuckets(Bridge.expression(v), flat, dim, nBits, nTables))
  }
}

/** Top-level so whole-stage codegen can call the Java static
  * forwarder `graft.functions.UpperTriImpl.compute` directly. */
object UpperTriImpl {
  /** [c_0·c_0, c_0·c_1, …, c_0·c_{d-1}, c_1·c_1, …, c_{d-1}·c_{d-1}]:
    * row-major upper triangular, p(i,j) = i·d − i(i−1)/2 + (j−i). */
  def compute(codes: ArrayData): Array[Long] = {
    val d = codes.numElements()
    val out = new Array[Long](d * (d + 1) / 2)
    var p = 0
    var i = 0
    while (i < d) {
      val ci = codes.getInt(i).toLong
      var j = i
      while (j < d) { out(p) = ci * codes.getInt(j); p += 1; j += 1 }
      i += 1
    }
    out
  }
}

/** Top-level so whole-stage codegen can call the Java static
  * forwarder `graft.functions.NearestCentroidsImpl.select` directly. */
object NearestCentroidsImpl {
  /** nProbe centroid ids with highest cosine to v, nearest first. */
  def select(v: Array[Double], centroids: Array[Double], dim: Int, c: Int, nProbe: Int): Array[Int] = {
      val sims = new Array[Double](c)
      var vn = 0.0
      var d = 0
      while (d < v.length) { vn += v(d) * v(d); d += 1 }
      var ci = 0
      while (ci < c) {
        var dot = 0.0; var cn = 0.0
        var j = 0
        val base = ci * dim
        val n = math.min(dim, v.length)
        while (j < n) {
          val cv = centroids(base + j)
          dot += v(j) * cv; cn += cv * cv; j += 1
        }
        sims(ci) = dot / (math.sqrt(vn) * math.sqrt(cn))
        ci += 1
      }
      val k = math.min(nProbe, c)
      val out = new Array[Int](k)
      val used = new Array[Boolean](c)
      var r = 0
      while (r < k) {
        var best = -1; var bestSim = Double.NegativeInfinity
        var x = 0
        while (x < c) {
          if (!used(x) && (sims(x) > bestSim || (sims(x) == bestSim && (best == -1 || x < best)))) {
            best = x; bestSim = sims(x)
          }
          x += 1
        }
        if (best == -1) {
          // all remaining sims are NaN (zero/empty vector): fall back to
          // centroid index order instead of crashing the task
          var y = 0
          while (y < c && used(y)) y += 1
          best = y
        }
        used(best) = true; out(r) = best; r += 1
      }
      out
  }
}
