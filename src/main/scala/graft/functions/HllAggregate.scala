package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketches as first-class BINARY columns —
  * the pre-aggregated-rollup pattern every 100 TB deployment ends up
  * needing: build per-shard/per-day sketches ONCE, persist them
  * (2^p bytes each), and answer any distinct-count rollup later by
  * merging sketches instead of re-scanning the corpus (the
  * Druid/BigQuery sketch-table shape). Spark's own
  * `approx_count_distinct` computes a number and throws the sketch
  * away; keeping the sketch is what makes incremental and
  * cross-period union queries O(sketches), not O(events).
  *
  * Determinism: values are hashed BY THE CALLER (pass `xxhash64(col)`
  * — keeps the hash choice visible and oracle-swappable like the
  * dedup gates), and a register-wise MAX merge is commutative and
  * associative, so the sketch BYTES are bit-identical under any
  * partitioning or merge order — pinned by spec, the same invariant
  * the integer-moment operators rely on.
  *
  * Flajolet et al. 2007 estimator with the small-range
  * linear-counting correction; 64-bit hashes make the large-range
  * correction irrelevant at any realistic cardinality. Standard error
  * ≈ 1.04/√(2^p): p=12 → 4 KB per sketch, ~1.6%. */
case class HllSketchAggregate(child: Expression, p: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, "p must be in [4, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // Values must be pre-hashed longs (xxhash64) — fail at analysis time
  // with a clear message, not mid-job with a ClassCastException.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft HLL sketch requires a LongType child (pass xxhash64(col)); got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllImpl.add(buf, v.asInstanceOf[Long], p)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllImpl.mergeInto(a, b)
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Merge already-built sketches (a BINARY column) — the rollup side:
  * per-day sketches → per-month distinct, per-shard → corpus. */
case class HllMergeAggregate(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft HLL merge requires a BINARY sketch column; got ${child.dataType.catalogString}")

  // sized lazily from the first sketch seen (empty marker until then)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) s.clone()
      else { require(buf.length == s.length, "sketch precision mismatch"); HllImpl.mergeInto(buf, s); buf }
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else { require(a.length == b.length, "sketch precision mismatch"); HllImpl.mergeInto(a, b); a }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Scalar estimator over a sketch column (codegen'd; precision is the
  * sketch's own length, so no parameter to mismatch). */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    HllImpl.estimate(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HllImpl.estimate($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Register vector of a sketch as ARRAY<INT> in bucket order — the
  * inspection/oracle surface: registers are exact integers (a pure
  * function of the hashed input set), so cross-engine checks can pin
  * the sketch CONTENT without touching the float estimator. */
case class HllRegisters(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      a.asInstanceOf[Array[Byte]].map(b => b & 0xff))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(graft.functions.HllImpl.registers($v));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HllAggregate {
  /** Build a sketch from PRE-HASHED 64-bit values (pass xxhash64(col)).
    * Returns 2^p BINARY bytes. */
  def sketch(hashed: Column, p: Int = 12): Column =
    Bridge.column(HllSketchAggregate(Bridge.expression(hashed), p).toAggregateExpression())

  /** Merge a column of sketches into one (register-wise max). */
  def merge(sketches: Column): Column =
    Bridge.column(HllMergeAggregate(Bridge.expression(sketches)).toAggregateExpression())

  /** Distinct-count estimate of a sketch. */
  def estimate(sketch: Column): Column =
    Bridge.column(HllEstimate(Bridge.expression(sketch)))

  /** Exact register vector (ARRAY<INT>, bucket order) of a sketch. */
  def registers(sketch: Column): Column =
    Bridge.column(HllRegisters(Bridge.expression(sketch)))
}

/** Top-level so whole-stage codegen can call the Java static forwarder
  * `graft.functions.HllImpl.estimate` directly (nested-object Java
  * names are unresolvable by janino). */
object HllImpl {
  /** Register index = top p bits; rank = leading zeros of the
    * remaining 64−p bits (within those bits) + 1, capped by the
    * field width. */
  def add(regs: Array[Byte], hash: Long, p: Int): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val rest = hash << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
  }

  /** Registers as unsigned ints (codegen forwarder for HllRegisters). */
  def registers(regs: Array[Byte]): Array[Int] = regs.map(b => b & 0xff)

  /** Register-wise max of `b` into `a` (commutative, associative —
    * merge order can never change the bytes). */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
  }

  /** Raw HLL estimate with the small-range linear-counting switch. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
