package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** K-minimum-values (KMV / bottom-k) sketches — the set-operation
  * complement of [[HllAggregate]]: where HLL only unions, a KMV
  * sketch (the k smallest distinct hash values of a set) supports
  * UNION (merge + retruncate) and, crucially, JACCARD/INTERSECTION
  * estimation between independently-built sketches (Beyer et al.
  * 2007; the theta-sketch family) — "how much do these two corpora /
  * vocabularies / crawls overlap" answered from two k·8-byte
  * sketches without joining 100 TB against 100 TB. That pre-dedup
  * overlap diagnostic is exactly what decides whether a cross-corpus
  * dedup pass is worth scheduling.
  *
  * Determinism: the k smallest distinct values of a multiset are a
  * FUNCTION of the set — no merge-order or partitioning dependence —
  * so sketch bytes are bit-identical under any plan (spec-pinned).
  * Values are hashed by the caller (pass xxhash64(col), the
  * HllAggregate contract); hash order is UNSIGNED (uniform over
  * [0, 2^64)).
  *
  * Estimators: distinct ≈ (n−1)/θ with θ = (k-th smallest)/2^64 when
  * the sketch is full (RSE ≈ 1/√(k−2)), exact when not (a partial
  * sketch IS the distinct set). Jaccard(A,B) ≈ |M ∩ A ∩ B|/|M| where
  * M = the k smallest of A ∪ B.
  *
  * Layout: [int32 k][int32 n][n × int64 ascending-unsigned]. */
case class KmvSketchAggregate(child: Expression, k: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {
  require(k >= 16, "k must be >= 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // Values must be pre-hashed longs (xxhash64) — fail at analysis time
  // with a clear message, not mid-job with a ClassCastException.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft KMV sketch requires a LongType child (pass xxhash64(col)); got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = { a.mergeIn(b); a }
  override def eval(buf: KmvBuffer): Any = buf.serialize()
  override def serialize(buf: KmvBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Merge already-built KMV sketches (BINARY column) into their union
  * sketch — the rollup side. */
case class KmvMergeAggregate(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft KMV merge requires a BINARY sketch column; got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(0) // sized on first sketch

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val s = child.eval(input)
    if (s == null) buf
    else {
      val other = KmvBuffer.deserialize(s.asInstanceOf[Array[Byte]])
      if (buf.k == 0) other
      else {
        // A smaller-k sketch is missing values between its theta and
        // ours — merging it would silently bias estimate()/jaccard().
        require(other.k == buf.k,
          s"KMV sketch k mismatch: ${other.k} vs ${buf.k} — sketches must be built with the same k to merge")
        buf.mergeIn(other); buf
      }
    }
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
    if (a.k == 0) b else if (b.k == 0) a
    else {
      require(a.k == b.k,
        s"KMV sketch k mismatch: ${b.k} vs ${a.k} — sketches must be built with the same k to merge")
      a.mergeIn(b); a
    }
  override def eval(buf: KmvBuffer): Any = buf.serialize()
  override def serialize(buf: KmvBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Distinct-count estimate of a KMV sketch (codegen'd scalar). */
case class KmvEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    KmvImpl.estimate(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.KmvImpl.estimate($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard-similarity estimate between two KMV sketches (codegen'd). */
case class KmvJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvImpl.jaccard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.KmvImpl.jaccard($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KmvAggregate {
  /** Build a KMV sketch from PRE-HASHED 64-bit values (xxhash64(col)). */
  def sketch(hashed: Column, k: Int = 1024): Column =
    Bridge.column(KmvSketchAggregate(Bridge.expression(hashed), k).toAggregateExpression())

  /** Merge a column of KMV sketches into their union sketch. */
  def merge(sketches: Column): Column =
    Bridge.column(KmvMergeAggregate(Bridge.expression(sketches)).toAggregateExpression())

  /** Distinct-count estimate of a sketch. */
  def estimate(sketch: Column): Column =
    Bridge.column(KmvEstimate(Bridge.expression(sketch)))

  /** Jaccard-overlap estimate between two sketches. */
  def jaccard(a: Column, b: Column): Column =
    Bridge.column(KmvJaccard(Bridge.expression(a), Bridge.expression(b)))
}

/** Bounded set of the k smallest distinct hashes (unsigned order):
  * a max-heap (root = largest kept) + membership set, so add/evict is
  * O(log k) and duplicate hashes are no-ops. */
final class KmvBuffer(val k: Int) {
  private val heap = new java.util.PriorityQueue[java.lang.Long](
    math.max(k, 1), (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(b, a)) // max-heap, unsigned
  private val seen = new java.util.HashSet[java.lang.Long]()

  def size: Int = heap.size()

  def add(v: Long): Unit = {
    if (seen.contains(v)) return
    if (heap.size() < k) { heap.add(v); seen.add(v) }
    else if (java.lang.Long.compareUnsigned(v, heap.peek()) < 0) {
      seen.remove(heap.poll()); heap.add(v); seen.add(v)
    }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) add(it.next())
  }

  /** [int32 k][int32 n][n × int64 ascending unsigned]. */
  def serialize(): Array[Byte] = {
    val vals = new Array[Long](heap.size())
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vals)
    // signed sort then rotate negatives to the back == unsigned order
    val neg = vals.count(_ < 0)
    val sorted = new Array[Long](vals.length)
    System.arraycopy(vals, neg, sorted, 0, vals.length - neg)
    System.arraycopy(vals, 0, sorted, vals.length - neg, neg)
    val bb = ByteBuffer.allocate(8 + 8 * sorted.length)
    bb.putInt(k).putInt(sorted.length)
    sorted.foreach(bb.putLong)
    bb.array()
  }
}

object KmvBuffer {
  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val n = bb.getInt()
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }
}

/** Top-level codegen forwarders (janino cannot resolve nested-object
  * Java names). */
object KmvImpl {
  private def header(bytes: Array[Byte]): (Int, Int) = {
    val bb = ByteBuffer.wrap(bytes)
    (bb.getInt(), bb.getInt())
  }

  private def value(bytes: Array[Byte], i: Int): Long =
    ByteBuffer.wrap(bytes).getLong(8 + 8 * i)

  /** (n−1)/θ when full (θ = k-th smallest as a fraction of 2^64);
    * exact n when the sketch holds the whole set. */
  def estimate(bytes: Array[Byte]): Double = {
    val (k, n) = header(bytes)
    if (n < k || n == 0) n.toDouble
    else {
      val kth = value(bytes, n - 1)
      // unsigned long → [0,1): shift into 63 bits exactly
      val theta = (kth >>> 1).toDouble / 9.223372036854775807e18 +
        (if ((kth & 1L) != 0) 0.5 / 9.223372036854775807e18 else 0.0)
      (n - 1).toDouble / theta
    }
  }

  /** |M ∩ A ∩ B| / |M| with M = the min(kA, kB) smallest of A ∪ B. */
  def jaccard(a: Array[Byte], b: Array[Byte]): Double = {
    val (ka, na) = header(a)
    val (kb, nb) = header(b)
    val k = math.min(ka, kb)
    // merge the two ascending-unsigned lists, keep the k smallest
    // distinct, count members present in both
    var i = 0; var j = 0; var m = 0; var inBoth = 0
    while (m < k && (i < na || j < nb)) {
      val av = if (i < na) value(a, i) else -1L // unsigned max sentinel
      val bv = if (j < nb) value(b, j) else -1L
      val cmp =
        if (i >= na) 1
        else if (j >= nb) -1
        else java.lang.Long.compareUnsigned(av, bv)
      if (cmp == 0) { inBoth += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
      m += 1
    }
    if (m == 0) 0.0 else inBoth.toDouble / m
  }
}
