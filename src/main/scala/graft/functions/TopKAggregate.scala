package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k as a partial aggregate.
  *
  * `topK(score, id, k)` keeps the k highest (score, id) pairs — ties
  * broken by smaller id — as an array<struct<score,id>> sorted
  * descending.
  *
  * Scale rationale: ranking "top k per query" with a window function
  * shuffles every scored row; as a TypedImperativeAggregate each map
  * task reduces its partitions to at most k entries per group before
  * the exchange, so the shuffle carries k×partitions rows per group
  * instead of the whole scored corpus. This is the same partial-top-K
  * physical shape Spark uses for global `ORDER BY ... LIMIT k`
  * (TakeOrderedAndProject), generalized to per-group.
  */
case class TopKAggregate(scoreExpr: Expression, idExpr: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeIn(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1))
}

/** Bounded min-heap of (score, id); the root is the WORST kept entry
  * so a better candidate evicts it in O(log k). Ordering: higher score
  * wins; equal scores -> smaller id wins. */
final class TopKBuffer(val k: Int) {
  // parallel arrays as a binary heap; index 0 = worst kept
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  // a is WORSE than b (min-heap on "keep priority")
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(s: Double, i: Long): Unit = {
    if (s.isNaN) return // undefined score (e.g. cosine with a zero vector)
    if (n < k) {
      scores(n) = s; ids(n) = i; n += 1
      var c = n - 1
      while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown()
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(): Unit = {
    var p = 0
    var done = false
    while (!done) {
      val l = 2 * p + 1; val r = l + 1
      var worst = p
      if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == p) done = true else { swap(p, worst); p = worst }
    }
  }

  def mergeIn(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortInPlaceWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
    out
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}

object TopKAggregate {
  /** Column API: array<struct<score,id>> of the k best, sorted desc. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAggregate(
      Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())
}
