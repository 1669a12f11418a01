package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup hot path. */
object TextExpressions {

  /** 64-bit hashes of all word `k`-shingles of a (pre-normalized,
    * single-space-separated) text, in one pass with no intermediate
    * shingle strings: each token is FNV-1a-hashed as its bytes stream
    * by, and a ring buffer of the last k token hashes is order-
    * sensitively mixed into one shingle hash. Texts with fewer than k
    * tokens yield one whole-text shingle hash (same degenerate-case
    * semantics as the string-building formulation).
    *
    * Cost: O(bytes + shingles), zero allocations per shingle vs. the
    * `transform(sequence, slice, concat_ws)` formulation which builds
    * every shingle string through interpreted lambdas. */
  case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      new GenericArrayData(ShingleHashImpl.compute(a.asInstanceOf[UTF8String].toString, k))

    // NOTE: must target the TOP-LEVEL ShingleHashImpl object — a
    // top-level Scala object gets Java static forwarders, so janino
    // sees a plain static call. A nested object's Java name
    // (`TextExpressions$ShingleHashes$`) is not resolvable by janino's
    // source-name lookup and silently killed whole-stage codegen for
    // every stage containing this expression.
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.ShingleHashImpl.compute($v.toString(), $k));
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Delegator kept for source compatibility (specs reference
    * `TextExpressions.ShingleHashes.compute`); the implementation
    * lives in the top-level [[ShingleHashImpl]] so generated code can
    * reach it as a plain static call. */
  object ShingleHashes {
    def compute(s: String, k: Int): Array[Long] = ShingleHashImpl.compute(s, k)
  }

  /** Column API: shingle hashes of the normalized text. */
  def shingleHashes(normalizedText: Column, k: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(normalizedText), k))
}

/** Top-level so whole-stage codegen can call the Java static
  * forwarder `graft.functions.ShingleHashImpl.compute` directly. */
object ShingleHashImpl {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Mix = 0x9e3779b97f4a7c15L

  /** token FNV-1a over UTF-16 chars; shingle = ordered mix of the
    * last k token hashes. */
  def compute(s: String, k: Int): Array[Long] = {
      val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](32)
      var h = FnvOffset
      var inTok = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ') {
          if (inTok) { tokenHashes += h; h = FnvOffset; inTok = false }
        } else {
          h = (h ^ c) * FnvPrime
          inTok = true
        }
        i += 1
      }
      if (inTok) tokenHashes += h
      val n = tokenHashes.length
      if (n == 0) return Array(FnvOffset)
      if (n < k) {
        var all = FnvOffset
        var j = 0
        while (j < n) { all = all * Mix ^ tokenHashes(j); j += 1 }
        return Array(all)
      }
      val out = new Array[Long](n - k + 1)
      var start = 0
      while (start <= n - k) {
        var sh = FnvOffset
        var j = start
        while (j < start + k) { sh = sh * Mix ^ tokenHashes(j); j += 1 }
        out(start) = sh
        start += 1
      }
      out
  }
}
