package graft

import graft.functions.{TopKAggregate, VectorExpressions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration: `spark.sql.extensions=graft.GraftExtensions`
  * (or `GraftSession.builder`, which wires it in) exposes the native
  * expressions to SQL:
  *
  *   graft_cosine(a, b)            — fused cosine similarity
  *   graft_dot(a, b)               — fused dot product
  *   graft_topk(score, id, k)      — bounded-heap per-group top-k
  *
  * This is the Spark-idiomatic analogue of eel registering its
  * components into a toolkit namespace: extension points, not a forked
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[VectorExpressions.CosineSimilarity]),
      (exprs: Seq[Expression]) => VectorExpressions.CosineSimilarity(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[VectorExpressions.DotProduct]),
      (exprs: Seq[Expression]) => VectorExpressions.DotProduct(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("graft_topk"),
      info("graft_topk", classOf[TopKAggregate]),
      (exprs: Seq[Expression]) => {
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an integer literal, got $other")
        }
        TopKAggregate(exprs(0), exprs(1), k)
      }))
  }
}
