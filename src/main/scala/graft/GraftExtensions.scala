package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Divide, EqualTo, Expression, ExpressionInfo, If, Literal, Multiply, Sqrt
}

import graft.functions.VecDot

/** SQL-surface registration for the engine's native expressions — the
  * idiomatic cluster deployment path:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  *   spark.sql("SELECT vec_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * Registers:
  *  - `vec_dot(a, b)`    — codegen'd left-to-right double dot product
  *                         ([[graft.functions.VecDot]]'s exact semantics:
  *                         null array / null element / length mismatch → null)
  *  - `vec_norm(a)`      — sqrt(vec_dot(a, a))
  *  - `vec_cosine(a, b)` — vec_dot/(norm·norm) with the same zero-denominator
  *                         → 0.0 guard as [[graft.ops.Similarity.cosine]]
  *                         (pinned equal to the Column path in
  *                         GraftExtensionsSpec — scores must not depend on
  *                         whether a pipeline was written in SQL or Scala)
  *
  * Only scalar expressions register here; whole-operator surfaces (search,
  * index build, dedup) stay DataFrame-first — they are multi-stage plans,
  * not functions, and wrapping them in SQL would hide their partitioning
  * contracts. Scala callers don't need any of this: the `graft.ops` /
  * `graft.query` APIs build the expression trees directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"vec_dot(a, b) takes 2 arguments, got ${children.size}")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_norm"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"vec_norm(a) takes 1 argument, got ${children.size}")
        Sqrt(VecDot(children.head, children.head))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"vec_cosine(a, b) takes 2 arguments, got ${children.size}")
        val denom = Multiply(Sqrt(VecDot(children.head, children.head)),
          Sqrt(VecDot(children(1), children(1))))
        If(EqualTo(denom, Literal(0.0)), Literal(0.0),
          Divide(VecDot(children.head, children(1)), denom))
      }))
  }
}
