package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/**
 * `SparkSessionExtensions` hook registering the engine's native
 * Catalyst expressions with the SQL function registry, so pure-SQL
 * users (thriftserver, `spark.sql`) get the codegen'd kernels without
 * touching the Scala API:
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *   SELECT id, graft_dot(embedding, query_vec) AS score FROM embeddings
 *
 * [[GraftExtensions.register]] is the programmatic twin for an
 * already-built session (same builders, session-scoped registry).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  /** (identifier, info, builder) for every engine SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(
        classOf[DotProduct].getName,
        null,
        "graft_dot",
        "graft_dot(a, b) - dot product of two array<float|double> vectors (whole-stage codegen)",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_dot expects 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }),
    (
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(
        classOf[DotProduct].getName,
        null,
        "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two array<float|double> vectors " +
          "(composed from three codegen'd dot products; NULL-safe, 0-norm yields NULL)",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_cosine expects 2 arguments, got ${children.length}")
        // dot(a,b) / sqrt(dot(a,a) * dot(b,b)) as a Catalyst tree —
        // all three dots share one whole-stage-codegen scope (locals
        // are freshName'd, so janino compiles the fused stage)
        import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode, Multiply, Sqrt}
        val (a, b) = (children.head, children(1))
        // TRY division: a zero-norm vector yields NULL under ANSI
        // (default in Spark 4) instead of DIVIDE_BY_ZERO
        Divide(DotProduct(a, b),
          Sqrt(Multiply(DotProduct(a, a), DotProduct(b, b))), EvalMode.TRY)
      }))

  /** Register on a live session (tests, notebooks — no restart). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
