package org.apache.spark.sql

/** Column wrappers for graft's custom Catalyst expressions (lives here
 * for `private[sql]` Column↔Expression access; no reflection). */
object GraftFunctions {

  /** Codegen'd vector dot product over array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    classic.ExpressionUtils.column(
      graft.functions.DotProduct(
        classic.ExpressionUtils.expression(a),
        classic.ExpressionUtils.expression(b)))
}
