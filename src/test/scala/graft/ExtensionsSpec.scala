package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SQL-surface registration of the native Catalyst expressions. */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot resolves in SQL and computes the codegen dot product") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(cast(1.0 AS double), 2.0, 3.0),
        |                 array(cast(4.0 AS double), 5.0, 6.0)) AS d""".stripMargin)
    assert(r.collect().head.getDouble(0) == 32.0)
    // mixed float/double arrays (the embeddings table is array<float>)
    val rf = spark.sql(
      """SELECT graft_dot(array(cast(1.5 AS float), cast(2.0 AS float)),
        |                 array(cast(2.0 AS double), 3.0)) AS d""".stripMargin)
    assert(rf.collect().head.getDouble(0) == 9.0)
  }

  test("the extensions class injects the same builders (cluster --conf path)") {
    // the injection hook itself: apply() must register every function
    // without throwing; resolution via the hook needs a fresh context,
    // which the shared-session harness cannot build — the builders are
    // the same objects exercised through register() above
    new GraftExtensions().apply(new SparkSessionExtensions)
    assert(GraftExtensions.functions.map(_._1.funcName) == Seq("graft_dot", "graft_cosine"))
  }

  test("graft_cosine fuses three dots in one codegen scope (freshName'd locals)") {
    GraftExtensions.register(spark)
    // cos((1,0),(1,1)) = 1/sqrt(2); three DotProducts share the stage —
    // duplicate locals would janino-fail and fall back to interpreted
    val r = spark.sql(
      """SELECT graft_cosine(array(cast(1.0 AS double), 0.0),
        |                    array(cast(1.0 AS double), 1.0)) AS c""".stripMargin)
    assert(math.abs(r.collect().head.getDouble(0) - 1.0 / math.sqrt(2.0)) < 1e-15)
    // zero-norm vector: TRY-mode division yields NULL under ANSI, never a crash
    val z = spark.sql(
      """SELECT graft_cosine(array(cast(0.0 AS double), 0.0),
        |                    array(cast(1.0 AS double), 1.0)) AS c""".stripMargin)
    val row = z.collect().head
    assert(row.isNullAt(0) || row.getDouble(0).isNaN)
  }

  test("null vector yields null, not a crash") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(cast(NULL AS array<double>), array(cast(1.0 AS double))) AS d")
    assert(r.collect().head.isNullAt(0))
  }
}
