package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import graft.SparkSpec

/** SQL-surface + optimizer-rule coverage for the graftbridge
  * extension layer (lives in this package to reach the
  * `private[sql]` build* accessors on SparkSessionExtensions). */
class ExtensionSpecs extends SparkSpec {

  test("registered SQL functions: vec_dot / vec_norm / vec_cosine") {
    GraftFunctions.install(spark)
    val r = spark.sql(
      """SELECT vec_dot(CAST(array(1, 2, 3) AS ARRAY<FLOAT>),
        |               CAST(array(4, 5, 6) AS ARRAY<FLOAT>)) AS d,
        |       vec_norm(CAST(array(3, 4) AS ARRAY<FLOAT>)) AS n,
        |       vec_cosine(CAST(array(2, 0) AS ARRAY<FLOAT>),
        |                  CAST(array(5, 0) AS ARRAY<FLOAT>)) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("VecDotRewrite upgrades the HOF dot-product idiom to FloatVecDot") {
    GraftFunctions.install(spark)
    // parquet-backed input so ConvertToLocalRelation can't fold the
    // whole expression away before we can inspect the plan
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = emb.selectExpr("vec_id",
      "aggregate(zip_with(embedding, embedding, (x, y) -> double(x) * double(y)), 0D, (s, x) -> s + x) AS d")
    val optimized = df.queryExecution.optimizedPlan
    val hasNative = optimized.expressions.exists(_.exists(_.isInstanceOf[FloatVecDot]))
    assert(hasNative, s"expected FloatVecDot in:\n$optimized")
    val viaNative = emb.selectExpr("vec_id", "vec_dot(embedding, embedding) AS d")
    assert(df.orderBy("vec_id").head().getDouble(1) ==
      viaNative.orderBy("vec_id").head().getDouble(1))
  }

  test("VecDotRewrite leaves non-matching aggregates alone") {
    GraftFunctions.install(spark)
    import spark.implicits._
    // sum of |x - y| — same shape, different combiner: must NOT rewrite
    val df = Seq((Array(1f, 2f), Array(4f, 5f))).toDF("a", "b")
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> abs(double(x) - double(y))), 0D, (s, x) -> s + x) AS d")
    val hasNative =
      df.queryExecution.optimizedPlan.expressions.exists(_.exists(_.isInstanceOf[FloatVecDot]))
    assert(!hasNative)
    assert(df.head().getDouble(0) == 6.0)
  }

  test("GraftExtensions injects the functions and the optimizer rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = ext.buildOptimizerRules(spark)
    assert(rules.contains(VecDotRewrite))
  }
}
