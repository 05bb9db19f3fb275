package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Sqrt, ZipWith}
import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** SQL-surface + optimizer integration for graft's native vector
  * expressions, so `spark.sql("SELECT vec_dot(a, b) …")` works and
  * hand-written higher-order-function dot products are silently
  * upgraded to the codegen'd primitive.
  *
  * Two installation paths:
  *  - [[GraftFunctions.install]] — runtime, works on an existing
  *    session (the harness constructs sessions before our code runs,
  *    so this is what `SparkEntry.configure` uses).
  *  - [[GraftExtensions]] — the idiomatic
  *    `spark.sql.extensions=org.apache.spark.sql.graftbridge.GraftExtensions`
  *    config for cluster deployments, where the extension class is on
  *    the classpath at session build time.
  */
object GraftFunctions {

  /** (name, builder) for every graft SQL function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> ((es: Seq[Expression]) => FloatVecDot(es(0), es(1))),
    "vec_norm" -> ((es: Seq[Expression]) => Sqrt(FloatVecDot(es(0), es(0)))),
    "vec_cosine" -> ((es: Seq[Expression]) =>
      Divide(FloatVecDot(es(0), es(1)),
        Multiply(Sqrt(FloatVecDot(es(0), es(0))), Sqrt(FloatVecDot(es(1), es(1)))))),
    // nfc(s): Unicode NFC normalization (round 9) — the pre-dedup
    // canonical-composition pass; DuckDB's nfc_normalize mirrors it
    "nfc" -> ((es: Seq[Expression]) => NfcNormalize(es.head)),
    // hilbert_index(bits, d0, d1, …): the round-9 clustering curve on
    // the SQL surface — bits must be a foldable integer literal
    "hilbert_index" -> ((es: Seq[Expression]) => {
      val bits = es.head match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"hilbert_index: first argument must be an integer literal, got $other")
      }
      HilbertIndex(es.tail, bits)
    }))

  def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[FloatVecDot].getName, name)

  /** Register the SQL functions and the [[VecDotRewrite]] optimizer
    * rule on an already-built session. Idempotent. */
  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registry = classic.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.registerFunction(FunctionIdentifier(name), info(name), b)
    }
    val cur = classic.experimental.extraOptimizations
    if (!cur.contains(VecDotRewrite))
      classic.experimental.extraOptimizations = cur :+ VecDotRewrite
  }
}

/** Rewrites the interpreted higher-order-function dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0D, (s, x) -> s + x) }}}
  *
  * over `array<float>` columns into [[FloatVecDot]]. The HOF tree is
  * CodegenFallback (per-element interpreted dispatch, measured ~400×
  * slower in the all-pairs cosine stage); the rewrite preserves exact
  * semantics — sequential double accumulation in element order, AND
  * the idiom's null behavior: [[FloatVecDot]] returns NULL on unequal
  * lengths (zip_with null-pads) and on any null element, so the
  * substitution is equivalence-preserving on ragged or
  * null-containing inputs too.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `e` is lambda variable `v`, possibly under a widening cast to double. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case c: Cast if c.dataType == DoubleType => isVar(c.child, v)
    case _ => false
  }

  private def isPair(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(ad: Add, Seq(s: NamedLambdaVariable, e: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fs: NamedLambdaVariable), _))
      if zero == 0.0 && isFloatArray(a.dataType) && isFloatArray(b.dataType) &&
         isPair(m.left, m.right, x, y) && isPair(ad.left, ad.right, s, e) &&
         fin.exprId == fs.exprId =>
      FloatVecDot(a, b)
  }
}

/** `spark.sql.extensions` entry point: injects the vector SQL
  * functions and the [[VecDotRewrite]] optimizer rule at session
  * build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name), GraftFunctions.info(name), b))
    }
    ext.injectOptimizerRule(_ => VecDotRewrite)
    // round 12: DML interception + relation swap for the graft catalog
    // (the SQL write surface); build-time only — resolution rules
    // cannot be added to an already-built analyzer
    ext.injectResolutionRule(session => GraftDmlRules(session))
  }
}
