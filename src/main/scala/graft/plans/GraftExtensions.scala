package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.FunctionBridge

/** Optimizer rule: self-dot-product is a squared norm — `dot_f32(x, x)` →
  * `norm_sq_f32(x)` halves the array reads of the generated loop. A small
  * rule, but the real point is the seam: engine-specific algebraic
  * rewrites hook into Catalyst here rather than being hand-applied at
  * call sites.
  */
object RewriteSelfDot extends Rule[LogicalPlan] {
  import FloatVectorExpressions.{DotF32, DotI64, NormSqF32, NormSqI64}
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotF32(l, r) if l.semanticEquals(r) && l.deterministic => NormSqF32(l)
      case DotI64(l, r) if l.semanticEquals(r) && l.deterministic => NormSqI64(l)
    }
}

/** SQL surface for the engine's native expressions.
  *
  * Production path: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) injects them at
  * session build. `registerRuntime` covers sessions that already exist
  * (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftExtensions.inject(e)
}

object GraftExtensions {

  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("dot_f32",
      es => FloatVectorExpressions.DotF32(es(0), es(1)),
      "dot_f32(x, y) - ordered-fold dot product over two array<float> columns"),
    ("norm_sq_f32",
      es => FloatVectorExpressions.NormSqF32(es.head),
      "norm_sq_f32(x) - squared L2 norm of an array<float> column"),
    ("sq_dist_f32",
      es => FloatVectorExpressions.SqDistF32(es(0), es(1)),
      "sq_dist_f32(x, y) - ordered-fold squared L2 distance over two array<float> columns"),
    ("dot_i64",
      es => FloatVectorExpressions.DotI64(es(0), es(1)),
      "dot_i64(x, y) - exact integer dot product over two array<bigint> columns"),
    ("norm_sq_i64",
      es => FloatVectorExpressions.NormSqI64(es.head),
      "norm_sq_i64(x) - exact integer squared L2 norm of an array<bigint> column"),
    ("sq_dist_i64",
      es => FloatVectorExpressions.SqDistI64(es(0), es(1)),
      "sq_dist_i64(x, y) - exact integer squared L2 distance over two array<bigint> columns"),
    ("argmin_sq_dist_i64",
      es => FloatVectorExpressions.ArgMinSqDistI64(es(0), es(1)),
      "argmin_sq_dist_i64(v, mat) - index of the nearest row of a flattened row-major array<bigint> centroid matrix"),
    ("word_trigrams",
      es => TextExpressions.WordTrigrams(es.head),
      "word_trigrams(s) - overlapping word 3-grams of a single-space-separated string"),
    ("rolling_hash32",
      es => TextExpressions.RollingHash32(es.head),
      "rolling_hash32(s) - Rabin-Karp polynomial hash of the UTF-8 bytes mod 2^31-1"))

  def inject(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder, usage) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[FloatVectorExpressions.DotF32].getName, name, usage),
        builder))
    }
    e.injectOptimizerRule(_ => RewriteSelfDot)
  }

  def registerRuntime(spark: SparkSession): Unit =
    functions.foreach { case (name, builder, _) =>
      FunctionBridge.registerTemp(spark, name, builder)
    }
}
