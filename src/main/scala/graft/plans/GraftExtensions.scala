package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.FunctionBridge

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
      "norm_sq_f32(x) - squared L2 norm of an array<float> column"))

  def inject(e: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder, usage) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[FloatVectorExpressions.DotF32].getName, name, usage),
        builder))
    }

  def registerRuntime(spark: SparkSession): Unit =
    functions.foreach { case (name, builder, _) =>
      FunctionBridge.registerTemp(spark, name, builder)
    }
}
