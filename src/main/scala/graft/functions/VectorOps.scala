package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * All helpers are built from Spark's higher-order functions
  * (`aggregate`/`zip_with`/`transform`), which stay inside whole-stage
  * codegen and are narrow (no shuffle, no UDF serialization) — each row's
  * math runs where the row lives, which is exactly what a 100 TB scan
  * needs. Accumulation is an ordered left fold in double precision, so
  * results are bit-deterministic for a given array.
  */
object VectorOps {

  /** Σ xᵢ·yᵢ, ordered left fold in double. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ xᵢ² (squared L2 norm). */
  def normSq(x: Column): Column =
    aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** ‖x‖₂ */
  def l2Norm(x: Column): Column = sqrt(normSq(x))

  /** Σ |xᵢ| */
  def l1Norm(x: Column): Column =
    aggregate(x, lit(0.0), (acc, v) => acc + abs(v.cast("double")))

  /** cos(x, y) = x·y / (‖x‖‖y‖); 0-vector guarded to NULL. */
  def cosine(x: Column, y: Column): Column = {
    val d = dot(x, y)
    val n = l2Norm(x) * l2Norm(y)
    when(n === 0.0, lit(null).cast("double")).otherwise(d / n)
  }
}
