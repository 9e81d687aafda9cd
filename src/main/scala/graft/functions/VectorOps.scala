package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.plans.FloatVectorExpressions.{dotF32, normSqF32, sqDistF32}

/** Column-level vector math over `array<float>` embedding columns.
  *
  * Backed by the native codegen'd Catalyst expressions in
  * graft.plans.FloatVectorExpressions (tight primitive loops inside
  * whole-stage codegen). Spark's higher-order functions
  * (`aggregate`/`zip_with`) compute the same values but evaluate an
  * interpreted lambda per element — measurably slower on wide fan-outs
  * (pairwise similarity) and kept only for the L1 norm, which sits on no
  * hot path.
  *
  * All folds are ordered left-to-right in double precision —
  * bit-deterministic for a given array, matching the DuckDB oracle.
  */
object VectorOps {

  /** Σ xᵢ·yᵢ (native codegen). */
  def dot(x: Column, y: Column): Column = dotF32(x, y)

  /** Σ xᵢ² (native codegen). */
  def normSq(x: Column): Column = normSqF32(x)

  /** Σ (xᵢ−yᵢ)² (native codegen) — the PQ-encode distance kernel. */
  def sqDist(x: Column, y: Column): Column = sqDistF32(x, y)

  /** ‖x‖₂ */
  def l2Norm(x: Column): Column = sqrt(normSqF32(x))

  /** Σ |xᵢ| (higher-order fold; cold path). */
  def l1Norm(x: Column): Column =
    aggregate(x, lit(0.0), (acc, v) => acc + abs(v.cast("double")))

  /** cos(x, y) = x·y / (‖x‖‖y‖); 0-vector guarded to NULL.
    * For pairwise workloads prefer precomputing per-row norms once and
    * combining with `dot` directly — this convenience form recomputes
    * both norms per evaluation.
    */
  def cosine(x: Column, y: Column): Column = {
    val d = dot(x, y)
    val n = l2Norm(x) * l2Norm(y)
    when(n === 0.0, lit(null).cast("double")).otherwise(d / n)
  }
}
