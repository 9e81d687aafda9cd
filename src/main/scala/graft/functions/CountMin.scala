package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a typed `Aggregator` — the point-frequency twin of
  * the Misra–Gries top-k sketch (graft.functions.HeavyHitters): MG answers
  * "which items are frequent", CMS answers "how often is THIS item" for
  * any item, heavy or not, from the same constant-size state.
  *
  * Structure: a Depth×Width matrix of long counters. Each item increments
  * one counter per row (row j uses hash_j); a point estimate is the MIN of
  * its Depth counters. Estimates NEVER undercount (every true occurrence
  * incremented all Depth positions) and overcount only by collisions:
  * P[est > true + (3/Width)·N] ≤ 3^−Depth per query (Markov on each row's
  * expected collision mass N/Width, independent rows).
  *
  * Scale shape: the buffer is a fixed Depth·Width long array (8 KiB here)
  * regardless of input rows or key cardinality; merges are elementwise
  * adds (associative/commutative), so the aggregate is partial+final like
  * any hash aggregate and ships ONE fixed-size buffer per task. Point
  * lookups on the finished sketch are row-local array reads — see
  * `estimate`, which renders the probe as a codegen'd `least(element_at…)`
  * over the same xxhash64 family the update path uses.
  *
  * Hash parity: the JVM update path (XXH64.hashLong chain, seed 42) and
  * the SQL probe path (`xxhash64(CAST(j AS BIGINT), key)`) MUST agree —
  * pinned by HeavyHittersSpec's parity test.
  */
object CountMin {

  val Depth = 4
  val Width = 256

  /** Row-j bucket of a long key: pmod(xxhash64(j, key), Width) with the
    * exact fold Spark's variadic xxhash64 applies (seed 42, then each
    * argument hashed over the running seed).
    */
  def bucket(j: Int, key: Long): Int = {
    val h = XXH64.hashLong(key, XXH64.hashLong(j.toLong, 42L))
    val m = (h % Width).toInt
    if (m < 0) m + Width else m
  }

  final class Sketch extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * Width)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      var j = 0
      while (j < Depth) { b(j * Width + bucket(j, key)) += 1L; j += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate a long key column into a CMS (array<bigint> of Depth·Width). */
  def countMin(key: Column): Column = udaf(new Sketch).apply(key)

  /** Point estimate of `key` against a finished sketch column — row-local,
    * codegen'd (element_at + xxhash64 + least), no UDF in the probe path.
    */
  def estimate(sketch: Column, key: Column): Column =
    least((0 until Depth).map { j =>
      element_at(sketch,
        (lit(j * Width + 1) + pmod(xxhash64(lit(j.toLong), key), lit(Width.toLong)))
          .cast("int"))
    }: _*)
}
