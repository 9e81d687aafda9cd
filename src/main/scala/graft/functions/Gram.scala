package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass distributed Gram/covariance accumulator over integer
  * embedding vectors (the q99 integer-millis grid: array<long>).
  *
  * The naive plan — posexplode every vector and self-join on vec_id to
  * form (i, j) coordinate pairs — shuffles d(d+1)/2 rows PER VECTOR
  * (2,080 rows/vector at d=64): quadratic-in-d row volume that dies at
  * corpus scale. This aggregator instead folds each vector into a
  * per-partition buffer of exact longs — n, the d coordinate sums, and
  * the d(d+1)/2 upper-triangle product sums — so the shuffle carries
  * ONE ~17 KB buffer per partition regardless of row count, and partial
  * buffers merge by elementwise addition (commutative/associative ⇒
  * deterministic under any merge order, unlike a double-precision
  * accumulator).
  *
  * Buffer layout: [n, s_0..s_{d-1}, p_00, p_01..p_0{d-1}, p_11, ...]
  * (products in row-major upper-triangle order). d is discovered from
  * the first vector; a dimension mismatch fails loudly rather than
  * silently mis-accumulating.
  */
object Gram {

  final case class GramResult(n: Long, sums: Seq[Long], prods: Seq[Long])

  private class GramAgg extends Aggregator[Seq[Long], Array[Long], GramResult] {
    override def zero: Array[Long] = Array.empty

    private def alloc(d: Int): Array[Long] = new Array[Long](1 + d + d * (d + 1) / 2)

    private def dimOf(buf: Array[Long]): Int =
      ((math.sqrt(9.0 + 8.0 * (buf.length - 1)) - 3.0) / 2.0).round.toInt

    override def reduce(buf0: Array[Long], v: Seq[Long]): Array[Long] = {
      if (v == null) return buf0
      val d = v.length
      val buf = if (buf0.isEmpty) alloc(d) else buf0
      require(dimOf(buf) == d, s"Gram: dimension mismatch (${dimOf(buf)} vs $d)")
      buf(0) += 1
      val x = v.toArray
      var i = 0
      var p = 1 + d
      while (i < d) {
        buf(1 + i) += x(i)
        var j = i
        while (j < d) {
          buf(p) += x(i) * x(j)
          p += 1
          j += 1
        }
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      require(a.length == b.length, "Gram: buffer length mismatch")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): GramResult = {
      if (buf.isEmpty) return GramResult(0L, Seq.empty, Seq.empty)
      val d = dimOf(buf)
      GramResult(buf(0), buf.slice(1, 1 + d).toSeq, buf.drop(1 + d).toSeq)
    }

    // Stable public API only: Encoders.kryo keeps the buffer opaque
    // bytes (fine — the buffer never needs SQL-visible structure),
    // where the previous catalyst-internal ExpressionEncoder could
    // break across Spark minor upgrades.
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[GramResult] = Encoders.product[GramResult]
  }

  /** Aggregate an array<long> column into (n, Σx_i, Σx_i·x_j upper-tri). */
  def gramAgg(vec: Column): Column = udaf(new GramAgg).apply(vec)

  /** Flat upper-triangle index of (i, j), i ≤ j, for dimension d. */
  def triIndex(d: Int, i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
}
