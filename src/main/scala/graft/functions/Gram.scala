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
  * per-partition buffer — n, max|x|, the d coordinate sums, and the
  * d(d+1)/2 upper-triangle product sums — so the shuffle carries ONE
  * ~34 KB buffer per partition regardless of row count, and partial
  * buffers merge by elementwise addition (commutative/associative ⇒
  * deterministic under any merge order for the integer carriers).
  *
  * DUAL CARRIERS (r19, the q195 `exactDistSafe` treatment applied to
  * the Gram family): every sum is accumulated TWICE — exact int64 and
  * IEEE double. The int64 carrier is bit-identical cross-engine but
  * wraps silently (non-ANSI) once the corpus outgrows its bound: the
  * partial Σx·x wraps past n·max|x|² > Long.MaxValue, and the
  * n·Σxy − Σx·Σy finishing arithmetic downstream wraps far earlier, at
  * 2·(n·max|x|)² > Long.MaxValue — n ≈ 1.5·10⁶ vectors for ×1000-
  * quantized unit-scale coords, well below a 100 TB corpus. Consumers
  * read (n, mx) off the 1-row result and pick the carrier with
  * [[Gram.covExactSafe]]; the double carrier never wraps, at the cost
  * of merge-order ulps (each partial is exact while below 2⁵³, so the
  * carriers agree exactly on small fixtures — spec-pinned). Carrying
  * both costs one extra double FMA per int64 FMA in the fold — the
  * corpus pass stays single.
  *
  * Buffer layout: l = [n, mx, s_0..s_{d-1}, p_00, p_01..p_0{d-1},
  * p_11, ...] (products in row-major upper-triangle order), d2 = the
  * same d sums + tri products in doubles. d is discovered from the
  * first vector; a dimension mismatch fails loudly rather than
  * silently mis-accumulating.
  */
object Gram {

  final case class GramResult(n: Long, mx: Long, sums: Seq[Long],
      prods: Seq[Long], sumsD: Seq[Double], prodsD: Seq[Double])

  final case class GramBuf(l: Array[Long], d: Array[Double])

  private class GramAgg extends Aggregator[Seq[Long], GramBuf, GramResult] {
    override def zero: GramBuf = GramBuf(Array.empty, Array.empty)

    private def alloc(d: Int): GramBuf =
      GramBuf(new Array[Long](2 + d + d * (d + 1) / 2),
        new Array[Double](d + d * (d + 1) / 2))

    private def dimOf(buf: GramBuf): Int =
      ((math.sqrt(9.0 + 8.0 * (buf.l.length - 2)) - 3.0) / 2.0).round.toInt

    override def reduce(buf0: GramBuf, v: Seq[Long]): GramBuf = {
      if (v == null) return buf0
      val d = v.length
      val buf = if (buf0.l.isEmpty) alloc(d) else buf0
      require(dimOf(buf) == d, s"Gram: dimension mismatch (${dimOf(buf)} vs $d)")
      val l = buf.l
      val dd = buf.d
      l(0) += 1
      val x = v.toArray
      // one int→double conversion per element, not per (i, j) pair
      val xd = new Array[Double](d)
      var t = 0
      while (t < d) { xd(t) = x(t).toDouble; t += 1 }
      var i = 0
      var p = 2 + d
      var pd = d
      while (i < d) {
        val xi = x(i)
        val xiD = xd(i)
        val a = math.abs(xi)
        if (a > l(1)) l(1) = a
        l(2 + i) += xi
        dd(i) += xiD
        var j = i
        while (j < d) {
          l(p) += xi * x(j)
          dd(pd) += xiD * xd(j)
          p += 1
          pd += 1
          j += 1
        }
        i += 1
      }
      buf
    }

    override def merge(a: GramBuf, b: GramBuf): GramBuf = {
      if (a.l.isEmpty) return b
      if (b.l.isEmpty) return a
      require(a.l.length == b.l.length, "Gram: buffer length mismatch")
      a.l(0) += b.l(0)
      a.l(1) = math.max(a.l(1), b.l(1))
      var i = 2
      while (i < a.l.length) { a.l(i) += b.l(i); i += 1 }
      var j = 0
      while (j < a.d.length) { a.d(j) += b.d(j); j += 1 }
      a
    }

    override def finish(buf: GramBuf): GramResult = {
      if (buf.l.isEmpty)
        return GramResult(0L, 0L, Seq.empty, Seq.empty, Seq.empty, Seq.empty)
      val d = dimOf(buf)
      GramResult(buf.l(0), buf.l(1),
        buf.l.slice(2, 2 + d).toSeq, buf.l.drop(2 + d).toSeq,
        buf.d.slice(0, d).toSeq, buf.d.drop(d).toSeq)
    }

    // Stable public API only: Encoders.kryo keeps the buffer opaque
    // bytes (fine — the buffer never needs SQL-visible structure),
    // where a catalyst-internal ExpressionEncoder could break across
    // Spark minor upgrades.
    override def bufferEncoder: Encoder[GramBuf] = Encoders.kryo[GramBuf]
    override def outputEncoder: Encoder[GramResult] = Encoders.product[GramResult]
  }

  /** Aggregate an array<long> column into
    * (n, max|x|, Σx_i, Σx_i·x_j upper-tri, + double carriers).
    */
  def gramAgg(vec: Column): Column = udaf(new GramAgg).apply(vec)

  /** Flat upper-triangle index of (i, j), i ≤ j, for dimension d. */
  def triIndex(d: Int, i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  /** Exact-int64 admissibility for the Gram finishing arithmetic
    * n·Σxy − Σx·Σy (covariance/variance numerators, q145/q151/q157):
    * |Σxy| ≤ n·mx² and |Σx| ≤ n·mx, so the finish is bounded by
    * 2·(n·mx)² and the partial Σxy by n·mx². Safe (with 2× headroom)
    * iff BOTH stay under Long.MaxValue/2 — past that the int64
    * carriers wrap silently (silently-wrong covariances, misranked
    * components: the failure mode has no error). Evaluated in doubles:
    * the inputs are exact counters and the 2× headroom dwarfs one ulp
    * of bound arithmetic. The empty corpus (n = 0) is vacuously safe.
    */
  def covExactSafe(n: Long, mx: Long): Boolean = {
    val nm = n.toDouble * math.max(mx, 1L).toDouble
    val lim = Long.MaxValue.toDouble / 2
    2.0 * nm * nm <= lim && nm * math.max(mx, 1L).toDouble <= lim
  }
}
