package graft.functions

/** The registry-wide exact-int64 bound table (r19, verdict order 1).
  *
  * Every query that claims "exact integer" arithmetic is either safe
  * at ANY corpus size by construction, guarded by a runtime lane swap,
  * checked as a loud precondition, or bounded by a disclosed
  * ANSI-loud cliff. This object is the single place that enumerates
  * them; [[graft.IntegerBoundsSpec]] pins the numeric flip points so
  * the table cannot drift from the guards it describes.
  *
  * == Corpus-n-growing numerators (grow with row count) ==
  *
  * {{{
  * site                      numerator                bound                            past the bound
  * ------------------------  -----------------------  -------------------------------  ----------------------------------
  * q145/q151/q157 Gram       n·Σxy − Σx·Σy            2·(n·mx)² ≤ Long.Max/2 AND       GUARDED: Gram.covExactSafe swaps to
  *   (covariance family)       and partials Σxy         n·mx² ≤ Long.Max/2               the double carriers folded by the
  *                                                      (n ≈ 1.5·10⁶ at mx = 1000)       same pass; int64 columns → NULL
  * q195/q196/q197 rank keys  Σ(n·q_i − s_i)²          dims·(2n·mx)² ≤ Long.Max/2       GUARDED: SimilarityOps.exactDistSafe
  *   (centroid screens)                                 (n ≈ 1.3·10⁵ at 64 dims,         swaps to the ScaledMsdD double
  *                                                      mx = 1000)                       lane; dist2_num → NULL
  * q168 PSI ppm              c·10⁶ (Laplace ppm)      c ≤ Long.Max/10⁶ ≈ 9.2·10¹²      ANSI-LOUD: the multiply throws
  *                                                      rows per (type, bin, half)       ARITHMETIC_OVERFLOW — never silent
  * q105 KS statistic         cum_a·m − cum_b·n        n·m ≤ Long.Max ⇒ ≈ 6·10⁹ rows    ANSI-LOUD (same)
  *                                                      per event type
  * q106 table digest         bit_xor of md5 words     NONE — XOR is carry-free:        wrap-free at any corpus size
  *                                                      commutative, associative,
  *                                                      closed on 64 bits
  * q173 Zipf OLS             nΣxy − ΣxΣy over         K²·(2.6·10⁵)² ≈ 2.7·10¹⁴,        wrap-free by construction: the
  *                             log2-Q12 pairs           K = 200 FIXED — corpus growth    top-K cut caps every stat before
  *                                                      cannot move it                   the fold (also < 2⁵³)
  * }}}
  *
  * == Row-local numerators (grow with per-component magnitude, not n) ==
  *
  * {{{
  * site                      numerator                bound                            past the bound
  * ------------------------  -----------------------  -------------------------------  ----------------------------------
  * q198 norm² fold           Σ q_i²                   dims·mx² ≤ Long.Max/2            CHECKED: raise_error before the
  *                                                      (mx ≈ 2.7·10⁸ milli-units        fold — a loud precondition, never
  *                                                      at 64 dims)                      a two's-complement bucket
  * DotI64/SqDistI64/         Σ q_i·r_i etc. in a      same row-local class:            UNGUARDED JVM loops (wrap silently)
  *   NormSqI64/ArgMin...       codegen'd JVM loop       dims·mx² ≤ Long.Max              — but q198 IS their gate: any
  *   (q24/q59/q99/q135…)                                                                 corpus past this bound raises in
  *                                                                                       the q198 hygiene screen, which a
  *                                                                                       pipeline runs BEFORE trusting any
  *                                                                                       distance math (its scaladoc
  *                                                                                       contract). Per-pair products cap
  *                                                                                       at mx ≤ 3·10⁹ the same way.
  * }}}
  *
  * Why three different answers: a SILENT wrap only exists where the
  * arithmetic bypasses ANSI — JVM aggregator/kernel loops and SQL
  * higher-order folds. Catalyst multiplies throw under ANSI (loud,
  * but still a dead 100 TB query — hence lanes for the queries whose
  * design ceiling crosses the bound). Bounds that corpus GROWTH can
  * cross get lanes or checks; bounds only pathological VALUES can
  * cross get loud checks (q198) or a documented gate; bounds nothing
  * can cross are stated as wrap-free.
  */
object IntegerBounds {

  /** Row-local kernel admissibility: dims·mx² ≤ Long.MaxValue/2 — the
    * q198 checked precondition, and the documented safety envelope of
    * the whole I64 kernel family. mx is in quantized milli-units.
    */
  def rowLocalSafe(dims: Int, mx: Long): Boolean = {
    val m = math.max(mx, 1L).toDouble
    dims.toDouble * m * m <= Long.MaxValue.toDouble / 2
  }

  /** The q168 ppm cliff: cell count × 10⁶ must stay in int64. */
  val PsiPpmMaxCellCount: Long = Long.MaxValue / 1000000L

  /** The q105 KS cliff: n·m over the two half-counts of one event
    * type; with balanced halves that is ≈ 6·10⁹ rows per type.
    */
  def ksSafe(n: Long, m: Long): Boolean =
    n.toDouble * m.toDouble <= Long.MaxValue.toDouble
}
