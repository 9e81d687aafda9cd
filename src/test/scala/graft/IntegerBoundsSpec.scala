package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Gram, IntegerBounds}
import graft.operators.SimilarityOps

/** Executable documentation for the registry-wide exact-int64 bound
  * table ([[graft.functions.IntegerBounds]]): the numbers quoted in
  * the table must be the ACTUAL flip points of the guards they
  * describe, so the table cannot silently drift from the code.
  */
class IntegerBoundsSpec extends AnyFunSuite {

  test("table row: Gram covariance guard flips near n = 1.5e6 at mx = 1000") {
    assert(Gram.covExactSafe(1518500L, 1000L))
    assert(!Gram.covExactSafe(1518501L, 1000L))
  }

  test("table row: centroid-screen guard flips near n = 1.3e5 at 64 dims, mx = 1000") {
    assert(SimilarityOps.exactDistSafe(134217L, 1000L, 64))
    assert(!SimilarityOps.exactDistSafe(134218L, 1000L, 64))
  }

  test("table row: row-local kernel envelope flips near mx = 2.7e8 milli at 64 dims") {
    // floor(sqrt(Long.MaxValue/2/64)) = 268435455 = 2^28 - 1; the
    // double image of Long.MaxValue rounds UP to 2^63 so the exact
    // 2^28 point sits ON the double boundary — test one past it
    assert(IntegerBounds.rowLocalSafe(64, 268435455L))
    assert(!IntegerBounds.rowLocalSafe(64, 268435457L))
    // the q198 SQL guard uses the same formula — one dim, 2x headroom
    assert(IntegerBounds.rowLocalSafe(1, 2147483647L))
  }

  test("table row: PSI ppm cliff is Long.MaxValue/1e6 cell rows") {
    assert(IntegerBounds.PsiPpmMaxCellCount == 9223372036854L)
  }

  test("table row: KS cliff is ~6e9 balanced rows per event type") {
    assert(IntegerBounds.ksSafe(3000000000L, 3000000000L))
    assert(!IntegerBounds.ksSafe(4000000000L, 4000000000L))
  }

  test("table row: q173 OLS stats are K-capped below both int64 and 2^53") {
    // K = 200 top terms, |log2_q12| <= 2.6e5: nSxy <= K^2 * (2.6e5)^2
    val worst = 200.0 * 200.0 * 2.6e5 * 2.6e5
    assert(worst < Long.MaxValue.toDouble / 2)
    assert(worst < math.pow(2, 53))
  }

  test("table row: XOR digest folds are closed on 64 bits (wrap-free)") {
    // XOR has no carries: folding any values stays a valid 64-bit word
    // and merge order cannot change the result
    val xs = Seq(Long.MaxValue, Long.MinValue, -1L, 0L, 123456789L)
    val l = xs.foldLeft(0L)(_ ^ _)
    val r = xs.reverse.foldLeft(0L)(_ ^ _)
    assert(l == r)
  }
}
