package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps

/** Pins the IVF index's operating point on data it was DESIGNED for.
  *
  * The driver fixture's embeddings are near-uniform random (max pairwise
  * cosine ≈ 0.51), so label cells carry no proximity signal and q147's
  * recall@10 ≈ 0.28 at nProbe=2 is the DATA's ceiling — scanning 2 of 10
  * uncorrelated cells can't recover neighbours that are spread uniformly
  * across all 10. This spec plants the opposite regime: 10 well-separated
  * clusters (intra-cluster cosine ≈ 0.86, cross ≈ ±0.12) with `label` the
  * true cluster assignment, and asserts the SAME registered code path
  * (annRecallAt → q147) achieves recall@10 ≥ 0.9 at the registered
  * nProbe=2 — proving the low fixture number indicts the fixture, not the
  * index.
  */
class AnnOperatingPointSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val plantedDir: String = {
    val dir = TestSpark.scratch("ann-planted")
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian())).map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => x / n)
    }
    // point = center + N(0, 0.05) per dim → E‖noise‖² = 64·0.0025 = 0.16,
    // intra-cluster cosine ≈ 1/1.16 ≈ 0.86 vs cross ≈ N(0, 1/64)
    val rows = (0 until 500).map { i =>
      val c = i % 10
      val emb = centers(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, c, emb)
    }
    rows.toDF("vec_id", "label", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q184 dim truncation: matches an independent Scala brute-force oracle, full dim is exact") {
    // 40 seeded-random vectors (ids 0..19 = the fixed panel). Expected
    // recall per cut is recomputed here from scratch on the same integer
    // grid — independent of the DataFrame pipeline under test.
    val dir = TestSpark.scratch("trunc-dims")
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map { i =>
      val e =
        if (i == 3) Array.tabulate(64)(j => if (j == 63) 1.0f else 0.0f)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
      (i.toLong, i % 10, e)
    }
    vecs.toDF("vec_id", "label", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val eq = vecs.map { case (id, _, e) =>
      id -> e.map(x => math.round(x.toDouble * 1000))
    }.toMap
    def cos(a: Array[Long], b: Array[Long], d: Int): Double = {
      val na = (0 until d).map(i => a(i) * a(i)).sum
      val nb = (0 until d).map(i => b(i) * b(i)).sum
      if (na == 0 || nb == 0) -2.0 // the operator's zero-norm-prefix rule
      else {
        val dot = (0 until d).map(i => a(i) * b(i)).sum.toDouble
        dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      }
    }
    def top10(q: Long, d: Int): Set[Long] =
      (0L until 40L).filter(_ != q)
        .sortBy(v => (-cos(eq(q), eq(v), d), v)).take(10).toSet
    val dims = Seq(8, 16, 32, 64)
    val expected = dims.map { d =>
      d.toLong -> (0L until 20L).map(q => (top10(q, d) & top10(q, 64)).size).sum.toLong
    }.toMap

    val out = SimilarityOps.q184DimTruncation(spark, dir)
      .as[(Long, Long, Double)].collect().toList
    assert(out.map(_._1) == dims.map(_.toLong))
    out.foreach { case (d, hits, recall) =>
      assert(hits == expected(d), s"dim $d: hits $hits vs oracle ${expected(d)}")
      assert(recall == math.round(hits / 200.0 * 10000) / 10000.0)
    }
    // the full-dim cut is its own truth: exact by construction
    assert(out.last == ((64L, 200L, 1.0)))
    // random prefixes must actually degrade — otherwise the fixture
    // proves nothing
    assert(out.head._2 < 200L)
  }

  test("planted clusters: registered nProbe=2 reaches recall@10 >= 0.9") {
    val rec = SimilarityOps.annRecallAt(spark, plantedDir, nProbe = 2).collect()
    val r10 = rec.find(_.getLong(0) == 10L).get.getDouble(2)
    assert(r10 >= 0.9, s"recall@10 = $r10 on planted clusters")
  }

  test("sweep frame: recall non-decreasing in nProbe, full probe is exact") {
    val sweep = SimilarityOps.ivfSweep(spark, plantedDir, Seq(1, 2, 10))
      .collect()
    val at10 = sweep.filter(_.getLong(1) == 10L)
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(at10(1) <= at10(2) + 1e-9 && at10(2) <= at10(10) + 1e-9,
      s"recall@10 must be monotone in nProbe: $at10")
    // probing every cell IS the brute-force scan — recall must be 1
    assert(at10(10) == 1.0, s"full-probe recall@10 = ${at10(10)}")
    // scanned fraction prices the width: nProbe=1 touches ~1/10th
    val frac1 = sweep.find(r => r.getInt(0) == 1 && r.getLong(1) == 10L)
      .get.getDouble(5)
    assert(frac1 < 0.2, s"nProbe=1 scanned_frac = $frac1")
  }
}
