package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

/** Misra–Gries guarantee: every item with frequency > n/(k+1) appears in
  * the sketch; counts undercount by at most n/(k+1).
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted heavy hitters survive the sketch; counts within the error bound") {
    val k = 8
    // 1000 items: 'hot' ×400, 'warm' ×200, 60 distinct cold fillers
    val items = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 400).map(i => s"cold${i % 60}")
    val n = items.size
    val df = scala.util.Random.shuffle(items).toDF("tok").repartition(8)
    val sketch = df.agg(HeavyHitters.heavyHitters($"tok", k).as("hh"))
      .as[Map[String, Long]].head()
    assert(sketch.size <= k)
    assert(sketch.contains("hot") && sketch.contains("warm"))
    val bound = n / (k + 1)
    assert(sketch("hot") >= 400 - bound && sketch("hot") <= 400)
    assert(sketch("warm") >= 200 - bound && sketch("warm") <= 200)
  }

  test("k >= vocabulary degenerates to exact counts over the real token stream") {
    // the fixture corpus is a flat ~40-word vocabulary: no token exceeds
    // n/(k+1) for small k (so MG guarantees nothing there) — but with
    // k >= |vocab| the sketch never decrements and must be exact
    val toks = Tables(spark, TestSpark.sf).documents
      .select(explode(split($"text", " ")).as("tok"))
    val vocab = toks.distinct().count().toInt
    val sketch = toks.agg(HeavyHitters.heavyHitters($"tok", vocab + 8).as("hh"))
      .as[Map[String, Long]].head()
    val exact = toks.groupBy($"tok").count()
      .as[(String, Long)].collect().toMap
    assert(sketch == exact)
  }

  test("CMS bucket hash matches SQL xxhash64(j, key) — update and probe paths agree") {
    import graft.functions.CountMin
    val keys = Seq(0L, 1L, -1L, 42L, 123456789L, Long.MaxValue, Long.MinValue)
    val cols = col("key") +: (0 until CountMin.Depth).map(j =>
      pmod(xxhash64(lit(j.toLong), col("key")), lit(CountMin.Width.toLong))
        .cast("int").as(s"b$j"))
    val sql = keys.toDF("key").select(cols: _*).collect()
    sql.foreach { row =>
      val key = row.getLong(0)
      (0 until CountMin.Depth).foreach { j =>
        assert(CountMin.bucket(j, key) === row.getInt(j + 1),
          s"bucket mismatch for key=$key row=$j")
      }
    }
  }

  test("CMS never undercounts, each row's counters sum to N, and probes hit exact on sparse keys") {
    import graft.functions.CountMin
    // 3 hot keys + a sparse tail, shuffled across partitions so the
    // partial+final merge path is exercised
    val data = (Seq.fill(300)(7L) ++ Seq.fill(120)(11L) ++ Seq.fill(60)(13L) ++
      (1000L to 1099L)).reverse
    val df = data.toDF("key").repartition(8)
    val sk = df.agg(CountMin.countMin($"key").as("sk"))
      .as[Array[Long]].head()
    val n = data.size.toLong
    (0 until CountMin.Depth).foreach { j =>
      assert(sk.slice(j * CountMin.Width, (j + 1) * CountMin.Width).sum === n)
    }
    def est(key: Long): Long =
      (0 until CountMin.Depth).map(j => sk(j * CountMin.Width + CountMin.bucket(j, key))).min
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, c) => assert(est(k) >= c, s"undercount at $k") }
    // overcount stays within the (3/Width)·N collision bound for every key
    val bound = (3 * n + CountMin.Width - 1) / CountMin.Width
    exact.foreach { case (k, c) => assert(est(k) <= c + bound, s"bound blown at $k") }
  }
}
