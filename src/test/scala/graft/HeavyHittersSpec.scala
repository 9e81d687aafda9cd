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
}
