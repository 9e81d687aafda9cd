package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerKey

/** The custom group-wise top-k operator must agree row-for-row with the
  * window rewrite, plan as partial+final heap execs (partial BEFORE the
  * exchange), and handle k larger than any group.
  */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables(spark, TestSpark.sf).orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")
  }

  private def viaCustom(k: Int) =
    TopKPerKey.topKPerKey(
        Tables(spark, TestSpark.sf).orders,
        keys = Seq("o_orderpriority"),
        order = Seq(TopKPerKey.SortSpec("o_totalprice", desc = true),
          TopKPerKey.SortSpec("o_orderkey")),
        k = k)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"o_totalprice".desc, $"o_orderkey")

  test("matches the window rewrite exactly") {
    assert(viaCustom(5).collect().toSeq == viaWindow(5).collect().toSeq)
  }

  test("k exceeding group sizes returns all rows per key") {
    val n = viaCustom(100000).count()
    assert(n == Tables(spark, TestSpark.sf).orders.count())
  }

  test("plans as partial heap before the exchange, final after") {
    val df = TopKPerKey.topKPerKey(
      Tables(spark, TestSpark.sf).orders,
      Seq("o_orderpriority"),
      Seq(TopKPerKey.SortSpec("o_totalprice", desc = true),
        TopKPerKey.SortSpec("o_orderkey")), 3)
    val plan = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }
    assert(plan.contains("TopKPerKey"), plan.take(2000))
    val first = plan.indexOf("(2) TopKPerKey")
    assert(plan.indexOf("(4) TopKPerKey", first + 1) > 0, "expected partial + final")
    assert(plan.contains("Exchange"))
  }
}
