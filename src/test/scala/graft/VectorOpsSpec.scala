package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f)))
      .toDF("x", "y").select(c.as("v")).as[Double].head()

  test("dot is the ordered fold of pairwise products") {
    assert(one(VectorOps.dot(col("x"), col("y"))) == 4.0 - 10.0 + 18.0)
  }

  test("norms") {
    assert(one(VectorOps.normSq(col("x"))) == 14.0)
    assert(one(VectorOps.l1Norm(col("y"))) == 15.0)
    assert(math.abs(one(VectorOps.l2Norm(col("x"))) - math.sqrt(14.0)) < 1e-12)
  }

  test("cosine of identical vectors is 1; zero vector yields null") {
    val self = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("x", "y")
      .select(VectorOps.cosine(col("x"), col("y")).as("v")).as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("x", "y")
      .select(VectorOps.cosine(col("x"), col("y")).as("v"))
      .head().isNullAt(0)
    assert(z)
  }
}
