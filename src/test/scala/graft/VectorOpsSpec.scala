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

  test("sqDist matches the interpreted HOF fold bit-for-bit, and codegens fused") {
    // the PQ encoder leans on this equivalence: swapping the zip_with/
    // aggregate fold for the native expression must not move a single bit
    val hof = one(aggregate(
      zip_with(col("x"), col("y"), (a, b) => {
        val d = a.cast("double") - b.cast("double"); d * d
      }), lit(0.0), (acc, d) => acc + d))
    assert(one(VectorOps.sqDist(col("x"), col("y"))) == hof)
    assert(hof == (9.0 + 49.0 + 9.0))
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val fused = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("x", "y")
        .select((VectorOps.sqDist(col("x"), col("y"))
          + VectorOps.sqDist(col("y"), col("x"))).as("v")).as[Double].head()
      assert(fused == 16.0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("SQL surface: dot_f32 / norm_sq_f32 / word_trigrams register and evaluate") {
    graft.plans.GraftExtensions.registerRuntime(spark)
    val row = spark.sql(
      """SELECT dot_f32(array(cast(1.0 as float), cast(2.0 as float)),
        |               array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |       norm_sq_f32(array(cast(3.0 as float), cast(4.0 as float))) AS n""".stripMargin)
      .as[(Double, Double)].head()
    assert(row == ((11.0, 25.0)))
    val tri = spark.sql("SELECT word_trigrams('a b c d') AS t")
      .as[Seq[String]].head()
    assert(tri == Seq("a b c", "b c d"))
    val rh = spark.sql("SELECT rolling_hash32('abc') AS h, rolling_hash32('') AS e")
      .as[(Long, Long)].head()
    // ((97*257 + 98)*257 + 99) mod (2^31-1), zero for empty input
    assert(rh == ((6432038L, 0L)))
  }

  test("RewriteSelfDot turns dot_f32(x,x) into norm_sq_f32(x), value-preserving") {
    import graft.plans.{FloatVectorExpressions, RewriteSelfDot}
    val df = Seq(Tuple1(Seq(1.5f, -2.0f, 3.0f))).toDF("x")
    val selfDot = df.select(VectorOps.dot(col("x"), col("x")).as("d"))
    val before = org.apache.spark.sql.graft.PlanBridge.analyzed(selfDot)
    val after = RewriteSelfDot(before)
    val exprs = after.expressions.flatMap(_.collect {
      case n: FloatVectorExpressions.NormSqF32 => n
      case d: FloatVectorExpressions.DotF32 => d
    })
    assert(exprs.exists(_.isInstanceOf[FloatVectorExpressions.NormSqF32]))
    assert(!exprs.exists(_.isInstanceOf[FloatVectorExpressions.DotF32]))
    val d = selfDot.as[Double].head()
    val n = df.select(VectorOps.normSq(col("x")).as("n")).as[Double].head()
    assert(d == n)
  }

  test("native expressions reject non-float arrays at analysis time") {
    val err = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("x", "y")
        .select(VectorOps.dot(col("x"), col("y"))).collect()
    }
    assert(err.getMessage.contains("array<float>"))
  }

  test("fused dot+normSq expressions survive whole-stage codegen (no janino fallback)") {
    // Regression: doGenCode used a fixed local `acc`, so two vector
    // expressions fused into one codegen'd method collided ("Redefinition of
    // local variable acc") and Spark silently fell back to interpreted
    // execution. With fallback disabled the collision surfaces as a failure.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)), (Seq(0.5f, -1.0f), Seq(2.0f, 2.0f)))
        .toDF("x", "y")
        .select((VectorOps.normSq(col("x")) + VectorOps.dot(col("x"), col("y"))
          + VectorOps.normSq(col("y")) + VectorOps.cosine(col("x"), col("y"))).as("v"))
        .as[Double].collect()
      assert(rows.length == 2)
      // WordTrigrams generates through the same nullSafeCodeGen path —
      // fused twice so a name collision would also surface here
      val tri = Seq(("a b c d", "x y z w")).toDF("s", "t")
        .select((size(graft.plans.TextExpressions.wordTrigrams(col("s")))
          + size(graft.plans.TextExpressions.wordTrigrams(col("t")))).as("n"))
        .as[Int].collect()
      assert(tri.toSeq == Seq(4))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
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
