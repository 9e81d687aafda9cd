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

  test("integer kernels match their higher-order folds exactly and codegen fused") {
    import graft.plans.FloatVectorExpressions._
    val df = Seq((Seq(3L, -4L, 5L), Seq(-1L, 2L, 7L))).toDF("x", "y")
    def oneL(c: org.apache.spark.sql.Column): Long =
      df.select(c.as("v")).as[Long].head()
    assert(oneL(dotI64(col("x"), col("y"))) == (-3L - 8L + 35L))
    assert(oneL(normSqI64(col("x"))) == (9L + 16L + 25L))
    assert(oneL(sqDistI64(col("x"), col("y"))) == (16L + 36L + 4L))
    // parity with the interpreted fold (associative long sums — exact)
    val hof = oneL(aggregate(
      zip_with(col("x"), col("y"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, d) => acc + d))
    assert(oneL(sqDistI64(col("x"), col("y"))) == hof)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val fused = df.select((dotI64(col("x"), col("y"))
        + sqDistI64(col("x"), col("y")) + normSqI64(col("y"))).as("v"))
        .as[Long].head()
      assert(fused == 24L + 56L + (1L + 4L + 49L))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("argmin kernel picks the nearest centroid row, first on ties") {
    import graft.plans.FloatVectorExpressions._
    // matrix rows: [0,0], [3,4], [1,1] — v=[1,1] is exactly row 2;
    // v=[2,2] ties rows 1? no: d([2,2],[0,0])=8, d([2,2],[3,4])=5,
    // d([2,2],[1,1])=2 → row 2. Tie case: rows [0,0] and [0,0] dup —
    // first wins.
    val m = Seq(0L, 0L, 3L, 4L, 1L, 1L)
    def arg(v: Seq[Long], mat: Seq[Long]): Int =
      Seq(Tuple1(v)).toDF("v")
        .select(argMinSqDistI64(col("v"), lit(mat.toArray)).as("i"))
        .as[Int].head()
    assert(arg(Seq(1L, 1L), m) == 2)
    assert(arg(Seq(3L, 3L), m) == 1)
    assert(arg(Seq(0L, 0L), Seq(0L, 0L, 0L, 0L)) == 0) // tie → first row
    // empty vector degenerates to 0, not a crash
    assert(arg(Seq.empty[Long], m) == 0)
  }

  test("scaled kernels: a dimension mismatch scores NULL, never a truncated distance (r19, ADVICE r18)") {
    import graft.plans.FloatVectorExpressions._
    // the replaced aggregate(zip_with(...)) folds padded the shorter
    // array with NULLs and surfaced NULL — the kernels must preserve
    // that: a ragged vector is un-scorable
    val meta = Seq(2L, 1L, /*cids*/ 0L, 1L, /*ns*/ 2L, 2L,
      /*sums row-major d=2*/ 0L, 0L, 10L, 10L)
    def run(fallback: String): (Boolean, Boolean, Boolean, Long, Double) = {
      val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.codegen.fallback", fallback)
      try {
        val r = Seq((Seq(1L, 2L, 3L), Seq(10L, 10L), 2L))
          .toDF("v", "s", "n")
          .select(
            scaledSqDistI64(col("v"), col("s"), col("n")).as("d2"),
            scaledMsdD(col("v"), col("s"), col("n")).as("msd"),
            minOtherMsd(col("v"), lit(0L), lit(meta.toArray)).as("om"),
            // matched lengths still score (same projection, both lanes)
            scaledSqDistI64(col("s"), col("s"), col("n")).as("ok"),
            minOtherMsd(col("s"), lit(0L), lit(meta.toArray)).as("okm"))
          .head()
        (r.isNullAt(0), r.isNullAt(1), r.isNullAt(2),
          r.getAs[Long]("ok"), r.getAs[Double]("okm"))
      } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    }
    for (fb <- Seq("true", "false")) {
      val (d2N, msdN, omN, ok, okm) = run(fb)
      assert(d2N && msdN && omN, s"fallback=$fb")
      // own sums vs own sums: dev = 2*10-10 = 10 per dim → 200
      assert(ok == 200L)
      // other centroid (label 1, n=2, sums [10,10]): same → 200/4 = 50
      assert(okm == 50.0)
    }
  }

  test("SQL surface: the i64 family registers; self-dot rewrites to norm") {
    graft.plans.GraftExtensions.registerRuntime(spark)
    val row = spark.sql(
      """SELECT dot_i64(array(2L, 3L), array(4L, 5L)) AS d,
        |       norm_sq_i64(array(3L, 4L)) AS n,
        |       sq_dist_i64(array(1L, 2L), array(4L, 6L)) AS s,
        |       argmin_sq_dist_i64(array(5L, 5L), array(0L, 0L, 5L, 5L)) AS a
        |""".stripMargin)
      .as[(Long, Long, Long, Int)].head()
    assert(row == ((23L, 25L, 25L, 1)))
  }
}
