package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for float-vector math.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) evaluate an
  * interpreted lambda per element and block whole-stage codegen, which is
  * the difference between "scans 100 TB of embeddings at parquet speed"
  * and "burns CPU boxing floats". These expressions generate a tight
  * primitive loop over the columnar `ArrayData` (no per-element closures,
  * no boxing) and participate in whole-stage codegen.
  *
  * Accumulation is an ordered left fold in double precision — same
  * numeric contract as the higher-order versions they replace.
  */
object FloatVectorExpressions {

  /** getFloat on a non-float ArrayData would silently misread bits — the
    * input type MUST be checked at analysis time.
    */
  private def requireFloatArray(name: String, types: DataType*): TypeCheckResult =
    if (types.forall { case ArrayType(FloatType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> inputs, got ${types.map(_.sql).mkString(", ")}")

  /** Σ xᵢ·yᵢ over two array<float> columns (length = min of the two). */
  case class DotF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_f32"
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(prettyName, left.dataType, right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $a.getFloat($i)) * $b.getFloat($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF32 =
      copy(left = l, right = r)
  }

  /** Σ (xᵢ−yᵢ)² over two array<float> columns (length = min of the two) —
    * the PQ encode hot path: corpus×M×K evaluations per encode pass, so
    * the interpreted zip_with/aggregate fold it replaces was the
    * dominant cost. Same ordered left fold in double precision:
    * bit-identical to the higher-order form and to the DuckDB oracle's
    * sum-over-unnest.
    */
  case class SqDistF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sq_dist_f32"
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(prettyName, left.dataType, right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - b.getFloat(i)
        s += d * d
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = ((double) $a.getFloat($i)) - $b.getFloat($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistF32 =
      copy(left = l, right = r)
  }

  /** Σ xᵢ² over an array<float> column. */
  case class NormSqF32(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "norm_sq_f32"
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(prettyName, child.dataType)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val x = ctx.freshName("x")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  $acc += $x * $x;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): NormSqF32 = copy(child = c)
  }

  /** The integer twins, for the exact-integer (quantized-millis) vector
    * paths — k-means assignment and the SemDeDup pair cosine, where the
    * interpreted zip_with/aggregate fold was the dominant N×k cost (the
    * q135 sf1 run spent ~100 of 103 seconds in it). Long addition is
    * associative and exact, so these are bit-identical to the
    * higher-order folds AND to the DuckDB oracle's integer sums —
    * unlike the fp family there is not even an ordering contract to
    * preserve.
    */
  private def requireLongArray(name: String, types: DataType*): TypeCheckResult =
    if (types.forall { case ArrayType(LongType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$name requires array<bigint> inputs, got ${types.map(_.sql).mkString(", ")}")

  /** Σ xᵢ·yᵢ over two array<bigint> columns (length = min of the two). */
  case class DotI64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "dot_i64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(prettyName, left.dataType, right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0L
      var i = 0
      while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotI64 =
      copy(left = l, right = r)
  }

  /** Σ (xᵢ−yᵢ)² over two array<bigint> columns — the k-means assignment
    * kernel (N×k evaluations per round).
    */
  case class SqDistI64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "sq_dist_i64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(prettyName, left.dataType, right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0L
      var i = 0
      while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $d = $a.getLong($i) - $b.getLong($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistI64 =
      copy(left = l, right = r)
  }

  /** argmin over a centroid matrix: for a vector v (array<bigint>, dim d)
    * and a row-major flattened matrix of k centroids (array<bigint>,
    * length k·d), returns the 0-based index of the centroid with the
    * smallest Σ(vᵢ−cᵢ)². Strict `<` keeps the FIRST minimum, so with
    * centroid rows sorted by cid the result reproduces the
    * min-on-(dist, cid) struct exactly.
    *
    * This is the k-means assignment kernel. The matrix rides in as a
    * LITERAL (centroids are collected to the driver each round — k·d
    * longs, ≤ 2 MB at the k = 4096 cap; the same contract as MLlib's
    * broadcast k-means and the PQ codebook literals), so assignment is
    * ONE row-local projection. The crossJoin-against-centroids form it
    * replaces materialized N·k intermediate rows each dragging the
    * d-long array — 765s for the sf10 point; this kernel does the same
    * arithmetic inside one codegen'd double loop over flat primitives.
    */
  case class ArgMinSqDistI64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "argmin_sq_dist_i64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(prettyName, left.dataType, right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val v = l.asInstanceOf[ArrayData]
      val m = r.asInstanceOf[ArrayData]
      val d = v.numElements()
      if (d == 0) 0
      else {
        val k = m.numElements() / d
        var best = Long.MaxValue
        var bi = 0
        var j = 0
        while (j < k) {
          var s = 0L
          var i = 0
          val base = j * d
          while (i < d) { val df = v.getLong(i) - m.getLong(base + i); s += df * df; i += 1 }
          if (s < best) { best = s; bi = j }
          j += 1
        }
        bi
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, m) => {
        val d = ctx.freshName("d")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val df = ctx.freshName("df")
        val base = ctx.freshName("base")
        val best = ctx.freshName("best")
        val bi = ctx.freshName("bi")
        s"""
           |int $d = $v.numElements();
           |int $bi = 0;
           |if ($d > 0) {
           |  int $k = $m.numElements() / $d;
           |  long $best = Long.MAX_VALUE;
           |  for (int $j = 0; $j < $k; $j++) {
           |    long $s = 0L;
           |    int $base = $j * $d;
           |    for (int $i = 0; $i < $d; $i++) {
           |      long $df = $v.getLong($i) - $m.getLong($base + $i);
           |      $s += $df * $df;
           |    }
           |    if ($s < $best) { $best = $s; $bi = $j; }
           |  }
           |}
           |${ev.value} = $bi;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgMinSqDistI64 =
      copy(left = l, right = r)
  }

  /** Σ xᵢ² over an array<bigint> column. */
  case class NormSqI64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "norm_sq_i64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(prettyName, child.dataType)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var s = 0L
      var i = 0
      while (i < n) { val x = a.getLong(i); s += x * x; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val x = ctx.freshName("x")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $x = $a.getLong($i);
           |  $acc += $x * $x;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): NormSqI64 = copy(child = c)
  }

  def dotF32(x: Column, y: Column): Column =
    ColumnBridge.column(DotF32(ColumnBridge.expression(x), ColumnBridge.expression(y)))
  def normSqF32(x: Column): Column =
    ColumnBridge.column(NormSqF32(ColumnBridge.expression(x)))
  def sqDistF32(x: Column, y: Column): Column =
    ColumnBridge.column(SqDistF32(ColumnBridge.expression(x), ColumnBridge.expression(y)))
  def dotI64(x: Column, y: Column): Column =
    ColumnBridge.column(DotI64(ColumnBridge.expression(x), ColumnBridge.expression(y)))
  def normSqI64(x: Column): Column =
    ColumnBridge.column(NormSqI64(ColumnBridge.expression(x)))
  def sqDistI64(x: Column, y: Column): Column =
    ColumnBridge.column(SqDistI64(ColumnBridge.expression(x), ColumnBridge.expression(y)))
  def argMinSqDistI64(v: Column, mat: Column): Column =
    ColumnBridge.column(ArgMinSqDistI64(ColumnBridge.expression(v), ColumnBridge.expression(mat)))
}
