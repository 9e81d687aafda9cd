package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

  private def requireScaledDistTypes(name: String, v: DataType,
      s: DataType, n: DataType): TypeCheckResult =
    (v, s, n) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$name requires (array<bigint>, array<bigint>, bigint), got " +
          s"${v.sql}, ${s.sql}, ${n.sql}")
    }

  /** Σ (n·vᵢ − sᵢ)² over (vector, per-dim sums, count) — the exact
    * centroid-deviation rank key of q195/q197 (deviation from the mean
    * scaled by n so everything stays on the integer grid). Exact int64;
    * the CALLER guards the `exactDistSafe` bound (past it this wraps,
    * which is precisely why the msd lane exists). Replaces an
    * interpreted `aggregate(zip_with(...))` pair — same ordered fold,
    * same values, codegen'd flat loop with no per-row array
    * materialization. A vector/sums LENGTH MISMATCH returns NULL (r19):
    * the replaced `zip_with` padded the shorter side with NULLs and the
    * fold surfaced NULL — a ragged vector must score as un-scorable,
    * never as a silently-truncated distance.
    */
  case class ScaledSqDistI64(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "scaled_sq_dist_i64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireScaledDistTypes(prettyName,
        first.dataType, second.dataType, third.dataType)

    override def nullSafeEval(v: Any, s: Any, n: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val b = s.asInstanceOf[ArrayData]
      val nn = n.asInstanceOf[Long]
      val d = a.numElements()
      if (d != b.numElements()) null
      else {
        var acc = 0L
        var i = 0
        while (i < d) {
          val df = nn * a.getLong(i) - b.getLong(i); acc += df * df; i += 1
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, s, n) => {
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val df = ctx.freshName("df")
        val acc = ctx.freshName("acc")
        s"""
           |int $d = $v.numElements();
           |if ($d != $s.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $d; $i++) {
           |    long $df = $n * $v.getLong($i) - $s.getLong($i);
           |    $acc += $df * $df;
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): ScaledSqDistI64 =
      copy(first = f, second = s, third = t)
  }

  /** The double-carrier twin of [[ScaledSqDistI64]] for the large-n
    * regime: Σ ((double)(n)·vᵢ − sᵢ)² / ((double)n · (double)n) — the
    * msd directly, every term carried in doubles so nothing wraps.
    * Same ordered fold and identical arithmetic to the HOF msd lane it
    * replaces (per-term double multiply-subtract-square, one final
    * division by the double product). Length mismatch returns NULL,
    * same contract as [[ScaledSqDistI64]] (r19).
    */
  case class ScaledMsdD(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "scaled_msd_double"
    override def checkInputDataTypes(): TypeCheckResult =
      requireScaledDistTypes(prettyName,
        first.dataType, second.dataType, third.dataType)

    override def nullSafeEval(v: Any, s: Any, n: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val b = s.asInstanceOf[ArrayData]
      val nn = n.asInstanceOf[Long].toDouble
      val d = a.numElements()
      if (d != b.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        while (i < d) {
          val df = nn * a.getLong(i) - b.getLong(i); acc += df * df; i += 1
        }
        acc / (nn * nn)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, s, n) => {
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val nd = ctx.freshName("nd")
        val df = ctx.freshName("df")
        val acc = ctx.freshName("acc")
        s"""
           |int $d = $v.numElements();
           |if ($d != $s.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $nd = (double) $n;
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $d; $i++) {
           |    double $df = $nd * $v.getLong($i) - $s.getLong($i);
           |    $acc += $df * $df;
           |  }
           |  ${ev.value} = $acc / ($nd * $nd);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): ScaledMsdD =
      copy(first = f, second = s, third = t)
  }

  /** min over OTHER-label centroids of msd_j = Σ(n_j·vᵢ − s_jᵢ)² / n_j²
    * — the q196/q197 mislabel test's cross-centroid scan as ONE
    * codegen'd kernel over a literal stats matrix, replacing the
    * crossJoin-against-centroids grid that materialized N·k rows each
    * dragging two dim-long arrays (the exact shape kmeansAssign already
    * measured at 765 s/sf10 and replaced; q196's r18 re-measure read
    * 122 s at sf10 = 24×/decade for the same reason).
    *
    * `meta` is one flat array<bigint> literal, layout
    * `[k, carrier, cid_0..cid_{k-1}, n_0..n_{k-1}, s_00..s_{k-1,d-1}]`
    * (row-major sums; d inferred from its length) — bounded by the
    * ≤2 MB broadcast-codebook contract (≤4096 labels at 64 dims).
    * carrier 1 folds exact int64 then divides by the long n_j² (the
    * tested-decades lane, bit-identical to the grid form the oracle
    * checks); carrier 0 folds in doubles and divides by
    * (double)n_j·(double)n_j (the large-n lane). Returns NULL when no
    * other label exists (single-label corpus) — same semantics as
    * `min(CASE WHEN clabel <> label THEN msd END)` — and NULL when the
    * vector's length differs from the matrix's dimension (r19): a
    * ragged vector is un-scorable, never a truncated distance.
    */
  case class MinOtherMsd(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "min_other_msd"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(LongType, _), LongType, ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, bigint, array<bigint>)")
      }

    override def nullSafeEval(v: Any, label: Any, meta: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val m = meta.asInstanceOf[ArrayData]
      val own = label.asInstanceOf[Long]
      val k = m.getLong(0).toInt
      val exactCarrier = m.getLong(1) == 1L
      if (k <= 0) null
      else if (a.numElements() != (m.numElements() - 2 - 2 * k) / k) null
      else {
        val d = a.numElements()
        var best = Double.PositiveInfinity
        var found = false
        var j = 0
        while (j < k) {
          if (m.getLong(2 + j) != own) {
            val nj = m.getLong(2 + k + j)
            val base = 2 + 2 * k + j * ((m.numElements() - 2 - 2 * k) / k)
            val msd =
              if (exactCarrier) {
                var acc = 0L
                var i = 0
                while (i < d) {
                  val df = nj * a.getLong(i) - m.getLong(base + i)
                  acc += df * df; i += 1
                }
                acc.toDouble / (nj * nj)
              } else {
                val nd = nj.toDouble
                var acc = 0.0
                var i = 0
                while (i < d) {
                  val df = nd * a.getLong(i) - m.getLong(base + i)
                  acc += df * df; i += 1
                }
                acc / (nd * nd)
              }
            if (!found || msd < best) { best = msd; found = true }
          }
          j += 1
        }
        if (found) best else null
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, label, m) => {
        val k = ctx.freshName("k")
        val ds = ctx.freshName("ds")
        val d = ctx.freshName("d")
        val exact = ctx.freshName("exact")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val nj = ctx.freshName("nj")
        val base = ctx.freshName("base")
        val msd = ctx.freshName("msd")
        val best = ctx.freshName("best")
        val found = ctx.freshName("found")
        val accL = ctx.freshName("accL")
        val accD = ctx.freshName("accD")
        val df = ctx.freshName("df")
        val nd = ctx.freshName("nd")
        s"""
           |int $k = (int) $m.getLong(0);
           |boolean $exact = $m.getLong(1) == 1L;
           |boolean $found = false;
           |double $best = Double.POSITIVE_INFINITY;
           |if ($k > 0 && $v.numElements() == ($m.numElements() - 2 - 2 * $k) / $k) {
           |  int $ds = ($m.numElements() - 2 - 2 * $k) / $k;
           |  int $d = $v.numElements();
           |  for (int $j = 0; $j < $k; $j++) {
           |    if ($m.getLong(2 + $j) != $label) {
           |      long $nj = $m.getLong(2 + $k + $j);
           |      int $base = 2 + 2 * $k + $j * $ds;
           |      double $msd;
           |      if ($exact) {
           |        long $accL = 0L;
           |        for (int $i = 0; $i < $d; $i++) {
           |          long $df = $nj * $v.getLong($i) - $m.getLong($base + $i);
           |          $accL += $df * $df;
           |        }
           |        $msd = (double) $accL / ($nj * $nj);
           |      } else {
           |        double $nd = (double) $nj;
           |        double $accD = 0.0;
           |        for (int $i = 0; $i < $d; $i++) {
           |          double $df = $nd * $v.getLong($i) - $m.getLong($base + $i);
           |          $accD += $df * $df;
           |        }
           |        $msd = $accD / ($nd * $nd);
           |      }
           |      if (!$found || $msd < $best) { $best = $msd; $found = true; }
           |    }
           |  }
           |}
           |if ($found) { ${ev.value} = $best; } else { ${ev.isNull} = true; }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): MinOtherMsd =
      copy(first = f, second = s, third = t)
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
  def scaledSqDistI64(v: Column, s: Column, n: Column): Column =
    ColumnBridge.column(ScaledSqDistI64(ColumnBridge.expression(v),
      ColumnBridge.expression(s), ColumnBridge.expression(n)))
  def scaledMsdD(v: Column, s: Column, n: Column): Column =
    ColumnBridge.column(ScaledMsdD(ColumnBridge.expression(v),
      ColumnBridge.expression(s), ColumnBridge.expression(n)))
  def minOtherMsd(v: Column, label: Column, meta: Column): Column =
    ColumnBridge.column(MinOtherMsd(ColumnBridge.expression(v),
      ColumnBridge.expression(label), ColumnBridge.expression(meta)))
}
