package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** dot(a, b) over two `array<double>` columns as a single codegen'd loop.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * allocates an intermediate array per row and walks it twice; inside an
  * O(n²) candidate-pair join that allocation dominated the similarity
  * benchmarks. This expression reads both `ArrayData` buffers in one pass
  * with no allocation, while performing the *same IEEE operations in the
  * same order* (sequential left fold of products), so results — and the
  * DuckDB oracle comparisons — are bit-identical to the composable form.
  *
  * Element nulls are not expected (embedding vectors are dense); like the
  * built-in vector ops, a null *array* yields null.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance (ADC) sum for product-quantized vectors:
  * `graft_adc(codes array<int>, lut array<double>)` = Σ_m lut[m·Ks +
  * codes[m]], where Ks = |lut| / |codes| (the per-subspace codebook size,
  * row-major flattened). This is THE hot loop of IVFPQ serving — per
  * (query, candidate) pair it reads M ints and M table cells instead of
  * touching any raw vector — so it's a codegen'd no-allocation loop like
  * [[DotProductDouble]]. Null array → null; codes are trusted in-range
  * (the encoder emits 0..Ks−1 by construction).
  */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_adc expects (array<int>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val ks = if (m == 0) 0 else lut.numElements() / m
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getDouble(i * ks + codes.getInt(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val ks = ctx.freshName("ks")
      s"""
         |int $m = $a.numElements();
         |int $ks = $m == 0 ? 0 : $b.numElements() / $m;
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  ${ev.value} += $b.getDouble($i * $ks + $a.getInt($i));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization kernel: per-subspace squared-L2 distances of a
  * vector against a flattened codebook, as ONE tight codegen loop.
  * `graft_pq(u array<double>, cb array<double>, m int)` where cb is
  * row-major `(mi, c, d)` with ds = |u|/m and ks = |cb|/(m·ds).
  *
  *  - [[PqCodes]] (`graft_pq_encode`) returns the m argmin codes
  *    (array<int>, first-minimum tie-break = lowest code);
  *  - [[PqDistTable]] (`graft_pq_dists`) returns all m·ks distances
  *    (array<double>, the per-query ADC lookup table).
  *
  * Exists because the composable form — m·ks `struct(dist, c)` trees of
  * `graft_dot(slice(...))` over literal codeword arrays — costs SECONDS
  * of analysis + Janino compilation per distinct codebook (every
  * training round is a new codebook ⇒ a new compile; measured 1.5 s per
  * round on 2 k rows, pure plan overhead). Here the codebook is a single
  * array literal and the generated code is one nested loop. All inputs
  * are integer-valued doubles (the ·10⁴ fixed-point domain), so Σ(a−b)²
  * is exact and equals the |a|²+|b|²−2ab expansion bit-for-bit.
  */
abstract class PqKernel extends TernaryExpression {
  def u: Expression
  def cb: Expression
  def m: Expression
  override def first: Expression = u
  override def second: Expression = cb
  override def third: Expression = m

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (u.dataType, cb.dataType, m.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            org.apache.spark.sql.types.IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<double>, array<double>, int), got ($a, $b, $c)")
    }
}

case class PqCodes(u: Expression, cb: Expression, m: Expression) extends PqKernel {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(uv: Any, cbv: Any, mv: Any): Any = {
    val ua = uv.asInstanceOf[ArrayData]
    val ca = cbv.asInstanceOf[ArrayData]
    val mi = mv.asInstanceOf[Int]
    val ds = ua.numElements() / mi
    val ks = ca.numElements() / (mi * ds)
    val out = new Array[Int](mi)
    var s = 0
    while (s < mi) {
      var bestD = Double.MaxValue; var bestC = 0; var c = 0
      while (c < ks) {
        var d = 0.0; var i = 0
        while (i < ds) {
          val diff = ua.getDouble(s * ds + i) - ca.getDouble((s * ks + c) * ds + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC; s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ua, ca, mv) => {
      val (s, c, i, ds, ks, out, best, bestC, d, diff) =
        (ctx.freshName("s"), ctx.freshName("c"), ctx.freshName("i"), ctx.freshName("ds"),
         ctx.freshName("ks"), ctx.freshName("out"), ctx.freshName("best"),
         ctx.freshName("bestC"), ctx.freshName("d"), ctx.freshName("diff"))
      s"""
         |int $ds = $ua.numElements() / $mv;
         |int $ks = $ca.numElements() / ($mv * $ds);
         |int[] $out = new int[$mv];
         |for (int $s = 0; $s < $mv; $s++) {
         |  double $best = Double.MAX_VALUE; int $bestC = 0;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $ds; $i++) {
         |      double $diff = $ua.getDouble($s * $ds + $i) - $ca.getDouble(($s * $ks + $c) * $ds + $i);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $bestC = $c; }
         |  }
         |  $out[$s] = $bestC;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(u = newFirst, cb = newSecond, m = newThird)
}

case class PqDistTable(u: Expression, cb: Expression, m: Expression) extends PqKernel {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_dists"

  override def nullSafeEval(uv: Any, cbv: Any, mv: Any): Any = {
    val ua = uv.asInstanceOf[ArrayData]
    val ca = cbv.asInstanceOf[ArrayData]
    val mi = mv.asInstanceOf[Int]
    val ds = ua.numElements() / mi
    val ks = ca.numElements() / (mi * ds)
    val out = new Array[Double](mi * ks)
    var s = 0
    while (s < mi) {
      var c = 0
      while (c < ks) {
        var d = 0.0; var i = 0
        while (i < ds) {
          val diff = ua.getDouble(s * ds + i) - ca.getDouble((s * ks + c) * ds + i)
          d += diff * diff; i += 1
        }
        out(s * ks + c) = d; c += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ua, ca, mv) => {
      val (s, c, i, ds, ks, out, d, diff) =
        (ctx.freshName("s"), ctx.freshName("c"), ctx.freshName("i"), ctx.freshName("ds"),
         ctx.freshName("ks"), ctx.freshName("out"), ctx.freshName("d"), ctx.freshName("diff"))
      s"""
         |int $ds = $ua.numElements() / $mv;
         |int $ks = $ca.numElements() / ($mv * $ds);
         |double[] $out = new double[$mv * $ks];
         |for (int $s = 0; $s < $mv; $s++) {
         |  for (int $c = 0; $c < $ks; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $ds; $i++) {
         |      double $diff = $ua.getDouble($s * $ds + $i) - $ca.getDouble(($s * $ks + $c) * $ds + $i);
         |      $d += $diff * $diff;
         |    }
         |    $out[$s * $ks + $c] = $d;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(u = newFirst, cb = newSecond, m = newThird)
}

object VectorExpressions {
  /** Idempotent session registration (Column API reaches it via
    * `call_function`, SQL texts via the bare name).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductDouble(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adc", exprs => PqAdcSum(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode", exprs => PqCodes(exprs.head, exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_dists", exprs => PqDistTable(exprs.head, exprs(1), exprs(2)), "built-in")
  }
}
