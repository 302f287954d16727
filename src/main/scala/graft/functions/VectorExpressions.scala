package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object VectorExpressions {
  /** Idempotent session registration (Column API reaches it via
    * `call_function`, SQL texts via the bare name).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductDouble(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adc", exprs => PqAdcSum(exprs.head, exprs(1)), "built-in")
  }
}
