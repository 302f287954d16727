package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string as `array<string>`, as one codegen'd
  * loop.
  *
  * The composable form — `transform(sequence(1, length(s)-n+1),
  * i -> substr(s, i, n))` — runs INTERPRETED: higher-order functions have
  * no codegen path, so profiling a 10M-character corpus paid ~10M
  * reflective `substr` calls (v3 was the slowest non-iterative query in
  * the bench). This expression emits the same code-point substrings from a
  * single generated loop. Fewer than `n` chars → empty array, matching the
  * `when(length >= n, ...)` guard it replaces.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams expects (string, n>=1), got (${child.dataType}, $n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) new GenericArrayData(new Array[AnyRef](0))
    else {
      val out = new Array[AnyRef](len - n + 1)
      var i = 0
      while (i <= len - n) { out(i) = s.substring(i, i + n); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val arr = ctx.freshName("arr")
      s"""
         |int $len = $s.numChars();
         |if ($len < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  Object[] $arr = new Object[$len - $n + 1];
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    $arr[$i] = $s.substring($i, $i + $n);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization as a codegen'd expression — the text
  * pipeline's canonicalization step: the same visible string can arrive
  * as precomposed (é) or combining (e +  ́) codepoints; hashing, dedup,
  * and equality joins must see ONE form or identical documents fingerprint
  * differently. Wraps `java.text.Normalizer` (a static JDK call — safe to
  * invoke from generated Java); DuckDB's `nfc_normalize` is the oracle
  * counterpart.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(), java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Idempotent session registration: `graft_char_ngrams(s, n)` with a
    * foldable integral n, and `graft_nfc(s)`.
    *
    * The n argument is resolved at registration-expansion time (it sizes
    * the codegen'd loop), so it must be a foldable integral expression;
    * anything else fails with a named AnalysisException rather than the
    * opaque ClassCastException/NPE a blind `eval(null).asInstanceOf[Int]`
    * produced (BIGINT literals are the common trap: SQL `3` parses as INT
    * but `CAST(3 AS BIGINT)` folds to a Long).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_ngrams",
      exprs => {
        def fail(why: String): Nothing = throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" -> s"graft_char_ngrams(text, n): $why"))
        if (exprs.length != 2) fail(s"expects 2 arguments, got ${exprs.length}")
        val nExpr = exprs(1)
        if (!nExpr.foldable) fail(s"n must be a literal integer, got non-foldable ${nExpr.sql}")
        val n = nExpr.eval(null) match {
          case i: java.lang.Integer => i.intValue
          case s: java.lang.Short   => s.intValue
          case b: java.lang.Byte    => b.intValue
          case l: java.lang.Long =>
            try Math.toIntExact(l.longValue)
            catch { case _: ArithmeticException => fail(s"n = $l does not fit in an Int") }
          case null  => fail("n must not be NULL")
          case _     => fail(s"n must be an integral literal, got ${nExpr.dataType.simpleString}")
        }
        CharNGrams(exprs.head, n)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
  }
}
