package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, TimestampType}

/** Top-level so scalac emits a Java static forwarder — whole-stage-codegen'd
  * Java (compiled by Janino) can then call
  * `graft.functions.YqlErrors.unwrapNull()` directly.
  */
object YqlErrors {
  def unwrapNull(): RuntimeException =
    new IllegalStateException("unwrap() failed: got NULL where a required value was expected")
}

/** YQL-compatibility scalar layer (SURVEY.md §2.3, §2.8).
  *
  * The reference's query dialect has exactly one scalar primitive Spark lacks:
  * `unwrap(x)` — YQL's Optional→required assertion that *fails the query at
  * runtime* when the value is NULL and flips the schema to non-nullable
  * (used at /root/reference/src/py/yq_dag.py:66 and :73 on `p.id` and on the
  * partition-year expression). Everything else maps to built-in
  * `org.apache.spark.sql.functions`.
  */
object Yql {

  /** YQL `unwrap`: identity on non-null input, runtime error on NULL, and —
    * unlike a `when(...isNull, raise_error)` guard — reports `nullable=false`
    * to downstream schema consumers, exactly like YQL's `T?` → `T`.
    *
    * Codegen-friendly (participates in whole-stage codegen via doGenCode) so
    * it never breaks a codegen span in the export hot path.
    */
  case class Unwrap(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean  = false
    override def prettyName: String = "unwrap"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) throw YqlErrors.unwrapNull()
      v
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      val jt = CodeGenerator.javaType(dataType)
      val resultCode =
        code"""
          ${c.code}
          if (${c.isNull}) {
            throw graft.functions.YqlErrors.unwrapNull();
          }
          $jt ${ev.value} = ${c.value};
        """
      ev.copy(code = resultCode, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Idempotent registration of the YQL-compat functions for SQL texts. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unwrap", exprs => Unwrap(exprs.head), "built-in")

  /** `unwrap(col)` for the Column API. Requires [[register]] on the session
    * the plan is analyzed with (GraftSession.prepare does this).
    */
  def unwrap(c: Column): Column = call_function("unwrap", c)

  /** YQL `cast(ts as Datetime)`: second-precision truncation
    * (/root/reference/src/py/yq_dag.py:66 — µs → s). Must be applied
    * identically on export and reconciliation or the exclusion join ≠ 0.
    */
  def toDatetime(c: Column): Column = date_trunc("second", c).cast(TimestampType)

  /** YQL `unwrap(cast(DateTime::GetYear(ts) as UInt32))` — the partition-year
    * expression (/root/reference/src/py/yq_dag.py:73). Spark has no unsigned
    * types; year values fit IntegerType.
    */
  def paymentYear(c: Column): Column = year(c).cast(IntegerType)
}
