package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(child)` as a codegen'd boolean expression.
  *
  * The production shape behind d13: a crawl-increment dedup pipeline keeps
  * a Bloom filter of the corpus fingerprint index as a store artifact and
  * filters each increment executor-side BEFORE the index join. A Bloom
  * filter has no false negatives, so bloom-negative rows are definitively
  * novel and never touch the index; bloom-positive rows (real matches plus
  * an fpp-bounded sliver of false positives) proceed to the exact confirm
  * join — the final answer is exact, the filter only prunes join traffic.
  *
  * The filter is carried as serialized bytes (the case class must survive
  * plan serialization; `BloomFilterImpl` itself is not guaranteed
  * `Serializable`) and deserialized once per JVM via a plan-stable cache
  * key; generated code reaches the live filter through
  * `ctx.addReferenceObj`, so the per-row cost is one `mightContainLong`
  * call inside whole-stage codegen — no UDF, no interpreted fallback.
  */
case class BloomMightContain(child: Expression, ser: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a LONG fingerprint, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter = BloomExpressions.deserialize(ser)

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {

  /** Deserialization cache: the same serialized filter is deserialized at
    * most once per JVM. Keyed on CONTENT (`ByteBuffer.wrap` gives byte-wise
    * equality + hashCode), never on identity — identity hash codes are not
    * unique, and a collision between two distinct filters would silently
    * return the wrong one, turning bloom-negative pruning into wrong d13
    * answers. The cache is a bounded access-order LRU so long-lived
    * sessions that cycle through many filters don't accumulate them; the
    * content hash costs O(bytes) once per plan execution, not per row.
    */
  private val MaxCachedFilters = 64
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[java.nio.ByteBuffer, BloomFilter](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.nio.ByteBuffer, BloomFilter]): Boolean =
        size() > MaxCachedFilters
    })

  def deserialize(ser: Array[Byte]): BloomFilter = {
    val key = java.nio.ByteBuffer.wrap(ser)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(ser))
      cache.put(key, bf)
      bf
    }
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Column-level entry point: `mightContain(bloom, fpCol)` — routes
    * through the registered function so no private Column constructor is
    * needed; the serialized filter rides as a foldable binary literal that
    * the registration builder unwraps once at analysis time.
    */
  def mightContain(bf: BloomFilter, fp: Column): Column =
    call_function("graft_bloom_might_contain", fp, lit(serialize(bf)))

  /** Idempotent registration (same discipline as `TextExpressions`): the
    * filter argument must be a foldable BINARY literal — it sizes a
    * per-JVM deserialization, not a per-row one — so anything else fails
    * with a named AnalysisException.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => {
        def fail(why: String): Nothing = throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" -> s"graft_bloom_might_contain(fp, bloom): $why"))
        if (exprs.length != 2) fail(s"expects 2 arguments, got ${exprs.length}")
        val serExpr = exprs(1)
        if (!serExpr.foldable || serExpr.dataType != BinaryType)
          fail(s"bloom must be a foldable BINARY literal, got ${serExpr.sql}")
        serExpr.eval(null) match {
          case b: Array[Byte] => BloomMightContain(exprs.head, b)
          case null           => fail("bloom must not be NULL")
        }
      },
      "built-in")
}
