package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Loud-failure guard on the driver test corpus (`TESTDATA.md`): the corpus
  * is regenerated between rounds and its physical types are NOT guaranteed
  * stable (the events `ts` encoding has already changed once, silently
  * breaking 23 queries — see `EventTsContractSpec`). This spec pins the
  * logical schema every query module assumes, per table, so the next drift
  * fails here with the table and column named instead of surfacing as a
  * wall of oracle hash mismatches.
  *
  * Timestamp-valued columns accept both session-zoned TIMESTAMP and
  * TIMESTAMP_NTZ: under the pinned UTC session zone the two carry the same
  * micros and DuckDB reads either as its naive TIMESTAMP, so queries are
  * agnostic between them. Anything else (DATE, strings, a changed unit) is
  * a real contract change.
  */
class CorpusContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private val TimestampLike: Set[DataType] = Set(TimestampType, TimestampNTZType)

  /** column -> acceptable data types (singleton for exact pins) */
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> TimestampLike, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> TimestampLike),
    // events goes through normalizeEventTs, so ts pins to the EXACT
    // normalized type — a new physical encoding must extend the normalizer
    "events" -> Map("event_id" -> Set(LongType), "ts" -> Set(TimestampType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType)))

  test("every gate table loads with the logical schema the query modules assume") {
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Tables.load(spark, sfDir, table).schema
      cols.toSeq.sortBy(_._1).flatMap { case (name, ok) =>
        if (!schema.fieldNames.contains(name))
          Some(s"$table.$name: MISSING (corpus now has ${schema.fieldNames.mkString(",")})")
        else if (!ok.contains(schema(name).dataType))
          Some(s"$table.$name: is ${schema(name).dataType}, engine expects one of ${ok.mkString("/")}")
        else None
      }
    }
    assert(problems.isEmpty,
      "the driver regenerated the corpus with a schema the engine does not expect — " +
        "fix the loaders (see Tables.normalizeEventTs for the pattern) before debugging " +
        "query code:\n  " + problems.mkString("\n  "))
  }

  test("every gate SF directory carries every table") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); t <- Tables.names)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"/root/testdata/$sf/$t.parquet")),
        s"$sf/$t.parquet missing")
  }
}
