package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PaymentsGenerator
import graft.sources.ColdStore
import graft.yql.{PartitionedParquetSink, YqlFrontend, YqlResolver}

/** The YQL front-end against the reference's ACTUAL query texts
  * (/root/reference/src/py/yq_dag.py:65-74 load, :82-95 reconcile), with the
  * DAG's `{var}` date substitution applied the same way the reference's
  * Python does. The texts below are the reference's queries — they are the
  * INPUT the compatibility layer exists to accept, cited not copied-as-code.
  */
class YqlFrontendSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // -- translator units ------------------------------------------------

  test("tokenizer keeps strings, backticks, $refs and :: whole") {
    val ts = YqlFrontend.tokenize(
      "select unwrap(p.id) from `pg-finance`.payments p where x >= date('2020-01-01') -- c\n and DateTime::GetYear(d) <> 7")
    assert(ts.contains("`pg-finance`"))
    assert(ts.contains("'2020-01-01'"))
    assert(ts.contains("::") && ts.contains(">=") && ts.contains("<>"))
    assert(!ts.exists(_.contains("c\n")))
    val ts2 = YqlFrontend.tokenize("$s = (select 1); select * from $s;")
    assert(ts2.count(_ == "$s") == 2)
    // double-quoted strings are literals too (the CLI smoke-test trap)
    val ts3 = YqlFrontend.tokenize("""select date("1996-03-04"), 'it''s', "a""b"""")
    assert(ts3.contains("\"1996-03-04\"") && ts3.contains("'it''s'") && ts3.contains("\"a\"\"b\""))
  }

  test("cast translation: Datetime truncates to seconds, UInt32 narrows, Utf8 is STRING") {
    val s = YqlFrontend.translate(
      "select cast(ts as Datetime) as t, cast(y as UInt32) as y, cast(s as Utf8) as s from v;").sql
    assert(s.toLowerCase.contains("date_trunc ( 'second' , cast ( ts as timestamp ) )"))
    assert(s.toUpperCase.contains("AS INT )"))
    assert(s.toUpperCase.contains("AS STRING )"))
    // semantics: truncation actually happens
    GraftSession.prepare(spark)
    spark.sql("SELECT TIMESTAMP '2020-03-04 05:06:07.891234' AS ts").createOrReplaceTempView("yql_ts")
    val r = YqlFrontend.run(spark, "select cast(ts as Datetime) as t from yql_ts;").get.head()
    assert(r.getTimestamp(0).toString == "2020-03-04 05:06:07.0")
  }

  test("module functions map to Spark builtins; unknown modules fail loudly") {
    spark.sql("SELECT TIMESTAMP '2021-07-09 10:11:12' AS ts").createOrReplaceTempView("yql_mf")
    val r = YqlFrontend.run(spark,
      "select DateTime::GetYear(ts) as y, DateTime::GetMonth(ts) as m from yql_mf;").get.head()
    assert(r.getInt(0) == 2021 && r.getInt(1) == 7)
    // Unicode::Fold (locale-sensitive case folding) has no faithful Spark
    // twin — it stays unmapped and must fail loudly, naming the call
    val e = intercept[IllegalArgumentException] {
      YqlFrontend.translate("select Unicode::Fold(x) from v;")
    }
    assert(e.getMessage.contains("Unicode::Fold"))
  }

  test("exclusion join text == ExclusionJoin operator on the orders corpus") {
    val dir = "/root/testdata/sf0.001"
    sources.Tables.registerAll(spark, dir)
    val keys = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val yql = YqlFrontend.run(spark,
      """
      $a = (select o_orderkey, o_custkey, o_orderstatus, o_totalprice from orders where o_orderkey % 7 <> 0);
      $b = (select o_orderkey, o_custkey, o_orderstatus, o_totalprice from orders where o_orderkey % 5 <> 0);
      select a.* from $a a exclusion join $b b
          on a.o_orderkey = b.o_orderkey and a.o_custkey = b.o_custkey
         and a.o_orderstatus = b.o_orderstatus and a.o_totalprice = b.o_totalprice;
      """).get
    val o = spark.table("orders").selectExpr(keys: _*)
    val api = operators.ExclusionJoin(
      o.where("o_orderkey % 7 <> 0"), o.where("o_orderkey % 5 <> 0"), keys)
    assert(yql.count() == api.count())
    assert(yql.exceptAll(api).isEmpty && api.exceptAll(yql).isEmpty)
  }

  test("pragma is ignored; scalar bindings inline; DECLARE + params substitute literals") {
    sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    // pragma + scalar expression binding (the YQL idiom for shared constants)
    val r1 = YqlFrontend.run(spark,
      """
      pragma AnsiOptionalAs;
      $lo = date('1996-01-01');
      $n = 2 + 3;
      select count(1) as n from orders where o_orderdate >= $lo and o_orderkey % $n = 0;
      """).get.head().getLong(0)
    val want = spark.table("orders")
      .where("o_orderdate >= date('1996-01-01') and o_orderkey % 5 = 0").count()
    assert(r1 == want)

    // DECLARE + submitted parameters (string, long, date)
    val r2 = YqlFrontend.run(spark,
      """
      declare $status as Utf8;
      declare $lo as Date;
      select count(1) as n from orders where o_orderstatus = $status and o_orderdate >= $lo;
      """,
      params = Map("status" -> "F", "lo" -> java.sql.Date.valueOf("1994-01-01"))).get.head().getLong(0)
    val want2 = spark.table("orders")
      .where("o_orderstatus = 'F' and o_orderdate >= date('1994-01-01')").count()
    assert(r2 == want2)
  }

  test("FLATTEN BY explodes arrays: replace semantics without AS, keep-both with AS") {
    spark.sql("SELECT * FROM VALUES (1, array('x','y')), (2, array('z')) v(id, tags)")
      .createOrReplaceTempView("yql_fb")
    // default: the element REPLACES the array column
    val r = YqlFrontend.run(spark,
      "select id, tags from yql_fb t flatten by tags order by id, tags;").get.collect()
    assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "x"), (1, "y"), (2, "z")))
    // AS: original array kept, element under the new name
    val r2 = YqlFrontend.run(spark,
      "select id, tag, tags from yql_fb t flatten by tags as tag order by id, tag;").get.collect()
    assert(r2.map(x => (x.getInt(0), x.getString(1), x.getSeq[String](2).toList)).toSeq ==
      Seq((1, "x", List("x", "y")), (1, "y", List("x", "y")), (2, "z", List("z"))))
    // works against a $binding too
    val r3 = YqlFrontend.run(spark,
      """
      $b = (select id, tags from yql_fb where id = 1);
      select count(1) as n from $b flatten by tags;
      """).get.head().getLong(0)
    assert(r3 == 2L)
    // and against a parenthesized subquery relation (inner FROM must not
    // confuse the clause detection)
    val r4 = YqlFrontend.run(spark,
      "select id, tags from (select id, tags from yql_fb) t flatten by tags order by id, tags;")
      .get.collect()
    assert(r4.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "x"), (1, "y"), (2, "z")))
  }

  test("GROUP BY ROLLUP/CUBE/GROUPING SETS pass through the grouping-clause scanner") {
    spark.sql("SELECT * FROM VALUES ('a','x',1), ('a','y',2), ('b','x',4) v(g, h, n)")
      .createOrReplaceTempView("yql_gs")
    val roll = YqlFrontend.run(spark,
      "select g, h, sum(n) as s from yql_gs group by rollup(g, h) order by g, h;").get
    assert(roll.count() == 6) // 3 leaves + 2 per-g subtotals + 1 grand total
    val cube = YqlFrontend.run(spark,
      "select g, h, sum(n) as s from yql_gs group by cube(g, h) order by g, h;").get
    assert(cube.count() == 8) // + 2 per-h subtotals
    val gs = YqlFrontend.run(spark,
      "select g, h, sum(n) as s from yql_gs group by grouping sets ((g), (h)) order by g, h;").get
    assert(gs.count() == 4)
    assert(roll.where("g IS NULL AND h IS NULL").head().getLong(2) == 7L)
  }

  test("String::SplitToList splits on the LITERAL separator (regex metachars escaped)") {
    // '.' is a regex metacharacter: an unescaped split('a.b', '.') would
    // return empty fragments — the rewrite must regex-quote it
    val r = YqlFrontend.run(spark,
      "select String::SplitToList('a.b.c', '.') as parts;").get.head().getSeq[String](0)
    assert(r.toList == List("a", "b", "c"))
    val r2 = YqlFrontend.run(spark,
      "select ListLength(String::SplitToList('x y  z', ' ')) as n;").get.head().getInt(0)
    assert(r2 == 4) // consecutive separators yield an empty fragment, as in YQL
    // computed separators have no safe literal rewrite: loud failure
    val e = intercept[IllegalArgumentException] {
      YqlFrontend.translate("select String::SplitToList('a', lower('X')) as p;")
    }
    assert(e.getMessage.contains("separator must be a string literal"))
  }

  test("binding references to undefined names and bare SELECT scripts") {
    val e = intercept[IllegalArgumentException] {
      YqlFrontend.translate("select * from $nope;")
    }
    assert(e.getMessage.contains("$nope"))
    assert(YqlFrontend.run(spark, "select 1 as one;").get.head().getInt(0) == 1)
  }

  test("tokenizer: signed-exponent literals stay one token; block comments are dropped") {
    assert(YqlFrontend.tokenize("select 1.5e-3, 2E+10, 7e-2d") ==
      Vector("select", "1.5e-3", ",", "2E+10", ",", "7e-2d"))
    // plain subtraction after a number is NOT an exponent
    assert(YqlFrontend.tokenize("select 3-1, x-1") ==
      Vector("select", "3", "-", "1", ",", "x", "-", "1"))
    assert(YqlFrontend.tokenize("select /* a\n * multi-line, 'quoted' */ 1; /*x*/") ==
      Vector("select", "1", ";"))
    intercept[IllegalArgumentException](YqlFrontend.tokenize("select /* never closed"))
    // semantics end-to-end: the literal survives translation
    val r = YqlFrontend.run(spark, "select 1.5e-3 /* tiny */ as v;").get.head()
    assert(math.abs(r.getDouble(0) - 0.0015) < 1e-12)
  }

  test("FROM inside extract/substring/trim is not table-resolved") {
    val poisoned = YqlResolver(tables = Map(
      "o_orderdate" -> "WRONG_T1", "s" -> "WRONG_T2", "x" -> "WRONG_T3", "orders" -> "orders"))
    val sql = YqlFrontend.translate(
      "select extract(year from o_orderdate), substring(s from 2 for 3), trim(both 'a' from x) from orders;",
      poisoned).sql
    assert(!sql.contains("WRONG"), sql)
    // and it actually runs on Spark's parser
    spark.sql("SELECT TIMESTAMP '2022-05-06 00:00:00' AS d, 'abcdef' AS s0").createOrReplaceTempView("yql_ex")
    val r = YqlFrontend.run(spark,
      "select extract(year from d) as y, substring(s0 from 2 for 3) as m from yql_ex;").get.head()
    assert(r.getInt(0) == 2022 && r.getString(1) == "bcd")
  }

  test("LEFT ONLY JOIN maps to LEFT ANTI JOIN; RIGHT ONLY fails loudly; LIMIT and IF pass through") {
    val sql = YqlFrontend.translate("select a.x from t1 a left only join t2 b on a.x = b.x;").sql
    assert(sql.toUpperCase.contains("LEFT ANTI JOIN"))
    val e = intercept[IllegalArgumentException] {
      YqlFrontend.translate("select b.x from t1 a right only join t2 b on a.x = b.x;")
    }
    assert(e.getMessage.contains("RIGHT ONLY"))
    spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') AS t(k, v)").createOrReplaceTempView("yql_t1")
    spark.sql("SELECT * FROM VALUES (2) AS t(k)").createOrReplaceTempView("yql_t2")
    val rows = YqlFrontend.run(spark,
      "select k, if(k > 1, 'big', 'small') as sz from yql_t1 a left only join yql_t2 b on a.k = b.k order by k limit 1;")
      .get.collect()
    assert(rows.length == 1 && rows(0).getInt(0) == 1 && rows(0).getString(1) == "small")
  }

  test("SELECT * WITHOUT maps to star-EXCEPT; multi-column and t.* forms") {
    val s1 = YqlFrontend.translate("select * without a from t;").sql.toUpperCase
    assert(s1.contains("* EXCEPT ( A )"))
    val s2 = YqlFrontend.translate("select p.* without a, `b` from t p;").sql.toUpperCase
    assert(s2.contains("* EXCEPT ( A , `B` )")) // user quoting preserved
    spark.sql("SELECT 1 AS a, 2 AS b, 3 AS c").createOrReplaceTempView("yql_wo")
    val df = YqlFrontend.run(spark, "select * without b from yql_wo;").get
    assert(df.columns.toSeq == Seq("a", "c"))
    // a backquoted reserved word survives the rewrite with its quoting
    spark.sql("SELECT 1 AS `order`, 2 AS b").createOrReplaceTempView("yql_wo_rw")
    val rw = YqlFrontend.run(spark, "select * without `order` from yql_wo_rw;").get
    assert(rw.columns.toSeq == Seq("b"))
    // a WITHOUT not following a star is not YQL; Spark's parser rejects it
    intercept[Exception] {
      YqlFrontend.run(spark, "select a without b from yql_wo;").get.collect()
    }
  }

  test("List builtins and the Math/String modules map 1:1; gap'd names fail loudly") {
    val r = YqlFrontend.run(spark,
      """select ListLength(AsList(3, 1, 2)) as n, ListSort(AsList(3, 1, 2)) as srt,
        |       ListHas(AsList(1, 2), 2) as has, ListUniq(ListExtend(AsList(1), AsList(1, 2))) as uq,
        |       Math::Pow(2.0, 10.0) as p, Math::Floor(Math::Log2(1024.0)) as lg,
        |       String::ReplaceAll('a.b.c', '.', '-') as rep, String::Strip('  x ') as st,
        |       String::Contains('haystack', 'stack') as c1, String::EndsWith('file.csv', '.csv') as c2
        |  from (select 1);""".stripMargin).get.head()
    assert(r.getInt(0) == 3)
    assert(r.getSeq[Int](1) == Seq(1, 2, 3))
    assert(r.getBoolean(2))
    assert(r.getSeq[Int](3) == Seq(1, 2))
    assert(r.getDouble(4) == 1024.0)
    assert(r.getLong(5) == 10L) // Spark floor(double) → BIGINT (DuckDB keeps DOUBLE)
    assert(r.getString(6) == "a-b-c" && r.getString(7) == "x")
    assert(r.getBoolean(8) && r.getBoolean(9))
    // ListConcat (string-join, not list-append) is a semantic gap: unmapped,
    // so it reaches Spark's analyzer and fails loudly instead of silently
    // concatenating lists
    intercept[Exception] {
      YqlFrontend.run(spark, "select ListConcat(AsList('a','b')) from (select 1);").get.collect()
    }
    // ListAny/ListAll take a BOOL list (no predicate) — bridged to
    // exists/forall with an identity lambda, including nested calls and
    // composition with ListMap's real lambda
    val b = YqlFrontend.run(spark,
      """select ListAny(AsList(false, true)) as any1, ListAll(AsList(false, true)) as all1,
        |       ListAll(AsList(true, true)) as all2, ListAny(AsList(false)) as any2,
        |       ListAny(ListMap(AsList(1, 5), ($x) -> ($x > 4))) as comp,
        |       ListAll(AsList(ListAny(AsList(true)), true)) as nested
        |  from (select 1);""".stripMargin).get.head()
    assert(b.getBoolean(0) && !b.getBoolean(1) && b.getBoolean(2) && !b.getBoolean(3))
    assert(b.getBoolean(4) && b.getBoolean(5))
  }

  test("lambdas: inline, named-binding, block body; AGGREGATE_LIST collects") {
    // single-param lambda loses its parens (Spark's grammar: bare `x -> e`;
    // only 2+ params parenthesize) and `$x` refs become bare
    val t = YqlFrontend.translate(
      "select ListMap(AsList(1, 2), ($x) -> ($x * 2)) as m from (select 1);").sql
    assert(t.contains("transform ( array ( 1 , 2 ) , x -> ( x * 2 ) )"), t)
    // multi-param keeps the paren list
    val t2 = YqlFrontend.translate("select ListFilter(l, ($x, $i) -> ($i > $x)) from v;").sql
    assert(t2.contains("( x , i ) -> ( i > x )"), t2)
    // execution: inline lambda, NAMED lambda binding (inlined bare — a
    // parenthesized lambda is not a Spark expression), and a block body
    val r = YqlFrontend.run(spark,
      """$small = ($s) -> ($s < 10);
        |select ListMap(AsList(1, 2, 3), ($x) -> ($x * 2)) as dbl,
        |       ListFilter(AsList(5, 50, 7), $small) as sm,
        |       ListMap(AsList(1, 2), ($x) -> { RETURN $x + 100; }) as blk
        |  from (select 1);""".stripMargin).get.head()
    assert(r.getSeq[Int](0) == Seq(2, 4, 6))
    assert(r.getSeq[Int](1) == Seq(5, 7))
    assert(r.getSeq[Int](2) == Seq(101, 102))
    // list-collecting aggregates
    spark.sql("SELECT * FROM VALUES ('a', 1), ('a', 2), ('a', 1), ('b', 3) AS t(g, v)")
      .createOrReplaceTempView("yql_agg")
    val a = YqlFrontend.run(spark,
      """select g, ListSort(AGGREGATE_LIST(v)) as vs,
        |       ListSort(AGGREGATE_LIST_DISTINCT(v)) as dvs
        |  from yql_agg group by g order by g;""".stripMargin).get.collect()
    assert(a(0).getSeq[Int](1) == Seq(1, 1, 2) && a(0).getSeq[Int](2) == Seq(1, 2))
    assert(a(1).getSeq[Int](1) == Seq(3))
    // multi-statement block bodies: local bindings inline sequentially
    // (each sees the previous), params rename through the inlined exprs
    val m = YqlFrontend.run(spark,
      """select ListMap(AsList(1, 2, 3), ($x) -> { $d = $x * 2; $s = $d + $x; RETURN $s + 1; }) as r
        |  from (select 1);""".stripMargin).get.head()
    assert(m.getSeq[Int](0) == Seq(4, 7, 10)) // 3x+1
    // a block not ending in RETURN still fails loudly
    val e = intercept[IllegalArgumentException] {
      YqlFrontend.translate("select ListMap(l, ($x) -> { $y = 1; }) from v;")
    }
    assert(e.getMessage.toLowerCase.contains("return"))
    // a non-binding statement before RETURN fails loudly
    val e2 = intercept[IllegalArgumentException] {
      YqlFrontend.translate("select ListMap(l, ($x) -> { select 1; RETURN $x; }) from v;")
    }
    assert(e2.getMessage.contains("binding"))
  }

  test("ANSI constructs pass through untouched: named windows, EXISTS/IN, BETWEEN, CASE") {
    spark.sql(
      "SELECT * FROM VALUES (1, 10.0, 'a'), (2, 5.0, 'a'), (3, 20.0, 'b'), (4, 1.0, 'b') AS t(k, amt, g)")
      .createOrReplaceTempView("yql_ansi")
    // named WINDOW clause survives the rewriter and Spark resolves it
    // (partitioned — an unpartitioned window would warn WindowExec about
    // single-partition collapse on every test run)
    val w = YqlFrontend.run(spark,
      """$r = (select k, amt, row_number() over w as rn from yql_ansi
        |       window w as (partition by g order by amt desc));
        |select k, rn from $r where rn = 1 order by k;""".stripMargin).get.collect()
    assert(w.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 1), (3, 1)))
    // EXISTS / IN subqueries, BETWEEN, CASE — clause-level FROM rewriting
    // must not touch the inner relations' usage as expression operands
    val rows = YqlFrontend.run(spark,
      """select k,
        |       case when amt between 4.0 and 15.0 then 'mid' else 'edge' end as bucket
        |  from yql_ansi a
        | where exists (select 1 from yql_ansi b where b.k = a.k + 1)
        |   and k in (select k from yql_ansi where amt > 2.0)
        | order by k;""".stripMargin).get.collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "mid"), (2, "mid"), (3, "edge")))
  }

  test("ANSI join texts: LEFT/RIGHT/FULL/CROSS pass through; backticked alias in ON survives") {
    spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') AS t(k, s)")
      .createOrReplaceTempView("yql_jl")
    spark.sql("SELECT * FROM VALUES (2, 'x'), (3, 'y'), (4, 'z') AS t(k, v)")
      .createOrReplaceTempView("yql_jr")
    def rows(q: String) = YqlFrontend.run(spark, q).get.collect()
    val lj = rows("select l.k as k, r.v as v from yql_jl l left join yql_jr r on l.k = r.k order by k;")
    assert(lj.map(r => (r.getInt(0), Option(r.getString(1)))).toSeq ==
      Seq((1, None), (2, Some("x")), (3, Some("y"))))
    val rj = rows("select r.k as k, l.s as s from yql_jl l right join yql_jr r on l.k = r.k order by k;")
    assert(rj.map(r => (r.getInt(0), Option(r.getString(1)))).toSeq ==
      Seq((2, Some("b")), (3, Some("c")), (4, None)))
    val fj = rows("select coalesce(l.k, r.k) as k from yql_jl l full join yql_jr r on l.k = r.k order by k;")
    assert(fj.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val cj = rows("select count(1) as n from yql_jl cross join yql_jr;")
    assert(cj.head.getLong(0) == 9L)
    // a reserved-word alias must stay backquoted — `order`.k in the ON
    // condition and the select list is an ALIAS.column reference, which
    // the table rewriter used to mistake for a connection.table ref and
    // swallow the qualifier
    val ba = rows("select `order`.k as k, r.v as v from yql_jl `order` join yql_jr r on `order`.k = r.k order by k;")
    assert(ba.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((2, "x"), (3, "y")))
    // comma-separated FROM lists still resolve EVERY relation through the
    // resolver, not just the first
    val resolver = YqlResolver(tables = Map("pgA.t1" -> "yql_jl", "s3B.t2" -> "yql_jr"))
    val cf = YqlFrontend.run(spark,
      "select count(1) as n from `pgA`.t1 a, `s3B`.t2 b where a.k = b.k;", resolver).get
    assert(cf.head.getLong(0) == 2L)
  }

  test("HAVING resolves a GROUP BY alias (inlined) next to an aggregate; DISTINCT passes through") {
    spark.sql("SELECT * FROM VALUES (1, 10), (1, 10), (2, 20), (3, 30), (4, 41), (5, 52) AS t(k, v)")
      .createOrReplaceTempView("yql_hav")
    // alias referenced ONLY in HAVING — Spark's output-alias fallback can't
    // resolve it (it isn't in the SELECT list), so this proves the inline
    val r = YqlFrontend.run(spark,
      """$d = (select distinct k, v from yql_hav);
        |select count(1) as n from $d
        | group by v % 10 as vmod having vmod > 0 and count(1) >= 1
        | order by n;""".stripMargin).get.collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1, 1)) // vmod 1 -> {41}, 2 -> {52}
    // DISTINCT deduplicated the (1,10) twin: groups of vmod=0 were dropped by
    // HAVING; sanity-check the distinct binding alone
    val d = YqlFrontend.run(spark,
      "select distinct k, v from yql_hav;").get.count()
    assert(d == 5)
  }

  test("INSERT WITH TRUNCATE parses, replaces instead of appends, and unknown hints fail") {
    val s = YqlFrontend.translate(
      "insert into sink_t with truncate (a, b) select k, v from yql_hav;")
    assert(s.insert.exists(t => t.truncate && t.sink == "sink_t" && t.columns == Seq("a", "b")))
    assert(!YqlFrontend.translate(
      "insert into sink_t (a, b) select k, v from yql_hav;").insert.get.truncate)
    val bad = intercept[IllegalArgumentException] {
      YqlFrontend.translate("insert into sink_t with xlock (a) select k from yql_hav;")
    }
    assert(bad.getMessage.contains("hint"))

    // end-to-end: re-running a WITH TRUNCATE insert is idempotent (dynamic
    // overwrite of produced partitions), while plain INSERT appends
    val base = Files.createTempDirectory("graft-yql-trunc").toString + "/cold"
    spark.sql("SELECT * FROM VALUES (1, 2020), (2, 2020), (3, 2021) AS t(id, y)")
      .createOrReplaceTempView("yql_trunc_src")
    val res = YqlResolver(sinks = Map("store" -> PartitionedParquetSink(base, "y")))
    val text = "insert into store with truncate (id, y) select id, y from yql_trunc_src;"
    YqlFrontend.run(spark, text, res)
    YqlFrontend.run(spark, text, res)
    assert(spark.read.parquet(base).count() == 3) // not 6: second run replaced
    YqlFrontend.run(spark, "insert into store (id, y) select id, y from yql_trunc_src;", res)
    assert(spark.read.parquet(base).count() == 6) // append still appends
    // a sink without truncate support fails loudly
    val noTrunc = YqlResolver(sinks = Map("store" -> new graft.yql.YqlSink {
      def insert(df: org.apache.spark.sql.DataFrame): Unit = ()
    }))
    intercept[UnsupportedOperationException] { YqlFrontend.run(spark, text, noTrunc) }
  }

  // -- the reference's three texts, verbatim ---------------------------

  private val root = Files.createTempDirectory("graft-yql").toString
  private val coldBase = s"$root/cold"

  private def referenceResolver = YqlResolver(
    tables = Map("pg-finance.payments" -> "payments", "etl_object_storage" -> "etl_object_storage"),
    sinks = Map("etl_object_storage" -> PartitionedParquetSink(coldBase, "payment_year")))

  private lazy val fixture: Unit = {
    PaymentsGenerator.payments(spark, "2020-01-01", months = 13)
      .createOrReplaceTempView("payments")
  }

  // yq_dag.py:65-74 with {var1}=2020-01-01, {var2}=2021-01-01 (the DAG's
  // EXP_DATE substitution). Verbatim YQL, modulo the Python .format braces.
  private val loadSql = """
            $s = (select unwrap(p.id) as id, p.doc_num, p.accdt, p.acckt, p.amount, cast(p.payment_date as datetime) as payment_date, descr, p.state
                from `pg-finance`.payments p
                where cast(p.payment_date as datetime) >= date('2020-01-01') and
                        cast(p.payment_date as datetime) < date('2021-01-01')
            );
            insert into etl_object_storage
            (id, doc_num, accdt, acckt, amount, payment_date, descr, state, payment_year)
            select id, doc_num, accdt, acckt, amount, payment_date, descr, state, unwrap(cast(DateTime::GetYear(payment_date) as UInt32)) from $s;
        """

  // yq_dag.py:82-95, same substitution.
  private val checkSql = """
            $s = (select unwrap(p.id) as id, p.doc_num, p.accdt, p.acckt, p.amount, cast(p.payment_date as datetime) as payment_date, descr, p.state
                from `pg-finance`.payments p
                where cast(p.payment_date as datetime) >= date('2020-01-01') and
                        cast(p.payment_date as datetime) < date('2021-01-01')
            );
            $d = (select p.id as id, p.doc_num, p.accdt, p.acckt, p.amount, p.payment_date, descr, p.state
                from etl_object_storage p
                where p.payment_date >= date('2020-01-01') and
                        p.payment_date < date('2021-01-01')
            );
            select count(1) from $s s exclusion join $d d on s.id = d.id and s.doc_num = d.doc_num
              and s.accdt = d.accdt and s.acckt = d.acckt and s.amount = d.amount and s.state = d.state;
        """

  test("reference federation query text runs verbatim (README_en.md:239-245)") {
    val dir = "/root/testdata/sf0.001"
    sources.Tables.registerAll(spark, dir)
    // hot/cold split of orders stands in for pg-finance.payments / the S3 binding
    spark.table("orders").where("o_orderdate >= TIMESTAMP '1998-01-01'")
      .selectExpr("o_orderkey AS id", "o_orderdate AS payment_date")
      .createOrReplaceTempView("fed_hot")
    spark.table("orders").where("o_orderdate < TIMESTAMP '1998-01-01'")
      .selectExpr("o_orderkey AS id", "o_orderdate AS payment_date")
      .createOrReplaceTempView("fed_cold")
    // VERBATIM text: unparenthesized $binding, GROUP BY expr AS alias
    val got = YqlFrontend.run(spark, """
      $a =
      select id, cast(payment_date as datetime) as pdate, 'pg' as src from `pg-finance`.payments
      union all
      select id, payment_date as pdate, 's3' as src from etl_object_storage;

      select dyear, src, count(1) from $a
      group by DateTime::GetYear(pdate) as dyear, src order by dyear;
      """,
      YqlResolver(tables = Map(
        "pg-finance.payments" -> "fed_hot", "etl_object_storage" -> "fed_cold")))
      .get.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val want = graft.queries.ReferenceQueries.q3Federation(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.sortBy(t => (t._1, t._2)) == want)
  }

  test("reference load query text runs verbatim: partitioned export with golden leap-year count") {
    fixture
    assert(YqlFrontend.run(spark, loadSql, referenceResolver).isEmpty) // insert → no frame
    val cold = new ColdStore(coldBase)
    val out = cold.scan(spark)
    assert(out.where(col("payment_year") === 2020).count() == 527040L) // img/YQ_Federation_Query.png leap year
    assert(out.schema("payment_date").dataType.typeName == "timestamp")
    // second truncation applied by the cast-as-datetime in $s
    assert(out.where(expr("payment_date <> date_trunc('SECOND', payment_date)")).isEmpty)
  }

  test("reference check query text runs verbatim: reconcile 0, then detects corruption") {
    fixture
    val cold = new ColdStore(coldBase)
    cold.scan(spark).createOrReplaceTempView("etl_object_storage")
    val n = YqlFrontend.run(spark, checkSql, referenceResolver).get.head().getLong(0)
    assert(n == 0L)

    // corrupt one exported row -> the same text must flag exactly 2 rows
    // (the altered S3 row + its unmatched PG twin)
    cold.scan(spark)
      .withColumn("amount", when(col("id") === 42L, col("amount") + 1.0).otherwise(col("amount")))
      .createOrReplaceTempView("etl_object_storage")
    val bad = YqlFrontend.run(spark, checkSql, referenceResolver).get.head().getLong(0)
    assert(bad == 2L)
  }

  test("2-arg IF defaults else to NULL; 3-arg and nested forms untouched") {
    val r = YqlFrontend.run(spark,
      """select IF(1 = 1, 'yes') as a,
        |       IF(1 = 2, 'yes') as b,
        |       IF(1 = 2, 'yes', 'no') as c,
        |       IF(1 = 1, IF(2 = 3, 'x'), 'z') as nested
        |  from (select 1);""".stripMargin).get.head()
    assert(r.getString(0) == "yes")
    assert(r.isNullAt(1))
    assert(r.getString(2) == "no")
    assert(r.isNullAt(3)) // outer takes then-branch = inner 2-arg IF → NULL
  }

  test("String::Substring is zero-based (structural rewrite), composes with computed pos") {
    val r = YqlFrontend.run(spark,
      """select String::Substring('abcdef', 0, 2) as head2,
        |       String::Substring('abcdef', 2) as tail4,
        |       String::Substring('abcdef', 1 + 1, 3) as mid,
        |       Unicode::ToUpper('straße') as uc,
        |       Unicode::Normalize('é') = 'é' as nfc_folds
        |  from (select 1);""".stripMargin).get.head()
    assert(r.getString(0) == "ab")
    assert(r.getString(1) == "cdef")
    assert(r.getString(2) == "cde") // pos expression (1+1) → substr(…, (1+1)+1, 3)
    assert(r.getString(3) == "STRASSE")
    assert(r.getBoolean(4)) // combining acute collapses to the precomposed char
    // wrong arity fails loudly at the rewrite, naming the function
    val e = intercept[IllegalArgumentException] {
      YqlFrontend.run(spark, "select String::Substring('abc') from (select 1);")
    }
    assert(e.getMessage.contains("Substring"))
  }

  test("notch 14: set ops pass when branch names align; misalignment fails naming the pragma") {
    // aligned names: positional ≡ by-name → passes through, UNION dedupes
    val ok = YqlFrontend.run(spark,
      """select 1 as a, 'x' as b union select 1 as a, 'x' as b
        |union select 2 as a, 'y' as b;""".stripMargin).get
    assert(ok.count() == 2)

    // YQL combines by NAME; swapped names would positionally compute a
    // different bag — must fail loudly, not silently diverge from YQ
    val mis = intercept[IllegalArgumentException] {
      YqlFrontend.run(spark, "select 1 as a, 2 as b union all select 20 as b, 10 as a;")
    }
    assert(mis.getMessage.contains("PositionalUnionAll") && mis.getMessage.contains("NAME"))

    // a star branch is underivable from the text — same loud failure
    val star = intercept[IllegalArgumentException] {
      YqlFrontend.run(spark,
        "select * from (select 1 as a) union all select 2 as a;")
    }
    assert(star.getMessage.contains("not derivable"))

    // YQL's own escape: PRAGMA PositionalUnionAll opts into positional
    val pos = YqlFrontend.run(spark,
      """pragma PositionalUnionAll;
        |select 1 as a, 2 as b union all select 20 as b, 10 as a;""".stripMargin).get
    assert(pos.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((1, 2), (20, 10))) // positional: second branch lands under (a, b)

    // audit reaches set ops nested in derived tables and bindings
    val nested = intercept[IllegalArgumentException] {
      YqlFrontend.run(spark,
        "select a from (select 1 as a union all select 2 as zz) t;")
    }
    assert(nested.getMessage.contains("differ"))
  }

  test("notch 14: INTERSECT/EXCEPT texts and JOIN USING + ROWS BETWEEN pass through") {
    val ix = YqlFrontend.run(spark,
      """select 1 as a union all select 2 as a intersect select 2 as a;""").get
    // ANSI precedence: INTERSECT binds tighter — (1 ∪ (2 ∩ 2)) = {1, 2}
    assert(ix.collect().map(_.getInt(0)).toSet == Set(1, 2))
    val ex = YqlFrontend.run(spark,
      "select 1 as a union all select 2 as a except select 2 as a;").get
    assert(ex.collect().map(_.getInt(0)).toSet == Set(1))

    // JOIN … USING coalesces the key; explicit ROWS frame bounds the sum
    val j = YqlFrontend.run(spark,
      """$l = (select 1 as k, 10 as v union all select 2 as k, 20 as v);
        |$r = (select 1 as k, 'a' as tag union all select 2 as k, 'b' as tag);
        |select k, tag,
        |       sum(v) over (order by k rows between 1 preceding and current row) as rsum
        |  from $l join $r using (k) order by k;""".stripMargin).get.collect()
    assert(j.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "a", 10L), (2, "b", 30L)))
  }
}
