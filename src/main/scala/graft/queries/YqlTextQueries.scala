package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables
import graft.yql.YqlFrontend

/** The YQL front-end under the DuckDB correctness gate: each query here is a
  * YQL TEXT (the reference's dialect — /root/reference/src/py/yq_dag.py:65-74,
  * 82-95) run through [[graft.yql.YqlFrontend]] over the federated temp-view
  * namespace, hash-compared against a plain-SQL oracle. This is the proof
  * that a reference user's query strings work unchanged, not just the
  * operator semantics.
  */
object YqlTextQueries {

  /** y1: the load query's YQL shape (yq_dag.py:65-74) on the `orders`
    * stand-in — named binding, `unwrap`, second-truncating Datetime cast,
    * `date()` literals, `DateTime::GetYear` + UInt32 partition-year.
    */
  def y1YqlProject(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $s = (select unwrap(p.o_orderkey) as id, p.o_custkey as acc,
                   cast(p.o_orderdate as datetime) as payment_date,
                   p.o_totalprice as amount, p.o_orderstatus as state
              from orders p
             where cast(p.o_orderdate as datetime) >= date('1996-01-01') and
                   cast(p.o_orderdate as datetime) < date('1997-01-01'));
      select id, acc, payment_date, amount, state,
             unwrap(cast(DateTime::GetYear(payment_date) as UInt32)) as payment_year
        from $s order by id;
      """).get
  }

  val y1Oracle: String =
    """SELECT o_orderkey AS id, o_custkey AS acc,
      |       date_trunc('second', o_orderdate) AS payment_date,
      |       o_totalprice AS amount, o_orderstatus AS state,
      |       CAST(year(o_orderdate) AS INTEGER) AS payment_year
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |ORDER BY id""".stripMargin

  /** y2: the reconciliation query's YQL shape (yq_dag.py:82-95) — two
    * bindings, EXCLUSION JOIN on a multi-column key including a DOUBLE,
    * count-only result.
    */
  def y2YqlExclusion(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $a = (select o_orderkey, o_custkey, o_orderstatus, o_totalprice
              from orders where o_orderkey % 7 <> 0);
      $b = (select o_orderkey, o_custkey, o_orderstatus, o_totalprice
              from orders where o_orderkey % 5 <> 0);
      select count(1) as n_mismatch from $a a exclusion join $b b
          on a.o_orderkey = b.o_orderkey and a.o_custkey = b.o_custkey
         and a.o_orderstatus = b.o_orderstatus and a.o_totalprice = b.o_totalprice;
      """).get
  }

  val y2Oracle: String =
    """WITH a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
      |     b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT (SELECT count(1) FROM a WHERE NOT EXISTS (
      |          SELECT 1 FROM b WHERE b.o_orderkey = a.o_orderkey AND b.o_custkey = a.o_custkey
      |            AND b.o_orderstatus = a.o_orderstatus AND b.o_totalprice = a.o_totalprice))
      |     + (SELECT count(1) FROM b WHERE NOT EXISTS (
      |          SELECT 1 FROM a WHERE a.o_orderkey = b.o_orderkey AND a.o_custkey = b.o_custkey
      |            AND a.o_orderstatus = b.o_orderstatus AND a.o_totalprice = b.o_totalprice))
      |       AS n_mismatch""".stripMargin

  /** y3: the federation query's YQL shape (README_en.md:239-245) — an
    * UNPARENTHESIZED `$a = select … union all select …;` binding and
    * YQL's `GROUP BY expr AS alias` with the alias referenced in the
    * SELECT list. `cnt` is aliased (the verbatim bare `count(1)` runs in
    * `YqlFrontendSpec`; the gate needs matching column names).
    */
  def y3YqlFederation(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $a =
      select o_orderkey as id, cast(o_orderdate as datetime) as pdate, 'pg' as src
        from orders where o_orderdate >= date('1998-01-01')
      union all
      select o_orderkey as id, cast(o_orderdate as datetime) as pdate, 's3' as src
        from orders where o_orderdate < date('1998-01-01');

      select dyear, src, count(1) as cnt from $a
      group by DateTime::GetYear(pdate) as dyear, src order by dyear, src;
      """).get
  }

  val y3Oracle: String =
    """WITH a AS (
      |  SELECT o_orderkey AS id, o_orderdate AS pdate, 'pg' AS src FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |  UNION ALL
      |  SELECT o_orderkey AS id, o_orderdate AS pdate, 's3' AS src FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT CAST(year(pdate) AS INTEGER) AS dyear, src, count(1) AS cnt
      |FROM a GROUP BY 1, 2 ORDER BY dyear, src""".stripMargin

  /** y4: one notch beyond the reference's three texts — the constructs a
    * real YQL user pastes next: `LEFT ONLY JOIN` (anti-join keeping left
    * columns), `IF(cond, a, b)`, `LIMIT`, a signed-exponent literal and a
    * block comment (the round-5 tokenizer defects, now load-bearing in the
    * correctness gate).
    */
  def y4YqlOnlyLimit(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      /* customers with no order above 2.5e+5 = 250000.00,
         classified by account balance */
      $big = (select o_custkey from orders where o_totalprice > 2.5e+5);
      select c.c_custkey as cust, if(c.c_acctbal < 0.0, 'neg', 'pos') as bal_class
        from customer c left only join $big b on c.c_custkey = b.o_custkey
       order by cust limit 50;
      """).get
  }

  val y4Oracle: String =
    """SELECT c.c_custkey AS cust,
      |       CASE WHEN c.c_acctbal < 0.0 THEN 'neg' ELSE 'pos' END AS bal_class
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_totalprice > 2.5e+5 AND o.o_custkey = c.c_custkey)
      |ORDER BY cust LIMIT 50""".stripMargin

  /** y5: the next breadth notch — `SELECT * WITHOUT col` (YQL's star-minus
    * projection, Spark `* EXCEPT`), `String::Contains`, and the Math module
    * over the documents corpus. `sqrt` runs on an exactly-summed BIGINT so
    * the double is identical cross-engine.
    */
  def y5YqlWithout(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $d = select * without text from documents
            where String::Contains(text, 'data') and not String::StartsWith(lang, 'x');
      select lang, count(1) as n_docs, sum(n_chars) as chars,
             cast(Math::Floor(Math::Sqrt(cast(sum(n_chars) as double))) as Int64) as sqrt_chars
        from $d group by lang order by lang;
      """).get
  }

  val y5Oracle: String =
    """SELECT lang, count(1) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars,
      |       CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE))) AS BIGINT) AS sqrt_chars
      |FROM documents
      |WHERE contains(text, 'data') AND NOT starts_with(lang, 'x')
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** y6: breadth notch 3 — `SELECT DISTINCT` in a binding, and `HAVING`
    * that references BOTH an aggregate and the `GROUP BY … AS alias` name
    * (YQL resolves the grouping alias in HAVING; the frontend inlines the
    * expression since Spark's HAVING does not see grouping-item aliases).
    */
  def y6YqlHaving(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $a = (select distinct o_custkey as acc, cast(o_orderdate as datetime) as pdate
              from orders);
      select dyear, count(1) as n_accounts
        from $a
       group by DateTime::GetYear(pdate) as dyear
      having count(1) > 50 and dyear >= 1993
       order by dyear;
      """).get
  }

  val y6Oracle: String =
    """WITH a AS (SELECT DISTINCT o_custkey AS acc,
      |                           date_trunc('second', o_orderdate) AS pdate FROM orders)
      |SELECT CAST(year(pdate) AS INTEGER) AS dyear, count(1) AS n_accounts
      |FROM a GROUP BY year(pdate)
      |HAVING count(1) > 50 AND year(pdate) >= 1993
      |ORDER BY dyear""".stripMargin

  /** y7: breadth notch 4 — list-collecting aggregates (`AGGREGATE_LIST`,
    * `AGGREGATE_LIST_DISTINCT`) and YQL lambdas in all three shapes: an
    * inline `($x) -> (expr)`, a NAMED lambda binding (`$small = …` — inlined
    * bare, since Spark only accepts lambdas as direct HOF arguments), and a
    * block body `($s) -> { RETURN …; }`. Collected lists are sorted before
    * joining/counting, so the engine-dependent collection order (true in
    * both engines) never reaches the hash compare.
    */
  def y7YqlLambdas(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $by_lang = (select lang,
             String::JoinFromList(ListSort(AGGREGATE_LIST_DISTINCT(source)), ',') as sources,
             AGGREGATE_LIST(n_chars) as sizes
        from documents group by lang);
      $small = ($s) -> ($s < 120);
      select lang, sources,
             cast(ListLength(ListFilter(sizes, ($x) -> ($x >= 500))) as Int64) as n_large,
             String::JoinFromList(
               ListMap(ListSort(ListFilter(sizes, $small)),
                       ($s) -> { RETURN cast($s as Utf8); }), ',') as small_sizes
        from $by_lang order by lang;
      """).get
  }

  val y7Oracle: String =
    """WITH by_lang AS (
      |  SELECT lang,
      |         array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
      |         list(n_chars) AS sizes
      |  FROM documents GROUP BY lang)
      |SELECT lang, sources,
      |       CAST(len(list_filter(sizes, x -> x >= 500)) AS BIGINT) AS n_large,
      |       array_to_string(list_transform(list_sort(list_filter(sizes, s -> s < 120)),
      |                                      s -> CAST(s AS VARCHAR)), ',') AS small_sizes
      |FROM by_lang ORDER BY lang""".stripMargin

  /** y8: breadth notch 5 — window functions through YQL text: a NAMED
    * `WINDOW w AS (…)` clause shared by `ROW_NUMBER` and `LAG`, plus an
    * inline windowed `COUNT`. The partition order key (`o_orderkey`) is
    * unique, so every window result is deterministic cross-engine.
    */
  def y8YqlWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $o = (select o_orderkey, o_custkey, o_totalprice from orders where o_orderkey % 3 = 0);
      select o_custkey as acc, cast(row_number() over w as Int64) as rn,
             o_orderkey as okey,
             coalesce(lag(o_orderkey) over w, 0) as prev_okey,
             cast(count(1) over (partition by o_custkey) as Int64) as n_orders
        from $o
      window w as (partition by o_custkey order by o_orderkey)
      order by acc, rn limit 200;
      """).get
  }

  val y8Oracle: String =
    """SELECT o_custkey AS acc,
      |       row_number() OVER w AS rn,
      |       o_orderkey AS okey,
      |       coalesce(lag(o_orderkey) OVER w, 0) AS prev_okey,
      |       count(1) OVER (PARTITION BY o_custkey) AS n_orders
      |FROM orders WHERE o_orderkey % 3 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY acc, rn LIMIT 200""".stripMargin

  /** y9: breadth notch 6 — ANSI join texts through the YQL frontend: a
    * LEFT JOIN against a named binding, an IN subquery, and a
    * reserved-word table alias that must stay backquoted through the
    * table rewriter (the `` `alias`.column `` form in ON/SELECT used to
    * be mistaken for a connection.table reference).
    */
  def y9YqlJoins(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $rich = (select c_custkey, c_nationkey from customer where c_acctbal > 8000.0);
      select `order`.n_name as nation, count(r.c_custkey) as n_rich
        from nation `order`
        left join $rich r on r.c_nationkey = `order`.n_nationkey
       where `order`.n_regionkey in (select r_regionkey from region where r_name <> 'EUROPE')
       group by `order`.n_name
       order by nation;
      """).get
  }

  val y9Oracle: String =
    """SELECT n.n_name AS nation, count(r.c_custkey) AS n_rich
      |FROM nation n
      |LEFT JOIN (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 8000.0) r
      |  ON r.c_nationkey = n.n_nationkey
      |WHERE n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name <> 'EUROPE')
      |GROUP BY n.n_name
      |ORDER BY nation""".stripMargin

  /** y10: the notch-6/7 constructs under the gate — `ListAny`/`ListAll`
    * over collected boolean lists (the identity-lambda bridge), a
    * block-bodied lambda with a LOCAL binding inlined ahead of RETURN,
    * and list shaping joined to strings so output order stays
    * deterministic cross-engine.
    */
  def y10YqlBoolLists(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $cls = ($n) -> { $big = $n >= 1000; RETURN IF($big, 'kb+', 'sub-kb'); };
      $flags = (select source,
                       AGGREGATE_LIST(String::Contains(text, 'data')) as has_data,
                       AGGREGATE_LIST(n_chars > 100) as big,
                       String::JoinFromList(
                         ListSort(ListUniq(ListMap(AGGREGATE_LIST(n_chars), $cls))), ',') as classes
                  from documents group by source);
      select source, ListAny(has_data) as any_data, ListAll(big) as all_big,
             cast(ListLength(has_data) as Int64) as n_docs, classes
        from $flags order by source;
      """).get
  }

  val y10Oracle: String =
    """SELECT source,
      |       bool_or(contains(text, 'data')) AS any_data,
      |       bool_and(n_chars > 100) AS all_big,
      |       count(1) AS n_docs,
      |       array_to_string(list_sort(list_distinct(
      |         list(CASE WHEN n_chars >= 1000 THEN 'kb+' ELSE 'sub-kb' END))), ',') AS classes
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** y11: FLATTEN BY under the gate — `String::SplitToList` (literal
    * separator, rewritten to a regex-escaped Spark `split`) feeding
    * `FLATTEN BY … AS …` (array explode), then a grouped count over the
    * flattened words. The row-5 frontend feature existed spec-only; this
    * puts the explode semantics (element-per-row, empty arrays vanish)
    * under the DuckDB `unnest` oracle.
    */
  def y11YqlFlatten(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $w = (select doc_id, String::SplitToList(text, ' ') as words
              from documents where doc_id % 5 = 0);
      select word, count(1) as n
        from $w flatten by words as word
       group by word
      having count(1) >= 25
       order by word;
      """).get
  }

  val y11Oracle: String =
    """SELECT word, count(1) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word
      |      FROM documents WHERE doc_id % 5 = 0)
      |GROUP BY word HAVING count(1) >= 25
      |ORDER BY word""".stripMargin

  /** y12: `GROUP BY ROLLUP` through the YQL text path — subtotal grids are
    * a reporting staple and the grouping-clause scanner must pass the
    * function-shaped grouping spec through untouched (no alias inlining
    * inside `ROLLUP(…)`). Cents are rounded on both sides (double→int
    * casts truncate in Spark but round in DuckDB), and the oracle orders
    * NULLS FIRST to match Spark's ascending default.
    */
  def y12YqlRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $o = (select r.r_name as region, n.n_name as nation, c.c_acctbal as bal
              from customer c
              join nation n on c.c_nationkey = n.n_nationkey
              join region r on n.n_regionkey = r.r_regionkey);
      select region, nation, count(1) as n_cust,
             sum(cast(Math::Round(bal * 100.0) as Int64)) as bal_cents
        from $o
       group by rollup(region, nation)
       order by region, nation;
      """).get
  }

  val y12Oracle: String =
    """WITH o AS (
      |  SELECT r.r_name AS region, n.n_name AS nation, c.c_acctbal AS bal
      |  FROM customer c
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey)
      |SELECT region, nation, count(1) AS n_cust,
      |       CAST(sum(CAST(round(bal * 100.0) AS BIGINT)) AS BIGINT) AS bal_cents
      |FROM o
      |GROUP BY ROLLUP(region, nation)
      |ORDER BY region NULLS FIRST, nation NULLS FIRST""".stripMargin

  /** y13: ordered-argument aggregates through YQL text — `MAX_BY`/`MIN_BY`
    * (pass-through: Spark's builtins share YQL's name and (value, key)
    * argument order; the ordering key is the unique orderkey so the
    * result is deterministic) and `SOME` → `any_value` over a
    * group-constant expression (the only deterministic use; the oracle
    * computes the constant directly).
    */
  def y13YqlMaxBy(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $o = (select o_custkey as acc, o_orderkey as okey, o_orderstatus as st
              from orders);
      select acc,
             max_by(st, okey) as last_status,
             min_by(st, okey) as first_status,
             some(acc % 7 = 0) as lucky,
             cast(count(1) as Int64) as n
        from $o group by acc order by acc limit 200;
      """).get
  }

  val y13Oracle: String =
    """SELECT o_custkey AS acc,
      |       max_by(o_orderstatus, o_orderkey) AS last_status,
      |       min_by(o_orderstatus, o_orderkey) AS first_status,
      |       (o_custkey % 7 = 0) AS lucky,
      |       count(1) AS n
      |FROM orders GROUP BY o_custkey ORDER BY acc LIMIT 200""".stripMargin

  /** y14: module-function breadth (notch 11) — `String::Substring`
    * (ZERO-based in YQL: rewritten structurally to one-based `substr`
    * with `pos + 1`, both 2- and 3-arg forms), `DateTime::ToSeconds` →
    * `unix_seconds`, `Unicode::ToUpper`/`Unicode::Normalize` (NFC — the
    * registered codegen expression), and `String::LevensteinDistance` →
    * `levenshtein`. The oracle computes each from DuckDB primitives
    * (`epoch_us // 1e6`, one-based `substr`, `nfc_normalize`), so the
    * hash certifies every bridge's semantics, not just its parse.
    */
  def y14YqlModules(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $e = (select event_id, ts, event_type from events);
      select event_id,
             cast(DateTime::ToSeconds(ts) as Int64) as ts_sec,
             Unicode::ToUpper(event_type) as type_uc,
             Unicode::Normalize(event_type) as type_nfc,
             String::Substring(event_type, 0, 3) as t3,
             String::Substring(event_type, 2) as t_from2,
             cast(String::LevensteinDistance(event_type, 'click') as Int64) as lev
        from $e order by event_id limit 500;
      """).get
  }

  val y14Oracle: String =
    """SELECT event_id,
      |       epoch_us(ts) // 1000000 AS ts_sec,
      |       upper(event_type) AS type_uc,
      |       nfc_normalize(event_type) AS type_nfc,
      |       substr(event_type, 1, 3) AS t3,
      |       substr(event_type, 3) AS t_from2,
      |       levenshtein(event_type, 'click') AS lev
      |FROM events ORDER BY event_id LIMIT 500""".stripMargin

  /** y15: `DateTime::StartOf*` bridges (notch 12) — structural rewrites
    * to `date_trunc('<UNIT>', x)`; WEEK is faithful because both engines
    * start weeks on Monday. Oracle = DuckDB `date_trunc` directly.
    */
  def y15YqlStartOf(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $e = (select event_id, ts from events);
      select event_id,
             DateTime::StartOfDay(ts) as day_start,
             DateTime::StartOfWeek(ts) as week_start,
             DateTime::StartOfMonth(ts) as month_start,
             DateTime::StartOfYear(ts) as year_start
        from $e order by event_id limit 400;
      """).get
  }

  val y15Oracle: String =
    """SELECT event_id,
      |       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
      |       CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
      |       CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
      |       CAST(date_trunc('year', ts) AS TIMESTAMP) AS year_start
      |FROM events ORDER BY event_id LIMIT 400""".stripMargin

  /** y16: notch 14 — set-operation texts, `JOIN … USING`, and explicit
    * window frames (`ROWS BETWEEN`). YQL set ops combine columns BY NAME;
    * the frontend's audit proves every branch's output names align (then
    * positional ≡ by-name and the text passes through; misaligned or
    * underivable names fail loudly naming `PRAGMA PositionalUnionAll`).
    * `UNION` (distinct) dedupes the overlap of the two branches; the
    * USING join coalesces the key; the framed window sums integer cents —
    * all three constructs are Spark-grammar pass-throughs, which is
    * exactly what a compatibility shim wants.
    */
  def y16YqlSetops(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    YqlFrontend.run(spark,
      """
      $o =
      select o_custkey as ck, o_orderkey as okey,
             cast(Math::Round(o_totalprice * 100.0) as Int64) as cents
        from orders where o_totalprice >= 150000.0
      union
      select o_custkey as ck, o_orderkey as okey,
             cast(Math::Round(o_totalprice * 100.0) as Int64) as cents
        from orders where o_orderkey % 7 = 0;

      $c = (select c_custkey as ck, c_name as cname from customer);

      select ck, cname, okey, cents,
             sum(cents) over (partition by ck order by okey
                              rows between 2 preceding and current row) as run3_cents
        from $o join $c using (ck)
        order by ck, okey limit 600;
      """).get
  }

  val y16Oracle: String =
    """WITH o AS (
      |  SELECT o_custkey AS ck, o_orderkey AS okey,
      |         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
      |  FROM orders WHERE o_totalprice >= 150000.0
      |  UNION
      |  SELECT o_custkey, o_orderkey, CAST(round(o_totalprice * 100.0) AS BIGINT)
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |c AS (SELECT c_custkey AS ck, c_name AS cname FROM customer)
      |SELECT ck, cname, okey, cents,
      |       CAST(sum(cents) OVER (PARTITION BY ck ORDER BY okey
      |                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS run3_cents
      |FROM o JOIN c USING (ck)
      |ORDER BY ck, okey LIMIT 600""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "y16_yql_setops" -> (y16YqlSetops _),
    "y15_yql_startof" -> (y15YqlStartOf _),
    "y14_yql_modules" -> (y14YqlModules _),
    "y1_yql_project" -> (y1YqlProject _),
    "y2_yql_exclusion" -> (y2YqlExclusion _),
    "y3_yql_federation" -> (y3YqlFederation _),
    "y4_yql_only_limit" -> (y4YqlOnlyLimit _),
    "y5_yql_without" -> (y5YqlWithout _),
    "y6_yql_having" -> (y6YqlHaving _),
    "y7_yql_lambdas" -> (y7YqlLambdas _),
    "y8_yql_window" -> (y8YqlWindow _),
    "y9_yql_joins" -> (y9YqlJoins _),
    "y10_yql_bool_lists" -> (y10YqlBoolLists _),
    "y11_yql_flatten" -> (y11YqlFlatten _),
    "y12_yql_rollup" -> (y12YqlRollup _),
    "y13_yql_maxby" -> (y13YqlMaxBy _))

  val oracles: Map[String, String] = Map(
    "y16_yql_setops" -> y16Oracle,
    "y15_yql_startof" -> y15Oracle,
    "y14_yql_modules" -> y14Oracle,
    "y1_yql_project" -> y1Oracle,
    "y2_yql_exclusion" -> y2Oracle,
    "y3_yql_federation" -> y3Oracle,
    "y4_yql_only_limit" -> y4Oracle,
    "y5_yql_without" -> y5Oracle,
    "y6_yql_having" -> y6Oracle,
    "y7_yql_lambdas" -> y7Oracle,
    "y8_yql_window" -> y8Oracle,
    "y9_yql_joins" -> y9Oracle,
    "y10_yql_bool_lists" -> y10Oracle,
    "y11_yql_flatten" -> y11Oracle,
    "y12_yql_rollup" -> y12Oracle,
    "y13_yql_maxby" -> y13Oracle)
}
