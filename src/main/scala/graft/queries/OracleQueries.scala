package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** The t2 correctness contract: OQ01-OQ20 from SURVEY.md §2.1, each as an
  * idiomatic DataFrame-API composition over the parquet fixtures, paired
  * (in [[graft.SparkEntry.oracleSql]]) with DuckDB SQL that must hash-match
  * at sf0.01.
  *
  * Conventions shared by every query (driver compare contract):
  *  - every output column is explicitly aliased, and the alias matches the
  *    oracle SQL exactly (the driver sorts columns BY NAME before hashing);
  *  - total-order ORDER BY on both sides;
  *  - float aggregates ROUND(x, 2) (or 4) so summation-order noise between
  *    engines cannot flip the hash;
  *  - integer-typed derivations that DuckDB widens to BIGINT (row_number,
  *    rank, length, extract) are cast to LongType on the Spark side.
  *
  * Scale notes (100 TB discipline): all filters/projections sit directly on
  * the scan so Catalyst pushes them into parquet (verified via
  * explain: PushedFilters / ReadSchema); dimension joins (region, nation,
  * customer at small SF) stay under autoBroadcastJoinThreshold and plan as
  * BroadcastHashJoin; fact-fact shuffles hash-partition on the join/group
  * key only. Top-k (OQ11) plans as TakeOrderedAndProject — no global sort.
  */
object OracleQueries {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables(s, dir, name)

  /** OQ01 — scan + project + filter (reference S7/T1 shape). */
  def oq01(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** OQ02 — inner equi-join (Q2 merge shape). */
  def oq02(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir)("orders").filter(col("o_totalprice") > 200000)
    val c = t(s, dir)("customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), c("c_name"))
      .orderBy("o_orderkey")
  }

  /** OQ03 — 3-way join + grouped aggregation (Q7/Q12). */
  def oq03(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir)("orders")
    val c = t(s, dir)("customer")
    val n = t(s, dir)("nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name"))
      .agg(
        round(sum(o("o_totalprice")), 2).as("rev"),
        count(lit(1)).as("cnt"))
      .orderBy("n_name")
  }

  /** OQ04 — left outer join + count-over-nullable (Q19 backfill shape). */
  def oq04(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer")
    val o = t(s, dir)("orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n"))
      .orderBy(col("n").desc, col("c_custkey"))
  }

  /** OQ05 — semi join (Q3 seed-filter shape). */
  def oq05(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer")
    val o = t(s, dir)("orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  /** OQ06 — anti join (Q2 insert-branch shape). */
  def oq06(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer")
    val o = t(s, dir)("orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  /** OQ07 — full aggregate suite incl. COUNT(DISTINCT) (Q7/Q12). */
  def oq07(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .filter(col("l_shipdate") < to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("c"),
        countDistinct(col("l_partkey")).as("dp"),
        min("l_quantity").as("mn"),
        max("l_quantity").as("mx"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"),
        // exact decimal sum -> double -> IEEE divide -> detRound: the same
        // op sequence the oracle spells, so the average cannot diverge at
        // a half boundary (Spark's avg(decimal) is decimal-HALF_UP, the
        // oracle's AVG(decimal) is a double — different rounders)
        graft.functions.NumericFunctions.detRound(
          sum(col("l_discount")).cast("double") / count(lit(1)), 4).as("ad"))
      .orderBy("l_returnflag", "l_linestatus")

  /** OQ08 — ROLLUP grouping sets (SP derivation rollups).
    *
    * Expressed in Spark SQL: `Dataset.rollup` on a join output trips Spark
    * 4.1's ambiguous-self-join detector (the rollup's Expand duplicates the
    * grouping attributes), while the SQL path analyzes cleanly — identical
    * Catalyst plan (Expand + HashAggregate) either way. */
  def oq08(s: SparkSession, dir: String): DataFrame = {
    t(s, dir)("nation").createOrReplaceTempView("oq08_nation")
    t(s, dir)("region").createOrReplaceTempView("oq08_region")
    s.sql(
      """SELECT r_name, n_name, COUNT(*) AS c
        |FROM oq08_nation JOIN oq08_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** OQ09 — ranking windows (Q1/Q14/Q17 row_number machinery). */
  def oq09(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(s, dir)("orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"))
      .orderBy("o_custkey", "rn")
  }

  /** OQ10 — analytic window with explicit frame + LAG (Q4/Q16). */
  def oq10(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir)("orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(wRun), 2).as("run"),
        lag("o_orderkey", 1).over(w).as("prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** OQ11 — top-k: plans as TakeOrderedAndProject via [[Relational.topK]]. */
  def oq11(s: SparkSession, dir: String): DataFrame =
    Relational.topK(
      t(s, dir)("orders").select("o_orderkey", "o_totalprice"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 10)

  /** OQ12 — set operations (INTERSECT / EXCEPT / UNION ALL). */
  def oq12(s: SparkSession, dir: String): DataFrame = {
    val ck = t(s, dir)("customer").select(col("c_nationkey").as("k"))
    val sk = t(s, dir)("supplier").select(col("s_nationkey").as("k"))
    ck.intersect(sk).unionAll(ck.except(sk)).orderBy("k")
  }

  /** OQ13 — string functions (T2 digit-strip et al.). */
  def oq13(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("part")
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[0-9]", "").as("nodigit"),
        upper(col("p_brand")).as("ub"),
        substring(col("p_type"), 1, 5).as("t5"),
        length(col("p_name")).cast("long").as("ln"),
        trim(concat(col("p_brand"), lit(" "), col("p_type"))).as("ct"))
      .orderBy("p_partkey")

  /** OQ14 — date/time functions (T4/T5/T7 parse-format family). */
  def oq14(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders")
      .select(
        col("o_orderkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("m"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .orderBy("o_orderkey")

  /** OQ15 — tumbling time window (SP-era daily bucketing, hourly here). */
  def oq15(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
      .orderBy("h", "event_type")

  /** OQ16 — JSON extraction from a string column (S7/T6/E1-E4 family). */
  def oq16(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** OQ17 — explode/unnest (E1-E4): every token occurrence, no dedupe. */
  def oq17(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .orderBy("doc_id", "token")

  /** OQ18 — dedupe-keep-first (Q1) via [[Relational.dedupeKeepFirst]]. */
  def oq18(s: SparkSession, dir: String): DataFrame =
    Relational.dedupeKeepFirst(
      t(s, dir)("events").select("user_id", "event_id", "ts"),
      Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id").as("first_event"))
      .orderBy("user_id")

  /** OQ19 — merge/upsert as full-outer + coalesce (Q2 MERGE shape). */
  def oq19(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir)("events")
    val u = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum("value").as("s"))
    val b = e.groupBy("user_id").agg(sum("value").as("s"))
    u.as("u").join(b.as("b"), col("u.user_id") === col("b.user_id"), "full_outer")
      .select(
        coalesce(col("u.user_id"), col("b.user_id")).as("id"),
        round(coalesce(col("u.s"), col("b.s")), 2).as("v"))
      .orderBy("id")
  }

  /** OQ20 — `""`→null normalization + CASE banding (T1 pattern,
    * reference app.py:38-54). */
  def oq20(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("customer")
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("")), lit("UNKNOWN")).as("seg"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("band"))
      .orderBy("c_custkey")

  /** All OQ queries keyed by driver name. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "oq01_filter"      -> (oq01 _),
    "oq02_join"        -> (oq02 _),
    "oq03_join_agg"    -> (oq03 _),
    "oq04_left_join"   -> (oq04 _),
    "oq05_semi_join"   -> (oq05 _),
    "oq06_anti_join"   -> (oq06 _),
    "oq07_agg_suite"   -> (oq07 _),
    "oq08_rollup"      -> (oq08 _),
    "oq09_rank_window" -> (oq09 _),
    "oq10_frame_window"-> (oq10 _),
    "oq11_topk"        -> (oq11 _),
    "oq12_set_ops"     -> (oq12 _),
    "oq13_string_fns"  -> (oq13 _),
    "oq14_date_fns"    -> (oq14 _),
    "oq15_time_bucket" -> (oq15 _),
    "oq16_json"        -> (oq16 _),
    "oq17_explode"     -> (oq17 _),
    "oq18_dedupe"      -> (oq18 _),
    "oq19_upsert"      -> (oq19 _),
    "oq20_null_norm"   -> (oq20 _),
  )

  /** DuckDB-dialect oracle SQL, column aliases identical to the Spark side.
    * Dialect deltas vs Spark are deliberate and semantic-preserving:
    * regexp_replace 'g' flag, `->>` JSON extraction, UNNEST lateral. */
  val sql: Map[String, String] = Map(
    "oq01_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "oq02_join" ->
      """SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
        | WHERE o_totalprice > 200000 ORDER BY o_orderkey""".stripMargin,
    "oq03_join_agg" ->
      """SELECT n_name, ROUND(SUM(o_totalprice), 2) AS rev, COUNT(*) AS cnt
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name ORDER BY n_name""".stripMargin,
    "oq04_left_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n FROM customer
        | LEFT JOIN orders ON o_custkey = c_custkey
        | GROUP BY c_custkey ORDER BY n DESC, c_custkey""".stripMargin,
    "oq05_semi_join" ->
      """SELECT c_custkey FROM customer WHERE EXISTS
        | (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        | ORDER BY c_custkey""".stripMargin,
    "oq06_anti_join" ->
      """SELECT c_custkey FROM customer WHERE NOT EXISTS
        | (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | ORDER BY c_custkey""".stripMargin,
    "oq07_agg_suite" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
        | COUNT(DISTINCT l_partkey) AS dp, MIN(l_quantity) AS mn,
        | MAX(l_quantity) AS mx,
        | ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev,
        | FLOOR((SUM(l_discount)::DOUBLE / COUNT(*)) * 1.0e4 + 0.5) / 1.0e4 AS ad
        | FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-02'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "oq08_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS c
        | FROM nation JOIN region ON n_regionkey = r_regionkey
        | GROUP BY ROLLUP(r_name, n_name)
        | ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "oq09_rank_window" ->
      """SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER w AS rn,
        | RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        | ORDER BY o_custkey, rn""".stripMargin,
    "oq10_frame_window" ->
      """SELECT o_custkey, o_orderkey,
        | ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run,
        | LAG(o_orderkey) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS prev
        | FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "oq11_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "oq12_set_ops" ->
      """(SELECT c_nationkey AS k FROM customer
        |  INTERSECT SELECT s_nationkey AS k FROM supplier)
        | UNION ALL
        | (SELECT c_nationkey AS k FROM customer
        |  EXCEPT SELECT s_nationkey AS k FROM supplier)
        | ORDER BY k""".stripMargin,
    "oq13_string_fns" ->
      """SELECT p_partkey, REGEXP_REPLACE(p_name, '[0-9]', '', 'g') AS nodigit,
        | UPPER(p_brand) AS ub, SUBSTRING(p_type, 1, 5) AS t5,
        | LENGTH(p_name) AS ln, TRIM(CONCAT(p_brand, ' ', p_type)) AS ct
        | FROM part ORDER BY p_partkey""".stripMargin,
    "oq14_date_fns" ->
      """SELECT o_orderkey, CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m,
        | EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS mo
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    "oq15_time_bucket" ->
      """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS h, event_type,
        | COUNT(*) AS c, ROUND(SUM(value), 2) AS s
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "oq16_json" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
        | FROM events ORDER BY event_id""".stripMargin,
    "oq17_explode" ->
      """SELECT doc_id, t.token AS token
        | FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
        | WHERE token <> '' ORDER BY doc_id, token""".stripMargin,
    "oq18_dedupe" ->
      """SELECT user_id, event_id AS first_event FROM
        | (SELECT user_id, event_id,
        |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "oq19_upsert" ->
      """SELECT COALESCE(u.user_id, b.user_id) AS id,
        | ROUND(COALESCE(u.s, b.s), 2) AS v FROM
        | (SELECT user_id, SUM(value) AS s FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id) u
        | FULL OUTER JOIN
        | (SELECT user_id, SUM(value) AS s FROM events GROUP BY user_id) b
        | ON u.user_id = b.user_id ORDER BY id""".stripMargin,
    "oq20_null_norm" ->
      """SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, ''), 'UNKNOWN') AS seg,
        | CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid'
        |   ELSE 'high' END AS band
        | FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
