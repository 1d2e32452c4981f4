package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{MapReduceOps, Relational}
import graft.functions.TextFunctions
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query is deterministic and oracle-comparable: fp sums run on
  * decimal internally (order-independent), orderings always carry a
  * unique tiebreak, and hashes are md5-derived (engine-portable).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  // ---- §2A: reference MapReduce surface ------------------------------------

  private val grepPattern = "stream (join|merge)"

  private val aQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wordcount" -> ((s, d) =>
      MapReduceOps.wordCount(Tables.documents(s, d), "text")),
    "mr_grep" -> ((s, d) =>
      MapReduceOps.grep(Tables.documents(s, d), "text", grepPattern)
        .select(col("doc_id"), col("source"), col("n_chars"))),
    "mr_inverted_index" -> ((s, d) =>
      MapReduceOps.invertedIndex(Tables.documents(s, d), "doc_id", "text")),
    "mr_key_stats" -> ((s, d) =>
      MapReduceOps.keyStats(Tables.events(s, d), "event_type", "value")),
    "mr_distributed_sort" -> ((s, d) =>
      MapReduceOps.distributedSort(Tables.events(s, d),
        Seq(col("value").desc, col("event_id")),
        Seq(col("event_id"), col("value")))),
    "mr_combiner_agg" -> ((s, d) =>
      MapReduceOps.combinerAgg(Tables.events(s, d), "user_id", "value")),
  )

  private def tok = TextFunctions.tokensSql("text")

  private val aOracles: Map[String, String] = Map(
    "mr_wordcount" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest($tok) AS word FROM documents)
         |GROUP BY word""".stripMargin,
    "mr_grep" ->
      s"""SELECT doc_id, source, n_chars FROM documents
         |WHERE regexp_matches(text, '$grepPattern')""".stripMargin,
    "mr_inverted_index" ->
      s"""SELECT word,
         |  array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
         |  count(DISTINCT doc_id) AS n_docs
         |FROM (SELECT doc_id, unnest($tok) AS word FROM documents)
         |GROUP BY word""".stripMargin,
    "mr_key_stats" ->
      """SELECT event_type,
        |  cast(sum(cast(value AS decimal(18,4))) AS double) / count(*) AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "mr_distributed_sort" ->
      """SELECT event_id, value,
        |  cast(row_number() OVER (ORDER BY value DESC, event_id) AS integer) AS pos
        |FROM events""".stripMargin,
    "mr_combiner_agg" ->
      """SELECT user_id,
        |  cast(sum(cast(value AS decimal(18,4))) AS double) AS total_value,
        |  count(*) AS n
        |FROM events GROUP BY user_id""".stripMargin,
  )

  // ---- §2B: relational analytics -------------------------------------------

  private val bQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_top_orders"      -> (Relational.q3TopOrders _),
    "q5_region_revenue"  -> (Relational.q5RegionRevenue _),
    "q_groupby_having"   -> (Relational.qGroupByHaving _),
    "q_distinct"         -> (Relational.qDistinct _),
    "q_semi_join"        -> (Relational.qSemiJoin _),
    "q_anti_join"        -> (Relational.qAntiJoin _),
    "q_outer_join_agg"   -> (Relational.qOuterJoinAgg _),
    "q_window_rank"      -> (Relational.qWindowRank _),
    "q_window_running"   -> (Relational.qWindowRunning _),
    "q_rollup"           -> (Relational.qRollup _),
    "q_topk"             -> (Relational.qTopK _),
    "q_union"            -> (Relational.qUnion _),
    "q_scalar_subquery"  -> (Relational.qScalarSubquery _),
    "q_sessionize"       -> (Relational.qSessionize _),
    "q_extract_props"    -> (Relational.qExtractProps _),
    "q_monthly_orders"   -> (Relational.qMonthlyOrders _),
    "q_tumbling_window"  -> (Relational.qTumblingWindow _),
  )

  private val bOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity AS decimal(18,4))) AS double) AS sum_qty,
        |  cast(sum(cast(l_extendedprice AS decimal(18,4))) AS double) AS sum_base_price,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2)) * cast(1 - l_discount AS decimal(8,2))) AS double) AS sum_disc_price,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2)) * cast(1 - l_discount AS decimal(8,2)) * cast(1 + l_tax AS decimal(8,2))) AS double) AS sum_charge,
        |  cast(sum(cast(l_quantity AS decimal(18,4))) AS double) / count(*) AS avg_qty,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / count(*) AS avg_price,
        |  cast(sum(cast(l_discount AS decimal(8,4))) AS double) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderdate,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2)) * cast(1 - l_discount AS decimal(8,2))) AS double) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2)) * cast(1 - l_discount AS decimal(8,2))) AS double) AS revenue,
        |  count(*) AS n_lines
        |FROM region, nation, customer, supplier, orders, lineitem
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_groupby_having" ->
      """SELECT p_brand, count(*) AS n_parts,
        |  cast(sum(cast(p_retailprice AS decimal(18,4))) AS double) / count(*) AS avg_price,
        |  max(p_size) AS max_size
        |FROM part GROUP BY p_brand HAVING count(*) >= 5""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "q_outer_join_agg" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  coalesce(cast(sum(cast(o_totalprice AS decimal(18,4))) AS double), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS integer) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT user_id, event_id,
        |  cast(sum(cast(value AS decimal(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS running_value
        |FROM events""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity AS decimal(18,4))) AS double) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_union" ->
      """SELECT src, count(*) AS n,
        |  cast(sum(cast(amount AS decimal(18,4))) AS double) AS total_amount
        |FROM (
        |  SELECT 'event_purchase' AS src, value AS amount FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'order' AS src, o_totalprice AS amount FROM orders)
        |GROUP BY src""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT cast(sum(cast(o_totalprice AS decimal(18,4))) AS double) / count(*) FROM orders)""".stripMargin,
    "q_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        |sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |per_session AS (
        |  SELECT user_id, session_id, count(*) AS n_events
        |  FROM sessions GROUP BY user_id, session_id)
        |SELECT user_id, cast(max(session_id) AS bigint) AS n_sessions,
        |  max(n_events) AS max_session_events, count(*) AS n_groups
        |FROM per_session GROUP BY user_id""".stripMargin,
    "q_extract_props" ->
      """SELECT cast(regexp_extract(props, '"k": (\d+)', 1) AS integer) % 10 AS k_bucket,
        |  count(*) AS n,
        |  cast(sum(cast(value AS decimal(18,4))) AS double) AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    "q_monthly_orders" ->
      """SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
        |  count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice AS decimal(18,4))) AS double) AS total_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_tumbling_window" ->
      """SELECT cast(date_trunc('hour', ts) AS timestamp) AS hour_start, event_type,
        |  count(*) AS n,
        |  cast(sum(cast(value AS decimal(18,4))) AS double) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    aQueries ++ bQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  def oracleSql: Map[String, String] =
    aOracles ++ bOracles
}
