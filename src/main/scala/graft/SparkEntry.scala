package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsofJoin, RangeJoin, Sketches}
import graft.queries.{Extensions, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the executable inventory of SURVEY.md §2 (one entry per
  * construct) and `oracleSql` the DuckDB-dialect equivalent the driver
  * hash-compares against at sf0.01. Column aliases match 1:1.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q26_star_join(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01_pricing_summary _),
    "q02_filter_project" -> (Relational.q02_filter_project _),
    "q03_join_inner" -> (Relational.q03_join_inner _),
    "q04_join_left" -> (Relational.q04_join_left _),
    "q05_join_right" -> (Relational.q05_join_right _),
    "q06_join_full" -> (Relational.q06_join_full _),
    "q07_join_semi" -> (Relational.q07_join_semi _),
    "q08_join_anti" -> (Relational.q08_join_anti _),
    "q09_join_broadcast" -> (Relational.q09_join_broadcast _),
    "q10_join_theta" -> (Relational.q10_join_theta _),
    "q11_union_all" -> (Relational.q11_union_all _),
    "q12_intersect" -> (Relational.q12_intersect _),
    "q13_except" -> (Relational.q13_except _),
    "q14_distinct_agg" -> (Relational.q14_distinct_agg _),
    "q15_case_when" -> (Relational.q15_case_when _),
    "q16_scalar_funcs" -> (Relational.q16_scalar_funcs _),
    "q17_arith_bitwise" -> (Relational.q17_arith_bitwise _),
    "q18_json_access" -> (Relational.q18_json_access _),
    "q19_subquery_from" -> (Relational.q19_subquery_from _),
    "q20_scalar_subquery" -> (Relational.q20_scalar_subquery _),
    "q21_in_subquery" -> (Relational.q21_in_subquery _),
    "q22_exists_correlated" -> (Relational.q22_exists_correlated _),
    "q23_window" -> (Relational.q23_window _),
    "q24_rollup" -> (Relational.q24_rollup _),
    "q25_topk" -> (Relational.q25_topk _),
    "q26_star_join" -> (Relational.q26_star_join _),
    "q27_sql25_analog" -> (Relational.q27_sql25_analog _),
    "q28_time_window" -> (Relational.q28_time_window _),
    "q29_like_null" -> (Relational.q29_like_null _),
    "q30_window_funcs" -> (Relational.q30_window_funcs _),
    "q31_cube" -> (Relational.q31_cube _),
    "q32_grouping_sets" -> (Relational.q32_grouping_sets _),
    "q33_string_funcs" -> (Relational.q33_string_funcs _),
    "q34_date_funcs" -> (Relational.q34_date_funcs _),
    "q35_having" -> (Relational.q35_having _),
    "q36_pivot" -> (Relational.q36_pivot _),
    "q37_correlated_scalar" -> (Relational.q37_correlated_scalar _),
    "q38_explode" -> (Relational.q38_explode _),
    "q39_asof_join" -> (AsofJoin.purchaseClickAsof _),
    "q40_range_join" -> (RangeJoin.eventValueBands _),
    "q41_percentiles" -> (Sketches.percentileRanks _),
    "q42_range_frame" -> (Relational.q42_range_frame _),
    "q43_cte" -> (Relational.q43_cte _),
    "q44_unpivot" -> (Relational.q44_unpivot _),
    "q45_lateral" -> (Relational.q45_lateral _),
    "q46_setops_all" -> (Relational.q46_setops_all _),
    "q47_null_safe" -> (Relational.q47_null_safe _),
    "q48_moments" -> (Relational.q48_moments _),
    "q49_skew_salted" -> (Relational.q49_skew_salted _),
    "q50_window_family" -> (Relational.q50_window_family _),
    "q51_recursive" -> (Relational.q51_recursive _),
    "q52_struct" -> (Relational.q52_struct _),
    "q53_ignore_nulls" -> (Relational.q53_ignore_nulls _),
    "q54_interval_range" -> (Relational.q54_interval_range _),
  ) ++ Extensions.queries

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_base_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS sum_charge,
        floor(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0 AS avg_qty,
        floor(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0 AS avg_price,
        floor(CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0 AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1 - l_discount) AS net_price
      FROM lineitem
      WHERE l_quantity > 45
        AND (l_returnflag IN ('A','R') OR l_linestatus <> 'O')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
      ORDER BY l_orderkey, l_linenumber""",
    "q03_join_inner" -> """
      SELECT c_mktsegment, CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue,
        count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q04_join_left" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "q05_join_right" -> """
      SELECT p_partkey, count(l_orderkey) AS n_lines
      FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
      GROUP BY p_partkey ORDER BY p_partkey""",
    "q06_join_full" -> """
      SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) cu
      FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) su
        ON cu.c_nationkey = su.s_nationkey
      ORDER BY nationkey""",
    "q07_join_semi" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey""",
    "q08_join_anti" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      ORDER BY c_custkey""",
    "q09_join_broadcast" -> """
      SELECT p_brand, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue,
        count(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",
    "q10_join_theta" -> """
      SELECT s_suppkey, count(*) AS n_matches,
        CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_bal
      FROM supplier JOIN customer
        ON (s_acctbal > c_acctbal OR s_suppkey = c_custkey)
       AND s_nationkey = c_nationkey
      GROUP BY s_suppkey ORDER BY s_suppkey""",
    "q11_union_all" -> """
      SELECT nationkey, count(*) AS n,
        CAST(CAST(sum(CAST(bal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_bal
      FROM (SELECT c_nationkey AS nationkey, c_acctbal AS bal FROM customer
            UNION ALL
            SELECT s_nationkey, s_acctbal FROM supplier) u
      GROUP BY nationkey ORDER BY nationkey""",
    "q12_intersect" -> """
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",
    "q13_except" -> """
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
      ORDER BY custkey""",
    "q14_distinct_agg" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supp,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q15_case_when" -> """
      SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'low' END AS bucket,
        count(*) AS n,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY bucket""",
    "q16_scalar_funcs" -> """
      SELECT o_orderkey,
        concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS nvl_status,
        strftime(o_orderdate - INTERVAL 30 DAY, '%Y-%m-%d') AS d30,
        CAST(year(o_orderdate) AS INTEGER) AS yr,
        upper(substr(o_orderpriority, 3, 99)) AS prio
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""",
    "q17_arith_bitwise" -> """
      SELECT l_orderkey, l_linenumber,
        l_quantity + l_tax AS a_add,
        l_quantity - l_discount AS a_sub,
        CAST(floor(l_quantity * l_extendedprice * 100 + 0.5) AS BIGINT) AS a_mul_e2,
        CAST(floor(l_extendedprice / l_quantity * 10000 + 0.5) AS BIGINT) AS a_div_e4,
        l_partkey % 10 AS a_mod,
        (l_partkey & 255) AS b_and,
        (l_partkey | 16) AS b_or,
        xor(l_partkey, l_suppkey) AS b_xor
      FROM lineitem WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber""",
    "q18_json_access" -> """
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_map
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
      ORDER BY event_id""",
    "q19_subquery_from" -> """
      SELECT c_custkey, c_name, spend
      FROM (SELECT o_custkey,
              CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS spend
            FROM orders GROUP BY o_custkey) s
      JOIN customer ON o_custkey = c_custkey
      WHERE spend > 1000000
      ORDER BY c_custkey""",
    // price > avg*1.5 cleared of the double mean: price*2n > sum*3 in
    // exact DECIMAL (membership cannot flip on summation order)
    "q20_scalar_subquery" -> """
      WITH a AS (SELECT sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s,
                   count(*) AS n FROM orders)
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM orders, a
      WHERE CAST(o_totalprice AS DECIMAL(12,2)) * 2 * n > s * 3
      ORDER BY o_orderkey""",
    "q21_in_subquery" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
      ORDER BY c_custkey""",
    "q22_exists_correlated" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      ORDER BY c_custkey""",
    "q23_window" -> """
      SELECT o_custkey, o_orderkey, CAST(rnk AS INTEGER) AS rnk, running
      FROM (SELECT o_custkey, o_orderkey,
              row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
              CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS running
            FROM orders) t
      WHERE rnk <= 3 ORDER BY o_custkey, rnk""",
    "q24_rollup" -> """
      SELECT coalesce(r_name, 'ALL') AS region,
        coalesce(n_name, 'ALL') AS nation, count(*) AS n_cust
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY region, nation""",
    "q25_topk" -> """
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q26_star_join" -> """
      SELECT n_name,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS STRING) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY n_name ORDER BY n_name""",
    "q27_sql25_analog" -> """
      SELECT n_name,
        CASE WHEN o_orderstatus = 'F' THEN 'done' ELSE 'open' END AS st,
        count(DISTINCT o_custkey) AS n_cust, count(*) AS n
      FROM orders
      JOIN customer ON o_custkey = c_custkey
        AND (o_totalprice > c_acctbal * 50 OR o_orderpriority LIKE '1-%')
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderstatus IS NOT NULL
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY n_name, st ORDER BY n_name, st""",
    "q28_time_window" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        event_type, count(*) AS n,
        CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""",
    "q29_like_null" -> """
      SELECT p_partkey, p_name, p_type FROM part
      WHERE (p_type LIKE '%ECO%' OR p_brand LIKE 'Brand#1_')
        AND p_name NOT LIKE '%red%' AND p_size IS NOT NULL
      ORDER BY p_partkey""",
    "q30_window_funcs" -> """
      SELECT o_custkey, o_orderkey,
        coalesce(lag(o_totalprice) OVER w, -1.0) AS prev_price,
        coalesce(lead(o_totalprice) OVER w, -1.0) AS next_price,
        CAST(dense_rank() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS drnk,
        CAST(ntile(4) OVER w AS INTEGER) AS tile4,
        max(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",
    "q31_cube" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
        coalesce(l_linestatus, 'ALL') AS status,
        count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY flag, status""",
    "q32_grouping_sets" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
        coalesce(l_linestatus, 'ALL') AS status,
        CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
        count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY flag, status""",
    "q33_string_funcs" -> """
      SELECT p_partkey,
        trim('  ' || p_name || '  ') AS s_trim,
        lpad(p_brand, 12, '*') AS s_lpad,
        rpad(p_brand, 12, '#') AS s_rpad,
        replace(p_type, ' ', '_') AS s_repl,
        reverse(p_name) AS s_rev,
        CAST(instr(p_name, 'a') AS INTEGER) AS s_instr,
        string_split(p_name, ' ')[1] AS s_first_word,
        left(p_name, 5) AS s_left,
        right(p_type, 4) AS s_right,
        repeat(p_brand, 2) AS s_repeat,
        translate(p_type, 'AEIOU', 'aeiou') AS s_trans
      FROM part WHERE p_partkey < 500 ORDER BY p_partkey""",
    "q34_date_funcs" -> """
      SELECT o_orderkey,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS d_month,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS d_diff,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS d_addm,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS d_last,
        CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS d_dow,
        CAST(quarter(o_orderdate) AS INTEGER) AS d_q,
        CAST(month(o_orderdate) AS INTEGER) AS d_m
      FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",
    "q35_having" -> """
      SELECT o_custkey, count(*) AS n_orders,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total
      FROM orders GROUP BY o_custkey
      HAVING count(*) >= 15
      ORDER BY o_custkey""",
    "q36_pivot" -> """
      SELECT l_returnflag,
        count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q37_correlated_scalar" -> """
      SELECT c_custkey,
        (SELECT count(*) FROM orders o
         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) AS n_big
      FROM customer c
      ORDER BY c_custkey""",
    "q38_explode" -> """
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(p_name, ' ')) AS word
            FROM part WHERE p_partkey < 1000) t
      GROUP BY word
      ORDER BY word""",
    "q39_asof_join" -> """
      SELECT p.event_id,
        coalesce(c.event_id, -1) AS click_id,
        coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
      FROM events p LEFT JOIN LATERAL (
        SELECT event_id, ts FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON true
      WHERE p.event_type = 'purchase'
      ORDER BY p.event_id""",
    "q40_range_join" -> """
      WITH b(band_id, lo, hi) AS (VALUES
        (0, 0.0, 1.0), (1, 1.0, 5.0), (2, 5.0, 25.0),
        (3, 25.0, 100.0), (4, 100.0, 250.0), (5, 250.0, 1000.0))
      SELECT band_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
        count(*) AS n,
        CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6
      FROM events e JOIN b ON e.value >= b.lo AND e.value < b.hi
      GROUP BY band_id, lo, hi
      ORDER BY band_id""",
    "q41_percentiles" -> """
      WITH li AS (SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
            FROM lineitem),
      r AS (SELECT l_returnflag, cents,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM li)
      SELECT l_returnflag, count(*) AS n,
        min(CASE WHEN rn >= ceil(n * 0.5::DOUBLE) THEN cents END) AS p50_cents,
        min(CASE WHEN rn >= ceil(n * 0.9::DOUBLE) THEN cents END) AS p90_cents,
        min(CASE WHEN rn >= ceil(n * 0.99::DOUBLE) THEN cents END) AS p99_cents,
        max(cents) AS max_cents
      FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q42_range_frame" -> """
      WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
               CAST(floor(value * 1000000) AS BIGINT) AS v_e6 FROM events)
      SELECT event_id, user_id,
        count(*) OVER w AS n_10m,
        CAST(sum(v_e6) OVER w AS BIGINT) AS sum_10m_e6
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",
    "q43_cte" -> """
      WITH nat_rev AS (
        SELECT n_name,
          sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec,
          count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name),
      tot AS (SELECT sum(rev_dec) AS t_rev, count(*) AS n_nat FROM nat_rev)
      SELECT n_name, CAST(CAST(rev_dec AS STRING) AS DOUBLE) AS revenue, n_orders
      FROM nat_rev, tot
      WHERE rev_dec * CAST(n_nat AS DECIMAL(3,0)) > t_rev
      ORDER BY n_name""",
    // DuckDB side melts with UNION ALL — same result, engine-neutral
    "q44_unpivot" -> """
      WITH a AS (
        SELECT l_returnflag,
          CAST(count(*) AS DOUBLE) AS n_lines,
          CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders,
          round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'n_lines' AS metric, n_lines AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'n_orders', n_orders FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_qty', sum_qty FROM a) u
      ORDER BY l_returnflag, metric""",
    "q45_lateral" -> """
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey <= 200
      ORDER BY c_custkey, o_orderkey""",
    "q46_setops_all" -> """
      SELECT 'intersect_all' AS op, k, count(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier) i
      GROUP BY k
      UNION ALL
      SELECT 'except_all' AS op, k, count(*) AS n FROM (
        SELECT s_nationkey AS k FROM supplier
        EXCEPT ALL
        SELECT c_nationkey FROM customer) e
      GROUP BY k
      ORDER BY op, k""",
    "q47_null_safe" -> """
      WITH c AS (SELECT CASE WHEN c_nationkey < 3 THEN NULL
                   ELSE c_nationkey END AS k, c_custkey FROM customer),
           su AS (SELECT CASE WHEN s_nationkey < 3 THEN NULL
                   ELSE s_nationkey END AS k, s_suppkey FROM supplier)
      SELECT c.k AS k, count(*) AS n_pairs
      FROM c JOIN su ON c.k IS NOT DISTINCT FROM su.k
      GROUP BY c.k
      ORDER BY k NULLS FIRST""",
    // moments accumulate as exact integers (DuckDB sums to HUGEINT —
    // gated columns must be re-CAST to BIGINT or pandas renders them
    // float64 vs Spark's int64), then one deterministic double
    // expression per group
    "q48_moments" -> """
      WITH m AS (
        SELECT l_returnflag AS flag, count(*) AS n,
          sum(CAST(l_quantity AS BIGINT)) AS sx,
          sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
          sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
          sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
            * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS syy,
          sum(CAST(l_quantity AS BIGINT)
            * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT flag, n, CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
        CAST(floor(1000000 * ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
          / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT) AS var_qty_e6,
        CAST(floor(1000000 * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))) AS BIGINT)
          AS corr_e6
      FROM m ORDER BY flag""",
    // plain join+agg: the Spark side salts the join (8 sub-keys);
    // matching this oracle proves salting is result-invariant
    "q49_skew_salted" -> """
      SELECT c_nationkey AS nationkey, count(*) AS n_orders,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey ORDER BY nationkey""",
    "q50_window_family" -> """
      SELECT o_custkey, o_orderkey,
        CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_e6,
        CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_e6,
        first_value(o_orderkey) OVER w AS first_ok,
        nth_value(o_orderkey, 3) OVER w AS third_ok
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",
    // the Spark side walks the chain with WITH RECURSIVE; the oracle
    // is the window-function equivalent — the gate proves recursion
    // and ordered aggregation agree
    "q51_recursive" -> """
      SELECT custkey, orderkey, pos, run_cents FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
          CAST(row_number() OVER w AS INTEGER) AS pos,
          CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
            (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS run_cents
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)) t
      WHERE pos <= 10
      ORDER BY custkey, orderkey""",
    // IGNORE NULLS carry-forward + null-skipping running count; the
    // Spark side's last(value, true) is DuckDB's IGNORE NULLS clause
    "q53_ignore_nulls" -> """
      SELECT event_id, user_id,
        CAST(floor(last_value(value IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) * 1000000)
          AS BIGINT) AS prev_val_e6,
        count(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_obs
      FROM events ORDER BY event_id""",
    // calendar-INTERVAL RANGE frame; integer count/sum so timestamp
    // frame peers can't reorder a float accumulation
    "q54_interval_range" -> """
      SELECT event_id, user_id,
        count(*) OVER w AS n_1h,
        CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) OVER w AS BIGINT)
          AS sum_1h_e6
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",
    // rank-window equivalent of Spark's max(struct(date, key)):
    // matching proves struct ordering == explicit lexicographic rank
    "q52_struct" -> """
      SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS last_date,
        o_orderkey AS last_ok, n_orders
      FROM (SELECT o_custkey, o_orderdate, o_orderkey,
              count(*) OVER (PARTITION BY o_custkey) AS n_orders,
              row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) z
      WHERE rn = 1
      ORDER BY o_custkey""",
  ) ++ Extensions.oracles
}
