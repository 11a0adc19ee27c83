package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Table profiling — the ANALYZE/stats-collection job every warehouse
  * runs before cost-based optimization and data-quality monitoring.
  *
  * t16 profiles the integer-codable lineitem columns into one narrow
  * stats row each: row count, null count, exact distinct count, min,
  * max. Shape: the table melts to (column, value) longs — a narrow
  * 6× row expansion, no wide shuffle — then one partial-aggregated
  * groupBy over 6 keys. At 100 TB the exact ndv becomes the one
  * expensive stat; production swaps in HLL/KMV (t05 shows the KMV
  * math) with the identical melt + groupBy shape, and the exact
  * version here is the ground truth such a sketch is validated
  * against.
  */
object Profile {

  /** column name → integer-coded projection (prices in cents so the
    * melt is lossless in both engines). */
  private val cols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "l_orderkey",
    "l_partkey" -> "l_partkey",
    "l_suppkey" -> "l_suppkey",
    "l_linenumber" -> "CAST(l_linenumber AS BIGINT)",
    "l_quantity_int" -> "CAST(floor(l_quantity + 0.5) AS BIGINT)",
    "l_price_cents" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")

  def columnStats(s: SparkSession, dir: String): DataFrame = {
    val melted = cols.map { case (name, e) =>
      s"SELECT '$name' AS col_name, $e AS v FROM lineitem"
    }.mkString(" UNION ALL ")
    Tables.ensure(s, dir)
    s.sql(s"""
      SELECT col_name, count(*) AS n, count(v) AS n_nonnull,
        count(DISTINCT v) AS ndv, min(v) AS min_v, max(v) AS max_v
      FROM ($melted) m
      GROUP BY col_name ORDER BY col_name""")
  }

  /** The declarative data-quality rule set x19 evaluates over the
    * event log (Deequ-style): name → violation predicate is
    * documented next to the aggregate that counts it. */
  val EventTypeDomain: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Regex a well-formed `props` payload must match — anchored, same
    * semantics under Java regex (Spark) and RE2 (DuckDB oracle). */
  val PropsRegex: String = """^\{"k": [0-9]+\}$"""

  /** x19: data-quality rule card — the Deequ/Great-Expectations-style
    * validation pass a pipeline runs before training data is
    * admitted: each declarative rule (null/range check, domain check,
    * payload-schema regex, key uniqueness) reports rows checked,
    * violations, and a fixed-point pass rate.
    *
    * Scale shape: every per-row rule folds into ONE partial-aggregated
    * scan of the log (a single agg row — no shuffle of row data); the
    * uniqueness rule adds the one unavoidable distinct on the key.
    * The wide agg row is then unpivoted driver-free with `stack`. */
  def dqRules(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val domain = EventTypeDomain.map(v => s"'$v'").mkString(", ")
    val agg = ev.agg(
      count(lit(1)).as("n"),
      sum(when(col("value").isNull || col("value") < 0, 1).otherwise(0))
        .as("v_value"),
      sum(when(expr(s"event_type IN ($domain)"), 0).otherwise(1))
        .as("v_type"),
      sum(when(col("props").rlike(PropsRegex), 0).otherwise(1))
        .as("v_props"),
      sum(when(col("ts").isNull, 1).otherwise(0)).as("v_ts"),
      sum(when(col("user_id").isNull || col("user_id") <= 0, 1).otherwise(0))
        .as("v_user"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("v_unique"))
    agg.select(expr("""stack(6,
        'event_id_unique', n, v_unique,
        'props_schema',    n, v_props,
        'ts_nonnull',      n, v_ts,
        'type_domain',     n, v_type,
        'user_id_positive', n, v_user,
        'value_nonneg',    n, v_value) AS (rule, n_checked, n_violations)"""))
      .withColumn("pass_e6",
        expr("(n_checked - n_violations) * 1000000L div n_checked"))
      .orderBy("rule")
  }
}
