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
}
