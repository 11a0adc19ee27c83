package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Data-layout operators: Z-order (Morton) clustering keys.
  *
  * Sorting (or range-partitioning) a 100 TB table by the interleaved
  * bits of two dimensions co-locates rows that are close in BOTH — a
  * 2-D box predicate then touches O(√files) instead of every file the
  * single-sort-key layout would. This is the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`; here the key itself is exposed
  * as a checked query (pure integer bit math, engine-portable) and
  * the locality claim is asserted by `CurationSpec`.
  */
object Layout {

  val Bits = 10

  /** zkey arithmetic over two bucketized 10-bit dims — same text runs
    * in Spark SQL and DuckDB. */
  def zkeyExpr(x: String, y: String): String =
    (0 until Bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  /** z01: Morton key per event over (hour bucket, value bucket) — the
    * classic time×measure box-query layout ("values in [a,b) during
    * week 2"). The hour bucket is relative to the table's first hour
    * (a tiny broadcast scalar), so temporally adjacent rows can never
    * land on opposite ends of the key space — a raw `% 1024` of the
    * epoch hour would wrap mid-window every ~43 days. Value is
    * clamped on BOTH sides: a negative value's sign bits would
    * corrupt the interleave — and a NULL value buckets at 0, not at
    * the top (least/greatest silently SKIP nulls in both engines, so
    * without the coalesce a null row would z-order next to the
    * highest-valued events). Windows longer than 1024 hours need
    * more time bits. */
  def zorderKeys(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "events")
      .select(col("event_id"),
        expr("unix_micros(ts) div 3600000000L").as("hr"),
        expr(s"greatest(0L, least(CAST(floor(coalesce(value, 0.0)) AS BIGINT), ${(1 << Bits) - 1}))")
          .as("vb"))
    val minHr = e.agg(min(col("hr")).as("min_hr"))
    e.crossJoin(broadcast(minHr))
      .withColumn("tb", (col("hr") - col("min_hr")) % (1 << Bits))
      .withColumn("zkey", expr(zkeyExpr("tb", "vb")))
      .select(col("event_id"), col("tb"), col("vb"), col("zkey"))
      .orderBy("event_id")
  }
}
