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

  /** z02 file-skipping simulation geometry: 64 files; the box query is
    * a 128-hour window (days 10–15) × the sparse high-value tail —
    * both dimensions selective BY ROW MASS, the workload Z-order
    * exists for. (A value slab inside the dense low range would make
    * the 1-D time sort look best: its files each hold ~1/64 of the
    * rows regardless of value, so when the value predicate keeps most
    * row mass, time pruning alone is optimal. Z-order's win is
    * two-dimensionally selective queries.) */
  val PruneFiles = 64L
  val PruneTbLo = 240L
  val PruneTbHi = 367L
  val PruneVbLo = 128L
  val PruneVbHi = 511L

  /** z02: pruning-effectiveness report — simulate min/max file
    * statistics (the parquet row-group / Delta file-stats model) under
    * four layouts of the SAME rows (insertion order, time-sorted,
    * value-sorted, Z-order) and count what a (time × value) box query
    * must scan in each. The report quantifies z01's locality claim as
    * the number a capacity planner uses: files touched and rows read
    * per layout, with the true box cardinality as the floor.
    *
    * Files are simulated as equal-width KEY ranges (file f gets keys
    * with `key·64 div (max+1) = f`) rather than ntile ranks: value
    * ranges compute distributively (two partial-agg passes + a 1-row
    * max scalar broadcast) where a rank-based ntile would need a
    * global single-task sort at 100 TB — and a real `OPTIMIZE ZORDER`
    * write range-partitions on the key the same way. Under skew the
    * simulated files hold unequal row counts, which is why the report
    * exposes rows-scanned alongside files-scanned. */
  def pruningReport(s: SparkSession, dir: String): DataFrame = {
    val mx = zorderKeys(s, dir).agg(max(col("event_id")).as("me"),
      max(col("tb")).as("mt"), max(col("vb")).as("mv"),
      max(col("zkey")).as("mz"))
    // persisted: the four per-layout file aggregations share one
    // scan+zkey pass (README persist-lifetime caveat applies)
    val rows = zorderKeys(s, dir).crossJoin(broadcast(mx))
      .select(col("tb"), col("vb"),
        expr(s"event_id * $PruneFiles div (me + 1L)").as("f_natural"),
        expr(s"tb * $PruneFiles div (mt + 1L)").as("f_time"),
        expr(s"vb * $PruneFiles div (mv + 1L)").as("f_value"),
        expr(s"zkey * $PruneFiles div (mz + 1L)").as("f_zorder"))
      .persist()
    val inBox = col("tb").between(PruneTbLo, PruneTbHi) &&
      col("vb").between(PruneVbLo, PruneVbHi)
    val fileHit = col("tb_max") >= PruneTbLo && col("tb_min") <= PruneTbHi &&
      col("vb_max") >= PruneVbLo && col("vb_min") <= PruneVbHi
    def layer(name: String, f: String): DataFrame =
      rows.groupBy(col(f).as("f"))
        .agg(min(col("tb")).as("tb_min"), max(col("tb")).as("tb_max"),
          min(col("vb")).as("vb_min"), max(col("vb")).as("vb_max"),
          count(lit(1)).as("n_rows"),
          sum(inBox.cast("long")).as("n_box"))
        .agg(count(lit(1)).as("n_files"),
          sum(fileHit.cast("long")).as("n_files_scanned"),
          sum(when(fileHit, col("n_rows")).otherwise(0L)).as("n_rows_scanned"),
          sum(col("n_box")).as("n_rows_box"))
        .select(lit(name).as("layout"), col("n_files"),
          col("n_files_scanned"), col("n_rows_scanned"), col("n_rows_box"))
    layer("natural", "f_natural")
      .unionByName(layer("time", "f_time"))
      .unionByName(layer("value", "f_value"))
      .unionByName(layer("zorder", "f_zorder"))
      .orderBy("layout")
  }
}
