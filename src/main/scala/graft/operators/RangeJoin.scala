package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Range (interval-containment) join: assign each fact row to the band
  * whose [lo, hi) interval contains its value (extension beyond the
  * reference surface — its analyzer only records theta-join conditions,
  * /root/reference/README.md:265–278).
  *
  * Scale design: the band table is tiny, so the right plan at any
  * scale is `broadcast(bands)` + a nested-loop probe — each fact row
  * scans B bands in memory, no shuffle of the fact side at all. For a
  * LARGE interval table the pattern changes to interval bucketing
  * (quantize both sides to a grid, equi-join on the grid cell, then
  * refine with the exact predicate); with B small that machinery would
  * only add overhead, so it is deliberately not used here.
  */
object RangeJoin {

  /** Irregular value bands (log-ish widths over events.value's range;
    * the irregularity is the point — a uniform grid would collapse to
    * a `floor(value/w)` equi-join and stop being a range join). */
  val bands: Seq[(Int, Double, Double)] = Seq(
    (0, 0.0, 1.0), (1, 1.0, 5.0), (2, 5.0, 25.0),
    (3, 25.0, 100.0), (4, 100.0, 250.0), (5, 250.0, 1000.0))

  /** q40: events binned into irregular value bands; per-band event
    * count and value mass (summed as floor(value·1e6) longs — integer
    * addition is associative, so partial aggregation across partitions
    * is oracle-exact, unlike a double sum). */
  def eventValueBands(s: SparkSession, dir: String): DataFrame = {
    val b = s.createDataFrame(bands).toDF("band_id", "lo", "hi")
    Tables.t(s, dir, "events")
      .join(broadcast(b), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band_id", "lo", "hi")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_e6"))
      .orderBy("band_id")
  }
}
