package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Time-series regularization: resample irregular event streams onto a
  * fixed grid with gap filling — the op every monitoring/feature
  * pipeline needs and Spark has no built-in for.
  *
  * Scale shape: events reduce to one row per (user, hour) in a single
  * partial-aggregated shuffle; the grid explodes from per-user
  * (min, max) bounds — rows proportional to user-hours, never a
  * cross join against a calendar table — and the forward fill is one
  * ordered window per user.
  */
object TimeSeries {

  private val HourUs = 3600000000L

  /** One row per (user, hour): event count and the hour's last
    * observed value as floor(v·1e6) (latest timestamp, ties to
    * highest event_id — a unique pair, so deterministic in both
    * engines). argmax_long ([[graft.functions.ArgMaxLong]]) picks it
    * in one partial-aggregated HASH pass: it is max_by(v_e6,
    * struct(us, event_id)) with the ordering pair flattened into
    * primitive buffer columns — the struct-buffered max_by has no
    * HashAggregate fast path, so the partial pass SORTED every scan
    * partition by the group key (round-16 finding, fixed round 17;
    * guide §2.3/§4). Shared by x06's resample and x09's SCD-2 builder
    * so the hourly-latest rule cannot drift between them. */
  def hourlyLatest(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        floor(col("value") * 1000000).cast("long").as("v_e6"))
      .withColumn("hr", expr(s"us div ${HourUs}L"))
      .groupBy("user_id", "hr")
      .agg(count(lit(1)).as("n_events"),
        expr("argmax_long(v_e6, us, cast(event_id as long))").as("last_v"))

  /** x06: hourly resample + forward fill. Each user's timeline is
    * filled from their first to last active hour: per grid cell the
    * event count (0 for gaps) and the last observed value at or
    * before that hour. */
  def resampleFfill(s: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyLatest(s, dir)
    val grid = hourly.groupBy("user_id")
      .agg(min("hr").as("mn"), max("hr").as("mx"))
      .select(col("user_id"), explode(expr("sequence(mn, mx)")).as("hr"))
    val wFill = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_v"), ignoreNulls = true).over(wFill).as("ffill_v_e6"))
      .orderBy("user_id", "hr")
  }

  /** x07: trailing z-score anomaly detection — flag an event whose
    * value deviates from the mean of the user's previous ≤100 events
    * by more than 3 trailing standard deviations.
    *
    * The test (v − mean)² > 9·var is cleared of divisions and square
    * roots into pure integer arithmetic over window sums:
    * (n·v − Σx)² > 9·(n·Σx² − (Σx)²), with values as floor(v·1e3)
    * longs — exact, associative, engine-portable (a float z-score
    * would make the >-boundary engine-dependent). Bounds: v_e3 < 1e6
    * and n ≤ 100 keep every product under 2^63.
    *
    * Shape: one shuffle on user_id, one ordered in-partition window —
    * the same cost as any per-key sessionization at 100 TB; no
    * self-join against history. */
  def anomalies(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 1000).cast("long").as("v_e3"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(-100, -1)
    val dev = col("n") * col("v_e3") - col("sx")
    // n counts VALUED events (count(v_e3), not count(*)): a window of
    // null-valued events must not pass the n >= 30 evidence gate with
    // zero variance and flag the first real value as anomalous
    e.withColumn("n", count(col("v_e3")).over(w))
      .withColumn("sx", sum(col("v_e3")).over(w))
      .withColumn("sxx", sum(col("v_e3") * col("v_e3")).over(w))
      .filter(col("n") >= 30 &&
        dev * dev > lit(9L) * (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("event_id"), col("user_id"), col("v_e3"),
        col("n"), col("sx"), col("sxx"))
      .orderBy("event_id")
  }

  /** x17: stream-freshness report — per event type: volume, first and
    * last arrival, the largest inter-arrival gap and the mean gap.
    * The pipeline-health card an ingest on-call reads: a type whose
    * max gap dwarfs its mean has stalled mid-window even if its
    * totals look right, and `last_us` against the wall clock is lag.
    * All micros-integer arithmetic (mean gap = span div (n−1)), so
    * the card is engine-exact.
    *
    * Scale shape: one ordered window per event type computes the
    * per-event gap (the partition key has ~types cardinality, but the
    * window is a single streaming pass per partition — at 100 TB the
    * same report shards by (type, day) and max/mean compose across
    * shards); the rollup is a partial-agg groupBy on the type key. */
  def freshness(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    e.withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"),
        max(col("gap")).as("max_gap_us"))
      .select(col("event_type"), col("n_events"), col("first_us"),
        col("last_us"), col("max_gap_us"),
        when(col("n_events") === 1, 0L)
          .otherwise(expr("(last_us - first_us) div (n_events - 1L)"))
          .as("mean_gap_us"))
      .orderBy("event_type")
  }

  /** x22: coverage-gap (backfill-planning) report — per user, the
    * holes in the hourly activity series: hours covered, the span
    * they should cover, how many hours are missing, how many distinct
    * gap runs there are, and the longest run. This is the card a
    * backfill scheduler reads to decide which (user, hour-range)
    * slices to re-ingest, and the complement of x06's forward-fill
    * (which papers over exactly these holes).
    *
    * Scale shape: one distinct to (user, hour) grain — the only
    * event-volume shuffle — then an ordered window and a
    * partial-aggregated rollup over the (tiny) per-user hour series;
    * never materializes the dense grid the way x06 must. */
  def gapReport(s: SparkSession, dir: String): DataFrame = {
    val hrs = Tables.t(s, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000L").as("hr"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("hr")
    hrs.withColumn("gap", col("hr") - lag(col("hr"), 1).over(w) - 1)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_present"),
        (max(col("hr")) - min(col("hr")) + 1).as("span_hours"),
        (max(col("hr")) - min(col("hr")) + 1 - count(lit(1))).as("n_missing"),
        sum(when(col("gap") > 0, 1L).otherwise(0L)).as("n_gaps"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap"))
      .orderBy("user_id")
  }

  /** x23: temporal train/test split with an embargo gap — the
    * leakage-safe alternative to random splits for time-ordered data
    * (de Prado's purged/embargoed split): train is everything before
    * the cutoff, test everything after cutoff + gap, and the gap rows
    * are quarantined so label windows that straddle the boundary can
    * never leak future information into training. Cutoff (80 % of the
    * observed span) and gap (5 %) are derived from the data's own
    * min/max in pure long math — deterministic, engine-portable, and
    * stable under re-runs (unlike wall-clock-relative cutoffs).
    *
    * Scale shape: one 1-row bounds aggregate broadcast back over the
    * stream (the allowlisted scalar crossJoin idiom), then a single
    * partial-aggregated rollup to (split, event_type) grain — no
    * event-scale shuffle beyond that groupBy at any corpus size. */
  def embargoSplit(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val cut = e.agg(min("us").as("mn"), max("us").as("mx"))
      .select(expr("mn + (mx - mn) * 8L div 10L").as("cut_us"),
        expr("mn + (mx - mn) * 85L div 100L").as("test_us"))
    e.crossJoin(broadcast(cut))
      .withColumn("split",
        when(col("us") < col("cut_us"), "train")
          .when(col("us") < col("test_us"), "embargo")
          .otherwise("test"))
      .groupBy("split", "event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min("us").as("min_us"), max("us").as("max_us"))
      .orderBy("split", "event_type")
  }
}
