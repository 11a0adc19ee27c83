package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Mutation-shaped batch operators: MERGE-style snapshot upsert and
  * SCD-2 history building — the two ops that turn an append-only event
  * log into serving tables, which vanilla Spark has no single operator
  * for (MERGE INTO needs a lakehouse table format; the *computation* is
  * these joins/windows either way).
  *
  * Both reduce the log to one row per (user, grain) with a partial
  * aggregation before any join/window, so the shuffled volume is
  * key-cardinality-bound, not event-bound — the property that holds at
  * 100 TB.
  */
object Merge {

  private val DayUs = 86400000000L

  private def valued(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        floor(col("value") * 1000000).cast("long").as("v_e6"))

  /** x13: dataset-version diff — the audit step a data-versioning
    * layer (lakehouse time travel, training-set releases) runs
    * between two snapshots: which keys were added, removed, or
    * changed, with both sides' values for the changed ones. The two
    * snapshots are derived deterministically from `orders` (old =
    * keys ≢ 3 (mod 10), new = keys ≢ 7 (mod 10), and every key ≡ 0
    * (mod 5) gains 500 price-cents in the new version), so the diff
    * exercises all three classes at every scale factor. Unchanged
    * rows — the overwhelming bulk of any real diff — are excluded
    * from the output by construction.
    *
    * Scale shape: one full-outer sort-merge join on the snapshot key
    * with value comparison in the join projection; both sides shuffle
    * once on the same key (at 100 TB the snapshots would be bucketed
    * on it and the shuffle vanishes). Prices compare in integer
    * cents — no float equality in the change predicate. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(s, dir, "orders").select(col("o_orderkey"),
      floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val old = o.filter(col("o_orderkey") % 10 =!= 3)
    val nw = o.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("price_c",
        when(col("o_orderkey") % 5 === 0, col("price_c") + 500)
          .otherwise(col("price_c")))
    old.as("o").join(nw.as("n"), Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        col("o.price_c").as("old_price_c"),
        col("n.price_c").as("new_price_c"),
        when(col("o.price_c").isNull, "added")
          .when(col("n.price_c").isNull, "removed")
          .when(col("o.price_c") =!= col("n.price_c"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy("o_orderkey")
  }

  /** x08: MERGE (SCD-1 upsert) of the last day of events into the
    * snapshot built from everything before: per user the latest value
    * on each side ((us, event_id)-latest — unique, so deterministic),
    * full-outer joined; rows only in the change set are `insert`, in
    * both are `update`, only in the snapshot are `keep`.
    *
    * The cutoff is data-derived (max us − 24 h) and travels as a
    * broadcast scalar — no driver collect, no literal a re-run at
    * another scale factor would invalidate. */
  def snapshotUpsert(s: SparkSession, dir: String): DataFrame = {
    val e = valued(s, dir)
    val cut = e.agg((max("us") - DayUs).as("cut"))
    val cutE = e.crossJoin(broadcast(cut))
    def latest(side: DataFrame): DataFrame = side
      .groupBy("user_id")
      .agg(expr("max_by(v_e6, struct(us, event_id))").as("v"))
    // presence flags, not value nullness, drive the action: a user
    // whose latest event carries a NULL value is still present on that
    // side (the oracle classifies via join-side user_id nullness)
    val snap = latest(cutE.filter(col("us") < col("cut")))
      .withColumnRenamed("v", "snap_v").withColumn("in_snap", lit(1))
    val chg = latest(cutE.filter(col("us") >= col("cut")))
      .withColumnRenamed("v", "chg_v").withColumn("in_chg", lit(1))
    snap.join(chg, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("in_snap").isNull, "insert")
          .when(col("in_chg").isNull, "keep")
          .otherwise("update").as("action"),
        coalesce(col("chg_v"), col("snap_v")).as("v_e6"))
      .orderBy("user_id")
  }

  /** x10: the per-user serving card — the three incremental-
    * maintenance views of the event log composed by key: the merged
    * current value (x08), how many SCD-2 versions the user's history
    * holds (x09), and how many of their events were flagged anomalous
    * (x07). Each input is already key-grain, so the composition is
    * two broadcast-sized left joins — no new event-scale shuffle. */
  def servingCard(s: SparkSession, dir: String): DataFrame = {
    val merged = snapshotUpsert(s, dir)
    val versions = scd2Intervals(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_versions"))
    val anomalies = TimeSeries.anomalies(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_anomalies"))
    merged
      .join(versions, Seq("user_id"), "left")
      .join(anomalies, Seq("user_id"), "left")
      .select(col("user_id"), col("action"), col("v_e6"),
        coalesce(col("n_versions"), lit(0L)).as("n_versions"),
        coalesce(col("n_anomalies"), lit(0L)).as("n_anomalies"))
      .orderBy("user_id")
  }

  /** x09: SCD-2 validity intervals — per user, the hourly last-value
    * series compressed to its change points, each valid from its hour
    * until the hour before the next change (−1 = still current).
    * Composes with x06: the forward-filled grid is exactly what
    * replaying these intervals reproduces — both consume the same
    * [[TimeSeries.hourlyLatest]] reduction, so the hourly-latest rule
    * cannot drift between them.
    *
    * Shape: one partial-aggregated shuffle to (user, hour) grain, then
    * two ordered windows over the (tiny) per-user hourly series. */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val hourly = TimeSeries.hourlyLatest(s, dir)
      .select(col("user_id"), col("hr"), col("last_v").as("v_e6"))
    val w = Window.partitionBy("user_id").orderBy("hr")
    hourly
      .withColumn("prev_v", lag(col("v_e6"), 1).over(w))
      .filter(col("prev_v").isNull || col("prev_v") =!= col("v_e6"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_hr",
        coalesce(lead(col("hr"), 1).over(w) - 1, lit(-1L)))
      .select(col("user_id"), col("version").cast("int").as("version"),
        col("hr").as("valid_from_hr"), col("valid_to_hr"), col("v_e6"))
      .orderBy("user_id", "version")
  }

  /** x21: incremental aggregate maintenance — the materialized-view
    * refresh every serving pipeline runs instead of recomputing: a
    * per-user (count, sum) view built from the base log (event_id ≢ 7
    * mod 10) absorbs a delta batch (≡ 7) by MERGING partial
    * aggregates, and the output self-audits against a full recompute
    * (`consistent` = 1 row-for-row — count/sum are the algebraic
    * aggregates for which partial-merge is exact). Only users the
    * delta touches are emitted, mirroring a real refresh that
    * rewrites only dirty partitions.
    *
    * Scale shape: three partial-aggregated groupBys on the user key
    * (base view, delta batch, audit recompute) + key-cardinality
    * joins; the delta-side agg is batch-sized, not corpus-sized. In
    * production the base agg is the stored view — here it is derived
    * so the operator is self-contained. */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = valued(s, dir)
    def agg(df: DataFrame, suffix: String): DataFrame =
      df.groupBy("user_id").agg(
        count(lit(1)).as(s"n_$suffix"),
        sum(col("v_e6")).as(s"s_$suffix"))
    val base = agg(ev.filter(col("event_id") % 10 =!= 7), "base")
    val delta = agg(ev.filter(col("event_id") % 10 === 7), "delta")
    val full = agg(ev, "full")
    delta.join(base, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        coalesce(col("n_base"), lit(0L)).as("n_before"),
        col("n_delta"),
        (coalesce(col("n_base"), lit(0L)) + col("n_delta")).as("n_after"),
        (coalesce(col("s_base"), lit(0L)) + coalesce(col("s_delta"), lit(0L)))
          .as("sum_after_e6"))
      .join(full, Seq("user_id"))
      .withColumn("consistent",
        (col("n_after") === col("n_full") &&
          col("sum_after_e6") === coalesce(col("s_full"), lit(0L)))
          .cast("int"))
      .select(col("user_id"), col("n_before"), col("n_delta"),
        col("n_after"), col("sum_after_e6"), col("consistent"))
      .orderBy("user_id")
  }

  /** x18: right-to-be-forgotten (tombstone) propagation card — the
    * audit every GDPR/CCPA delete job emits: for each event type, how
    * many log rows a pending deletion roster would remove vs retain,
    * and how many distinct users it touches. The roster here is the
    * deterministic stand-in `user_id ≡ 0 (mod 97)` (in production an
    * external tombstone table); it still flows through a real join so
    * the plan is the production plan.
    *
    * Scale shape: the roster is derived from the log itself (~1/97 of
    * distinct users), so it is NOT unconditionally broadcast-safe at
    * 100 TB — the join carries no hint and AQE picks broadcast only
    * while the built roster actually fits the threshold, falling back
    * to a shuffled hash join when the tombstone set outgrows driver
    * memory. The per-type card is then one partial-aggregated groupBy
    * over a handful of keys; the distinct-user count is the only term
    * that shuffles user ids, and only for roster hits. */
  def deletePropagation(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val roster = ev.select(col("user_id"))
      .filter(col("user_id") % 97 === 0)
      .distinct()
      .withColumn("del", lit(1))
    ev.join(roster, Seq("user_id"), "left_outer")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        coalesce(sum(col("del")), lit(0L)).as("n_deleted"),
        (count(lit(1)) - coalesce(sum(col("del")), lit(0L))).as("n_retained"),
        countDistinct(when(col("del") === 1, col("user_id")))
          .as("n_users_deleted"))
      .orderBy("event_type")
  }
}
