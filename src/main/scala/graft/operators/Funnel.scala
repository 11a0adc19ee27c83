package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Ordered-sequence (funnel) analysis over the events stream: how far
  * does each user get through view → click → purchase, where each
  * step must happen at or after the previous one?
  *
  * Implementation: three chained whole-partition window minima over
  * the SAME partitioning (no ordering) — step k's timestamp is
  * min(ts | type = step_k ∧ ts ≥ step_{k−1}). Catalyst collapses the
  * chain onto one exchange (the user_id hash shuffle is reused across
  * all three Window operators), so the whole funnel costs a single
  * shuffle of (user_id, type, ts) triples regardless of corpus size —
  * the formulation a 1000-executor run wants. Timestamps compare as
  * unix micros (engine-exact, see AsofJoin).
  */
object Funnel {

  /** x02: per-user funnel depth and step timestamps (-1 = not
    * reached). */
  def viewClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("v1", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c1", min(when(col("event_type") === "click" &&
        col("us") >= col("v1"), col("us"))).over(w))
      .withColumn("p1", min(when(col("event_type") === "purchase" &&
        col("us") >= col("c1"), col("us"))).over(w))
      .groupBy("user_id")
      .agg(min("v1").as("v1"), min("c1").as("c1"), min("p1").as("p1"))
      .select(col("user_id"),
        coalesce(col("v1"), lit(-1L)).as("view_us"),
        coalesce(col("c1"), lit(-1L)).as("click_us"),
        coalesce(col("p1"), lit(-1L)).as("purchase_us"),
        when(col("p1").isNotNull, 3).when(col("c1").isNotNull, 2)
          .when(col("v1").isNotNull, 1).otherwise(0).as("depth"))
      .orderBy("user_id")
  }

  /** x16: weekly retention cohorts — users grouped by their first
    * active week, counted as active per week offset since: the
    * cohort-retention matrix every product/engagement dashboard is
    * built on (and, for a training-data pipeline, the freshness curve
    * of a crawl's contributing users). All-integer day/week bucketing
    * from epoch micros, so the matrix is engine-exact.
    *
    * Scale shape: first-active is a partial-agg groupBy on user_id;
    * the join back is co-partitioned on the same key (one shuffle,
    * AQE broadcasts the per-user table when small); the distinct +
    * matrix aggregation shuffle (user, week) pairs bounded by
    * users × active-weeks, never raw events. */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000L").as("day"))
    val first = e.groupBy("user_id").agg(min(col("day")).as("d0"))
    e.join(first, "user_id")
      .select(col("user_id"), expr("d0 div 7L").as("cohort_week"),
        expr("(day - d0) div 7L").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }
}
