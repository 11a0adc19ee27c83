package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.TextHash._

/** Approximate-analytics sketches with *deterministic, engine-portable*
  * math — unlike Spark's built-in HLL++/percentile_approx, whose
  * internal hashing/compression can't be replicated by another engine,
  * these are oracle-checkable bit-for-bit.
  */
object Sketches {

  val KmvK = 256

  /** t05: KMV (k-minimum-values) distinct-count sketch over document
    * shingles, next to the exact count it estimates.
    *
    * The sketch is the K smallest distinct hash values; the estimator
    * is the classic (K−1)·M / h_(K) (Bar-Yossef et al., "Counting
    * distinct elements in a data stream"). Distributed cost: the
    * orderBy(h).limit(K) compiles to TakeOrdered — each partition
    * keeps its local K smallest, the driver merges P·K longs — so the
    * full-precision sketch of a 100 TB corpus moves kilobytes. With
    * fewer than K distinct values the sketch IS the exact set, so the
    * estimate switches to the observed count (standard KMV behavior).
    * The exact distinct count is computed alongside purely so the
    * driver gate pins both the sketch AND its ground truth. */
  def kmvDistinctShingles(s: SparkSession, dir: String): DataFrame = {
    val hv = shingleHashes(Tables.t(s, dir, "documents"))
      .select(explode(col("hv")).as("h")).distinct().persist()
    val topk = hv.orderBy("h").limit(KmvK)
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("k_actual"))
    val exact = hv.agg(count(lit(1)).as("exact_distinct"))
    topk.crossJoin(exact)
      .select(lit(KmvK).as("k"), col("k_actual"), col("kth_hash"),
        expr(s"CASE WHEN k_actual < $KmvK THEN k_actual " +
          s"ELSE (${KmvK - 1}L * ${P}L) div kth_hash END").as("est_distinct"),
        col("exact_distinct"))
  }

  /** q41: nearest-rank percentiles (type-1, exact) of line-item price
    * per return flag, in integer cents so rank selection is
    * engine-exact (Spark's percentile()/DuckDB's quantile_cont
    * interpolate in floating point with different formulas — their
    * last ulp differs, so neither can gate the other).
    *
    * Shape: one shuffle on the group key, one in-partition sort
    * (row_number), conditional-min aggregation. At 100 TB the same
    * answer would come from a two-pass fixed-width histogram or
    * t-digest to avoid the per-group sort; the nearest-rank contract
    * here is the ground truth such a sketch would be validated
    * against. */
  def percentileRanks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        // + 0.5 then floor = round-half-up in both engines (a bare
        // double→long cast truncates in Spark but rounds in DuckDB)
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val byFlag = Window.partitionBy("l_returnflag")
    val ranked = li
      .withColumn("rn", row_number().over(byFlag.orderBy("cents")))
      .withColumn("n", count(lit(1)).over(byFlag))
    def atRank(p: Double, name: String) =
      min(when(col("rn") >= ceil(col("n") * p), col("cents"))).as(name)
    ranked.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        atRank(0.50, "p50_cents"), atRank(0.90, "p90_cents"),
        atRank(0.99, "p99_cents"), max(col("cents")).as("max_cents"))
      .orderBy("l_returnflag")
  }
}
