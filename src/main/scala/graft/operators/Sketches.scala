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
    val hv = shingleHashesMemo(s, dir)
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
    * Shape (round 16): the value-domain census — the t29/x26
    * collapse applied to exact percentiles. Through round 16 this
    * ranked every row with `row_number` partitioned by the THREE
    * return flags: a few-huge-groups window, i.e. three tasks each
    * sorting a third of the corpus — the exact single-reducer class
    * the engine killed everywhere else (the round-16 rank-window
    * census probe found it as the last instance). The rework groups
    * to the (flag, cents) CENSUS first — one partial-agg'd shuffle;
    * the per-flag prefix sum then runs over distinct PRICE VALUES,
    * whose count is bounded by the price DOMAIN (TPC-H retail prices
    * × the 1–50 quantity grid — corpus-independent), never by the
    * corpus. The value at rank k = min cents with cum ≥ k, row-
    * identical to the rank form including the ceil(n·p) edge
    * (`min(cents WHERE rn ≥ k)` over sorted rows IS
    * `min(cents WHERE cum(cents) ≥ k)`). t14's fixed-width histogram
    * remains the sketch tier; this is its exact ground truth at the
    * same plan shape, bucket width 1. */
  def percentileRanks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        // + 0.5 then floor = round-half-up in both engines (a bare
        // double→long cast truncates in Spark but rounds in DuckDB)
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val census = li.groupBy("l_returnflag", "cents")
      .agg(count(lit(1)).as("cnt"))
    val byFlag = Window.partitionBy("l_returnflag")
    val cum = census
      .withColumn("cum", sum(col("cnt"))
        .over(byFlag.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(byFlag))
    def atRank(p: Double, name: String) =
      min(when(col("cum") >= ceil(col("n") * p), col("cents"))).as(name)
    cum.groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
        atRank(0.50, "p50_cents"), atRank(0.90, "p90_cents"),
        atRank(0.99, "p99_cents"), max(col("cents")).as("max_cents"))
      .orderBy("l_returnflag")
  }

  /** Bucket width of the t14 histogram: $100 in cents. */
  val HistW = 10000L

  /** t14: fixed-width-histogram quantiles — the sketch q41's exact
    * nearest-rank percentiles are the ground truth for. Values reduce
    * to (group, bucket) counts — ONE partial-aggregated shuffle of at
    * most groups × buckets rows regardless of input size, vs q41's
    * per-group full sort — then the quantile is the lower edge of the
    * first bucket whose running count reaches ceil(p·n). Error is
    * bounded by the bucket width by construction; all math is integer.
    */
  def histogramQuantiles(s: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr(s"CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div ${HistW}L")
          .as("bucket"))
      .groupBy("l_returnflag", "bucket").agg(count(lit(1)).as("cnt"))
    val byFlag = Window.partitionBy("l_returnflag")
    val cum = buckets
      .withColumn("cum", sum(col("cnt"))
        .over(byFlag.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(byFlag))
    def atQ(p: Double, name: String) =
      min(when(col("cum") >= ceil(col("n") * p),
        col("bucket") * HistW)).as(name)
    cum.groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
        atQ(0.50, "p50_lo_cents"), atQ(0.90, "p90_lo_cents"),
        atQ(0.99, "p99_lo_cents"))
      .orderBy("l_returnflag")
  }

  val CmDepth = 4
  val CmWidth = 1024L

  /** SQL fragment: the `CmDepth` sketch cells of a token-hash column
    * `h` (affine family, row j offset by j·width). Shared by the
    * batch fill, the probe, and the streaming fill so the cell math
    * cannot drift. */
  def cmCellsExpr(h: String): String =
    s"transform(sequence(0, ${CmDepth - 1}), " +
      s"j -> ((2*j + 1) * $h + 7919 * (j + 1)) % ${P}L " +
      s"% ${CmWidth}L + j * ${CmWidth}L)"

  /** t15: count-min heavy hitters — exact top-10 corpus tokens next
    * to their count-min estimates (depth 4 × width 1024, affine hash
    * family over the rolling token hash — the same engine-portable
    * recurrence MinHash uses). The sketch table is ≤ depth·width
    * cells however large the corpus; estimates are min over rows and
    * ≥ exact by construction (one-sided error). At 100 TB the cell
    * table is what a streaming frequent-terms job would maintain
    * per-partition and merge by cell-wise sum. */
  def countMinTopTerms(s: SparkSession, dir: String): DataFrame = {
    val toks = fanOut(Tables.t(s, dir, "documents"))
      .select(explode(tokens(col("text"))).as("term"))
      .select(col("term"), expr(rollingHashExpr("term", P)).as("h"))
      .persist() // exact counts + sketch fill share one tokenize pass
    // exact counts (the ground truth the sketch is gated against).
    // orderBy + limit compiles to TakeOrdered (per-partition top-10,
    // driver merge) — never a single-partition sort of the whole
    // vocabulary; the rank window then runs on 10 rows only.
    val exact = toks.groupBy("term", "h").agg(count(lit(1)).as("exact_n"))
    val top = exact.orderBy(col("exact_n").desc, col("term")).limit(10)
      .withColumn("rnk", row_number().over(
        Window.partitionBy().orderBy(col("exact_n").desc, col("term"))))
    // sketch fill: each occurrence increments depth cells
    val cells = toks
      .select(explode(expr(cmCellsExpr("h"))).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    // probe: the same depth cells for each top term, estimate = min
    val probes = top.select(col("term"), col("exact_n"), col("rnk"),
      explode(expr(cmCellsExpr("h"))).as("cell"))
    probes.join(cells, "cell")
      .groupBy("term", "exact_n", "rnk")
      .agg(min(col("cnt")).as("cm_est"))
      .select(col("rnk").cast("int").as("rnk"), col("term"),
        col("exact_n"), col("cm_est"))
      .orderBy("rnk")
  }
}
