package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Skew

/** Dev tool: cost/benefit telemetry for [[Skew.saltedJoin]] — the
  * numbers BASELINE.md's skew section records, so the operator's
  * benefit is a measurement rather than a claim.
  *
  * The corpus is `orders` with a deterministic hot key injected: 30 %
  * of rows remap their custkey to key 1 (the classic null/guest-user
  * hot key of a 100 TB event log). Two quantities are printed:
  *
  *  - `spread`: per-reducer row counts of the join's large side under
  *    the ACTUAL shuffle partitioning, computed analytically —
  *    `pmod(hash(keys…), P)` is exactly Catalyst's
  *    `HashPartitioning` (Murmur3, seed 42), so grouping by it
  *    reproduces reducer placement without instrumenting tasks.
  *    Reported as max rows and max/mean (the task-size spread a
  *    straggler watcher sees), plain vs salted.
  *  - `sec`: median-of-3 wall time of the materialized aggregation
  *    join, three ways: plain with AQE off (the naive baseline),
  *    plain with AQE skew-join enabled at scale-proportional
  *    thresholds (what a tuned deployment gets for free), and
  *    [[Skew.saltedJoin]] with salt=8 (the explicit mitigation, which
  *    also covers the case AQE cannot: a single key too large for one
  *    executor even after partition splitting).
  *
  * Usage: runMain graft.tools.SkewStress [sfDir]
  */
object SkewStress {

  val HotShare = 3 // o_custkey % 10 < 3 → 30 % of rows share key 1
  val Salt = 8
  val Partitions = 32

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", Partitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // scale-proportional skew thresholds: production's 256 MB
      // default assumes multi-GB shuffles; at bench scale the hot
      // partition is tens of MB, so the ratio-preserving setting is
      // what lets AQE's splitter act here the way it would at 100 TB
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = Tables.t(spark, dir, "orders")
      .withColumn("k",
        when(col("o_custkey") % 10 < HotShare, lit(1L))
          .otherwise(col("o_custkey")))
    val dim = Tables.t(spark, dir, "customer")
      .select(col("c_custkey").as("dk"), col("c_nationkey"))

    def spread(byReducer: DataFrame): (Long, Double) = {
      val r = byReducer.agg(max("cnt"), avg("cnt")).head()
      (r.getLong(0), r.getLong(0) / r.getDouble(1))
    }
    // plain join: reducer = pmod(hash(k), P)  (HashPartitioning mirror)
    val (plainMax, plainSpread) = spread(orders
      .groupBy(pmod(hash(col("k")), lit(Partitions)).as("p"))
      .agg(count(lit(1)).as("cnt")))
    // salted join: reducer = pmod(hash(k, __salt), P) with the same
    // deterministic salt expression saltedJoin applies
    val saltedL = orders.withColumn("__salt",
      pmod(hash(orders.columns.map(col) :+ spark_partition_id(): _*),
        lit(Salt)))
    val (saltMax, saltSpread) = spread(saltedL
      .groupBy(pmod(hash(col("k"), col("__salt")), lit(Partitions)).as("p"))
      .agg(count(lit(1)).as("cnt")))

    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
    def timed(body: => DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plainSec = timed(agg(orders.join(dim, col("k") === col("dk"))))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val aqeSec = timed(agg(orders.join(dim, col("k") === col("dk"))))
    val saltSec = timed(agg(Skew.saltedJoin(orders, dim, "k", "dk", Salt)))

    def f(v: Double): String = f"$v%.2f".replace(",", ".")
    println(s"""{"skew":{"hot_share_pct":${HotShare * 10},""" +
      s""""partitions":$Partitions,"salt":$Salt,""" +
      s""""plain_max_rows":$plainMax,"plain_max_over_mean":${f(plainSpread)},""" +
      s""""salted_max_rows":$saltMax,"salted_max_over_mean":${f(saltSpread)},""" +
      s""""plain_noaqe_sec":${f(plainSec)},"plain_aqe_sec":${f(aqeSec)},""" +
      s""""salted_sec":${f(saltSec)}},"sf":"$dir"}""")
    spark.stop()
  }
}
