package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: measure the CC star-contraction fixpoint against a FUSED
  * variant that computes each star pass's per-src minimum with a
  * window over ONE src-keyed exchange instead of groupBy(min) + a
  * re-key join (two exchanges of the edge frame per pass). The
  * round-16 verdict asked for this measurement (item 5): "fusing
  * trades bytes for exchanges is plausible but unmeasured".
  *
  * The fused form's hazard is the one this repo kills everywhere
  * else: Window.partitionBy(src) holds a node's ENTIRE neighbor set
  * in one task, and star contraction concentrates a component's
  * members onto its center — Θ(component) single-task rows, the
  * t29/i14 single-reducer class, where the production groupBy
  * partial-aggregates map-side and the join splits under AQE skew
  * handling. This probe EXECUTES both on a real graph (sf1's giant
  * component), checks the label sets are identical, and reports
  * wall + rounds + the per-round exchange counts, so the
  * keep-or-leave call is a number, not a vibe.
  *
  * Usage: runMain graft.tools.CcProbe <sfDir> <cpus> <s11|d09|m07|d06>
  */
object CcProbe {

  private def largeStarW(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("src")
    val m = e.withColumn("m", least(col("src"), min(col("dst")).over(w)))
    val half = m.filter(col("dst") > col("src"))
      .select(col("dst").as("a"), col("m").as("b"))
    half.select(col("a").as("src"), col("b").as("dst"))
      .union(half.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
  }

  private def smallStarW(e: DataFrame): DataFrame = {
    val le = e.filter(col("dst") < col("src"))
    val w = Window.partitionBy("src")
    val withM = le.withColumn("m", min(col("dst")).over(w))
    val half = withM.filter(col("dst") =!= col("m"))
      .select(col("dst").as("a"), col("m").as("b"))
      .union(withM.select(col("src").as("a"), col("m").as("b")).distinct())
    half.select(col("a").as("src"), col("b").as("dst"))
      .union(half.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
  }

  private def fixpointFused(pairs0: DataFrame): (DataFrame, Int) = {
    val pairs = pairs0.select(col("ida"), col("idb"))
      .filter(col("ida") =!= col("idb"))
    var edges = pairs
      .union(pairs.select(col("idb"), col("ida")))
      .toDF("src", "dst").distinct().localCheckpoint(false)
    var edgeCount = edges.count()
    var changed = true
    var rounds = 0
    while (changed) {
      val next = smallStarW(largeStarW(edges)).localCheckpoint(false)
      val nextCount = next.count()
      changed = nextCount != edgeCount || next.except(edges).count() > 0
      edges = next
      edgeCount = nextCount
      rounds += 1
    }
    (edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("cluster_id"))
      .localCheckpoint(), rounds)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/scale/sf1")
    val cpus = args.lift(1).getOrElse("32")
    val which = args.lift(2).getOrElse("s11")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, DupCluster, Multimodal, Similarity}
    val pairs = (which match {
      case "s11" => Similarity.mutualKnn(spark, dir)
      case "d09" => Similarity.embeddingNearDupsBucketed(spark, dir)
      case "m07" => Multimodal.ahashPairs(spark, dir)
      case "d06" => Dedup.minhashLshPairs(spark, dir)
    }).select("ida", "idb").localCheckpoint()
    println(s"[ccprobe] $which pairs=${pairs.count()}")

    // plan-shape evidence: exchanges in ONE round of each form
    def exchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Exchange") && !l.contains("Broadcast"))
    val seed = pairs.union(pairs.select(col("idb"), col("ida")))
      .toDF("src", "dst").distinct().localCheckpoint()
    // production round body (via the package-private helpers is not
    // exposed; reproduce the count from the full first-round plan)
    println(s"[ccprobe] fused one-round exchanges=" +
      exchanges(smallStarW(largeStarW(seed))))

    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ccprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val prod = time("production fixpoint") {
      val l = DupCluster.fixpointLabels(pairs)
      l.count(); l
    }
    println(s"[ccprobe] production rounds=${DupCluster.lastFixpointRounds}")
    val fused = time("fused fixpoint") {
      val (l, r) = fixpointFused(pairs)
      l.count()
      println(s"[ccprobe] fused rounds=$r")
      l
    }
    val onlyProd = prod.except(fused).count()
    val onlyFused = fused.except(prod).count()
    println(s"[ccprobe] label diff: prod-only=$onlyProd fused-only=$onlyFused" +
      s" n=${prod.count()} (must be 0/0)")
    // second timing pass, reversed order, same JVM (warm) — host
    // drift guard
    val fused2 = time("fused fixpoint (2nd)") {
      val (l, _) = fixpointFused(pairs); l.count(); l
    }
    val prod2 = time("production fixpoint (2nd)") {
      val l = DupCluster.fixpointLabels(pairs); l.count(); l
    }
    println(s"[ccprobe] 2nd-pass diff: ${prod2.except(fused2).count()}/" +
      s"${fused2.except(prod2).count()}")
    spark.stop()
  }
}
