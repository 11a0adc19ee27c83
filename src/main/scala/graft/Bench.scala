package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology:
  *  - Results are materialized through the `noop` sink, not `count()`
  *    — count() lets Catalyst prune the projected expressions away,
  *    which would "benchmark" a plan that computes nothing.
  *  - An untimed warm-up pass over every query at the smallest scale
  *    factor absorbs JVM/codegen/classloading costs that a long-lived
  *    cluster would not pay per query.
  *  - Each query is timed over `SPARK_GRAFT_BENCH_RUNS` runs (default
  *    3) and the MEDIAN is reported: this host exhibits rare
  *    multi-hundred-second scheduler stalls (same plan, 100× wall
  *    time) that a median absorbs while still reporting honest
  *    steady-state cost. The JSON records runs + stat used.
  *  - A query that throws is reported as -1, never as its (meaningless)
  *    elapsed time, and listed under "errors".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // default 300s: a single host stall inside a broadcast build would
      // otherwise surface as a timeout-exception whose wall time is
      // indistinguishable from real query cost
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String, dir: String = sfDir): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up at the smallest available sibling scale factor of the
    // configured data root (falls back to the root itself), so a
    // non-default SPARK_GRAFT_SF_DIR still gets a real warm-up.
    val warmDir = {
      val sib = new java.io.File(sfDir).getParentFile
      val cand = Option(sib).map(p => new java.io.File(p, "sf0.001"))
      cand.filter(_.isDirectory).map(_.toString).getOrElse(sfDir)
    }
    System.err.println(s"[bench] warm-up dir: $warmDir")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try materialize(name, warmDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    spark.catalog.clearCache()

    var errors = List.empty[String]
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { materialize(name); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        // operators cache signature tables; drop them so runs are
        // independently timed and the heap doesn't accumulate
        spark.catalog.clearCache()
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      if (times.isEmpty) { errors ::= name; name -> -1.0 }
      else name -> times.sorted.apply(times.size / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"stat":"median","errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
