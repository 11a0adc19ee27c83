package graft

import org.apache.spark.sql.SparkSession

/** Plan audit main: prints the formatted physical plan of selected
  * queries and greps for the scale-critical properties — parquet
  * filter pushdown (`PushedFilters`), column pruning (`ReadSchema`),
  * broadcast joins, partial aggregation, and whole-stage codegen
  * coverage. Run with `sbt "runMain graft.PlanAudit [queryName...]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_project", "q09_join_broadcast",
        "q26_star_join", "d03_dedup_minhash_lsh", "s01_ann_topk")
    names.foreach { n =>
      println(s"########## $n ##########")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
    }
    spark.stop()
  }
}
