package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only: print one gated query's FORMATTED physical plan (raw,
  * un-normalized — [[PlanFpDump]] is the fingerprint twin) so a plan
  * audit can eyeball node shapes without wiring a test first.
  *
  * Usage: runMain graft.tools.PlanText <sfDir> <queryName> [cpus]
  */
object PlanText {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = if (args.length > 2) args(2) else "4"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
