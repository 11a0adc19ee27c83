package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps every gated query's normalized plan fingerprint
  * ([[graft.Bench.planFp]] — the SAME function the bench records) as
  * one JSON object, for patching fingerprints into bench artifacts
  * produced before a normalization fix, and for verifying fingerprint
  * stability across JVMs (run twice, diff).
  *
  * Usage: runMain graft.tools.PlanFpDump <sfDir> <outFile>
  * NOTE: constructing some plans triggers eager memo builds
  * (d19/d20/x29/x31/x32/x33/t36/t37) — expect corpus-scale jobs.
  */
object PlanFpDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fps = graft.SparkEntry.queries.keys.toSeq.sorted
      .map(n => s""""$n":"${graft.Bench.planFp(spark, n, dir)}"""")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      fps.mkString("{", ",", "}").getBytes("UTF-8"))
    println(s"wrote $out (${fps.size} fingerprints)")
    spark.stop()
  }
}
