package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: run one gated query through the noop sink (the bench's
  * own timed action) and print a per-job / per-stage wall breakdown —
  * the "which 400 ms is this?" attribution the Bench's single
  * per-query number cannot give. Optimization-round telemetry only;
  * the driver never runs this.
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <cpus> <queryName...>
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.broadcastTimeout", "3600")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, t0: Long, var t1: Long = -1,
      var stages: Int = 0, var tasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap[Int, Job]()
    val stageTasks = scala.collection.mutable.Map[Int, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId,
            Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""), e.time, stages = e.stageIds.size)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageTasks.synchronized {
          stageTasks(e.stageInfo.stageId) =
            (e.stageInfo.numTasks,
              e.stageInfo.completionTime.getOrElse(0L) -
                e.stageInfo.submissionTime.getOrElse(0L))
        }
    }

    def run(tag: String, name: String): Unit = {
      jobs.clear(); stageTasks.clear()
      val t0 = System.nanoTime()
      spark.sparkContext.addSparkListener(listener)
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener bus is async; give it a beat to drain. 1 s (was
      // 300 ms — round-16 ADVICE: a loaded host could under-count
      // jobs). The bus's waitUntilEmpty is private[spark]; for a
      // dev-only attribution tool the lengthened drain is enough —
      // a remaining under-count would only ever LOWER a reported job
      // count, never invent one.
      Thread.sleep(1000)
      println(f"== $tag $name wall=$wall%.3f s, ${jobs.size} jobs, " +
        s"${stageTasks.size} stages, ${stageTasks.values.map(_._1).sum} tasks")
      val jseq = jobs.values.toSeq.sortBy(_.t0)
      val first = jseq.headOption.map(_.t0).getOrElse(0L)
      jseq.foreach { j =>
        val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e3 else -1.0
        val off = (j.t0 - first) / 1e3
        println(f"  job ${j.id}%3d +$off%7.2fs ${dur}%7.3fs stages=${j.stages} ${j.desc.take(90)}")
      }
      val gaps = jseq.sliding(2).collect {
        case Seq(a, b) if b.t0 - math.max(a.t1, a.t0) > 50 =>
          (a.id, b.id, (b.t0 - a.t1) / 1e3)
      }.toSeq
      if (gaps.nonEmpty) {
        println("  gaps >50ms between jobs (driver-side work):")
        gaps.foreach { case (a, b, g) => println(f"    job $a -> $b : $g%.3f s") }
      }
    }
    names.foreach { name =>
      run("cold", name)
      spark.catalog.clearCache()
      run("warm1", name)
      spark.catalog.clearCache()
      run("warm2", name)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
