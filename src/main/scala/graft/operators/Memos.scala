package graft.operators

/** Explicit invalidation for the build-once (session, dir) memo
  * tables (shingle hashes, minhash pairs, substring spans, decontam
  * base, knn graph, CC label frames).
  *
  * The memos key on (session, dir) only and deliberately survive
  * `spark.catalog.clearCache()` via localCheckpoint — correct for the
  * batch gate (the corpus under a dir is immutable for a run) but
  * stale if a LONG-LIVED session mutates the files under a dir
  * mid-flight. Such a session calls this after rewriting a corpus
  * dir; the next operator call rebuilds from the current files.
  * (Checkpoint blocks of the dropped frames are reclaimed by the
  * JVM's ContextCleaner once the old frames are unreachable.) */
object Memos {
  def invalidate(): Unit = {
    TextHash.invalidateMemos()
    Dedup.invalidateMemos()
    Similarity.invalidateMemos()
    DupCluster.invalidateMemos()
    TextAnalysis.invalidateMemos()
    // drop probe freshness with the frames: an entry surviving its
    // frame would be dead weight at best, and on a key collision it
    // could vouch for a frame that was never probed (round-13 ADVICE)
    lastProbeNs.clear()
  }

  /** Lost-checkpoint liveness probe for memo accessors.
    * localCheckpoint blocks are UNREPLICATED: on a real cluster an
    * executor loss permanently poisons a memoized frame, and without
    * a probe the accessor keeps handing out the dead frame for the
    * rest of a long-lived session until [[invalidate]] is called by
    * hand. A bounded 1-row job (limit(1).count) touches the
    * checkpoint storage; if the blocks are gone it throws and the
    * caller drops the memo and rebuilds from the files. The probe
    * reads at most one partition — milliseconds against materialized
    * blocks — so it cannot catch a PARTIAL loss confined to a later
    * partition; a session that knows it lost executors still calls
    * [[invalidate]] for certainty.
    *
    * RATE-LIMITED per frame (round-13 ADVICE fix): hot accessors —
    * substringSpansMemo under d19/d20/x32/x33, lloydStateMemo under
    * s27/d21 — are consulted during PLAN CONSTRUCTION (EXPLAIN
    * sweeps, plan census), and an unconditional probe made every
    * such access pay a Spark job. A frame probed alive within
    * [[ProbeIntervalNs]] is trusted without a job; the cost is a
    * ≤30 s stale window after an executor loss, in which the
    * consumer's own action throws (and the NEXT access rebuilds) —
    * the same terminal behavior, one failed action later. */
  /** First-touch build cost per memo frame, ("frame|dir" → seconds),
    * recorded by [[timedBuild]] around each (session, dir) build and
    * drained by Bench into the bench JSON's `memo_build_sec` map
    * (round-14 verdict item 5): the cold-start cost that
    * median-of-repeats correctly excludes from steady-state numbers
    * — a memo pays its build inside whichever query touches it first,
    * showing up only as that query's sample SPREAD (t36 measured
    * 0.13–28.9 s) — becomes an artifact instead of an inference.
    * Values accumulate per key: a re-build after [[invalidate]] adds
    * its cost to the same frame's total. */
  private[graft] val buildSec =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private[operators] def timedBuild[T](frame: String, dir: String)(
      body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    buildSec.merge(s"$frame|$dir",
      java.lang.Double.valueOf((System.nanoTime() - t0) / 1e9),
      (a, b) => java.lang.Double.valueOf(a + b))
    r
  }

  /** Snapshot of the recorded build costs for `dir`, frame → sec. */
  private[graft] def buildSecFor(dir: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSec.asScala.toMap.collect {
      case (k, v) if k.endsWith(s"|$dir") =>
        k.stripSuffix(s"|$dir") -> v.doubleValue()
    }
  }

  private val ProbeIntervalNs = 30L * 1000 * 1000 * 1000
  private[graft] val lastProbeNs =
    new java.util.concurrent.ConcurrentHashMap[Seq[Long], java.lang.Long]()

  /** Rate-limit key: ALL checkpoint RDD ids in the memoized frame's
    * plan, sorted. A memo frame is usually one localCheckpoint scan
    * (one LogicalRDD node), but a frame COMPOSED over two
    * checkpointed frames must not share its key with the frame owning
    * just the first leaf — probing one would vouch for the other for
    * up to 30 s even if the second frame's blocks were lost
    * (round-14 ADVICE; the old collectFirst had exactly that
    * single-leaf assumption). RDD ids come from a SparkContext-global
    * counter that is never recycled, so a REBUILT frame can never
    * inherit a dropped frame's probe freshness. A frame with no
    * LogicalRDD at all gets no key and probes unconditionally. */
  private[graft] def probeKey(
      g: org.apache.spark.sql.DataFrame): Option[Seq[Long]] = {
    val ids = g.queryExecution.logical.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id.toLong
    }.sorted
    if (ids.isEmpty) None else Some(ids)
  }

  private[operators] def alive(g: org.apache.spark.sql.DataFrame): Boolean = {
    val key = probeKey(g)
    val now = System.nanoTime()
    val last = key.flatMap(k => Option(lastProbeNs.get(k)))
    if (last.exists(now - _ < ProbeIntervalNs)) true
    else
      try {
        g.limit(1).count()
        key.foreach(lastProbeNs.put(_, now))
        true
      } catch { case scala.util.control.NonFatal(_) =>
        key.foreach(lastProbeNs.remove(_)); false }
  }
}
