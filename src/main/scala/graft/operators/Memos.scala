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
    * [[invalidate]] for certainty. */
  private[operators] def alive(g: org.apache.spark.sql.DataFrame): Boolean =
    try { g.limit(1).count(); true }
    catch { case scala.util.control.NonFatal(_) => false }
}
