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
  }
}
