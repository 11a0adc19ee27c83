package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Storage-accounting specs (VERDICT r8 item 5): the round-8 bench
  * added per-query peak-cache telemetry (`storage_mb` in
  * BENCH_DETAIL.json — heaviest at sf1: d14 160.6 MB, s11 105.7 MB,
  * the kNN family ~90 MB each); these tests turn the two governance
  * rules that telemetry motivated into executable pins:
  *
  *  1. a MATERIALIZED build (knnGraph's localCheckpoint) must drop
  *     its intermediate caches eagerly — only the checkpointed n·k
  *     result may stay resident;
  *  2. every documented-heavy query's peak cache stays inside a
  *     stated per-query budget, and the session-level
  *     `spark.catalog.clearCache()` hygiene (what Verify/Bench run
  *     between queries) actually returns storage to its pre-query
  *     floor — a persist that bypasses the catalog (raw RDD cache)
  *     would escape it and fail here.
  */
class CacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Bytes of block-manager storage currently resident (catalog
    * caches AND checkpoint/RDD-level blocks — the same measure
    * Bench's storage_mb uses). */
  @annotation.nowarn("cat=deprecation")
  private def storageBytes(): Long =
    spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum

  /** Storage after pending ContextCleaner work has drained: blocks of
    * frames earlier suites dropped are reclaimed ASYNCHRONOUSLY on
    * GC, so a baseline taken while that queue is non-empty can SHRINK
    * mid-measurement and fail the delta laws spuriously (observed
    * once in a full-suite run on a stalled host: −5 MB "shrink"
    * during the knnGraph build — CacheSpec alone was green). GC, then
    * poll until two consecutive samples agree; live (referenced)
    * blocks are never reclaimed, so the settled value is the real
    * floor. */
  private def settledStorageBytes(): Long = {
    System.gc()
    var prev = storageBytes()
    var tries = 0
    while (tries < 25) {
      Thread.sleep(200)
      val cur = storageBytes()
      if (cur == prev) return cur
      prev = cur
      tries += 1
    }
    prev
  }

  /** Per-query peak-cache budget at the sf0.01 gate scale. The
    * round-8 sf1 telemetry puts the heaviest lifetime (d14) at
    * 160.6 MB on a 100×-the-gate corpus — ≈ 1.6 MB at sf0.01 —  and
    * cache lifetimes measured ~linear in corpus size across the
    * sf0.1→sf1 runs. 24 MB at sf0.01 is ~15× that headroom (window
    * for partition overheads at toy scale) while still extrapolating
    * to ≈ 2.4 GB at sf1-per-executor-group — inside a standard 4 GB
    * executor storage region — and small enough to catch the real
    * failure class: a new operator persisting a corpus-scale frame
    * (token stream, postings before aggregation) instead of an
    * aggregate. An operator that must exceed this documents why here
    * and in its scaladoc. */
  val PerQueryBudgetMb = 24L

  val gateDir = "/root/testdata/sf0.01"

  test("knnGraph build drops its intermediates — only the n·k checkpoint stays") {
    spark.catalog.clearCache()
    val before = settledStorageBytes()
    Similarity.knnGraph(spark, gateDir) // eager: checkpoints the graph
    val delta = storageBytes() - before
    // the checkpointed sf0.01 graph is 1500 rows — single-digit MB
    // with partition overhead; the band/signature/scored intermediates
    // it must NOT leave behind are an order of magnitude bigger
    assert(delta >= 0, "storage shrank during a build — measurement broken")
    assert(delta <= 8L * 1024 * 1024,
      s"knnGraph left ${delta / 1024 / 1024} MB resident after its " +
        "checkpoint — an intermediate cache escaped the blocking unpersist")
    // nothing the build left depends on the catalog cache manager:
    // clearCache must be a no-op on the build's residue
    val after = storageBytes()
    spark.catalog.clearCache()
    assert(storageBytes() == after,
      "the build leaked a catalog-managed cache past its return")
  }

  test("documented heavies stay inside the per-query peak cache budget") {
    val heavies = Seq(
      "d14_hot_ngrams",       // 160.6 MB at sf1 — census max
      "s11_knn_components",   // 105.7 MB at sf1 (CC fixpoint checkpoints)
      "d16_cosine_prefix",    // capped-bucket scale path
      "i07_more_like_this",   // round-9 rewrite: pruned-roster persist
      "t31_source_similarity", // persists the (source, hash) distinct —
                               // the census's one corpus-scale persist
                               // by design (t32 is its sketch path)
      "t32_source_minhash",   // persists only |sources|·k component rows
      "s25_label_propagation", // persists the n·k symmetric edge list
      "x26_pretrain_card",    // composition: shared shingle-hash pass +
                              // its branches' own persists, all compact
      "x29_decontaminate",    // round-11 memo: the tokenize+8-gram pass
                              // localCheckpoints |train grams|+|bench
                              // grams| skinny rows (allowed residue)
      "x32_final_assembly",   // composition: span memo checkpoint +
                              // bpeNSym's |vocab| persist — nothing
                              // corpus-scale may stay resident
      "t36_classifier_train", // persists the labeled feature stream
                              // for its round-scans (skinny longs),
                              // unpersisted before return; the 4097-row
                              // round checkpoints are allowed residue
      "t37_classifier_eval",  // same stream persisted for split
                              // training + the final scoring pass
      "x33_assembly_trained") // x32's persists + the weight-memo
                              // checkpoint (4097 rows, allowed residue)
    heavies.foreach { name =>
      spark.catalog.clearCache()
      val floor = settledStorageBytes()
      graft.SparkEntry.queries(name)(spark, gateDir)
        .write.format("noop").mode("overwrite").save()
      val peakMb = (storageBytes() - floor) / 1024 / 1024
      assert(peakMb <= PerQueryBudgetMb,
        s"$name peaked at $peakMb MB cached (budget $PerQueryBudgetMb MB " +
          "at sf0.01) — document why or stop persisting a corpus-scale frame")
      // the inter-query hygiene Verify/Bench rely on must reclaim
      // everything the query pinned through the catalog (checkpoint
      // blocks from memoized builds are the one allowed residue)
      spark.catalog.clearCache()
      val residueMb = (storageBytes() - floor) / 1024 / 1024
      assert(residueMb <= 8L,
        s"$name left $residueMb MB that clearCache cannot reclaim — " +
          "a persist is bypassing the catalog cache manager")
    }
  }
}
