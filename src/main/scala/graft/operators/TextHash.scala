package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic text hashing primitives — SQL fragments
  * delegating to the native expressions in
  * [[graft.functions.TextHashExprs]] (registered by Tables.ensure).
  *
  * Everything here is pure integer math over ASCII codes (rolling
  * polynomial hash mod 1e9+7 / 2^32) built from Spark higher-order
  * functions. The DuckDB oracle replicates the same formulas with list
  * comprehensions, so results hash-compare exactly — no engine-native
  * hash (murmur/xxhash) appears anywhere in a checked output.
  *
  * Scale: each expression is per-row (narrow), so it parallelizes
  * embarrassingly; the only shuffles downstream are the groupBy/join
  * on the hashed keys, which are longs — far cheaper to shuffle than
  * raw document text at 100 TB.
  *
  * Cache lifecycle: several operators `persist()` a signature frame
  * that feeds multiple plan branches of ONE returned query. Because
  * the result is lazy, the operator cannot unpersist before the
  * caller materializes it — cache ownership is the CALLER's:
  * `spark.catalog.clearCache()` between independent queries (exactly
  * what Verify and Bench do per query). A long-lived session running
  * many operators without it will accumulate cached corpora.
  */
object TextHash {

  val P = 1000000007L

  /** Second hash modulus, for decisions that must be INDEPENDENT of a
    * P-hash decision on the same text: `h%100 < a` (split, mod P) and
    * `h%1000 < b` (sampling) from ONE hash are correlated — every
    * sampled doc with b <= 100 would land in 'train'. A different
    * prime modulus of the same polynomial decorrelates them. */
  val P2 = 998244353L

  /** Third prime modulus: the x14 temperature-sampling keep decision,
    * decorrelated from both the P split (t07) and the P2 quota rank
    * (x11) on the same text. */
  val P3 = 754974721L

  /** Whitespace tokens of lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** The oracle-gate fixed-point convention: ratios/doubles are
    * exposed as floor(x·1e6) longs. One definition — the floor/scale
    * pair is load-bearing for cross-engine hash compares, so per-file
    * copies must not drift. */
  def e6(c: Column): Column = floor(c * 1000000).cast("long")

  /** The content-hash split rule (t07): 80/10/10 on hash mod 100.
    * Shared by every operator that splits (t07, t11, x03, x05) so the
    * thresholds cannot drift between the standalone and composed
    * forms. */
  def splitOf(hMod: Column): Column =
    when(hMod < 80, "train").when(hMod < 90, "val").otherwise("test")

  /** Rolling polynomial hash (base 31, seed 7, mod `m`) of a string
    * column — SQL-expressible in both engines. Guarded for empty
    * strings: Spark's sequence(1, 0) counts *down*, DuckDB's
    * generate_series(1, 0) is empty, so the empty case short-circuits
    * to the seed in both. */
  def rollingHashExpr(s: String, m: Long): String =
    s"rolling_hash_str($s, ${m}L)"

  /** Adjacent token pairs of a token-array column `tk` as
    * struct(w1, w2) — ONE definition of the bigram-extraction rule
    * shared by the t17 model build and the t18 document scorer (a
    * drifted copy would score documents against a differently-
    * tokenized model). */
  def bigramsExpr(tk: String): String =
    s"CASE WHEN size($tk) >= 2 THEN transform(sequence(1, size($tk) - 1), " +
      s"i -> struct(element_at($tk, i) AS w1, element_at($tk, i + 1) AS w2)) " +
      s"ELSE cast(array() as array<struct<w1:string,w2:string>>) END"

  /** ALL word n-grams (with repeats) of a token-array column `tk`. */
  def ngramsExpr(tk: String, n: Int): String =
    s"CASE WHEN size($tk) >= $n THEN transform(sequence(1, size($tk) - ${n - 1}), " +
      s"i -> array_join(slice($tk, i, $n), ' ')) ELSE cast(array() as array<string>) END"

  /** Distinct word 5-gram shingles of a token-array column `tk`. */
  def shingleExpr(tk: String): String =
    s"CASE WHEN size($tk) >= 5 THEN array_distinct(transform(sequence(1, size($tk) - 4), " +
      s"i -> array_join(slice($tk, i, 5), ' '))) ELSE cast(array() as array<string>) END"

  /** Rolling hash of every element of a string-array column `arr`. */
  def hashArrayExpr(arr: String, m: Long): String =
    s"rolling_hash_arr($arr, ${m}L)"

  /** MinHash signature (k values) from a long-array column `hv`:
    * h_i(x) = ((2i+1)·x + 7919·(i+1)) mod P. */
  def minhashExpr(hv: String, k: Int): String =
    s"affine_minhash($hv, $k)"

  /** 32-bit SimHash from a long-array column `hv` (token hashes mod
    * 2^32, tf-weighted by repetition). */
  def simhashExpr(hv: String): String =
    s"simhash32($hv)"

  /** Spread the CPU-heavy per-row hashing across all cores: the test
    * parquet is a single file (= one input partition), so without this
    * every tokenize/hash pass runs on one core. Round-robin, no key
    * needed. SCALE-CONDITIONAL (round 16, guide §2.4): a 100 TB layout
    * is already thousands of splits, and an unconditional
    * `repartition(n)` there is a full shuffle of raw document text
    * bought for parallelism the scan already has — so the fan-out is
    * skipped when the input plan already carries at least
    * defaultParallelism partitions. Callers pass scan-level frames
    * (no Exchange beneath), so reading the partition count off the
    * RDD plans no shuffle and runs no job; at the driver's SFs the
    * single-file scan keeps the repartition, leaving local plans (and
    * their fingerprints) unchanged. */
  def fanOut(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    // Partition-count probe contract, now IN CODE (round-16 ADVICE):
    // touching df.rdd finalizes the plan, and on a frame with an
    // exchange beneath AQE would eagerly execute the upstream shuffle
    // stages just to read a count — running that work twice. Every
    // current caller passes a scan-level frame; any future caller
    // whose analyzed plan carries more than narrow scan-level nodes
    // skips the probe and keeps the unconditional repartition (the
    // pre-round-16 behavior — correct, never double-executing).
    val scanLevel = df.queryExecution.analyzed.collect { case p => p.nodeName }
      .forall(FanOutNarrowNodes)
    if (scanLevel && df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** Logical node kinds that cannot hide an exchange beneath
    * [[fanOut]]'s partition-count probe. */
  private val FanOutNarrowNodes = Set("Project", "Filter",
    "SubqueryAlias", "View", "Relation", "LogicalRelation", "LogicalRDD")

  /** doc_id + shingle-hash array for the documents table. */
  def shingleHashes(documents: DataFrame): DataFrame =
    fanOut(documents)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), expr(shingleExpr("tk")).as("shs"))
      .select(col("doc_id"), expr(hashArrayExpr("shs", P)).as("hv"),
        size(col("shs")).as("n_sh"))

  @volatile private var lastShingleHashes
      : Option[(org.apache.spark.sql.SparkSession, String, DataFrame)] = None

  /** Build-once corpus fingerprint table — [[shingleHashes]] of the
    * documents table, localCheckpoint-materialized per (session, dir):
    * the d03-pair/knn-graph convention applied to the primitive that
    * TEN gated queries (d02/d03/d11/d12/d18/x15/t05/t19/t31/t32 + the
    * x26 card) previously each rebuilt from the raw text — exactly as
    * a production pipeline materializes the signature table once and
    * every dedup/text stage reads it from storage. The frame is
    * (doc_id, hv, n_sh) — ~8 B per corpus shingle, two orders of
    * magnitude smaller than the text it summarizes — and checkpoint
    * blocks survive the inter-query `clearCache` by design (the
    * CacheSpec-documented allowed residue). Direct [[shingleHashes]]
    * callers (ScaleStress telemetry, ad-hoc frames) always rebuild. */
  private[operators] def shingleHashesMemo(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    lastShingleHashes match {
      case Some((ms, mdir, g)) if (ms eq s) && mdir == dir => g
      case _ => Memos.timedBuild("shingle_hashes", dir) {
        val g = shingleHashes(graft.engine.Tables.t(s, dir, "documents"))
          .localCheckpoint()
        lastShingleHashes = Some((s, dir, g))
        g
      }
    }

  private[operators] def invalidateMemos(): Unit =
    lastShingleHashes = None
}
