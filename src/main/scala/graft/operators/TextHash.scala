package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic text hashing primitives.
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
  */
object TextHash {

  val P = 1000000007L

  /** Whitespace tokens of lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Rolling polynomial hash (base 31, seed 7, mod `m`) of a string
    * column — SQL-expressible in both engines. Guarded for empty
    * strings: Spark's sequence(1, 0) counts *down*, DuckDB's
    * generate_series(1, 0) is empty, so the empty case short-circuits
    * to the seed in both. */
  def rollingHashExpr(s: String, m: Long): String =
    s"CASE WHEN length($s) >= 1 THEN " +
      s"aggregate(transform(sequence(1, length($s)), j -> cast(ascii(substring($s, j, 1)) as bigint)), " +
      s"cast(7 as bigint), (a, x) -> (a * 31 + x) % ${m}L) ELSE cast(7 as bigint) END"

  /** Distinct word 5-gram shingles of a token-array column `tk`. */
  def shingleExpr(tk: String): String =
    s"CASE WHEN size($tk) >= 5 THEN array_distinct(transform(sequence(1, size($tk) - 4), " +
      s"i -> array_join(slice($tk, i, 5), ' '))) ELSE cast(array() as array<string>) END"

  /** Rolling hash of every element of a string-array column `arr`. */
  def hashArrayExpr(arr: String, m: Long): String =
    s"transform($arr, s -> CASE WHEN length(s) >= 1 THEN " +
      s"aggregate(transform(sequence(1, length(s)), " +
      s"j -> cast(ascii(substring(s, j, 1)) as bigint)), cast(7 as bigint), " +
      s"(a, x) -> (a * 31 + x) % ${m}L) ELSE cast(7 as bigint) END)"

  /** MinHash signature (k values) from a long-array column `hv`:
    * h_i(x) = ((2i+1)·x + 7919·(i+1)) mod P. */
  def minhashExpr(hv: String, k: Int): String =
    s"transform(sequence(0, ${k - 1}), i -> array_min(transform($hv, " +
      s"h -> ((2 * i + 1) * h + 7919 * (i + 1)) % ${P}L)))"

  /** 32-bit SimHash from a long-array column `hv` (token hashes mod
    * 2^32, tf-weighted by repetition). */
  def simhashExpr(hv: String): String =
    s"aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) -> acc + " +
      s"(CASE WHEN aggregate($hv, 0, (c, h) -> c + (CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
      s"THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END))"

  /** doc_id + shingle-hash array for the documents table. */
  def shingleHashes(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), expr(shingleExpr("tk")).as("shs"))
      .select(col("doc_id"), expr(hashArrayExpr("shs", P)).as("hv"),
        size(col("shs")).as("n_sh"))
}
