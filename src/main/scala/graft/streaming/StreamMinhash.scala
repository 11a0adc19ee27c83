package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextHash}

/** Streaming per-source MinHash sketch: the live form of the gated t32
  * source-overlap estimate
  * ([[graft.operators.TextAnalysis.sourceSimilaritySketch]]).
  *
  * The sketch is mergeable by construction — min over a union of
  * shingle sets = min of the per-part mins — so each arriving
  * document's k-component signature folds into the running
  * per-(source, i) minimum with a plain streaming aggregate. The state
  * table holds at most |sources|·k rows however much text streams
  * through (the StreamSketch/StreamDrift bounded-state discipline); a
  * streaming form of t31's EXACT overlap would instead grow state with
  * the distinct-shingle universe, which is the reason the sketch path
  * exists at all.
  *
  * A batch pairing of the final state ([[pairEstimates]]) reproduces
  * t32's est_jac_e6 EXACTLY once the stream has carried the same
  * corpus — StreamingSpec pins the equivalence at sf0.001 across a
  * two-trigger replay, so trigger boundaries provably do not leak into
  * the estimate.
  */
object StreamMinhash {

  /** Input: streaming frame with (source, text); output: running
    * (source, i, v) — the live per-source MinHash component minima.
    * Docs with no shingles (< 5 tokens) carry no signature, matching
    * the batch twin. */
  def sourceMinhashStream(docs: DataFrame): DataFrame = {
    // batch operators reach the native hash expressions through
    // Tables.t; streaming takes a bare frame, so register here
    graft.functions.TextHashExprs.register(docs.sparkSession)
    docs
      .select(col("source"), TextHash.tokens(col("text")).as("tk"))
      .select(col("source"), expr(TextHash.shingleExpr("tk")).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("source"),
        expr(TextHash.hashArrayExpr("shs", TextHash.P)).as("hv"))
      .select(col("source"), posexplode(
        expr(TextHash.minhashExpr("hv", Dedup.MinhashK))).as(Seq("i", "v")))
      .groupBy("source", "i").agg(min("v").as("v"))
  }

  /** Batch probe of a (source, i, v) sketch table: t32's pair
    * estimator — matching components / k over every source pair. The
    * input is |sources|·k rows, so this is metadata-scale. */
  def pairEstimates(sk: DataFrame): DataFrame =
    // column renames (not plan aliases): the input may be a table view
    // whose self-join would otherwise hit identical attribute ids
    sk.toDF("source_a", "i", "va")
      .join(sk.toDF("source_b", "ib", "vb"),
        col("i") === col("ib") && col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(when(col("va") === col("vb"), 1L).otherwise(0L))
        .as("match_k"))
      .withColumn("est_jac_e6",
        expr(s"(1000000L * match_k) div ${Dedup.MinhashK}"))
      .orderBy("source_a", "source_b")
}
