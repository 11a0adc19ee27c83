package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 laws: the i14 distributed top-fraction selection.
  *
  * Round 15 replaced i14's per-term rank window (whose partition was
  * a whole posting list — Θ(corpus docs) for a stop term) with
  * [[TextAnalysis.prunedPostings]]'s 7-level radix selection. The
  * row-hash oracle pins the top-10 report; these laws pin the part
  * the report can hide: that the SELECTION ITSELF — every kept
  * posting — is identical to the rank-window cut it replaced,
  * including doc_id-asc resolution of contribution ties at the
  * threshold, and across contribution magnitudes that exercise every
  * radix level.
  */
class Round15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.01"

  /** The OLD semantics, first-principles: per term, sort by
    * (contrib desc, doc_id asc), keep ceil(df·permille/1000). */
  private def windowCut(
      rows: Seq[(String, Long, Long, Long)]): Set[(String, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val k = ((ps.head._3 * TextAnalysis.PruneKeepPermille + 999) / 1000).toInt
      ps.sortBy { case (_, id, _, c) => (-c, id) }.take(k)
    }.toSet

  private def runCut(postings: DataFrame): Set[(String, Long, Long, Long)] =
    TextAnalysis.prunedPostings(postings).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("df"), r.getAs[Long]("contrib_e6"))).toSet

  test("i14 threshold cut == rank-window cut on the corpus fixture") {
    val postings = TextAnalysis.indexPruningPostings(spark, dir).persist()
    val rows = postings.collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("df"), r.getAs[Long]("contrib_e6"))).toSeq
    val expected = windowCut(rows)
    val got = runCut(postings)
    assert(got == expected,
      s"threshold cut diverges from the window cut: " +
        s"extra=${(got -- expected).take(3)} " +
        s"missing=${(expected -- got).take(3)}")
    // the cut is proportional, not degenerate: strictly fewer
    // postings than the input, strictly more than zero
    assert(got.nonEmpty && got.size < rows.size)
  }

  test("i14 threshold ties resolve by doc_id asc, exactly") {
    import spark.implicits._
    // term "a": df=20, k=ceil(20·250/1000)=5. Contributions 100×2
    // then 50×10 — the threshold value 50 is crossed MID-TIE, so the
    // cut must keep both 100s and exactly the 3 smallest doc_ids of
    // the 50-tie (ids 10,11,12), dropping ids 13..19 at the SAME
    // contribution. term "b": df=7, k=ceil(7·250/1000)=2 (ceil
    // rounding bites), all-distinct contribs — plain top-2. term
    // "c": df=4, k=1, ALL FOUR postings share one value — the whole
    // selection is one tie group; only the smallest doc_id survives.
    val rows =
      (0L until 2L).map(i => ("a", i, 20L, 100L)) ++
      (10L until 20L).map(i => ("a", i, 20L, 50L)) ++
      (20L until 28L).map(i => ("a", i, 20L, 10L - (i - 20))) ++
      Seq(("b", 1L, 7L, 7L), ("b", 2L, 7L, 6L), ("b", 3L, 7L, 5L),
        ("b", 4L, 7L, 4L), ("b", 5L, 7L, 3L), ("b", 6L, 7L, 2L),
        ("b", 7L, 7L, 1L)) ++
      (0L until 4L).map(i => ("c", 100L - i, 4L, 777L))
    val postings = rows.toDF("term", "doc_id", "df", "contrib_e6")
      .repartition(4) // the cut must not depend on row layout
    val got = runCut(postings)
    assert(got == windowCut(rows), s"tie resolution diverged: $got")
    assert(got.filter(_._1 == "a").count(_._4 == 50L) == 3)
    assert(got.filter(_._1 == "a").filter(_._4 == 50L).map(_._2).toSet
      == Set(10L, 11L, 12L), "mid-tie cut must keep the smallest doc_ids")
    assert(got.filter(_._1 == "c") == Set(("c", 97L, 4L, 777L)),
      "an all-tie term must keep exactly the smallest doc_id")
  }

  test("i14 radix descent is exact across contribution magnitudes") {
    import spark.implicits._
    // contributions spanning the full long range the BM25 fixed-point
    // can produce: values around 2^60 (level-1 buckets split), around
    // 2^30 (mid levels), single digits (only level 7 splits), and
    // adjacent values differing by 1 at a high magnitude (the exact
    // threshold must separate v from v+1 after seven 9-bit levels).
    val big = 1L << 60
    val rows =
      (0L until 8L).map(i => ("hi", i, 16L, big + i)) ++ // distinct highs
      (8L until 16L).map(i => ("hi", i, 16L, big - 1L)) ++ // tie below
      (0L until 12L).map(i => ("mid", i, 12L, (1L << 30) + (i % 3))) ++
      (0L until 9L).map(i => ("lo", i, 9L, i % 4))
    val postings = rows.toDF("term", "doc_id", "df", "contrib_e6")
      .repartition(5)
    val got = runCut(postings)
    assert(got == windowCut(rows),
      s"radix selection diverges at magnitude extremes: $got")
  }

  test("i14 plan has no per-term rank window over the postings") {
    // the point of the round-15 rework: the only windows left in the
    // pruned branch run over ≤512-row radix histograms (ordered by
    // bucket) and the guarded threshold tie set (ordered by doc_id).
    // A window ORDERING BY THE CONTRIBUTION would mean the per-term
    // posting-list sort is back; pin its absence in the final plan.
    val p = TextAnalysis.indexPruning(spark, dir).queryExecution
      .optimizedPlan.toString
    val bad = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") && l.contains("contrib_e6#"))
    assert(bad.isEmpty,
      s"per-term contribution rank window resurfaced:\n${bad.mkString("\n")}")
  }
}
