package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that don't need a SparkSession — the
  * rules that make the harness gates work, pinned so adding a query
  * can't silently break them.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has a DuckDB oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
  }

  test("query id prefixes stay unique (bench short keys) ") {
    val names = SparkEntry.queries.keys.toSeq
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      "duplicate id prefix would force the bench line back to full names")
  }

  test("bench line never outgrows the driver tail window (self-truncating)") {
    // Bench.compactLine measures the REAL string and folds the
    // cheapest queries into other_n/other_sec until it fits — so the
    // invariant to pin is the builder's guarantee, at the current
    // query census and far past it.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val now = Bench.compactLine(
      names.zipWithIndex.map { case (n, i) => n -> (0.1 + i * 0.07) },
      42.0, 3, Nil, 0, "/root/testdata/sf0.1")
    assert(now.length <= Bench.MaxLineChars, s"line ${now.length} chars")
    // at the current census the heaviest queries must still be
    // in-line by name (folding, if any, eats from the cheap end)
    val heavy = names.zipWithIndex.sortBy(-_._2).take(10).map(_._1)
    heavy.foreach { n =>
      assert(now.contains("\"" + n.takeWhile(_ != '_') + "\":"),
        s"heavy query $n folded out of the bench line")
    }
    // stress: 400 synthetic queries still fit, and the fold rollup
    // preserves the census (other_n accounts for every folded entry)
    val big = (1 to 400).map(i => f"v$i%03d_synthetic" -> (i * 0.01))
    val folded = Bench.compactLine(big, 800.0, 3, Nil, 0, "/tmp/x")
    assert(folded.length <= Bench.MaxLineChars)
    assert(folded.contains("\"other_n\":"))
    // -1 (failed) entries never fold — reds stay visible
    val withRed = Bench.compactLine(big :+ ("zzz_red" -> -1.0),
      800.0, 3, Nil, 0, "/tmp/x")
    assert(withRed.contains("\"zzz\":-1"))
    assert(withRed.length <= Bench.MaxLineChars,
      s"red line ${withRed.length} chars")
    // mass failure: hundreds of reds + a full failed_runs map can't
    // be kept by name — the collapsed last resort must still fit and
    // still parse (failed_n carries the count)
    val massRed = (1 to 300).map(i => f"w$i%03d_red" -> -1.0) ++
      (1 to 100).map(i => f"v$i%03d_ok" -> (i * 0.01))
    val massLine = Bench.compactLine(massRed, 1.0, 3,
      (1 to 300).map(i => f"w$i%03d_red" -> 3), 0, "/tmp/x")
    assert(massLine.length <= Bench.MaxLineChars,
      s"mass-failure line ${massLine.length} chars")
    assert(massLine.contains("\"failed_n\":300"))
  }

  test("README census count matches the registered contract") {
    // the README is the driver-facing contract doc; its census went
    // stale twice (146 at a 148 contract) — pin it to the registry so
    // a new query forces the doc refresh in the same commit
    val n = SparkEntry.queries.size
    val readme = scala.io.Source.fromFile("README.md", "UTF-8")
    // whitespace-normalize BEFORE matching: the round-8 README carried
    // "…163\nqueries" across a hard wrap and the raw-text regex sailed
    // past it — the guard must see prose the way a reader does, one
    // space between words regardless of line breaks
    val text = (try readme.mkString finally readme.close())
      .replaceAll("\\s+", " ")
    val stale = "\\b[1-9][0-9]{2,3} quer".r.findAllIn(text).toSeq
      .filterNot(_.startsWith(s"$n quer"))
    assert(text.contains(s"$n queries"),
      s"README never states the current census of $n queries")
    assert(stale.isEmpty,
      s"README carries stale census counts: $stale (contract is $n)")
  }

}
