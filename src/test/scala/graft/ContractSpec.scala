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
  }

}
