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

  test("bench JSON line estimate stays inside the driver tail window") {
    // the driver parses the bench line from the last ~2000 chars of
    // stdout, minus sbt's trailing [success] line (~75 chars); the
    // compact line spends ~(prefix + 8) chars per query (quotes,
    // colon, comma, %.2f value with trailing zeros trimmed — measured
    // 1488 chars at 125 queries = 10.3/query + envelope, so +8 keeps
    // ~7% slack) plus ~200 of envelope. Estimate against 1900 so
    // growth is caught before a round silently records parsed:null
    // again (rounds 1, 2, 4 did).
    val names = SparkEntry.queries.keys.toSeq
    val estimate = names.map(_.takeWhile(_ != '_').length + 8).sum + 200
    assert(estimate < 1900,
      s"estimated bench line $estimate chars — trim or re-shorten keys")
    // fail one round EARLY: ten more queries at the current mean key
    // width must also fit, so the overflow is caught while there is
    // still a round to fix it in
    val meanPerQuery = (estimate - 200).toDouble / names.size
    val projected = estimate + (10 * meanPerQuery).ceil.toInt
    assert(projected < 1900,
      s"projected bench line at N+10 queries is $projected chars — " +
        "re-shorten keys now, before the next batch of queries lands")
  }

}
