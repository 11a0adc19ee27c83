package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression specs: the scale-critical physical-plan
  * properties (`PushedFilters` on the parquet scan, pruned
  * `ReadSchema`, broadcast joins on dimensions, no nested-loop
  * fallback for the theta joins) must survive refactors — a correct
  * but non-pushed plan is a 100 TB regression that row-level tests
  * cannot see. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("q02 filter reaches the parquet scan and projection is pruned") {
    val p = plan(Relational.q02_filter_project(spark, dir))
    assert(raw"PushedFilters: \[[^\]]".r.findFirstIn(p).isDefined,
      s"no non-empty PushedFilters in:\n$p")
    // only the referenced lineitem columns may be read
    assert(!p.contains("l_comment") && !p.contains("l_receiptdate"),
      "scan reads columns the query never references")
  }

  test("q09 MAPJOIN analog is a broadcast hash join") {
    val p = plan(Relational.q09_join_broadcast(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("theta-OR joins extract the equi conjunct (no nested loop)") {
    for (q <- Seq(Relational.q10_join_theta _, Relational.q27_sql25_analog _)) {
      val p = plan(q(spark, dir))
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"theta join fell back to a non-equi physical join:\n$p")
    }
  }

  test("q01 aggregates partially before the shuffle") {
    val p = plan(Relational.q01_pricing_summary(spark, dir))
    assert(p.contains("HashAggregate"), s"no hash aggregate in:\n$p")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate pair, got $aggs")
  }
}
