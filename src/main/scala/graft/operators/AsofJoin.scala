package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Backward as-of join — "for each left row, the latest right row at
  * or before it" — an operator Spark has no built-in for (extension
  * beyond the reference surface, which records join conditions only:
  * /root/reference/README.md:648–659).
  *
  * Implementation is the scalable union+window formulation, NOT a
  * range join: tag both inputs, union them, and run one
  * `last(..., ignoreNulls)` window per partition key ordered by
  * (ts, side, tie). A range-join (`l.ts >= r.ts`) formulation would
  * be O(|L|·|R|) per key for Spark's non-equi join paths; this one is
  * a single hash shuffle on the key plus one sort — the same cost as
  * any groupBy, so it survives a 100 TB scale-up unchanged (and AQE
  * handles skewed keys).
  */
object AsofJoin {

  /** Generic backward as-of join.
    *
    * @param left      probe rows; all its columns survive
    * @param right     build rows; `matchCols` are attached as `m_<col>`
    * @param partKeys  equality keys (both sides)
    * @param tsCol     ordering column, present in both inputs (use a
    *                  long — e.g. unix_micros — for engine-exact order)
    * @param tieCol    breaks ties among right rows at equal ts (the
    *                  LARGEST tie value wins); must exist in both
    * @param matchCols right columns to surface on matched left rows
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, partKeys: Seq[String],
      tsCol: String, tieCol: String, matchCols: Seq[String]): DataFrame = {
    // side 0 sorts before side 1 at equal ts => inclusive (r.ts <= l.ts)
    val r = right
      .select((partKeys :+ tsCol :+ tieCol).map(col) :+
        struct(matchCols.map(col): _*).as("__m"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(partKeys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__match", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matchCols.foldLeft(matched) { (df, c) =>
      df.withColumn(s"m_$c", col(s"__match.$c"))
    }.drop("__m", "__match", "__side")
  }

  /** q39: every purchase event joined to the user's latest click at or
    * before it (tie: largest click event_id); gap in microseconds,
    * -1 sentinels when the user never clicked before the purchase. */
  def purchaseClickAsof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
    val clicks = e.filter(col("event_type") === "click").drop("event_type")
    asofBackward(purchases, clicks, Seq("user_id"),
        tsCol = "us", tieCol = "event_id", matchCols = Seq("event_id", "us"))
      .select(col("event_id"),
        coalesce(col("m_event_id"), lit(-1L)).as("click_id"),
        coalesce(col("us") - col("m_us"), lit(-1L)).as("gap_us"))
      .orderBy("event_id")
  }
}
