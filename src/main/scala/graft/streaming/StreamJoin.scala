package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join: correlate two live event streams
  * (e.g. clicks with the purchases they convert into) without ever
  * materializing either side.
  *
  * Both inputs carry a watermark and the join condition carries a
  * time-range bound, so Spark can size the join state exactly: a click
  * is held only until the watermark passes its conversion horizon,
  * then evicted. Without BOTH constraints the state store grows
  * without bound — that is the difference between a demo and a
  * pipeline that survives week-long uptime at production rates. State
  * is hash-partitioned by the join key, so it scales out with
  * executors like any shuffle.
  */
object StreamJoin {

  val HorizonMinutes = 30

  /** Inner-join purchases to clicks of the same user that happened at
    * most [[HorizonMinutes]] before them (attribution join). Inputs:
    * streaming frames with (event_id, user_id, event_type, ts). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $HorizonMinutes MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }
}
