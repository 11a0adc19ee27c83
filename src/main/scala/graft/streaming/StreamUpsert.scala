package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SCD-1 upsert: "latest value per key" maintained
  * incrementally — the streaming twin of
  * [[graft.operators.Merge.snapshotUpsert]].
  *
  * An update-mode streaming aggregation holds one state row per key
  * (`max_by` over the unique (us, event_id) order, the same
  * deterministic choice the batch side makes), so state is
  * key-cardinality-bound — never event-bound — and each micro-batch
  * emits only the keys it touched, which is exactly the change-feed a
  * `foreachBatch` MERGE into a lakehouse table consumes.
  */
object StreamUpsert {

  /** Input: streaming (user_id, us, event_id, v_e6); output: the
    * serving row per user. */
  def latestValueStream(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(expr("max_by(v_e6, struct(us, event_id))").as("v_e6"))
}
