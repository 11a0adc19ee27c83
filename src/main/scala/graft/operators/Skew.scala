package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution has hot
  * keys (the 100 TB failure mode AQE's skew-join split cannot always
  * fix — e.g. a single key bigger than one executor's memory).
  *
  * `saltedJoin` spreads every large-side row over `salt` sub-keys via
  * a deterministic row-content hash and replicates the small side once
  * per sub-key, so a hot key's rows land on `salt` reducers instead of
  * one. Cost model: small side shuffles ×salt, large side unchanged —
  * the standard trade when the small side is dimension-sized. Result
  * is row-identical to the plain equi-join (verified in
  * OperatorsSpec).
  */
object Skew {

  /** Inner equi-join `large.key = small.key`, salted.
    *
    * The salt is `pmod(hash(all large columns, partition id), salt)` —
    * deterministic (re-runnable, no `rand()` nondeterminism under task
    * retry, which loses rows in shuffle-replay: a retried task re-reads
    * the same input split, so both terms replay identically) while
    * still spreading rows of one hot key. Mixing in
    * `spark_partition_id()` matters for dedup-shaped workloads where a
    * hot key's rows are LITERALLY identical: a pure content hash would
    * send them all to one salt bucket, re-creating the skew the salt
    * exists to break. Residual: identical rows inside one input
    * partition still share a bucket — bounded by the hot key's share
    * of a single split, not its global count. */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, salt: Int): DataFrame = {
    val saltedL = large.withColumn("__salt",
      pmod(hash(large.columns.map(col) :+ spark_partition_id(): _*),
        lit(salt)))
    val expandedS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedL.join(expandedS,
        saltedL(largeKey) === expandedS(smallKey) &&
          saltedL("__salt") === expandedS("__salt"))
      .drop("__salt")
  }
}
