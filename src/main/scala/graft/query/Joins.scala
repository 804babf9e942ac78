package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Join-strategy helpers. ADVICE r1: an UNCONDITIONAL broadcast hint on
  * the dimension is right for a 135-row customers table but OOMs the
  * driver if "the dimension" grows fact-like at 100×. Gate the hint on
  * Catalyst's own size estimate vs the session's broadcast threshold;
  * past the gate, no hint — AQE picks the strategy from runtime sizes.
  */
object Joins {

  /** `df` with a broadcast hint ONLY if its estimated size fits the
    * session's autoBroadcastJoinThreshold (default 10 MB). Estimation
    * uses the optimized plan's statistics — the same numbers Catalyst
    * itself plans with.
    */
  def maybeBroadcast(df: DataFrame): DataFrame = {
    // SQLConf parses size strings ("10MB") to bytes; -1 disables.
    val threshold = df.sparkSession.sessionState.conf
      .autoBroadcastJoinThreshold
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && estimated <= threshold) broadcast(df) else df
  }

  /** Fact ⋈ dimension with the gated hint. */
  def dimJoin(fact: DataFrame, dim: DataFrame, cond: Column,
              joinType: String = "inner"): DataFrame =
    fact.join(maybeBroadcast(dim), cond, joinType)
}
