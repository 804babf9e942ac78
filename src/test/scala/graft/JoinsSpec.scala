package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import graft.query.Joins

/** Size-gated broadcast: small dims hint, oversized dims fall back to
  * whatever AQE picks.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def hasBroadcastHashJoin(p: SparkPlan): Boolean =
    p.collect { case b: BroadcastHashJoinExec => b }.nonEmpty

  test("tiny dim gets the broadcast hint; threshold 1 byte suppresses it") {
    val fact = (1L to 10000L).map(i => (i, i % 100)).toDF("fk", "key")
    val dim = (0L to 99L).map(i => (i, s"d$i")).toDF("id", "name")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val hinted = Joins.dimJoin(fact, dim, col("key") === col("id"))
      assert(hasBroadcastHashJoin(hinted.queryExecution.executedPlan))

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val gated = Joins.dimJoin(fact, dim, col("key") === col("id"))
      assert(!hasBroadcastHashJoin(gated.queryExecution.executedPlan))
      assert(gated.count() == hinted.count()) // strategy, not semantics
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
