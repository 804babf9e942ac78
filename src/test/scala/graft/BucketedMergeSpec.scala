package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ingest.Load

/** The bucketed-fact merge layout: the stored side of the anti-join must
  * read pre-partitioned (zero exchanges); only the incoming batch
  * shuffles.
  */
class BucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  test("merge against a bucketed table shuffles only the incoming side") {
    val existing = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    val incoming = (990L to 1010L).map(i => (i, s"new$i")).toDF("k", "v")
    Load.writeBucketed(existing, "bucketed_fact", "k", 8)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Load.merge(spark.table("bucketed_fact"), incoming, "k")
      val exchanges = merged.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // unbucketed-vs-unbucketed would need 2; the stored side needs none
      assert(exchanges.length == 1)

      val out = merged.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.size == 1010)
      assert(out(5L) == "v5" && out(995L) == "new995" && out(1005L) == "new1005")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bucketed_fact")
    }
  }

  test("mergeIntoBucketed round-trips the table in the bucketed layout") {
    val existing = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val incoming = Seq((50L, "updated"), (101L, "inserted")).toDF("k", "v")
    Load.writeBucketed(existing, "bucketed_rt", "k", 4)
    try {
      Load.mergeIntoBucketed(spark, "bucketed_rt", incoming, "k", 4)
      val out = spark.table("bucketed_rt").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.size == 101)
      assert(out(50L) == "updated" && out(101L) == "inserted" && out(1L) == "v1")
    } finally spark.sql("DROP TABLE IF EXISTS bucketed_rt")
  }
}
