package graft

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{UnitPrePost, UnitSpend}

/** Streaming per-unit pre/post state == batch diffInDiff after the
  * last micro-batch: the (pre, post) sums are mergeable integers; the
  * hash arms and the Welch-on-changes surface happen in the stateless
  * finish.
  */
class StreamingDidSpec extends SparkSpec {

  test("incremental DiD over >=10 micro-batches == batch diffInDiff " +
    "on the orders table") {
    val sf = "/root/testdata/sf0.001"
    val customers = graft.queries.Tables.customer(spark, sf)
    val orders = graft.queries.Tables.orders(spark, sf)
    val batch = graft.query.Analytics.diffInDiff(customers, orders)
      .collect().head.toSeq

    // Per-order rows + a zero row per customer (the order-less-unit
    // contract, mirroring the batch left join).
    val rows = orders.select(col("o_custkey").as("k"),
        (to_date(col("o_orderdate"))
          >= lit("1996-01-01").cast("date")).as("post"),
        expr("CAST(round(o_totalprice, 0) AS BIGINT)").as("v"))
      .unionByName(customers.select(col("c_custkey").as("k"),
        lit(true).as("post"), lit(0L).as("v")))
    val dir = Files.createTempDirectory("graft-did-stream").toString
    rows.withColumn("slice",
        pmod(xxhash64(col("k"), col("v")), lit(10)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("k BIGINT, post BOOLEAN, v BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[UnitSpend](Encoders.product[UnitSpend])
    val q = StreamingSketch.didStream(stream)
      .writeStream.format("memory").queryName("did_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // Last update per key, recovered from the STATE VALUES, not the
    // memory-sink row order (r12 ADVICE: cross-micro-batch row order
    // is an implementation detail): per-unit pre/post are sums of
    // non-negative spend, so they are monotone non-decreasing across
    // updates — the max (pre, post) IS the final state, and any tie
    // is between identical rows.
    val streamed = spark.table("did_stream").collect()
    val units = streamed.groupBy(_.getLong(0)).map {
      case (_, rs) =>
        val r = rs.maxBy(x => (x.getLong(1), x.getLong(2)))
        UnitPrePost(r.getLong(0), r.getLong(1), r.getLong(2))
    }.toSeq
    val got = StreamingSketch.didFromUnits(
        spark.createDataset(units)(
          Encoders.product[UnitPrePost]).toDF())
      .collect().head.toSeq
    assert(got == batch, s"\nstreaming: $got\nbatch:     $batch")
    assert(streamed.length > units.length, "must re-emit updates")
  }
}
