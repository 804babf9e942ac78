package graft

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{UnitPrePost, UnitSpend}

/** Streaming per-unit activity flags == batch propZTest / mcnemar
  * after the last micro-batch (r13 VERDICT #5): ONE flag stream's
  * (pre, post) max-merged integers are the sufficient statistic for
  * BOTH experiment tests; each stateless finish replays the factored
  * batch tail verbatim.
  */
class StreamingExperimentSpec extends SparkSpec {

  test("incremental flag state over >=10 micro-batches == batch " +
    "propZTest AND mcnemar on the orders table") {
    val sf = "/root/testdata/sf0.001"
    val customers = graft.queries.Tables.customer(spark, sf)
    val orders = graft.queries.Tables.orders(spark, sf)
    val batchZ = graft.query.Analytics.propZTest(customers, orders)
      .collect().head.toSeq
    val batchMc = graft.query.Analytics.mcnemar(customers, orders)
      .collect().head.toSeq

    // One row per order (v = 1) + the order-less-unit zero row per
    // customer (the batch left-join contract).
    val rows = orders.select(col("o_custkey").as("k"),
        (to_date(col("o_orderdate"))
          >= lit("1996-01-01").cast("date")).as("post"),
        lit(1L).as("v"))
      .unionByName(customers.select(col("c_custkey").as("k"),
        lit(true).as("post"), lit(0L).as("v")))
    val dir = Files.createTempDirectory("graft-flag-stream").toString
    rows.withColumn("slice",
        pmod(xxhash64(col("k"), col("post")), lit(10)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("k BIGINT, post BOOLEAN, v BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[UnitSpend](Encoders.product[UnitSpend])
    val q = StreamingSketch.flagStream(stream)
      .writeStream.format("memory").queryName("flag_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // Last update per key from the STATE VALUES (the r12 ADVICE
    // discipline): 0/1 flags only ever flip upward, so the max
    // (pre, post) is the final state.
    val streamed = spark.table("flag_stream").collect()
    val units = streamed.groupBy(_.getLong(0)).map {
      case (_, rs) =>
        val r = rs.maxBy(x => (x.getLong(1), x.getLong(2)))
        UnitPrePost(r.getLong(0), r.getLong(1), r.getLong(2))
    }.toSeq
    val unitDf = spark.createDataset(units)(
      Encoders.product[UnitPrePost]).toDF()
    val gotZ = StreamingSketch.propZTestFromFlags(unitDf)
      .collect().head.toSeq
    val gotMc = StreamingSketch.mcnemarFromFlags(unitDf)
      .collect().head.toSeq
    assert(gotZ == batchZ, s"\nstreaming: $gotZ\nbatch:     $batchZ")
    assert(gotMc == batchMc, s"\nstreaming: $gotMc\nbatch:     $batchMc")
    assert(streamed.length > units.length, "must re-emit updates")
  }
}
