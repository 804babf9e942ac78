package graft

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.query.Analytics
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{DigitCount, DigitOne}

/** Streaming Benford digit counts == batch benford after the last
  * micro-batch: the 9-cell digit histogram is constant-size
  * mergeable state; shares and χ² happen in the shared stateless
  * finish.
  */
class StreamingBenfordSpec extends SparkSpec {

  private def resultMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      r.getAs[Int]("digit") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("obs_share"),
          r.getAs[Double]("exp_share"), r.getAs[Double]("chi2_term"))
    }.toMap

  test("incremental Benford over >=12 micro-batches == batch on the " +
    "sf0.001 orders") {
    val orders = graft.queries.Tables.orders(spark,
      "/root/testdata/sf0.001")
    val batch = resultMap(Analytics.benford(orders).collect())

    val digits = orders.select(
      substring(expr("CAST(CAST(round(o_totalprice * 100, 0) " +
        "AS BIGINT) AS STRING)"), 1, 1).cast("int").as("digit"))
    val dir = Files.createTempDirectory("graft-benford-stream").toString
    digits.withColumn("slice",
        pmod(xxhash64(col("digit"), monotonically_increasing_id()),
          lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("digit INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[DigitOne](Encoders.product[DigitOne])
    val q = StreamingSketch.benfordStream(stream)
      .writeStream.format("memory").queryName("benford_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("benford_stream").collect().zipWithIndex
    val last = streamed.groupBy(_._1.getInt(0)).map { case (_, rows) =>
      val r = rows.maxBy(_._2)._1
      DigitCount(r.getInt(0), r.getLong(1))
    }.toSeq
    val got = resultMap(StreamingSketch.benfordFromCounts(
        spark.createDataset(last)(Encoders.product[DigitCount]).toDF())
      .collect())
    assert(got == batch, s"streaming != batch: " +
      s"${got.toSet.diff(batch.toSet)} vs ${batch.toSet.diff(got.toSet)}")
    assert(streamed.length > got.size,
      "really incremental: more updates than digits")
  }
}
