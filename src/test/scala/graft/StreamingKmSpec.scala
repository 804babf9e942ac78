package graft

import java.nio.file.Files
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import graft.query.Analytics
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{DurCell, KmHist, PriorityDur}

/** Streaming KM histogram == batch kaplanMeier after the last
  * micro-batch: the per-priority (t → (d, c)) integer histogram is
  * the mergeable sufficient statistic; the at-risk ranking and the
  * fixed-point survival product happen in the shared stateless
  * finish.
  */
class StreamingKmSpec extends SparkSpec {

  private def lastHists(table: String): Seq[KmHist] = {
    val streamed = spark.table(table).collect().zipWithIndex
    streamed.groupBy(_._1.getString(0)).map { case (_, rows) =>
      val r = rows.maxBy(_._2)._1
      KmHist(r.getString(0),
        r.getSeq[Row](1).map(d =>
          DurCell(d.getLong(0), d.getLong(1), d.getLong(2))))
    }.toSeq
  }

  private def resultMap(rows: Array[Row]) = rows.map { r =>
    (r.getString(0), r.getAs[Long]("t_days")) ->
      (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_censored"), r.getAs[Double]("survival"))
  }.toMap

  test("incremental KM over >=12 micro-batches == batch kaplanMeier " +
    "on the sf0.001 orders") {
    val orders = graft.queries.Tables.orders(spark,
      "/root/testdata/sf0.001")
    val li = graft.queries.Tables.lineitem(spark,
      "/root/testdata/sf0.001")
    val batch = resultMap(Analytics.kaplanMeier(orders, li).collect())

    val base = Analytics.kmDurations(orders, li)
      .select(col("priority").as("g"), col("t"),
        col("ev").cast("int").as("ev"))
    val dir = Files.createTempDirectory("graft-km-stream").toString
    base.withColumn("slice",
        pmod(xxhash64(col("g"), col("t"), col("ev")), lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("g STRING, t BIGINT, ev INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[PriorityDur](Encoders.product[PriorityDur])
    val q = StreamingSketch.kmStream(stream)
      .writeStream.format("memory").queryName("km_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val streamedN = spark.table("km_stream").count()
    val got = resultMap(StreamingSketch.kmFromHistograms(
        spark.createDataset(lastHists("km_stream"))(
          Encoders.product[KmHist]).toDF())
      .collect())
    assert(got == batch, s"streaming != batch: " +
      s"${got.toSet.diff(batch.toSet).take(3)} vs " +
      s"${batch.toSet.diff(got.toSet).take(3)}")
    assert(streamedN > got.keySet.map(_._1).size,
      "really incremental: more updates than priorities")

    // The SAME persisted histogram feeds the Nelson-Aalen readout:
    // one sufficient statistic, two estimators.
    def naMap(rows: Array[Row]) = rows.map { r =>
      (r.getString(0), r.getAs[Long]("t_days")) ->
        (r.getAs[Long]("n_risk"), r.getAs[Double]("cum_hazard"),
          r.getAs[Double]("fh_survival"))
    }.toMap
    val naBatch = naMap(Analytics.nelsonAalen(orders, li).collect())
    val naGot = naMap(StreamingSketch.naFromHistograms(
        spark.createDataset(lastHists("km_stream"))(
          Encoders.product[KmHist]).toDF())
      .collect())
    assert(naGot == naBatch, "NA readout: streaming != batch")
  }
}
