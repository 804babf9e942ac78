package graft

import java.nio.file.Files
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import graft.query.Analytics
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{CustHist, CustMonthCents,
  MonthCents}

/** Streaming per-customer month histogram + the batch LTV finish ==
  * batch ltvCohorts after the last micro-batch. The interesting case
  * is baked into the hash slicing: a customer's EARLIEST order often
  * arrives in a late micro-batch, and the histogram state re-ages the
  * cohort exactly — a running "first seen month" could not.
  */
class StreamingLtvSpec extends SparkSpec {

  private def lastHists(table: String): Seq[CustHist] = {
    val streamed = spark.table(table).collect().zipWithIndex
    streamed.groupBy(_._1.getLong(0)).map { case (_, rows) =>
      val r = rows.maxBy(_._2)._1
      CustHist(r.getLong(0),
        r.getSeq[Row](1).map(m => MonthCents(m.getInt(0), m.getLong(1))))
    }.toSeq
  }

  private def resultMap(rows: Array[Row]) = rows.map { r =>
    (r.getAs[Long]("cohort_month"), r.getAs[Long]("age_months")) ->
      (r.getAs[Long]("n_customers"), r.getAs[Double]("avg_ltv_dollars"))
  }.toMap

  test("incremental LTV over >=12 micro-batches == batch ltvCohorts " +
    "on the sf0.001 orders") {
    val orders = graft.queries.Tables.orders(spark,
      "/root/testdata/sf0.001")
    val batch = resultMap(Analytics.ltvCohorts(orders).collect())

    val base = orders.select(col("o_custkey").as("cust"),
      (year(to_date(col("o_orderdate"))) * 12
        + month(to_date(col("o_orderdate"))) - 1).cast("int").as("m"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val dir = Files.createTempDirectory("graft-ltv-stream").toString
    base.withColumn("slice",
        pmod(xxhash64(col("cust"), col("m"), col("cents")), lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("cust BIGINT, m INT, cents BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[CustMonthCents](Encoders.product[CustMonthCents])
    val q = StreamingSketch.ltvStream(stream)
      .writeStream.format("memory").queryName("ltv_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val got = resultMap(StreamingSketch.ltvFromHistograms(
        spark.createDataset(lastHists("ltv_stream"))(
          Encoders.product[CustHist]).toDF())
      .collect())
    assert(got == batch, s"streaming != batch: " +
      s"${got.toSet.diff(batch.toSet).take(3)} vs " +
      s"${batch.toSet.diff(got.toSet).take(3)}")
    assert(spark.table("ltv_stream").count() > got.size,
      "really incremental: more updates than output rows")
  }
}
