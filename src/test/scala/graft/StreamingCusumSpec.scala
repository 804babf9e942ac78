package graft

import java.nio.file.Files
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import graft.query.Analytics
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{CusumHist, DayCents, TypeDayCents}

/** Streaming CUSUM histogram == batch cusumDrift after the last
  * micro-batch: the per-type (day → cents) histogram is mergeable
  * integer state even though the CUSUM statistic itself re-scales
  * with every new day — the reference mean, scaled prefix, running
  * min and alarm all happen in the stateless finish.
  */
class StreamingCusumSpec extends SparkSpec {

  private def lastHists(table: String): Seq[CusumHist] = {
    // Last update per type, recovered from the STATE VALUES, not the
    // memory-sink row order (r12 ADVICE: cross-micro-batch order is an
    // implementation detail): day counts and cents totals only grow
    // (positive cents), so the max (n_days, Σcents) IS the final
    // histogram.
    val streamed = spark.table(table).collect()
    streamed.groupBy(_.getString(0)).map { case (_, rows) =>
      val r = rows.maxBy(x =>
        (x.getSeq[Row](1).length, x.getSeq[Row](1).map(_.getLong(1)).sum))
      CusumHist(r.getString(0),
        r.getSeq[Row](1).map(d => DayCents(d.getInt(0), d.getLong(1))))
    }.toSeq
  }

  private def resultMap(rows: Array[Row]) = rows.map { r =>
    (r.getString(0), r.getAs[java.sql.Date]("day").toString) ->
      (r.getAs[Long]("day_total_cents"),
        r.getAs[Long]("cusum_scaled"), r.getAs[Boolean]("alarm"))
  }.toMap

  test("incremental CUSUM over >=12 micro-batches == batch " +
    "cusumDrift on the events table") {
    val events = graft.queries.Tables.events(spark,
      "/root/testdata/sf0.001")
    val batch = resultMap(Analytics.cusumDrift(events).collect())

    val gd = events.select(col("event_type").as("g"),
      datediff(col("ts").cast("date"), lit("1970-01-01"))
        .cast("int").as("day"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val dir = Files.createTempDirectory("graft-cusum-stream").toString
    gd.withColumn("slice",
        pmod(xxhash64(col("g"), col("day"), col("cents")), lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("g STRING, day INT, cents BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[TypeDayCents](Encoders.product[TypeDayCents])
    val q = StreamingSketch.cusumStream(stream)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val streamedN = spark.table("cusum_stream").count()
    val got = resultMap(StreamingSketch.cusumFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(got == batch, s"streaming != batch: " +
      s"${got.toSet.diff(batch.toSet).take(3)} vs " +
      s"${batch.toSet.diff(got.toSet).take(3)}")
    // really incremental: more emitted updates than groups
    assert(streamedN > got.keySet.map(_._1).size)

    // The SAME persisted day histogram feeds the seasonality readout
    // — third estimator off one sufficient statistic.
    def seaMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getString(0), r.getAs[Long]("dow")) ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("dow_index"),
          Option(r.getAs[java.lang.Double]("var_share"))
            .map(_.toDouble))
    }.toMap
    val seaBatch = seaMap(Analytics.seasonality(events).collect())
    val seaGot = seaMap(StreamingSketch.seasonalityFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(seaGot == seaBatch, "seasonality readout: streaming != batch")

    // ...and the sign-flip randomization test — fourth estimator.
    def sfRow(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[Long]("n_days"), r.getAs[Long]("obs_diff_cents"),
        r.getAs[Long]("n_extreme"), r.getAs[Double]("p_value"))
    }.toSeq
    val sfBatch = sfRow(Analytics.signFlipTest(events).collect())
    val sfGot = sfRow(StreamingSketch.signFlipFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(sfGot == sfBatch, s"sign-flip readout: $sfGot vs $sfBatch")

    // ...and the Mann-Kendall trend test — fifth estimator.
    def mkMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getString(0) -> (r.getAs[Long]("n_days"),
        r.getAs[Long]("s_stat"), r.getAs[Double]("var_s"),
        Option(r.getAs[java.lang.Double]("z")).map(_.toDouble),
        r.getAs[Boolean]("significant"))
    }.toMap
    val mkBatch = mkMap(Analytics.mannKendall(events).collect())
    val mkGot = mkMap(StreamingSketch.mannKendallFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(mkGot == mkBatch, s"MK readout: $mkGot vs $mkBatch")

    // ...and the Kendall τ-b concordance — sixth estimator
    // (VERDICT r12 #3: the joined daily series is a pure function of
    // the same persisted per-type day histograms).
    def ktRow(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"),
        Option(r.getAs[java.lang.Double]("tau_b")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("z")).map(_.toDouble),
        r.getAs[Boolean]("significant"))
    }.toSeq
    val ktBatch = ktRow(Analytics.kendallTau(events).collect())
    val ktGot = ktRow(StreamingSketch.kendallTauFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(ktGot == ktBatch, s"tau-b readout: $ktGot vs $ktBatch")

    // ...and lag-1 Granger, both directions — seventh estimator.
    def grMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getString(0) -> (r.getAs[Long]("n_obs"),
        Option(r.getAs[java.lang.Double]("f_stat")).map(_.toDouble),
        r.getAs[Boolean]("significant"))
    }.toMap
    val grBatch = grMap(Analytics.granger(events).collect())
    val grGot = grMap(StreamingSketch.grangerFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(grGot == grBatch, s"granger readout: $grGot vs $grBatch")

    // ...Theil-Sen robust slope — eighth estimator.
    def tsMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getString(0) -> (r.getAs[Long]("n_pairs"),
        r.getAs[Double]("sen_slope"))
    }.toMap
    val tsBatch = tsMap(Analytics.theilSen(events).collect())
    val tsGot = tsMap(StreamingSketch.theilSenFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(tsGot == tsBatch, s"theil-sen readout: $tsGot vs $tsBatch")

    // ...lag-k autocorrelation — ninth estimator.
    def acMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getString(0), r.getAs[Int]("lag")) ->
        (r.getAs[Long]("n_terms"),
          Option(r.getAs[java.lang.Double]("acf")).map(_.toDouble))
    }.toMap
    val acBatch = acMap(Analytics.acf(events).collect())
    val acGot = acMap(StreamingSketch.acfFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(acGot == acBatch, s"acf readout: $acGot vs $acBatch")

    // ...Pettitt changepoint — tenth estimator off the same state.
    def ptMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getString(0) -> (r.getAs[Long]("n_days"),
        r.getAs[Long]("k_stat"),
        Option(r.getAs[java.sql.Date]("cp_day")).map(_.toString),
        r.getAs[Double]("p_approx"), r.getAs[Boolean]("significant"))
    }.toMap
    val ptBatch = ptMap(Analytics.pettitt(events).collect())
    val ptGot = ptMap(StreamingSketch.pettittFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(ptGot == ptBatch, s"pettitt readout: $ptGot vs $ptBatch")

    // ...SES and Holt forecasting readouts — estimators 11 and 12.
    def seqMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val sesBatch = seqMap(Analytics.sesForecast(events).collect())
    val sesGot = seqMap(StreamingSketch.sesFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(sesGot == sesBatch, s"ses readout: $sesGot vs $sesBatch")
    val hoBatch = seqMap(Analytics.holtForecast(events).collect())
    val hoGot = seqMap(StreamingSketch.holtFromHistograms(
        spark.createDataset(lastHists("cusum_stream"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    assert(hoGot == hoBatch, s"holt readout: $hoGot vs $hoBatch")
  }

  test("a level shift arriving in later micro-batches flips the " +
    "alarm exactly as the batch closed form does") {
    import spark.implicits._
    // 10 quiet days at 100 cents, then 6 loud days at 5000: the batch
    // alarm fires only in the loud tail; streamed state must agree.
    val rows = (0 until 10).map(d => ("a", 19000 + d, 100L)) ++
      (10 until 16).map(d => ("a", 19000 + d, 5000L))
    val dir = Files.createTempDirectory("graft-cusum-shift").toString
    rows.zipWithIndex.toDF("r", "slice")
      .select(col("r._1").as("g"), col("r._2").as("day"),
        col("r._3").as("cents"), col("slice"))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("g STRING, day INT, cents BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[TypeDayCents](Encoders.product[TypeDayCents])
    val q = StreamingSketch.cusumStream(stream)
      .writeStream.format("memory").queryName("cusum_shift")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val got = resultMap(StreamingSketch.cusumFromHistograms(
        spark.createDataset(lastHists("cusum_shift"))(
          Encoders.product[CusumHist]).toDF())
      .collect())
    val batch = resultMap(Analytics.cusumDrift(
        rows.toDF("event_type", "day", "cents").select(
          col("event_type"),
          expr("cast(date_add('1970-01-01', day) as timestamp)")
            .as("ts"),
          (col("cents").cast("double") / 100.0).as("value")))
      .collect())
    assert(got == batch, s"streaming $got vs batch $batch")
    // Loud days start at epoch day 19010 = 2022-01-18; the closed
    // form first crosses 2·Σx at t = 12 (2022-01-19).
    val alarms = got.collect { case ((_, d), (_, _, true)) => d }
    assert(alarms.nonEmpty && alarms.forall(_ >= "2022-01-18"),
      s"alarm only in the loud tail: $alarms")
  }
}
