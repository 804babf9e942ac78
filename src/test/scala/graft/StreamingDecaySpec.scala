package graft

import java.nio.file.Files
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import graft.query.Analytics
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{DayCount, DecayHist, GroupDay}

/** Streaming decay histogram == batch decayCounts after the last
  * micro-batch (VERDICT r9 #4): the (total, day-histogram) state is
  * mergeable even though the decayed sum itself is not — the global-
  * ref weighting happens in the stateless finish.
  */
class StreamingDecaySpec extends SparkSpec {

  private def lastHists(table: String): Seq[DecayHist] = {
    val streamed = spark.table(table).collect().zipWithIndex
    streamed.groupBy(_._1.getString(0)).map { case (_, rows) =>
      val r = rows.maxBy(_._2)._1
      DecayHist(r.getString(0), r.getLong(1), r.getInt(2),
        r.getSeq[Row](3).map(d => DayCount(d.getInt(0), d.getLong(1))))
    }.toSeq
  }

  test("incremental decay over >=12 micro-batches == batch " +
    "decayCounts on the events table") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = Analytics.decayCounts(events).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_count")))
      .toMap

    val gd = events.select(col("event_type").as("g"),
      datediff(col("ts").cast("date"), lit("1970-01-01"))
        .cast("int").as("day"))
    val dir = Files.createTempDirectory("graft-decay-stream").toString
    gd.withColumn("slice",
        pmod(xxhash64(col("g"), col("day")), lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("g STRING, day INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[GroupDay](Encoders.product[GroupDay])
    val q = StreamingSketch.decayStream(stream)
      .writeStream.format("memory").queryName("decay_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val streamedN = spark.table("decay_stream").count()
    val hists = lastHists("decay_stream")
    val got = StreamingSketch.decayFromHistograms(
        spark.createDataset(hists)(Encoders.product[DecayHist]).toDF())
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_count")))
      .toMap
    assert(got == batch, s"streaming $got vs batch $batch")
    // really incremental: more emitted updates than groups
    assert(streamedN > batch.size)
  }

  test("state prunes weight-zero days (bounded histogram) without " +
    "losing the event total or the weighted sum") {
    import spark.implicits._
    // One group spanning ~24 half-lives: the old day decays to weight
    // 0 mid-stream and must be pruned from state, while n_events and
    // the final decayed sum still match the batch operator.
    val day0 = 19000
    val rows = Seq(
      ("a", day0),                  // will fall beyond 21 half-lives
      ("a", day0 + 300),            // 10 half-lives before the end
      ("a", day0 + 30 * 24),        // the final reference day
      ("b", day0 + 30 * 24 - 15))   // same bucket as ref: weight 1
    val dir = Files.createTempDirectory("graft-decay-prune").toString
    rows.zipWithIndex.toDF("r", "slice")
      .select(col("r._1").as("g"), col("r._2").as("day"), col("slice"))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("g STRING, day INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[GroupDay](Encoders.product[GroupDay])
    val q = StreamingSketch.decayStream(stream)
      .writeStream.format("memory").queryName("decay_prune")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val hists = lastHists("decay_prune")
    val a = hists.find(_.g == "a").get
    assert(a.n_events == 3L, "pruning keeps the total")
    assert(a.days.map(_.day).toSet == Set(day0 + 300, day0 + 30 * 24),
      "day0 pruned from state")

    val got = StreamingSketch.decayFromHistograms(
        spark.createDataset(hists)(Encoders.product[DecayHist]).toDF())
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_count")))
      .toMap
    // batch twin over the same rows (epoch-day -> date arithmetic)
    val batch = Analytics.decayCounts(
        rows.toDF("event_type", "day").select(col("event_type"),
          expr("cast(date_add('1970-01-01', day) as timestamp)")
            .as("ts")))
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_count")))
      .toMap
    assert(got == batch, s"streaming $got vs batch $batch")
  }
}
