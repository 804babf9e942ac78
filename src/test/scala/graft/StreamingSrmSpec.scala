package graft

import java.nio.file.Files
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import graft.query.Analytics
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.UserSeen

/** Streaming first-sight dedup + the batch SRM finish == batch
  * srmCheck after the last micro-batch: DISTINCT units are the one
  * aggregate a histogram can't carry, so the per-key seen flag is the
  * persisted sufficient statistic and everything else (arm lottery,
  * chi-square) replays the batch operator verbatim.
  */
class StreamingSrmSpec extends SparkSpec {

  private def resultMap(rows: Array[Row]) = rows.map { r =>
    r.getAs[Long]("arm") -> (r.getAs[Long]("n_obs"),
      r.getAs[Double]("expected"),
      Option(r.getAs[java.lang.Double]("chi2")).map(_.toDouble),
      Option(r.getAs[java.lang.Boolean]("alarm")).map(_.booleanValue))
  }.toMap

  test("incremental first-sight SRM over >=12 micro-batches == " +
    "batch srmCheck on the sf0.001 events") {
    val events = graft.queries.Tables.events(spark,
      "/root/testdata/sf0.001")
    val batch = resultMap(Analytics.srmCheck(
      Analytics.srmAssignments(events), "arm", Seq(9, 1)).collect())

    val base = events.select(col("user_id"))
    val dir = Files.createTempDirectory("graft-srm-stream").toString
    base.withColumn("slice", pmod(xxhash64(col("user_id")), lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("user_id BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[UserSeen](Encoders.product[UserSeen])
    val q = StreamingSketch.firstSightStream(stream)
      .writeStream.format("memory").queryName("srm_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val sighted = spark.table("srm_stream")
    val nDistinct = events.select(col("user_id")).distinct().count()
    assert(sighted.count() == nDistinct,
      "each user emitted exactly once across all micro-batches")
    assert(events.count() > nDistinct,
      "the replay really contains repeat users")

    val got = resultMap(Analytics.srmCheck(
      sighted.select(col("user_id"),
        Analytics.srmArm(col("user_id"), Seq(9, 1)).as("arm")),
      "arm", Seq(9, 1)).collect())
    assert(got == batch, s"streaming != batch: $got vs $batch")
  }
}
