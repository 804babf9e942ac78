package graft

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.DigestDoc

/** Streaming exact-digest media dedup == batch mediaDedup after the
  * last micro-batch: the continuous-ingest twin of the q_media_dedup
  * corpus (injected exact copies every 40th doc).
  */
class StreamingMediaDedupSpec extends SparkSpec {

  test("incremental digest dedup over >=12 micro-batches == batch " +
    "mediaDedup") {
    val docs = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))
    val dups = docs.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
        col("source"))
    val media = Multimodal.mediaTable(docs.unionByName(dups))

    val batch = Multimodal.mediaDedup(media).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("n"),
          r.getAs[Long]("total_bytes"))).toMap

    // The stream carries digests, never payloads.
    val digests = media.select(
      sha2(hex(col("payload")), 256).as("sha"), col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"))
    val dir = Files.createTempDirectory("graft-media-dedup-stream")
      .toString
    digests.withColumn("slice", pmod(col("doc_id"), lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("sha STRING, doc_id BIGINT, n_bytes BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[DigestDoc](Encoders.product[DigestDoc])
    val q = StreamingSketch.mediaDedupStream(stream)
      .writeStream.format("memory").queryName("media_dedup_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("media_dedup_stream").collect()
      .zipWithIndex
    val last = streamed.groupBy(_._1.getString(0)).map {
      case (sha, rows) =>
        val r = rows.maxBy(_._2)._1
        sha -> (r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val dupGroups = last.filter(_._2._2 > 1)
    assert(dupGroups == batch,
      s"streaming ${dupGroups.size} groups vs batch ${batch.size}")
    // really incremental: a duplicate arriving in a later slice was
    // re-emitted (updates outnumber distinct digests)
    assert(streamed.length > last.size)
  }
}
