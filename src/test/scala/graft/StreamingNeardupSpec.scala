package graft

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{BandSig, BucketState, SigDoc}

/** Streaming banded signature buckets + stateless finish == batch
  * mediaNearDupPairs after the last micro-batch: the perceptual
  * near-dup twin over a continuous media ingest (the q_media_neardup
  * perturbed corpus).
  */
class StreamingNeardupSpec extends SparkSpec {

  test("incremental banded buckets over >=12 micro-batches == batch " +
    "mediaNearDupPairs") {
    val docs = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))
    val pert = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(lit("XYZ"), expr("substring(text, 4)")).as("text"),
        col("source"))
    // localCheckpoint: truncates the union lineage (Spark's Union
    // constraint rewrite trips over the shared docs ancestry when the
    // same frame feeds both the batch compare and the re-derived
    // band stream in one test).
    val media = Multimodal.mediaTable(docs.unionByName(pert))
      .localCheckpoint()

    val batch = Multimodal.mediaNearDupPairs(media).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap

    // The stream carries band words + signature words, never payloads.
    val bands = Multimodal.dhashSignatures(media)
      .select(col("doc_id"), expr(
        "transform(sequence(0, 3), b -> " +
          "cast(conv(substring(sig, b * 16 + 1, 16), 2, 10) as bigint))")
        .as("w"))
      .select(col("doc_id"), col("w"), posexplode(col("w")))
      .select(col("pos").as("band"), col("col").as("bv"),
        col("doc_id"), col("w")(0).as("w0"), col("w")(1).as("w1"),
        col("w")(2).as("w2"), col("w")(3).as("w3"))
    val dir = Files.createTempDirectory("graft-neardup-stream").toString
    bands.withColumn("slice", pmod(col("doc_id"), lit(12)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("band INT, bv BIGINT, doc_id BIGINT, " +
        "w0 BIGINT, w1 BIGINT, w2 BIGINT, w3 BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[BandSig](Encoders.product[BandSig])
    val q = StreamingSketch.neardupStream(stream)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // last state per bucket -> stateless finish
    val streamed = spark.table("neardup_stream").collect().zipWithIndex
    val last = streamed.groupBy(r =>
        (r._1.getInt(0), r._1.getLong(1)))
      .map { case ((band, bv), rows) =>
        val r = rows.maxBy(_._2)._1
        BucketState(band, bv, r.getLong(2),
          r.getSeq[org.apache.spark.sql.Row](3).map(d =>
            SigDoc(d.getLong(0), d.getLong(1), d.getLong(2),
              d.getLong(3), d.getLong(4))))
      }.toSeq
    val got = StreamingSketch.neardupFromBuckets(
        spark.createDataset(last)(Encoders.product[BucketState]).toDF())
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(got == batch,
      s"streaming ${got.size} pairs vs batch ${batch.size}")
    assert(streamed.length > last.size, "really incremental")
  }
}
