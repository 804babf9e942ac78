package graft

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.{PhraseCounts, PhraseLang}

/** Streaming phrase-count state == batch distinctivePhrases after the
  * last micro-batch: the per-phrase (en, other) counts are mergeable
  * integers; the Monroe log-odds surface (informative prior, totals,
  * δ, z, top-k) happens in the stateless finish.
  */
class StreamingDistinctiveSpec extends SparkSpec {

  test("incremental phrase counts over >=8 micro-batches == batch " +
    "distinctivePhrases on the documents table") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = graft.operators.Retrieval.distinctivePhrases(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("log_odds"), r.getAs[Double]("z_score"))).toSeq

    // Pre-shaped instance rows (the stream's contract: extraction is
    // per-document stateless and happens upstream of the state op).
    val inst = graft.operators.Retrieval.rakeCandidates(docs)
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").as("en")), Seq("doc_id"))
      .select(col("phrase"), col("en"))
    val dir = Files.createTempDirectory("graft-phrase-stream").toString
    // Slice per INSTANCE (not per phrase) so repeated phrases span
    // micro-batches and the state op genuinely re-emits updates.
    inst.withColumn("slice",
        pmod(xxhash64(col("phrase"), monotonically_increasing_id()),
          lit(8)))
      .write.partitionBy("slice").mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("phrase STRING, en BOOLEAN")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/slice=*")
      .as[PhraseLang](Encoders.product[PhraseLang])
    val q = StreamingSketch.phraseCountStream(stream)
      .writeStream.format("memory").queryName("phrase_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // Last emitted update per phrase = the finished count state,
    // recovered from the STATE VALUES, not the memory-sink row order
    // (r12 ADVICE: cross-micro-batch row order is an implementation
    // detail): per-phrase (en, other) counts are monotone
    // non-decreasing, so the max pair IS the final state.
    val streamed = spark.table("phrase_stream").collect()
    val counts = streamed.groupBy(_.getString(0)).map {
      case (_, rows) =>
        val r = rows.maxBy(x => (x.getLong(1), x.getLong(2)))
        PhraseCounts(r.getString(0), r.getLong(1), r.getLong(2))
    }.toSeq
    val got = StreamingSketch.distinctiveFromCounts(
        spark.createDataset(counts)(
          Encoders.product[PhraseCounts]).toDF())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("log_odds"), r.getAs[Double]("z_score"))).toSeq
    assert(got == batch, s"\nstreaming: $got\nbatch:     $batch")
    // really incremental: a phrase seen in several slices re-emits
    assert(streamed.length > counts.length)
  }
}
