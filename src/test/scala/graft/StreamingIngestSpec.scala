package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.CsvSource
import graft.streaming.StreamingIngest

/** Streaming dedup (bounded state) and the incremental CSV-stream ingest
  * with per-batch MERGE.
  */
class StreamingIngestSpec extends SparkSpec {

  test("stream dedup: duplicate keys across micro-batches collapse once") {
    val typed = graft.streaming.Events.typed(
      graft.queries.Tables.events(spark, "/root/testdata/sf0.001"))
      .limit(300).cache()
    val dir = Files.createTempDirectory("graft-dedup-stream").toString
    // two slices CONTAINING THE SAME ROWS → every event arrives twice
    typed.write.mode("overwrite").parquet(s"$dir/slice=0")
    typed.write.mode("overwrite").parquet(s"$dir/slice=1")

    val stream = spark.readStream.schema(typed.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/slice=*")
    val q = StreamingIngest.dedupStream(stream, Seq("event_id"), "10 hours")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("dedup_stream")
    assert(out.count() == typed.count()) // not 2×
    assert(out.select("event_id").distinct().count() == typed.count())
  }

  test("CSV stream ingest: per-batch merge upserts into the fact table") {
    val in = Files.createTempDirectory("graft-csv-in").toString
    val fact = Files.createTempDirectory("graft-csv-fact").toString + "/fact"
    val ckpt = Files.createTempDirectory("graft-csv-ckpt").toString
    val header = CsvSource.Columns.mkString(",")

    def row(name: String, inv: String, bill: String) =
      s"$name,$inv,01/02/2024,PO-1,$bill,0,Open,USD,Bob,555,b@x.com,Net 30,"

    Files.writeString(Paths.get(s"$in/batch1.csv"),
      header + "\n" + row("Acme", "I1", "100") + "\n" + row("Acme", "I2", "200") + "\n")
    val q = StreamingIngest.ingestStream(spark, in, fact, ckpt)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(fact).count() == 2)

      // second file: update I2, insert I3
      Files.writeString(Paths.get(s"$in/batch2.csv"),
        header + "\n" + row("Acme", "I2", "250") + "\n" + row("Zeta", "I3", "300") + "\n")
      q.processAllAvailable()
      val out = spark.read.parquet(fact)
        .select(col("invoice_number"), col("bill_total").cast("string"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out == Map("I1" -> "100.00", "I2" -> "250.00", "I3" -> "300.00"))
    } finally q.stop()
  }
}
