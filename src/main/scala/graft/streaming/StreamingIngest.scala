package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ingest.{Load, Parse}
import graft.sources.CsvSource

/** Streaming forms of the pipeline's stateful pieces.
  *
  * - `dedupStream`: exact dedup on a stream with state bounded by the
  *   watermark horizon (`dropDuplicatesWithinWatermark`) — the streaming
  *   twin of the batch hash-groupBy dedup. State per key expires once
  *   the watermark passes, so memory is bounded by the horizon, not the
  *   stream's lifetime.
  *
  * - `ingestStream`: the incremental form of IngestJob — a CSV file
  *   stream parsed with the SAME Parse expressions, merged into the fact
  *   table per micro-batch via foreachBatch + the S5 MERGE emulation.
  *   Idempotency carries over: replaying a batch converges to the same
  *   state (checkpointing makes replays the failure mode to design for).
  */
object StreamingIngest {

  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  def ingestStream(spark: SparkSession, inDir: String, factPath: String,
                   checkpoint: String): StreamingQuery =
    spark.readStream
      .schema(CsvSource.arRawSchema)
      .option("header", "true")
      .csv(inDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (raw: DataFrame, _: Long) =>
        // row_id + parse happen HERE: inside foreachBatch the micro-batch
        // is a plain DataFrame (monotonically_increasing_id is not
        // allowed on streaming frames), and the id orders within a batch.
        val batch = Parse.parsed(
          raw.withColumn("row_id", monotonically_increasing_id()))
        if (new java.io.File(factPath).exists())
          Load.mergeInto(spark, factPath, batch, "invoice_number")
        else batch.write.mode("overwrite").parquet(factPath)
      }
      .start()
}
