package graft.queries

import org.apache.spark.sql.SparkSession
import graft.streaming.Events

/** The SQL surface: register the engine's logical tables as temp views so
  * `spark.sql(...)` text queries run against the same semantics the
  * DataFrame API exposes (same casts, same derived columns).
  */
object Views {
  def register(s: SparkSession, dir: String): Unit = {
    Tables.invoices(s, dir).createOrReplaceTempView("invoices")
    Tables.customers(s, dir).createOrReplaceTempView("customers")
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
    Events.typed(Tables.events(s, dir)).createOrReplaceTempView("events_typed")
    // The media table (synthesized format-real PNG payloads over the
    // documents corpus) — SQL text can slice the BINARY column
    // directly (q_sql_media_meta).
    graft.operators.Multimodal.mediaTable(Tables.documents(s, dir))
      .createOrReplaceTempView("media")
  }
}
