package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.CsvSource

/** The reference's ingest lifecycle as ONE batch job (SURVEY.md §3.4;
  * `scripts/ingest.py:104-240` + wrappers): read the CSV, parse, count
  * quality stats, build the dimension, resolve FKs, load — dimension as
  * a deterministic overwrite (S4), fact as a MERGE (S5) so re-running is
  * a state no-op (`SOLUTION.md:312-325`; IngestJobSpec asserts both the
  * stats and the idempotency).
  *
  * Stats mirror `ingest.py:247-262`: rows read, customers, invoices
  * loaded, parse errors (quarantined, ≤5 examples like the reference),
  * duplicate invoice numbers.
  *
  * Scale shape: one pass over the CSV (cached), windows shuffle once on
  * the dedup key, the fact merge shuffles on invoice_number (or not at
  * all against a bucketed fact, Load.mergeIntoBucketed).
  */
object IngestJob {

  case class IngestStats(rows: Long, customers: Long, invoices: Long,
                         errors: Long, errorExamples: Seq[String],
                         duplicates: Long)

  case class IngestResult(dim: DataFrame, fact: DataFrame,
                          stats: IngestStats)

  /** Parse + normalize, no sink — the testable core. */
  def prepare(spark: SparkSession, csvPath: String): IngestResult = {
    val raw = CsvSource.read(spark, csvPath).cache()
    val parsed = Parse.parsed(raw).cache()
    val dim = Normalize.dimension(parsed).cache()
    val fact = Normalize.fkResolve(parsed, dim)
    val quarantined = Normalize.quarantine(raw)
    val stats = IngestStats(
      rows = parsed.count(),
      customers = dim.count(),
      invoices = fact.count(),
      errors = quarantined.count(),
      errorExamples = quarantined.limit(5).collect()
        .map(r => s"row ${r.get(0)}: ${r.get(1)}").toSeq,
      duplicates = Normalize.dupCheck(parsed).count())
    IngestResult(dim, fact, stats)
  }

  /** Full job: prepare + load into `outDir` (dim overwrite, fact merge —
    * first run creates, later runs upsert).
    */
  def run(spark: SparkSession, csvPath: String, outDir: String): IngestStats = {
    val r = prepare(spark, csvPath)
    Load.overwriteDim(r.dim, s"$outDir/customers")
    val factPath = s"$outDir/invoices"
    if (new java.io.File(factPath).exists())
      Load.mergeInto(spark, factPath, r.fact, "invoice_number")
    else r.fact.write.mode("overwrite").parquet(factPath)
    r.stats
  }
}
