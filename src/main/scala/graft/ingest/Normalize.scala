package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-time relational transforms — the dimension build D1-D4 and the
  * data-quality checks T6/T7 (SURVEY.md §2.3-2.4). The reference does all
  * of this with per-row Python dict bookkeeping (`scripts/ingest.py:
  * 104-200`); here each step is a distributed window/aggregate.
  *
  * "First-seen in file order" (`ingest.py:126-136`) needs an explicit
  * `row_id` carrying the input order — well-defined for a CSV read with a
  * generated line index, and for the substrate's deterministic key
  * (SURVEY.md §7.3 hard part 4).
  */
object Normalize {

  /** D1 distinct-by-key first-seen + D2 first-non-null backfill + D3
    * sequential surrogate key — the customer dimension
    * (`ingest.py:126-144`).
    *
    * D2 is `first(ignoreNulls)` over the name-partitioned, row-ordered
    * window (a later row fills a still-NULL contact field,
    * `ingest.py:137-144`).
    *
    * Scale: the name-partitioned windows shuffle once on `name`. D3's
    * surrogate-key window is intentionally single-partition but runs over
    * POST-dedup dimension cardinality (≪ fact size) — same trade the
    * reference makes with its in-memory counter (`ingest.py:107`). For a
    * dimension too big for one partition, swap in zipWithIndex over a
    * sorted write; not needed at any realistic customer-dim size.
    */
  def dimension(parsed: DataFrame): DataFrame = {
    val byName = Window.partitionBy(col("name")).orderBy(col("row_id"))
    val wholePartition =
      byName.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    parsed
      .select(col("row_id"), col("name"), col("contact_name"),
        col("contact_phone"), col("contact_email"))
      .withColumn("contact_name",
        first(col("contact_name"), ignoreNulls = true).over(wholePartition))
      .withColumn("contact_phone",
        first(col("contact_phone"), ignoreNulls = true).over(wholePartition))
      .withColumn("contact_email",
        first(col("contact_email"), ignoreNulls = true).over(wholePartition))
      .withColumn("rn", row_number().over(byName))
      .filter(col("rn") === 1).drop("rn")
      .withColumnRenamed("row_id", "first_row_id")
      .withColumn("customer_id",
        row_number().over(Window.orderBy(col("first_row_id"))))
  }

  /** D4 FK resolution (`ingest.py:146`): every fact row gets its
    * customer's surrogate id. Broadcast join — the dimension is small by
    * construction; never shuffle the fact side for this.
    */
  def fkResolve(parsed: DataFrame, dim: DataFrame): DataFrame =
    parsed.join(broadcast(dim.select(col("name"), col("customer_id"))),
      Seq("name"), "inner")

  /** T7 duplicate-key detection (`ingest.py:114-116,179-187`): invoice
    * numbers seen more than once. Map-side partial counts, one shuffle.
    */
  def dupCheck(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("invoice_number")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** T6 row-level quarantine (`ingest.py:124,191-200`): rows whose raw
    * money failed to parse (non-blank but try_cast → NULL). The reference
    * counts errors and keeps ≤5 examples; both derive from this frame
    * (`count()` / `limit(5)`).
    */
  def quarantine(raw: DataFrame): DataFrame =
    raw.filter(trim(col("BillTotal")) =!= "" &&
        Parse.money(col("BillTotal")).isNull)
      .select(col("row_id"), trim(col("BillTotal")).as("bad_value"))
}
