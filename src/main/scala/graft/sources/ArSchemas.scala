package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S3 — the logical star schema, declared once (the reference declares it
  * twice: SQLAlchemy `app/db/schema.py:10-37` and raw DDL
  * `schema_template.sql:9-37`). Parquet needs no CREATE TABLE; "DDL init"
  * is writing empty, correctly-typed tables, and the reference's
  * constraints (unique invoice_number, FK, CHECKs) become ingest-time
  * validations (dupCheck, fkResolve, quarantine) because Spark enforces
  * nothing declaratively.
  */
object ArSchemas {

  val customers: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("contact_name", StringType, nullable = true),
    StructField("contact_phone", StringType, nullable = true),
    StructField("contact_email", StringType, nullable = true)))

  val invoices: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("invoice_number", StringType, nullable = false),
    StructField("customer_id", IntegerType, nullable = false),
    StructField("invoice_date", DateType, nullable = true),
    StructField("due_date", DateType, nullable = true),
    StructField("customer_po_number", StringType, nullable = true),
    StructField("bill_total", DecimalType(18, 2), nullable = true),
    StructField("applied", DecimalType(18, 2), nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("currency", StringType, nullable = true),
    StructField("customer_terms", StringType, nullable = true),
    StructField("terms_days", IntegerType, nullable = true)))

  /** S3: drop-and-create both tables (`scripts/init_db.py:4-8`) — empty
    * typed parquet directories.
    */
  def initTables(spark: SparkSession, dir: String): Unit = {
    def empty(schema: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], schema)
    empty(customers).write.mode("overwrite").parquet(s"$dir/customers")
    empty(invoices).write.mode("overwrite").parquet(s"$dir/invoices")
  }
}
