package graft

import java.nio.file.Files
import graft.sources.{ArSchemas, CsvSource}

/** S1 CSV source contract + S3 DDL init. */
class SourcesSpec extends SparkSpec {

  test("S1: schema'd CSV read, header contract, no corrupt lines in ref data") {
    val raw = CsvSource.read(spark, "/root/reference/data/unicorn_inc.csv")
      .cache()
    assert(raw.columns.toSeq ==
      CsvSource.Columns ++ Seq("_corrupt_record", "row_id"))
    assert(raw.schema.fields.filter(_.name != "row_id")
      .forall(_.dataType.typeName == "string"))
    assert(CsvSource.corruptLines(raw).count() == 0)
    assert(raw.count() == 3107)
  }

  test("S3: init writes empty, correctly-typed tables") {
    val dir = Files.createTempDirectory("graft-ddl").toString
    ArSchemas.initTables(spark, dir)
    val cust = spark.read.parquet(s"$dir/customers")
    val inv = spark.read.parquet(s"$dir/invoices")
    assert(cust.count() == 0 && inv.count() == 0)
    assert(cust.schema.fieldNames.toSeq ==
      ArSchemas.customers.fieldNames.toSeq)
    assert(inv.schema("bill_total").dataType.typeName == "decimal(18,2)")
    assert(inv.schema("invoice_date").dataType.typeName == "date")
  }
}
