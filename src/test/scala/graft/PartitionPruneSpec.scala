package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.ingest.Load
import graft.queries.Tables

/** Month-partitioned fact layout: the F2 month-range predicate must turn
  * into partition pruning (read one month's directory, not the table).
  */
class PartitionPruneSpec extends SparkSpec {

  test("month-range filter prunes to the partition, not the table") {
    val dir = Files.createTempDirectory("graft-part").toString
    Load.writePartitionedByMonth(
      Tables.invoices(spark, "/root/testdata/sf0.001"), dir)
    val fact = spark.read.parquet(dir)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val march = fact.filter(col("inv_month") === "1997-03")
      val scans = march.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty)
      // pruning actually happened: selected partitions ≪ all partitions
      assert(scans.head.selectedPartitions.partitionCount == 1)
      // and the data is right
      val viaRange = Tables.invoices(spark, "/root/testdata/sf0.001")
        .filter(col("invoice_date") >= lit("1997-03-01").cast("date") &&
          col("invoice_date") < lit("1997-04-01").cast("date"))
      assert(march.count() == viaRange.count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
