package graft

import org.apache.spark.sql.functions._
import graft.ingest.Scd2

/** SCD2 history semantics: versioning, idempotence, as-of lookups. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def hist0 = Seq(
    (1L, "Acme", "AUTO"), (2L, "Globex", "RETAIL"), (3L, "Initech", "TECH"))
    .toDF("id", "name", "segment")
    .withColumn("valid_from", lit("1995-01-01").cast("date"))
    .withColumn("valid_to", lit(null).cast("date"))

  // id 1 changes segment, id 2 unchanged, id 3 absent, id 4 born
  private def snap = Seq(
    (1L, "Acme", "ENERGY"), (2L, "Globex", "RETAIL"), (4L, "Hooli", "TECH"))
    .toDF("id", "name", "segment")

  test("apply versions changes, keeps unchanged/absent, births new ids") {
    val h1 = Scd2.apply(hist0, snap, Seq("name", "segment"), "1997-06-01")
      .cache()
    assert(h1.count() == 5) // 3 original rows (1 now closed) + new v + born
    val curr = h1.filter(col("valid_to").isNull)
    assert(curr.count() == 4)
    val seg1 = curr.filter(col("id") === 1).head().getAs[String]("segment")
    assert(seg1 == "ENERGY")
    val closed = h1.filter(col("valid_to").isNotNull).collect()
    assert(closed.length == 1 && closed.head.getAs[Long]("id") == 1
      && closed.head.getAs[String]("segment") == "AUTO")
    // absent id 3 stays current and untouched
    assert(curr.filter(col("id") === 3).count() == 1)
    h1.unpersist()
  }

  test("re-applying the same snapshot is a no-op (idempotent ingest)") {
    val h1 = Scd2.apply(hist0, snap, Seq("name", "segment"), "1997-06-01")
    val h2 = Scd2.apply(h1, snap, Seq("name", "segment"), "1997-07-01")
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf)
    assert(h1.collect().map(key).sortBy(_.mkString).toSeq ==
      h2.collect().map(key).sortBy(_.mkString).toSeq)
  }

  test("asOfSlice returns the version valid on the asked date") {
    val h1 = Scd2.apply(hist0, snap, Seq("name", "segment"), "1997-06-01")
    val before = Scd2.asOfSlice(h1, "1996-01-01")
      .filter(col("id") === 1).head().getAs[String]("segment")
    val after = Scd2.asOfSlice(h1, "1997-06-01")
      .filter(col("id") === 1).head().getAs[String]("segment")
    assert(before == "AUTO" && after == "ENERGY")
    // the slice is unique per id at any date
    val dup = Scd2.asOfSlice(h1, "1997-06-01")
      .groupBy(col("id")).count().filter(col("count") > 1)
    assert(dup.count() == 0)
  }
}
