package graft

import org.apache.spark.sql.functions._
import graft.ingest.{Load, Normalize}
import graft.query.CustomerContact

/** D1-D4 dimension build + the J2 zero-invoice NULL case + S5 merge. */
class DimBuildSpec extends SparkSpec {
  import spark.implicits._

  private val ns: String = null

  private def parsedFixture = Seq(
    (1L, "Acme", ns, "p-first", ns),
    (2L, "Acme", "Bob", "p-second", ns),
    (3L, "Zeta", "Zoe", ns, "z@x.com"),
    (4L, "Acme", ns, ns, "a@x.com"),
    (5L, "Mid", ns, ns, ns)
  ).toDF("row_id", "name", "contact_name", "contact_phone", "contact_email")

  test("D1-D3: first-seen dedup, first-non-null backfill, surrogate keys") {
    val dim = Normalize.dimension(parsedFixture).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(dim.size == 3)
    val acme = dim("Acme")
    assert(acme.getAs[Long]("first_row_id") == 1L)
    assert(acme.getAs[String]("contact_name") == "Bob") // backfilled from row 2
    assert(acme.getAs[String]("contact_phone") == "p-first") // first non-null
    assert(acme.getAs[String]("contact_email") == "a@x.com") // from row 4
    // surrogate ids follow first-seen order: Acme=1, Zeta=2, Mid=3
    assert(acme.getAs[Int]("customer_id") == 1)
    assert(dim("Zeta").getAs[Int]("customer_id") == 2)
    assert(dim("Mid").getAs[Int]("customer_id") == 3)
  }

  test("D4: FK resolution assigns each fact row its surrogate id") {
    val dim = Normalize.dimension(parsedFixture)
    val out = Normalize.fkResolve(parsedFixture, dim)
      .select("row_id", "customer_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 1, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 3))
  }

  test("T7: duplicate-key detection") {
    val p = Seq((1L, "I1"), (2L, "I2"), (3L, "I1"))
      .toDF("row_id", "invoice_number")
    val dups = Normalize.dupCheck(p).collect()
    assert(dups.length == 1)
    assert(dups.head.getString(0) == "I1" && dups.head.getLong(1) == 2L)
  }

  test("J2: customers with zero invoices appear with NULL last_seen") {
    val customers = Seq(
      (1L, "Acme", "SEG", "1.00"), (2L, "NoOrders", "SEG", "2.00"))
      .toDF("id", "name", "segment", "acctbal")
      .withColumn("acctbal", col("acctbal").cast("decimal(18,2)"))
    val invoices = Seq((1L, "2024-01-05"))
      .toDF("customer_id", "invoice_date")
      .withColumn("invoice_date", col("invoice_date").cast("date"))
    val page = CustomerContact.contacts(customers, invoices, "seg",
      matchCol = "segment").collect()
    assert(page.length == 2)
    val byName = page.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("Acme").getAs[java.sql.Date]("last_seen_invoice_date")
      .toString == "2024-01-05")
    assert(byName("NoOrders").get(
      byName("NoOrders").fieldIndex("last_seen_invoice_date")) == null)
  }

  test("S5: merge upserts existing keys, inserts new, idempotent") {
    val existing = Seq(("I1", "10.00"), ("I2", "20.00"), ("I3", "30.00"))
      .toDF("invoice_number", "bill_total")
    val incoming = Seq(("I3", "33.00"), ("I4", "44.00"))
      .toDF("invoice_number", "bill_total")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val merged = Load.merge(existing, incoming, "invoice_number")
    assert(rows(merged) ==
      Set(("I1", "10.00"), ("I2", "20.00"), ("I3", "33.00"), ("I4", "44.00")))
    // idempotency: re-applying the same batch is a no-op state-wise
    assert(rows(Load.merge(merged, incoming, "invoice_number")) == rows(merged))
  }
}
