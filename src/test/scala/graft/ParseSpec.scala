package graft

import org.apache.spark.sql.functions._
import graft.ingest.Parse

/** T1-T5 scalar parse semantics on crafted strings (SURVEY.md §5.2),
  * incl. the reference data's shapes: 2-digit years, "HH:MM"-suffixed due
  * dates, empty money, digitless terms, the po_number keeps-"" quirk.
  */
class ParseSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head.get(0)

  test("T1 money: strip, empty->0, exact decimal, junk->NULL") {
    assertDecimal(one(Parse.money(lit("  9400.00 "))), "9400.00")
    assertDecimal(one(Parse.money(lit("3150"))), "3150.00")
    assertDecimal(one(Parse.money(lit(""))), "0.00")
    assertDecimal(one(Parse.money(lit(null).cast("string"))), "0.00")
    assert(one(Parse.money(lit("N/A"))) == null)
  }

  test("T2 date: time-strip, 2-digit and 4-digit years, empty->NULL") {
    assert(one(Parse.date(lit("11/19/24"))).toString == "2024-11-19")
    assert(one(Parse.date(lit("12/19/24 00:00"))).toString == "2024-12-19")
    assert(one(Parse.date(lit("03/05/1997"))).toString == "1997-03-05")
    assert(one(Parse.date(lit("3/5/1997"))).toString == "1997-03-05")
    assert(one(Parse.date(lit(""))) == null)
    assert(one(Parse.date(lit("garbage"))) == null)
  }

  test("T3 terms: first integer, digitless->NULL") {
    assert(one(Parse.termsDays(lit("Net 30"))) == 30)
    assert(one(Parse.termsDays(lit(" Net 45 "))) == 45)
    assert(one(Parse.termsDays(lit("Due on receipt"))) == null)
    assert(one(Parse.termsDays(lit(""))) == null)
  }

  test("T5 trim/empty->NULL; po_number keeps empty string") {
    assert(one(Parse.trimNull(lit(" x "))) == "x")
    assert(one(Parse.trimNull(lit("   "))) == null)
    assert(one(Parse.trimKeepEmpty(lit("  "))) == "")
    assert(one(Parse.trimKeepEmpty(lit(null).cast("string"))) == "")
    assert(one(Parse.trimKeepEmpty(lit(" PO-1 "))) == "PO-1")
  }

  test("T4 due-date derivation: explicit wins, else invoice+terms") {
    val df = Seq(
      (1L, "A", "1", "01/01/2024", "", "100", "", "S", "USD", "", "", "",
        "Net 30", ""),
      (2L, "A", "2", "01/01/2024", "", "100", "", "S", "USD", "", "", "",
        "Net 30", "02/15/2024 00:00"),
      (3L, "A", "3", "01/01/2024", "", "100", "", "S", "USD", "", "", "",
        "Due on receipt", "")
    ).toDF("row_id", "CustomerName", "InvoiceNumber", "InvoiceDate",
      "CustomerPoNumber", "BillTotal", "Applied", "Status", "Currency",
      "ContactName", "ContactPhone", "ContactEmail", "CustomerTerms",
      "DueDate")
    val out = Parse.parsed(df).select("row_id", "due_date")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString))
      .toMap
    assert(out(1L) == Some("2024-01-31"))
    assert(out(2L) == Some("2024-02-15"))
    assert(out(3L) == None)
  }
}
