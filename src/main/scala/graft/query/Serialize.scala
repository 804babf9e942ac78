package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S6 — the reference's JSON response contract (`app/models/invoices.py:
  * 10-55`, `app/models/customers.py:9-31`): money serialized as 2-dp
  * decimal STRINGS ("9400.00", `README.md:117-124`), dates as ISO strings,
  * integers left as numbers, NULLs preserved.
  *
  * Casting DECIMAL(18,2)→STRING yields the plain 2-dp form in both Spark
  * and DuckDB, so the shape is oracle-checkable. Applied as a final
  * projection layer — it never interferes with pushdown below it.
  */
object Serialize {

  def jsonShape(df: DataFrame, moneyCols: Seq[String],
                dateCols: Seq[String]): DataFrame = {
    val shaped = (moneyCols ++ dateCols).foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c).cast("string"))
    }
    shaped
  }
}
