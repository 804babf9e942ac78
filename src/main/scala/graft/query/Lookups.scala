package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point lookups and the customer list — reference
  * `GET /invoices/{invoice_number}` (`app/api/invoices.py:141-174`),
  * `GET /customers/{customer_id}` (`app/api/customers.py:122-152`),
  * `GET /customers/` (`app/api/customers.py:19-49`).
  *
  * Operators covered: F4 key-equality point lookup (×2), O2 static sort,
  * P1 projection. The 404-on-absent contract is the caller's (empty
  * DataFrame ⇒ 404 at an API edge).
  *
  * Scale: both lookups are literal equality predicates pushed into the
  * parquet scan (row-group min/max pruning does the work of the
  * reference's B-tree indexes, `schema_template.sql:40-47`).
  */
object Lookups {

  /** F4 ∘ J1: single-invoice detail with the customer name joined in. */
  def invoiceByNumber(invoices: DataFrame, customers: DataFrame,
                      invoiceNumber: Long): DataFrame =
    Joins.dimJoin(
      invoices.filter(col("invoice_number") === lit(invoiceNumber)),
      customers.select(col("id"), col("name").as("customer_name")),
      col("customer_id") === col("id"))
      .drop("id")

  /** F4: dimension point lookup. */
  def customerById(customers: DataFrame, id: Long): DataFrame =
    customers.filter(col("id") === lit(id))

  /** O2: full dimension list ordered by name (deterministic id tie-break). */
  def customerList(customers: DataFrame): DataFrame =
    customers.orderBy(col("name").asc, col("id").asc)
}
