package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.{Load, Normalize, Parse, Raw}
import graft.queries.Tables

/** Ingest-pipeline operator catalog (SURVEY.md §2.1/2.3/2.4): the raw
  * string substrate, the T1-T7 scalar transforms, the D1-D4 dimension
  * build, and the S5 merge — each as a named query with a DuckDB twin.
  *
  * The raw substrate itself is oracle-checked (q_ingest_raw): the Scala
  * generators in `ingest.Raw` and the SQL generators in `rawSql` must
  * produce byte-identical strings, which pins every downstream parse
  * comparison to genuinely identical inputs.
  */
object IngestCatalog {
  type Q = RelationalCatalog.Q

  private def parsed(s: SparkSession, d: String): DataFrame =
    Parse.parsed(Raw.raw(s, d))

  // ------------------------------------------------------------ SQL twins

  /** DuckDB twin of ingest.Raw.raw — keep in lockstep with the Scala. */
  private val rawSql =
    """SELECT o_orderkey AS row_id,
      |  CASE WHEN o_orderkey % 7 = 0 THEN '  ' || c_name || ' '
      |       ELSE c_name END AS CustomerName,
      |  CAST(o_orderkey AS VARCHAR) AS InvoiceNumber,
      |  strftime(CAST(o_orderdate AS DATE), '%m/%d/%Y') AS InvoiceDate,
      |  CASE WHEN o_orderkey % 11 = 0 THEN ''
      |       ELSE 'PO-' || CAST(o_orderkey AS VARCHAR) END AS CustomerPoNumber,
      |  CASE WHEN o_orderkey % 113 = 0 THEN 'N/A'
      |       WHEN o_orderkey % 97 = 0 THEN ''
      |       ELSE ' ' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || ' '
      |       END AS BillTotal,
      |  CASE WHEN o_orderkey % 89 = 0 THEN ''
      |       ELSE CAST(o_custkey AS VARCHAR) || '.75' END AS Applied,
      |  o_orderstatus AS Status,
      |  CASE WHEN o_orderkey % 53 = 0 THEN ''
      |       WHEN o_orderkey % 127 = 0 THEN 'CAD' ELSE 'USD' END AS Currency,
      |  CASE WHEN o_orderkey % 5 = 0 THEN ''
      |       ELSE 'Contact ' || c_name END AS ContactName,
      |  CASE WHEN o_orderkey % 3 = 0 THEN ''
      |       ELSE 'P-' || CAST(o_custkey AS VARCHAR) END AS ContactPhone,
      |  CASE WHEN o_orderkey % 13 = 0 THEN ''
      |       ELSE lower(replace(c_name, '#', '')) || '@example.com'
      |       END AS ContactEmail,
      |  CASE WHEN o_orderkey % 61 = 0 THEN 'Due on receipt'
      |       ELSE 'Net ' || CAST(7 * CAST(regexp_extract(o_orderpriority, '(\d+)', 1) AS INT) AS VARCHAR)
      |       END AS CustomerTerms,
      |  CASE WHEN o_orderkey % 41 = 0 THEN ''
      |       ELSE strftime(CAST(o_orderdate AS DATE)
      |              + 7 * CAST(regexp_extract(o_orderpriority, '(\d+)', 1) AS INT),
      |            '%m/%d/%Y') || ' 00:00'
      |       END AS DueDate
      |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** DuckDB twin of ingest.Parse.parsed over the raw substrate. */
  private val parsedSql =
    s"""raw AS ($rawSql),
       |parsed AS (
       |  SELECT row_id,
       |    trim(CustomerName) AS name,
       |    trim(InvoiceNumber) AS invoice_number,
       |    CAST(try_strptime(NULLIF(split_part(trim(InvoiceDate), ' ', 1), ''),
       |         '%m/%d/%Y') AS DATE) AS invoice_date,
       |    TRY_CAST(COALESCE(NULLIF(trim(BillTotal), ''), '0') AS DECIMAL(18,2)) AS bill_total,
       |    TRY_CAST(COALESCE(NULLIF(trim(Applied), ''), '0') AS DECIMAL(18,2)) AS applied,
       |    NULLIF(trim(Status), '') AS status,
       |    NULLIF(trim(Currency), '') AS currency,
       |    NULLIF(trim(ContactName), '') AS contact_name,
       |    NULLIF(trim(ContactPhone), '') AS contact_phone,
       |    NULLIF(trim(ContactEmail), '') AS contact_email,
       |    NULLIF(trim(CustomerTerms), '') AS customer_terms,
       |    trim(CustomerPoNumber) AS customer_po_number,
       |    TRY_CAST(NULLIF(regexp_extract(trim(CustomerTerms), '(\\d+)', 1), '') AS INT) AS terms_days,
       |    CAST(try_strptime(NULLIF(split_part(trim(DueDate), ' ', 1), ''),
       |         '%m/%d/%Y') AS DATE) AS due_date_raw
       |  FROM raw),
       |final AS (
       |  SELECT *, COALESCE(due_date_raw, invoice_date + terms_days) AS due_date
       |  FROM parsed)""".stripMargin

  /** DuckDB twin of ingest.Normalize.dimension (D1-D3). */
  private val dimSql =
    s"""WITH $parsedSql,
       |dim AS (
       |  SELECT name, min(row_id) AS first_row_id,
       |    arg_min(contact_name, row_id) FILTER (WHERE contact_name IS NOT NULL) AS contact_name,
       |    arg_min(contact_phone, row_id) FILTER (WHERE contact_phone IS NOT NULL) AS contact_phone,
       |    arg_min(contact_email, row_id) FILTER (WHERE contact_email IS NOT NULL) AS contact_email,
       |    CAST(row_number() OVER (ORDER BY min(row_id)) AS INT) AS customer_id
       |  FROM final GROUP BY name)""".stripMargin

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // S1-shape canary: the raw CSV-shaped substrate itself.
    "q_ingest_raw" -> ((s, d) => Raw.raw(s, d)),

    // T1 money parse (empty→0, junk→NULL, exact decimal).
    "q_parse_money" -> ((s, d) =>
      parsed(s, d).select(col("row_id"), col("bill_total"), col("applied"))),

    // T2 date parse with time-strip (empty→NULL).
    "q_parse_date" -> ((s, d) =>
      parsed(s, d).select(col("row_id"), col("invoice_date"),
        col("due_date_raw"))),

    // T3 terms-days regex extract (digitless→NULL).
    "q_parse_terms" -> ((s, d) =>
      parsed(s, d).select(col("row_id"), col("customer_terms"),
        col("terms_days"))),

    // T5 trim + empty→NULL, incl. the po_number keeps-'' quirk.
    "q_trim_null" -> ((s, d) =>
      parsed(s, d).select(col("row_id"), col("status"), col("currency"),
        col("contact_name"), col("contact_phone"), col("contact_email"),
        col("customer_po_number"))),

    // T4 due-date derivation (explicit wins, else invoice_date+terms).
    "q_due_derive" -> ((s, d) =>
      parsed(s, d).select(col("row_id"), col("due_date"))),

    // D1+D2+D3: first-seen dedup, first-non-null backfill, surrogate keys.
    "q_dim_build" -> ((s, d) => Normalize.dimension(parsed(s, d))),

    // S4 sink ROUND-TRIP: overwrite the dimension to parquet (the
    // full-rebuild contract — reference ingest.py:221-236 DELETE+INSERT)
    // and return the RE-READ table, so the oracle gates what's on disk,
    // not just the in-plan dim build.
    "q_dim_overwrite" -> ((s, d) => {
      val path = Tables.roundTripPath("dim_overwrite", d)
      Load.overwriteDim(Normalize.dimension(parsed(s, d)), path)
      s.read.parquet(path)
    }),

    // D4: broadcast FK resolution of every fact row.
    "q_fk_resolve" -> ((s, d) => {
      val p = parsed(s, d)
      Normalize.fkResolve(p, Normalize.dimension(p))
        .select(col("row_id"), col("invoice_number"), col("customer_id"))
    }),

    // T7: duplicate-key detection (dups injected at row_id % 500 = 0).
    "q_dup_check" -> ((s, d) => {
      val p = parsed(s, d)
      Normalize.dupCheck(p.unionByName(p.filter(col("row_id") % 500 === 0)))
    }),

    // T6: quarantine of unparseable money rows.
    "q_quarantine" -> ((s, d) => Normalize.quarantine(Raw.raw(s, d))),

    // Text hygiene / PII redaction over a note assembled from the raw
    // substrate (emails, phone-like and account-like digit runs).
    "q_redact" -> ((s, d) => {
      val note = concat_ws(" ", col("CustomerName"), col("ContactEmail"),
        col("ContactPhone"), col("CustomerPoNumber"),
        concat(lit("tel 555-"), lpad(col("row_id").cast("string"), 7, "0")),
        concat(lit("acct "), (col("row_id") + 1000000L).cast("string")))
      Raw.raw(s, d).select(col("row_id"), note.as("note"))
        .withColumn("redacted", graft.functions.Clean.hygiene(col("note")))
    }),

    // Pre-redaction PII audit: per-pattern hit totals over the same
    // note surface q_redact cleans, counted with the SAME regexes
    // (Clean.piiPatterns — audit can't drift from redaction).
    "q_pii_audit" -> ((s, d) => {
      val note = concat_ws(" ", col("CustomerName"), col("ContactEmail"),
        col("ContactPhone"), col("CustomerPoNumber"),
        concat(lit("tel 555-"), lpad(col("row_id").cast("string"), 7, "0")),
        concat(lit("acct "), (col("row_id") + 1000000L).cast("string")))
      Raw.raw(s, d).select(col("row_id"), note.as("note"))
        .select(Seq(col("row_id")) ++
          graft.functions.Clean.piiCounts(col("note")): _*)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_email")).as("emails"),
          sum(col("n_phone")).as("phones"),
          sum(col("n_long_number")).as("long_numbers"),
          sum(when(col("n_email") + col("n_phone")
            + col("n_long_number") > 0, 1L).otherwise(0L))
            .as("rows_with_pii"))
    }),

    // S5: MERGE emulation — existing ⟂ incoming ∪ incoming.
    "q_upsert" -> ((s, d) => {
      val p = parsed(s, d).select(col("row_id"), col("invoice_number"),
        col("bill_total"))
      val existing = p.filter(col("row_id") % 10 =!= 0)
        .select(col("invoice_number"), col("bill_total"))
      val incoming = p.filter(col("row_id") % 5 === 0)
        .select(col("invoice_number"),
          (col("bill_total") + lit(BigDecimal("1.00")))
            .cast(Tables.Money).as("bill_total"))
      Load.merge(existing, incoming, "invoice_number")
    }),

    // SCD2 snapshot apply: segment changes (id%7, minus the ids the
    // snapshot omits entirely at id%13) close + reopen; id%100 shifted
    // copies are born. Output = the full versioned history.
    "q_scd2" -> ((s, d) => {
      val dim = Tables.customers(s, d)
        .select(col("id"), col("name"), col("segment"))
      val history = dim
        .withColumn("valid_from", lit("1995-01-01").cast("date"))
        .withColumn("valid_to", lit(null).cast("date"))
      val snapshot = dim.filter(col("id") % 13 =!= 0)
        .withColumn("segment",
          when(col("id") % 7 === 0, concat(col("segment"), lit("-MOVED")))
            .otherwise(col("segment")))
        .unionByName(dim.filter(col("id") % 100 === 0)
          .select((col("id") + 1000000).as("id"),
            concat(lit("NEW "), col("name")).as("name"), col("segment")))
      graft.ingest.Scd2.apply(history, snapshot,
        Seq("name", "segment"), "1997-06-01")
    })
  )

  // ------------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "q_ingest_raw" -> rawSql,

    "q_parse_money" ->
      s"""WITH $parsedSql
         |SELECT row_id, bill_total, applied FROM final""".stripMargin,

    "q_parse_date" ->
      s"""WITH $parsedSql
         |SELECT row_id, invoice_date, due_date_raw FROM final""".stripMargin,

    "q_parse_terms" ->
      s"""WITH $parsedSql
         |SELECT row_id, customer_terms, terms_days FROM final""".stripMargin,

    "q_trim_null" ->
      s"""WITH $parsedSql
         |SELECT row_id, status, currency, contact_name, contact_phone,
         |  contact_email, customer_po_number FROM final""".stripMargin,

    "q_due_derive" ->
      s"""WITH $parsedSql
         |SELECT row_id, due_date FROM final""".stripMargin,

    "q_dim_build" ->
      s"""$dimSql
         |SELECT name, first_row_id, contact_name, contact_phone,
         |  contact_email, customer_id
         |FROM dim""".stripMargin,

    // Same truth as q_dim_build: the parquet round-trip must be lossless.
    "q_dim_overwrite" ->
      s"""$dimSql
         |SELECT name, first_row_id, contact_name, contact_phone,
         |  contact_email, customer_id
         |FROM dim""".stripMargin,

    "q_fk_resolve" ->
      s"""$dimSql
         |SELECT f.row_id, f.invoice_number, dim.customer_id
         |FROM final f JOIN dim ON f.name = dim.name""".stripMargin,

    "q_dup_check" ->
      s"""WITH $parsedSql,
         |withdups AS (
         |  SELECT invoice_number FROM final
         |  UNION ALL
         |  SELECT invoice_number FROM final WHERE row_id % 500 = 0)
         |SELECT invoice_number, COUNT(*) AS n
         |FROM withdups GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,

    "q_quarantine" ->
      s"""WITH raw AS ($rawSql)
         |SELECT row_id, trim(BillTotal) AS bad_value
         |FROM raw
         |WHERE trim(BillTotal) <> ''
         |  AND TRY_CAST(trim(BillTotal) AS DECIMAL(18,2)) IS NULL""".stripMargin,

    "q_redact" ->
      s"""WITH raw AS ($rawSql),
         |n AS (
         |  SELECT row_id,
         |    concat_ws(' ', CustomerName, ContactEmail, ContactPhone,
         |      CustomerPoNumber,
         |      'tel 555-' || lpad(CAST(row_id AS VARCHAR), 7, '0'),
         |      'acct ' || CAST(row_id + 1000000 AS VARCHAR)) AS note
         |  FROM raw)
         |SELECT row_id, note,
         |  trim(regexp_replace(lower(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(note, '[\\x00-\\x1f\\x7f]', '', 'g'),
         |          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
         |        '[0-9]{3}[ .()-]{1,2}[0-9]{3,4}[ .()-]{0,2}[0-9]{3,4}', '<PHONE>', 'g'),
         |      '[0-9]{6,}', '<NUM>', 'g')),
         |    '\\s+', ' ', 'g')) AS redacted
         |FROM n""".stripMargin,

    // PII-audit twin: the same note build, hits counted with the same
    // three patterns (len(regexp_extract_all) == Spark regexp_count).
    "q_pii_audit" ->
      s"""WITH raw AS ($rawSql),
         |n AS (
         |  SELECT row_id,
         |    concat_ws(' ', CustomerName, ContactEmail, ContactPhone,
         |      CustomerPoNumber,
         |      'tel 555-' || lpad(CAST(row_id AS VARCHAR), 7, '0'),
         |      'acct ' || CAST(row_id + 1000000 AS VARCHAR)) AS note
         |  FROM raw),
         |c AS (
         |  SELECT row_id,
         |    len(regexp_extract_all(note,
         |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
         |      AS n_email,
         |    len(regexp_extract_all(note,
         |      '[0-9]{3}[ .()-]{1,2}[0-9]{3,4}[ .()-]{0,2}[0-9]{3,4}'))
         |      AS n_phone,
         |    len(regexp_extract_all(note, '[0-9]{6,}')) AS n_long_number
         |  FROM n)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(n_email) AS BIGINT) AS emails,
         |  CAST(SUM(n_phone) AS BIGINT) AS phones,
         |  CAST(SUM(n_long_number) AS BIGINT) AS long_numbers,
         |  CAST(SUM(CASE WHEN n_email + n_phone + n_long_number > 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_pii
         |FROM c""".stripMargin,

    "q_upsert" ->
      s"""WITH $parsedSql,
         |existing AS (
         |  SELECT invoice_number, bill_total FROM final WHERE row_id % 10 <> 0),
         |incoming AS (
         |  SELECT invoice_number,
         |    CAST(ROUND(bill_total + 1.00, 2) AS DECIMAL(18,2)) AS bill_total
         |  FROM final WHERE row_id % 5 = 0)
         |SELECT * FROM existing e
         |WHERE NOT EXISTS (SELECT 1 FROM incoming i
         |                  WHERE i.invoice_number = e.invoice_number)
         |UNION ALL
         |SELECT * FROM incoming""".stripMargin,

    // Mirrors Scd2.apply's four output classes; IS DISTINCT FROM is the
    // twin of Spark's !(a <=> b) null-safe change test. The initial
    // history has no closed rows, so the pass-through class is empty.
    "q_scd2" ->
      s"""WITH cust AS (${RelationalCatalog.custSql}),
         |dim AS (SELECT id, name, segment FROM cust),
         |snap AS (
         |  SELECT id, name,
         |    CASE WHEN id % 7 = 0 THEN segment || '-MOVED'
         |         ELSE segment END AS segment
         |  FROM dim WHERE id % 13 <> 0
         |  UNION ALL
         |  SELECT id + 1000000, 'NEW ' || name, segment
         |  FROM dim WHERE id % 100 = 0),
         |j AS (
         |  SELECT h.id AS hid, h.name AS hname, h.segment AS hseg,
         |    s.id AS sid, s.name AS sname, s.segment AS sseg
         |  FROM dim h FULL OUTER JOIN snap s ON h.id = s.id),
         |chg AS (
         |  SELECT * FROM j WHERE hid IS NOT NULL AND sid IS NOT NULL
         |    AND (hname IS DISTINCT FROM sname
         |      OR hseg IS DISTINCT FROM sseg))
         |SELECT hid AS id, hname AS name, hseg AS segment,
         |  DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
         |FROM j WHERE hid IS NOT NULL AND (sid IS NULL
         |  OR (hname IS NOT DISTINCT FROM sname
         |      AND hseg IS NOT DISTINCT FROM sseg))
         |UNION ALL
         |SELECT hid, hname, hseg, DATE '1995-01-01', DATE '1997-06-01'
         |FROM chg
         |UNION ALL
         |SELECT sid, sname, sseg, DATE '1997-06-01', CAST(NULL AS DATE)
         |FROM chg
         |UNION ALL
         |SELECT sid, sname, sseg, DATE '1997-06-01', CAST(NULL AS DATE)
         |FROM j WHERE hid IS NULL""".stripMargin
  )
}
