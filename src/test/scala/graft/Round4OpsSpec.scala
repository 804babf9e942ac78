package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{Curation, Dedup, Sampling}
import graft.query.Analytics
import graft.queries.Tables

/** Unit gates for the round-4 operator additions (each also carries a
  * DuckDB differential in the catalogs — these tests pin the semantic
  * invariants the oracle alone wouldn't explain).
  */
class Round4OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)
  private def invoices = Tables.invoices(spark, sf)
  private def customers = Tables.customers(spark, sf)

  test("normalize: case-folds, strips punctuation, collapses whitespace") {
    import spark.implicits._
    val out = Seq("Hello,  WORLD!!  foo-bar  ", "already clean")
      .toDF("text").select(TextOps.normalize(col("text")).as("n"))
      .as[String].collect()
    assert(out(0) == "hello world foo bar")
    assert(out(1) == "already clean")
    // idempotent: normalizing a normalized string is a no-op
    val twice = Seq("A!B").toDF("text")
      .select(TextOps.normalize(TextOps.normalize(col("text"))).as("n"))
      .as[String].head()
    assert(twice == "a b")
  }

  test("truncateTokens: cap honored, flag matches, short docs intact") {
    val t = Curation.truncateTokens(docs, 64)
      .withColumn("n_trunc", TextOps.tokenCount(col("text_trunc")))
    assert(t.filter(col("n_trunc") > 64).count() == 0)
    assert(t.filter(col("truncated") =!= (col("n_tokens") > 64)).count() == 0)
    // untruncated docs keep their exact text (single-space substrate)
    val joined = t.join(docs, Seq("doc_id"))
      .filter(!col("truncated") && col("text_trunc") =!= col("text"))
    assert(joined.count() == 0)
  }

  test("duplicatePassages: finds planted near-dup windows, none solo") {
    val p = Dedup.duplicatePassages(Dedup.withNearDuplicates(docs), 8)
    assert(p.count() > 0)
    assert(p.filter(col("n_docs") < 2).count() == 0)
    // every injected near-dup (id >= 1000000) shares its suffix windows
    // with its source doc, so at least one passage pairs across the 1M gap
    assert(p.filter(col("min_doc_id") < 1000000).count() > 0)
  }

  test("topNgrams: deterministic cutoff, counts include within-doc repeats") {
    val top = Curation.topNgrams(docs, 2, 20).collect()
    assert(top.length == 20)
    val ns = top.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sortBy(-_)), "descending by count")
    // repeats counted: total bigram occurrences == sum over docs of (len-1)
    val totalBigrams = docs
      .select(sum(TextOps.tokenCount(col("text")) - 1)).head().getLong(0)
    val allCounts = docs
      .select(explode(TextOps.ngramsAll(col("text"), 2)).as("g"))
      .count()
    assert(allCounts == totalBigrams)
  }

  test("anti/semi join partition the customer dimension") {
    val inactive = Analytics.inactiveCustomers(customers, invoices,
      "1997-03-01", "1997-04-01")
    val active = Analytics.activeCustomers(customers, invoices,
      "1997-03-01", "1997-04-01")
    assert(inactive.count() + active.count() == customers.count())
    assert(inactive.join(active, Seq("id"), "inner").count() == 0)
  }

  test("corrByGroup matches Spark's built-in corr to 2e-6") {
    val ours = Analytics.corrByGroup(invoices)
      .select(col("currency"), col("corr")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = invoices
      .groupBy(col("currency"))
      .agg(corr(col("terms_days").cast("double"),
        col("bill_total").cast("double")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == builtin.keySet)
    // 2e-6, not 1e-6: round(...,6) alone contributes up to 5e-7, and the
    // built-in streaming corr adds its own accumulation error — 1e-6 sat
    // exactly at the boundary and could flake near a rounding edge
    // (ADVICE r4).
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 2e-6, s"$k: $v vs ${builtin(k)}")
    }
  }

  test("retentionCohorts: offset-0 row counts every cohort member") {
    val r = Analytics.retentionCohorts(invoices)
    val atZero = r.filter(col("month_offset") === 0)
      .agg(sum(col("n_customers"))).head().getLong(0)
    val nCustomersWithInvoices = invoices
      .select(col("customer_id")).distinct().count()
    assert(atZero == nCustomersWithInvoices)
    assert(r.filter(col("month_offset") < 0).count() == 0)
  }

  test("groupingSets: exactly the (currency) and (status) subtotal rows") {
    val g = Analytics.revenueGroupingSets(invoices).collect()
    val byCur = g.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val bySt = g.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(byCur.length + bySt.length == g.length, "no cross/grand rows")
    val nCur = invoices.select(col("currency")).distinct().count()
    val nSt = invoices.select(col("status")).distinct().count()
    assert(byCur.length == nCur && bySt.length == nSt)
  }

  test("unpivot inverts the pivot: totals preserved") {
    val long = Analytics.statusUnpivot(invoices, customers)
    val total = long.agg(sum(col("n"))).head().getLong(0)
    assert(total == invoices.count())
    assert(long.select(col("status")).distinct().count() == 3)
  }

  test("stratifiedSample: per-stratum quota, deterministic") {
    val base = docs.select(col("doc_id"), col("lang"))
    val s1 = Sampling.stratifiedSample(base, "lang", "doc_id", 5)
    val sizes = base.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val picked = s1.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(picked.getOrElse(lang, 0L) == math.min(5L, n), s"lang=$lang")
    }
    val a = s1.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val b = Sampling.stratifiedSample(base, "lang", "doc_id", 5)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(a == b, "re-run picks the identical sample")
  }

  test("stratifiedSampleHeap == window form, with a bounded-shuffle plan") {
    val base = docs.select(col("doc_id"), col("lang"))
    val win = Sampling.stratifiedSample(base, "lang", "doc_id", 5)
    val heap = Sampling.stratifiedSampleHeap(base, "lang", "doc_id", 5)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Int]("rk"))
    assert(win.collect().map(key).sortBy(_._1).toSeq ==
      heap.collect().map(key).sortBy(_._1).toSeq)
    // physical shape: the heap variant must not window-sort the corpus —
    // partial typed aggregation + a broadcast join back instead
    val plan = heap.queryExecution.sparkPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "no WindowExec in the heap variant")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty, "winners re-attach via broadcast hash join")
  }

  test("invoiceCadence: gaps are non-negative and null only at ends") {
    val c = Analytics.invoiceCadence(invoices)
    assert(c.filter(col("days_since_prev") < 0).count() == 0)
    assert(c.filter(col("days_to_next") < 0).count() == 0)
    // per customer: exactly one null lag (first) and one null lead (last)
    val perCust = c.groupBy(col("customer_id")).agg(
      sum(when(col("days_since_prev").isNull, 1).otherwise(0)).as("nl"),
      sum(when(col("days_to_next").isNull, 1).otherwise(0)).as("nn"))
    assert(perCust.filter(col("nl") =!= 1 || col("nn") =!= 1).count() == 0)
  }
}
