package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sketch, SkewJoin}
import graft.query.Analytics
import graft.queries.Tables
import graft.streaming.Events

/** Property gates for the round-6 operators: HLL registers, count-min
  * heavy hitters, containment pairs, passage excision, funnel,
  * k-anonymity, and salted-join equivalence.
  */
class Round6OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val events = Events.typed(Tables.events(spark, sf))

  test("HLL estimate lands within 25% of exact for every group") {
    val rows = Sketch.hllDistinctByGroup(
      Tables.events(spark, sf).select(col("event_type"), col("user_id")),
      "event_type", "user_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("estimate")
      val exact = r.getAs[Long]("exact_n")
      assert(math.abs(est - exact) / exact <= 0.25,
        s"${r.getString(0)}: est $est exact $exact")
    }
  }

  test("CMS estimate is never below the exact count (one-sided error)") {
    val rows = Sketch.cmsHeavyHitters(docs).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"),
        s"${r.getString(0)}: CMS under-counted")
    }
  }

  test("containment: injected trimmed copy is fully contained in source") {
    val pairs = Dedup.containmentPairs(Dedup.withNearDuplicates(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    // Every injected copy (id + 1e6) must be contained in its source.
    val injected = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    injected.foreach { id =>
      assert(pairs.contains((id + 1000000L, id)), s"copy of $id missing")
    }
  }

  test("excision removes every corpus-duplicated window and nothing else") {
    val corpus = Dedup.withNearDuplicates(docs, everyN = 10)
    val cleaned = Dedup.excisePassages(corpus, 8)
    // Row preservation: one output row per input doc.
    assert(cleaned.count() == corpus.count())
    // The cleaned corpus carries ZERO corpus-duplicated 8-windows that
    // survived from the original duplicated set: re-scan the rebuilt
    // texts for the original dup windows.
    val dup = Dedup.duplicatePassages(corpus, 8).select(col("passage"))
    val leftover = cleaned
      .select(explode(graft.functions.TextOps.shingles(
        col("text_clean"), 8)).as("passage"))
      .join(dup, Seq("passage"))
    // NOTE: excision can form NEW 8-windows at cut seams; asserting on
    // the ORIGINAL dup windows only is the operator's contract.
    assert(leftover.isEmpty, "a duplicated window survived excision")
    // Untouched docs keep their text verbatim.
    val untouched = cleaned.filter(col("n_removed") === 0)
      .join(corpus, Seq("doc_id"))
      .filter(col("text_clean") =!= col("text"))
    assert(untouched.isEmpty, "an untouched doc was rewritten")
  }

  test("funnel stages are monotone non-increasing and start at step 1") {
    val rows = Analytics.funnel(events).orderBy(col("stage")).collect()
    assert(rows.map(_.getAs[String]("step")).toSeq ==
      Seq("view", "click", "purchase"))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      counts.mkString(","))
    assert(counts.head > 0)
  }

  test("k-anonymity: every surviving QI combination covers >= k rows") {
    val anon = Analytics.kAnonymize(Tables.customer(spark, sf), k = 5)
    val kept = anon.filter(!col("suppressed"))
      .groupBy(col("nation_qi"), col("segment_qi"))
      .agg(count(lit(1)).as("n"))
    assert(kept.filter(col("n") < 5).isEmpty)
    val leaked = anon.filter(col("suppressed"))
      .filter(col("nation_qi").isNotNull || col("segment_qi").isNotNull)
    assert(leaked.isEmpty, "suppressed row leaked a quasi-identifier")
  }

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sf).select(
      col("o_custkey").as("custkey"), col("o_orderkey"))
    val cust = Tables.customer(spark, sf).select(
      col("c_custkey").as("custkey"), col("c_mktsegment").as("segment"))
    val salted = SkewJoin.saltedInnerJoin(orders, cust, "custkey",
      Seq("o_orderkey"), saltBuckets = 7)
      .select(col("o_orderkey"), col("segment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = orders.join(cust, Seq("custkey"))
      .select(col("o_orderkey"), col("segment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain && plain.nonEmpty)
  }
}
