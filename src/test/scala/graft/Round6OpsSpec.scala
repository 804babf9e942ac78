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

  test("chunking: full coverage, correct overlap, bounded chunk size") {
    val chunks = graft.operators.Curation.chunkOverlap(docs, 32, 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3)))
    val nTokens = docs.select(col("doc_id"),
        graft.functions.TextOps.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTokens(doc)
      // chunk_ids are 0..ceil; token counts bounded by size; coverage:
      // last chunk reaches the doc end.
      assert(cs.map(_._2).sorted.toSeq == (0 until cs.length))
      assert(cs.forall(c => c._4 >= 1 && c._4 <= 32))
      assert(cs.map(_._2).max * 24 < n)
      assert(cs.maxBy(_._2)._4 + cs.maxBy(_._2)._2 * 24 == n)
      // every chunk's token count matches its text
      cs.foreach(c => assert(c._3.split(" ").length == c._4))
    }
  }

  test("span mask: sentinels count matches n_masked span starts") {
    val out = graft.operators.Curation.spanMask(docs).collect()
    out.foreach { r =>
      val masked = r.getString(1)
      val target = r.getString(2)
      val sentinels = "<extra_id_\\d+>".r.findAllIn(masked).length
      assert("<extra_id_\\d+>".r.findAllIn(target).length == sentinels)
      // every span contributes >= 1 masked token and one sentinel
      assert(r.getInt(3) >= sentinels && sentinels > 0)
      // masked + target together preserve all tokens exactly once
      val n = masked.split(" ").length - sentinels +
        target.split(" ").length - sentinels
      assert(n == docs.filter(col("doc_id") === r.getLong(0))
        .select(graft.functions.TextOps.tokenCount(col("text")))
        .head().getInt(0))
    }
  }

  test("hard negatives never share the query's label") {
    val e = Tables.embeddings(spark, sf)
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = graft.operators.Similarity.hardNegatives(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), 5)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(1)),
        s"${r.getLong(1)} shares label with query ${r.getLong(0)}")
    }
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
