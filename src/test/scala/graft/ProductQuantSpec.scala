package graft

import org.apache.spark.sql.functions._
import graft.operators.{ProductQuant, Similarity}
import graft.queries.Tables

/** PQ codebook/codes invariants, ADC recall sanity, and the bigram-LM
  * and hashing-trick exactness gates.
  */
class ProductQuantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val queries = emb.filter(col("vec_id") < 10)
  private lazy val corpus = emb.filter(col("vec_id") >= 10)

  test("PQ codebook is m=8 subspaces x ksub<=16 cells of 8-dim centroids") {
    val cb = ProductQuant.fit(corpus).collect()
    assert(cb.map(_.getInt(0)).distinct.sorted.toSeq == (0 until 8))
    cb.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 16)
      assert(r.getSeq[Double](2).length == 8)
    }
  }

  test("PQ codes: every corpus vector carries exactly 8 in-range codes") {
    val cb = ProductQuant.fit(corpus)
    val codes = ProductQuant.encode(corpus, cb).collect()
    val perVec = codes.groupBy(_.getLong(0))
    assert(perVec.forall(_._2.length == 8))
    assert(codes.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 16))
  }

  test("ADC top-5 overlaps the exact top-5 (recall sanity) and is stable") {
    val adc = ProductQuant.adcTopK(queries, corpus, 5)
    val a1 = adc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a2 = ProductQuant.adcTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a1 == a2, "ADC ranking is not deterministic")
    val exact = Similarity.bruteTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((a1 & exact).nonEmpty, "ADC shares no neighbor with exact top-5")
    assert(a1.groupBy(_._1).forall(_._2.size == 5))
  }

  test("bigram LM: hand-computed smoothed score on a tiny corpus") {
    import scala.jdk.CollectionConverters._
    val rows = Seq((1L, "a b a b"), (2L, "c d"))
    val docs = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = graft.operators.LangModel.bigramScore(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // V=4. doc1 bigrams: (a b),(b a),(a b); c2(a b)=2, c2(b a)=1;
    // c1(a)=2, c1(b)=1. doc2: (c d); c2=1, c1(c)=1.
    val d1 = (math.log(3.0 / 6) + math.log(2.0 / 5) + math.log(3.0 / 6)) / 3
    val d2 = math.log(2.0 / 5)
    assert(out(1L)._1 == 3)
    assert(math.abs(out(1L)._2 - d1) < 1e-6, s"${out(1L)._2} vs $d1")
    assert(out(2L)._1 == 1)
    assert(math.abs(out(2L)._2 - d2) < 1e-6)
  }

  test("IVF-PQ candidates respect the probed coarse cell") {
    val out = ProductQuant.ivfPqTopK(queries, corpus, 5).collect()
    assert(out.nonEmpty && out.forall(_.getInt(2) <= 5))
    // Each query's neighbors must all sit in that query's probed cell.
    val cells = graft.operators.Quantizer.fit(corpus, 8)
    val coarse = graft.operators.Quantizer.assign(corpus, cells)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probes = graft.operators.Quantizer.probeCells(queries, cells, 1)
      .select(col("query_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(coarse(r.getLong(1)) == probes(r.getLong(0)),
        s"neighbor ${r.getLong(1)} outside query ${r.getLong(0)}'s cell")
    }
  }

  test("residual IVF-PQ: same probed-cell routing, recall >= raw IVF-PQ") {
    val exact = Similarity.bruteTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val raw = recall(ProductQuant.ivfPqTopK(queries, corpus, 5))
    val res = recall(ProductQuant.ivfPqResidualTopK(queries, corpus, 5))
    assert(res >= raw,
      s"residual coding lost recall: $res < $raw")
    // Residual candidates still respect the coarse routing: every
    // emitted neighbor sits in its query's probed cell.
    val out = ProductQuant.ivfPqResidualTopK(queries, corpus, 5).collect()
    assert(out.nonEmpty && out.forall(_.getInt(2) <= 5))
    val cells = graft.operators.Quantizer.fit(corpus, 8)
    val coarse = graft.operators.Quantizer.assign(corpus, cells)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probes = graft.operators.Quantizer.probeCells(queries, cells, 1)
      .select(col("query_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(coarse(r.getLong(1)) == probes(r.getLong(0)))
    }
  }

  test("snapshot dedup flags exactly the re-crawled copies") {
    val docs = Tables.documents(spark, sf)
    val prev = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .unionByName(prev.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
    val flags = graft.operators.Dedup.snapshotDupFlags(batch, prev)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    flags.foreach { case (id, dup) =>
      // Copies (id >= 3000000) are dups; odd originals are not (the
      // substrate has no cross-parity exact duplicates).
      assert(dup == (id >= 3000000L), s"doc $id flagged $dup")
    }
    assert(flags.count(_._2) > 0)
  }

  test("temperature targets: shares sum to 1 and flatten the skew") {
    val docs = Tables.documents(spark, sf)
    val t = graft.operators.Mixing.temperatureTargets(docs, "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(t.values.sum - 1.0) < 1e-9)
    val n = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α = ½ share ratios are the sqrt of the count ratios — strictly
    // flatter than proportional for any skewed pair.
    val (big, small) = (n.maxBy(_._2), n.minBy(_._2))
    if (big._2 > small._2) {
      val shareRatio = t(big._1) / t(small._1)
      val countRatio = big._2.toDouble / small._2
      assert(shareRatio < countRatio && shareRatio > 1.0)
    }
  }

  test("trained lang-id: predictions are argmax over profile hits") {
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.LangModel.trainedLangId(docs)
    val langs = docs.select(col("lang")).distinct().collect()
      .map(_.getString(0)).toSet
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(langs.contains(r.getString(1)))
      assert(r.getLong(2) >= 1)
    }
  }

  test("hashVector: one ±1 contribution per token, parity preserved") {
    val docs = Tables.documents(spark, sf).limit(50)
    val rows = docs.select(col("doc_id"),
        graft.functions.TextOps.tokenCount(col("text")).as("n"),
        graft.functions.TextOps.hashVector(col("text")).as("v"))
      .collect()
    rows.foreach { r =>
      val n = r.getInt(1)
      val v = r.getSeq[Long](2)
      assert(v.length == 32)
      assert(v.map(math.abs).sum <= n)
      assert(((v.sum - n) % 2 + 2) % 2 == 0, s"parity broken: ${v.sum} vs $n")
    }
  }
}
