package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{Curation, Sampling}
import graft.queries.Tables

/** Contracts for the second round-5 operator wave: A-ES weighted
  * sampling, Gopher-style rule filtering, unigram entropy.
  */
class Round5bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample: k rows, deterministic across runs, weight shifts inclusion") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("n_chars"))
    val a = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 20)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 20)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a == b && a.size == 20 && a.distinct.size == 20)
    // weight sensitivity: with an overwhelming weight on one row, that
    // row is (near-)certainly included — its key ln(u)/w → 0⁻ dominates
    val boosted = Sampling.weightedSample(
      docs.withColumn("w",
        when(col("doc_id") === 7, lit(1000000000L)).otherwise(lit(1L))),
      "doc_id", col("w"), 20)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(boosted.contains(7L))
  }

  test("weightedSample with equal weights = unweighted hash lottery (order by u)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"))
    val picked = Sampling.weightedSample(docs, "doc_id", lit(1L), 15)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // expected: the 15 largest u draws = 15 largest md5-prefix values
    val expected = docs.select(col("doc_id"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":ws"))),
          1, 13), 16, 10).cast("long").as("v"))
      .orderBy(col("v").desc, col("doc_id")).limit(15)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(picked == expected)
  }

  test("gopherRules: synthetic docs hit each rule independently") {
    val long = ("w" * 5 + " ") * 40 // 40 5-char words, no stopwords
    val docs = Seq(
      (1L, "the a " + ("word " * 38).trim),          // all rules pass
      (2L, "the a short text"),                       // r_len fails (4+2 < 30)
      (3L, ("word " * 40).trim),                      // r_stop fails
      (4L, "the a " + ("w " * 38).trim),              // r_meanw fails (mean < 3)
      (5L, "the a " + ("9999 " * 38).trim)            // r_alpha fails
    ).toDF("doc_id", "text")
    val m = Curation.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("r_len"), r.getAs[Boolean]("r_meanw"),
          r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_stop"),
          r.getAs[Boolean]("pass"))).toMap
    assert(m(1L) == ((true, true, true, true, true)), s"got ${m(1L)}; long=$long")
    assert(!m(2L)._1 && !m(2L)._5)
    assert(!m(3L)._4 && !m(3L)._5)
    assert(!m(4L)._2 && !m(4L)._5)
    assert(!m(5L)._3 && !m(5L)._5)
  }

  test("gopherRules splits the real corpus (both verdicts non-empty)") {
    val rules = Curation.gopherRules(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val byPass = rules.groupBy(col("pass")).count().collect()
      .map(r => r.getAs[Boolean]("pass") -> r.getAs[Long]("count")).toMap
    assert(byPass.getOrElse(true, 0L) > 0 && byPass.getOrElse(false, 0L) > 0)
  }

  test("tokenEntropy: uniform doc = ln(n); constant doc = 0; repetition lowers H") {
    val docs = Seq(
      (1L, "a b c d"),      // 4 distinct → H = ln 4
      (2L, "x x x x"),      // constant → H = 0
      (3L, "a a b c")       // skewed → 0 < H < ln 4
    ).toDF("doc_id", "text")
    val m = docs.select(col("doc_id"),
        TextOps.tokenEntropy(col("text")).as("h"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("h"))
      .toMap
    assert(math.abs(m(1L) - math.log(4.0)) < 1e-6)
    assert(m(2L) == 0.0)
    assert(m(3L) > 0.0 && m(3L) < m(1L))
  }
}
