package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, Graph}
import graft.query.Analytics

/** r9 wave-8 operators: Zipf-law fit, Heaps vocabulary-growth curve,
  * local clustering coefficient, degree assortativity, winsorized
  * statistics, cross-source quantile normalization.
  */
class Round9Wave8Spec extends SparkSpec {
  import spark.implicits._

  test("zipfFit: an exact power law tf = 60 / rank fits slope -1, " +
    "r2 = 1, intercept = ln 60") {
    // A geometric tf sequence (64,32,…) is NOT linear in ln(rank);
    // build the true Zipf sequence: tf(r) = 60 / r for r = 1..6 is
    // integer-exact (60 = lcm(1..6)), so ln(tf) = ln 60 − ln(rank).
    val docs = (1 to 6).flatMap { r =>
      Seq.fill(60 / r)(s"w$r")
    }.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val got = CorpusStats.zipfFit(docs).collect()(0)
    assert(got.getAs[Long]("n_fit") == 6L)
    assert(math.abs(got.getAs[Double]("slope") - (-1.0)) < 1e-3)
    assert(math.abs(got.getAs[Double]("intercept")
      - math.log(60.0)) < 1e-3)
    assert(got.getAs[Double]("r2") > 0.999999)
  }

  test("zipfFit: a single type has no spread -> null slope") {
    val docs = Seq((0L, "x x x")).toDF("doc_id", "text")
    val got = CorpusStats.zipfFit(docs).collect()(0)
    assert(got.getAs[Long]("n_fit") == 1L)
    assert(got.isNullAt(got.fieldIndex("slope")))
  }

  test("heapsCurve: new bigram types land in their first-appearance " +
    "bucket and the curve is cumulative") {
    // 10 docs (ids 0..9, one per bucket). Doc 0: "a b c" -> bigrams
    // "a b","b c" (2 new). Doc 5 repeats doc 0 (0 new) and adds
    // "c d" (1 new). Others are single-token docs (0 bigrams).
    val docs = ((0L, "a b c") +: (1L to 4L).map(i => (i, "z")) :+
      (5L, "a b c d")) ++ (6L to 9L).map(i => (i, "z"))
    val df = docs.toDF("doc_id", "text")
    val got = CorpusStats.heapsCurve(df).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_bigrams_cum"),
          r.getAs[Long]("vocab_cum"))).toMap
    assert(got(0L) == ((1L, 2L, 2L)), "doc 0: two new bigram types")
    assert(got(4L) == ((1L, 2L, 2L)), "quiet buckets carry the cum")
    assert(got(5L) == ((1L, 5L, 3L)), "repeat adds occurrences, one type")
    assert(got(9L) == ((1L, 5L, 3L)), "final totals")
  }

  test("clusteringCoefficient: triangle + pendant — the pendant's " +
    "neighbor loses density, leaf lcc is 0") {
    // Edges (a<b): triangle {1,2,3} + pendant 3-4.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.clusteringCoefficient(e).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"),
          r.getAs[Double]("lcc"))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, math.rint(1.0 / 3.0 * 1e6) / 1e6)))
    assert(got(4L) == ((1L, 0L, 0.0)), "degree-1 leaf: lcc 0 by convention")
  }

  test("assortativity: a star is maximally disassortative (r = -1)") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val got = Graph.assortativity(star).collect()(0)
    assert(got.getAs[Long]("n_edges") == 4L)
    assert(math.abs(got.getAs[Double]("assortativity") - (-1.0)) < 1e-9)
  }

  test("assortativity: a regular graph has zero degree variance -> " +
    "null (undefined), never NaN") {
    // 4-cycle: every degree is 2.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val got = Graph.assortativity(cyc).collect()(0)
    assert(got.isNullAt(got.fieldIndex("assortativity")))
  }

  test("winsorize: clips exactly at the integer-index order " +
    "statistics and reports clip counts") {
    // Group g: values 1..100 -> k_lo = ceil(5) = 5, k_hi = ceil(95) =
    // 95; lo = 5, hi = 95; 4 clipped low, 5 clipped high.
    // Winsorized sum = 4·5 + (5+..+95) + 5·95 = 20 + 4550 + 475.
    val df = (1 to 100).map(v => ("g", v.toLong)).toDF("grp", "v")
    val got = Analytics.winsorize(df, "grp", col("v")).collect()(0)
    assert(got.getAs[Long]("n") == 100L)
    assert(got.getAs[Long]("n_clip_lo") == 4L)
    assert(got.getAs[Long]("n_clip_hi") == 5L)
    assert(got.getAs[Long]("lo") == 5L && got.getAs[Long]("hi") == 95L)
    val expect = (20.0 + (5 to 95).sum + 475.0) / 100.0
    assert(math.abs(got.getAs[Double]("win_mean") - expect) < 1e-9)
  }

  test("winsorize: tiny group — k = ceil(p*n) stays in range, " +
    "nothing clips on n = 2") {
    // n = 2: k_lo = ceil(0.1) = 1, k_hi = ceil(1.9) = 2 -> lo = min,
    // hi = max, zero clips.
    val df = Seq(("g", 10L), ("g", 20L)).toDF("grp", "v")
    val got = Analytics.winsorize(df, "grp", col("v")).collect()(0)
    assert(got.getAs[Long]("n_clip_lo") == 0L)
    assert(got.getAs[Long]("n_clip_hi") == 0L)
    assert(got.getAs[Double]("win_mean") == 15.0)
  }

  test("quantileNormalize: two sources with shifted scales map to " +
    "the shared cross-source bin means") {
    // Source a: 1..20, source b: 101..120. Bin d of a holds
    // {2d-1, 2d}, of b {100+2d-1, 100+2d}: the normalized value of
    // every (source, d) is the cross-source mean = 50 + (4d-1)/2.
    val docs = ((1 to 20).map(v => ("a", v.toLong, v.toLong)) ++
      (1 to 20).map(v => ("b", 100L + v, 1000L + v)))
      .toDF("source", "n_chars", "doc_id")
    val got = Analytics.quantileNormalize(docs, "source",
      col("n_chars"), col("doc_id")).collect()
    assert(got.length == 20, "2 sources x 10 bins")
    got.foreach { r =>
      val d = r.getAs[Int]("bin")
      val expect = 50.0 + (4.0 * d - 1.0) / 2.0
      assert(r.getAs[Long]("n_docs") == 2L)
      assert(math.abs(r.getAs[Double]("norm_value") - expect) < 1e-9,
        s"bin $d")
    }
    // The source means straddle the normalized value symmetrically.
    val a1 = got.find(r => r.getAs[String]("source") == "a" &&
      r.getAs[Int]("bin") == 1).get
    assert(a1.getAs[Double]("src_mean") == 1.5)
    assert(a1.getAs[Double]("norm_value") == 51.5)
  }
}
