package graft

import org.apache.spark.sql.functions._
import graft.operators.{BinaryQuant, EntityMatch, Retrieval, Curation}
import graft.queries.Tables

/** Round-7 second-wave invariants: sign-pack bit exactness, Hamming
  * properties, binary-rerank score exactness, BM25 hand-check, blocked
  * entity-resolution recall, DSIR weight direction.
  */
class Round7WaveTwoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("signPack: exact lane bits; hamming = differing sign count") {
    import spark.implicits._
    // dims 0 and 33 positive, everything else negative
    val a = Array.fill(64)(-1.0f).updated(0, 1.0f).updated(33, 1.0f)
    // flips dim 0 and dim 63 relative to a
    val b = a.updated(0, -1.0f).updated(63, 2.0f)
    val row = Seq((a, b)).toDF("a", "b").select(
      BinaryQuant.signPack(col("a"), 64).as("pa"),
      BinaryQuant.signPack(col("b"), 64).as("pb"),
      BinaryQuant.hamming(
        BinaryQuant.signPack(col("a"), 64),
        BinaryQuant.signPack(col("b"), 64)).as("h"),
      BinaryQuant.hamming(
        BinaryQuant.signPack(col("a"), 64),
        BinaryQuant.signPack(col("a"), 64)).as("h0"))
      .collect().head
    assert(row.getSeq[Long](0) == Seq(1L, 1L << 1)) // dim0→lane0 bit0, dim33→lane1 bit1
    assert(row.getSeq[Long](1) == Seq(0L, (1L << 1) | (1L << 31)))
    assert(row.getInt(2) == 2) // dims 0 and 63 differ
    assert(row.getInt(3) == 0) // self-distance
  }

  test("binary rerank: emitted scores are the exact full-precision cosine") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    val exact = graft.operators.Similarity.bruteTopK(q, c, 40).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(3)).toMap
    val rr = BinaryQuant.hammingRerankTopK(q, c, 5).collect()
    assert(rr.nonEmpty)
    rr.filter(r => exact.contains((r.getLong(0), r.getLong(1))))
      .foreach { r =>
        assert(r.getDecimal(3) == exact((r.getLong(0), r.getLong(1))),
          s"rerank score drifted for ${(r.getLong(0), r.getLong(1))}")
      }
  }

  test("bm25: hand-computed score on a 3-doc corpus; tf saturation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana cherry"), // the query doc: terms apple banana cherry
      (7L, "apple apple pear"),
      (9L, "apple kiwi mango plum fig date grape lime peach pear")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, k = 5, queryEvery = 100,
      queryTerms = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(3)).toMap
    // replicate the exact arithmetic: N=3, avgdl=16/3
    def idf(df: Long) = Math.log((3L - df + 0.5) / (df + 0.5) + 1.0)
    def ts(tf: Long, df: Long, dl: Long) =
      idf(df) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (16L.toDouble / 3L)))
    def dec(v: Double) = new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    // doc 7: only "apple" matches (df=3, tf=2, dl=3)
    assert(out((0L, 7L)).compareTo(dec(ts(2, 3, 3))) == 0)
    // doc 0 matches all three query terms; apple tf=1
    val d0 = ts(1, 3, 3) + ts(1, 1, 3) + ts(1, 1, 3)
    assert(out((0L, 0L)).compareTo(dec(d0)) == 0)
    // saturation: doubling tf does NOT double the term score
    assert(ts(2, 3, 3) < 2 * ts(1, 3, 3))
  }

  test("entity match: full dirty coverage at lev <= 1 via two-key blocking") {
    val parts = Tables.part(spark, sf)
    val dirty = EntityMatch.dirtyFeed(parts, "p_partkey", "p_name")
    val resolved = EntityMatch.resolve(dirty, parts, "p_partkey", "p_name")
      .collect()
    val nDirty = dirty.count()
    assert(nDirty > 0 && resolved.length == nDirty,
      s"coverage hole: ${resolved.length} resolved of $nDirty dirty")
    // the true entity is always a candidate (interior drop keeps one
    // key) at lev 1, so the best match can never be worse than 1
    assert(resolved.forall(_.getInt(4) <= 1))
    // OPTIMALITY vs brute force: no catalog entry is strictly closer
    // than the resolved match, and the resolved key is the smallest
    // among the globally-minimal-distance entries. (On this substrate
    // p_name values repeat — a tiny word vocabulary — so "resolves to
    // its own key" would be the wrong contract; minimal (lev, key) is
    // the operator's actual promise.)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val catalog = parts.select(col("p_partkey"), col("p_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    resolved.foreach { r =>
      val (dirtyName, key, got) = (r.getString(1), r.getLong(2), r.getInt(4))
      val best = catalog.map { case (k, n) => (lev(dirtyName, n), k) }.min
      assert((got.toLong, key) == (best._1.toLong, best._2),
        s"suboptimal match for '$dirtyName': got ($got, $key), best $best")
    }
  }

  test("pagerank: mass conservation and hand-checked two-node chain") {
    import spark.implicits._
    // a <-> b symmetric pair: stationary at uniform; pr stays 0.5 each
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr2 = graft.operators.Graph.pageRank(pair, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr2(1L) == 0.5 && pr2(2L) == 0.5)
    // real graph: total mass ~ 1 (symmetrized graph has no dangling
    // leak; only the 1e-12 fixed-point round and the 6-dp edge round)
    val pr = graft.operators.Graph.pageRank(
      graft.operators.Graph.purchaseEdges(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf)))
    val mass = pr.agg(sum(col("pr"))).collect().head.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass drifted: $mass")
    // suppliers aggregate far more rank than any single customer
    val top = pr.orderBy(col("pr").desc).limit(1).collect().head
    assert(top.getLong(0) % 2 == 1, "top node should be a supplier")
  }

  test("dsir: target-slice docs score higher on average than raw docs") {
    val w = Curation.dsirWeights(Tables.documents(spark, sf))
      .withColumn("is_target", col("doc_id") % 50 === 0)
      .groupBy(col("is_target")).agg(avg(col("weight")).as("mw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false),
      s"importance weights do not separate target from raw: $w")
  }
}
