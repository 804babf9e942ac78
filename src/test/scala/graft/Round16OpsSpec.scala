package graft

import org.apache.spark.sql.functions._

/** r16 pins. The headline test is the RM3 non-default-parameter pin
  * (ADVICE r15): rm3Rescore's feedback-doc pass scores with the
  * CALLER'S (k1, b) — the standard RM3 formulation — instead of
  * bm25TopK's defaults. All catalog call sites use defaults (where the
  * two formulations coincide), so without this test nothing pins the
  * intentional r15 change; it is verified here against a driver-side
  * EXACT replica of the whole chain (the LocalFinish parity style):
  * same operation tree, same sorted-fold sums, same HALF_UP rounding,
  * same tie orders — bit-identical expected rows, not a property.
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side exact replica of Retrieval.bm25Scores: for each
    * (query, token ∈ qterms(query)) over docs containing the token,
    * idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), per-(query, doc)
    * sorted-fold sum, round 6 HALF_UP → BigDecimal score.
    */
  private def bm25Local(tokens: Map[Long, Seq[String]],
                        qterms: Map[Long, Seq[String]],
                        k1: Double, b: Double)
      : Map[(Long, Long), BigDecimal] = {
    val nDocs = tokens.size.toLong
    val totalDl = tokens.valuesIterator.map(_.length.toLong).sum
    val avgdl = totalDl.toDouble / nDocs
    val df = tokens.valuesIterator.flatMap(_.distinct).toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val ts = for {
      (q, qts) <- qterms.toSeq
      t <- qts
      (d, dtoks) <- tokens.toSeq
      tf = dtoks.count(_ == t).toLong
      if tf > 0L
    } yield {
      val dl = dtoks.length.toLong
      val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
      ((q, d),
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
    }
    ts.groupBy(_._1).map { case (k, xs) =>
      k -> BigDecimal(xs.map(_._2).sorted.foldLeft(0.0)(_ + _))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
  }

  test("rm3Rescore with NON-DEFAULT (k1, b): feedback docs are " +
    "selected from the caller-parameterized first pass and the " +
    "blended ranking matches an exact driver-side replica") {
    // Deterministic corpus with real dl variance (b sensitivity) and
    // overlapping vocabulary (shared df), so the parameterization is
    // load-bearing, not decorative. queryEvery=2 → queries {0,2,4,6}.
    val texts: Seq[(Long, String)] = Seq(
      0L -> "apple banana cherry apple dog",
      1L -> "apple apple apple banana egg fig grape hat ink jug",
      2L -> "banana cherry dog egg",
      3L -> "cherry dog",
      4L -> "fig grape apple",
      5L -> ("apple banana cherry dog egg fig grape hat ink jug " +
             "kiwi lemon mango nut olive"),
      6L -> "banana banana cherry",
      7L -> "grape hat apple banana")
    val docs = texts.toDF("doc_id", "text")
    val (k, k0, m, alpha, k1, b) = (3, 2, 2, 0.5, 1.6, 0.4)
    val tokens = texts.map { case (id, t) => id -> t.split(" ").toSeq }
      .toMap
    val qterms = tokens.filter(_._1 % 2 == 0)
      .map { case (q, ts) => q -> ts.distinct.take(3) }

    // ---- replica: first pass with the CALLER'S (k1, b) ----
    val s1 = bm25Local(tokens, qterms, k1, b)
    def feedback(scored: Map[(Long, Long), BigDecimal])
        : Map[Long, Seq[Long]] =
      scored.toSeq.groupBy(_._1._1).map { case (q, xs) =>
        q -> xs.sortBy { case ((_, d), s) => (-s, d) }
          .take(k0).map(_._1._2)
      }
    val fb = feedback(s1)
    // Substrate guard: the test can only catch a regression to
    // default-scored feedback if the two feedback sets DIFFER.
    val fbDefault = feedback(bm25Local(tokens, qterms, 1.2, 0.75))
    assert(fb != fbDefault,
      s"substrate does not discriminate (k1, b): $fb == $fbDefault")

    // ---- replica: expansion terms off the caller-scored feedback ----
    val expansion: Map[Long, Seq[String]] = fb.map { case (q, ds) =>
      val fbTf = ds.flatMap(tokens(_))
        .groupBy(identity).map { case (t, xs) => t -> xs.length }
      q -> fbTf.toSeq
        .filterNot { case (t, _) => qterms(q).contains(t) }
        .sortBy { case (t, n) => (-n, t) }.take(m).map(_._1)
    }.filter(_._2.nonEmpty)

    // ---- replica: second pass + interpolated blend + top-k ----
    val s2 = bm25Local(tokens, expansion, k1, b)
    val expected = (s1.keySet ++ s2.keySet).toSeq.map { key =>
      // round(·, 6) exactly as the engine: decimal HALF_UP, back to
      // double — so `expected` and the collected doubles compare ==.
      val blended = BigDecimal(
          alpha * s1.get(key).map(_.toDouble).getOrElse(0.0)
            + (1.0 - alpha) * s2.get(key).map(_.toDouble).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (key._1, key._2, blended)
    }.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy { case (_, d, s) => (-s, d) }.take(k).zipWithIndex
        .map { case ((q, d, s), i) => (q, d, i + 1, s) }
    }.sortBy(r => (r._1, r._3))

    val got = graft.operators.Retrieval.rm3Rescore(docs, k = k, k0 = k0,
        m = m, alpha = alpha, k1 = k1, b = b, queryEvery = 2)
      .orderBy(col("query_id"), col("rnk")).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rnk"), r.getAs[Double]("rm3_score")))
    assert(got.toSeq == expected,
      s"got ${got.toSeq}\nexpected $expected")
  }

  test("pairEdges (r16 lean core): matches a brute-force oracle on a " +
    "basket table with in-basket duplicates, and the semantic " +
    "minItemSupport > minPairSupport prune still binds exactly") {
    import graft.operators.Itemsets
    // Baskets with: duplicate (bk, it) rows (collect_set fold must
    // dedupe), a rare item x (1 basket), items co-occurring once vs
    // twice, and an item whose RAW row count exceeds its distinct
    // basket count (20 appears 3× across 2 baskets — the upper-bound
    // prune admits it; the exact prune at minItemSupport=3 must not).
    val rows = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 30L), (3L, 99L),
      (4L, 40L), (4L, 50L))
    val baskets = rows.toDF("bk", "it")
    def oracle(minItem: Int, minPair: Int): Set[(Long, Long)] = {
      val sets = rows.distinct.groupBy(_._1).values
        .map(_.map(_._2).toSet).toSeq
      val nItem = sets.flatten.groupBy(identity)
        .map { case (i, xs) => i -> xs.size }
      val kept = sets.map(_.filter(i => nItem(i) >= minItem))
      kept.flatMap(s => s.toSeq.sorted.combinations(2).map(p =>
          (p(0), p(1))))
        .groupBy(identity).filter(_._2.size >= minPair).keySet
    }
    for ((mi, mp) <- Seq((2, 2), (1, 1), (1, 2), (3, 1), (3, 2))) {
      val got = Itemsets.pairEdges(baskets, "bk", "it", mi, mp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == oracle(mi, mp), s"(minItem=$mi, minPair=$mp)")
    }
    // The crafted semantic case really is semantic: at (3, 1) item 20
    // must be pruned (2 distinct baskets < 3) even though its raw row
    // count is 3 — a raw-count prune would wrongly keep (10,20),(20,30).
    assert(!oracle(3, 1).exists(p => p._1 == 20L || p._2 == 20L))
    assert(oracle(1, 1).contains((10L, 20L)))
  }

  test("pairEdges + frequentPairs (r16 restructures): seeded-random " +
    "basket tables match brute-force references, counts and lift " +
    "included") {
    import graft.operators.Itemsets
    for (seed <- Seq(101, 202, 303, 404)) {
      val rnd = new scala.util.Random(seed)
      // 8-12 baskets, 1-7 items each from a 10-item universe, with
      // deliberate duplicate (bk, it) rows.
      val rows: Seq[(Long, Long)] = (1 to 8 + rnd.nextInt(5)).flatMap {
        bk =>
          val n = 1 + rnd.nextInt(7)
          (1 to n).map(_ => (bk.toLong, (1 + rnd.nextInt(10)).toLong)) ++
            (if (rnd.nextBoolean()) Seq((bk.toLong,
              (1 + rnd.nextInt(10)).toLong)) else Seq.empty)
      }
      val baskets = rows.toDF("bk", "it")
      val sets = rows.distinct.groupBy(_._1).values
        .map(_.map(_._2).toSet).toSeq
      val nItem = sets.flatten.groupBy(identity)
        .map { case (i, xs) => i -> xs.size }
      def brutePairs(minItem: Int): Map[(Long, Long), Int] =
        sets.map(_.filter(i => nItem(i) >= minItem))
          .flatMap(_.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
          .groupBy(identity).map { case (k, xs) => k -> xs.size }
      // pairEdges across both prune regimes.
      for ((mi, mp) <- Seq((2, 2), (3, 2), (1, 3))) {
        val got = Itemsets.pairEdges(baskets, "bk", "it", mi, mp)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = brutePairs(mi).filter(_._2 >= mp).keySet
        assert(got == want, s"seed=$seed pairEdges($mi, $mp)")
      }
      // frequentPairs: n_a / n_b / n_ab / lift against brute force.
      val mi = 2
      val bp = brutePairs(mi)
      val nB = sets.size
      val got = Itemsets.frequentPairs(baskets, "bk", "it", mi, k = 100)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4),
            r.getAs[Double]("lift"))))
      assert(got.map(_._1).toSet == bp.keySet, s"seed=$seed pair set")
      got.foreach { case ((a, b), (nab, na, nb2, lift)) =>
        assert(nab == bp((a, b)).toLong, s"seed=$seed n_ab($a,$b)")
        assert(na == nItem(a).toLong && nb2 == nItem(b).toLong,
          s"seed=$seed n_a/n_b($a,$b)")
        val want = BigDecimal(nab.toDouble * nB / (na * nb2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(lift == want, s"seed=$seed lift($a,$b)")
      }
    }
  }

  test("LocalFinish.release drops a localCheckpoint's storage blocks " +
    "and is a no-op on plans with no checkpoint behind them") {
    import graft.operators.LocalFinish
    val df = spark.range(0, 1000).toDF("id").localCheckpoint()
    assert(df.count() == 1000L)
    val rddId = df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.head
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "the eager localCheckpoint must be registered as persistent")
    LocalFinish.release(df)
    // unpersist(blocking = false) removes the registry entry
    // synchronously (block deletion is what's async).
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId),
      "release must unpersist the checkpoint RDD")
    LocalFinish.release(spark.range(0, 10).toDF("id")) // must not throw
  }
}
