package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.{Sampling, Sketch}
import graft.operators.Sampling.StratPick
import graft.expressions.WinnowFingerprints
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the round-5 bounded-state aggregators and
  * the native winnow kernel — the algebra distributed partial
  * aggregation depends on: any partitioning of the input, folded and
  * merged in any order, must equal the global answer.
  */
object R5AggregatorProps extends Properties("R5Aggregators") {

  // ---- KMV: bounded distinct bottom-k of hashes ----------------------

  private val k = 8
  private val kmv = new Sketch.KmvAggregator(k)

  private val hashGen: Gen[Long] = Gen.chooseNum(0L, 40L) // dups common

  private def kmvNaive(xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(k)

  private def kmvFold(xs: Seq[Long]): Seq[Long] =
    xs.foldLeft(kmv.zero)(kmv.reduce)

  property("kmv fold == distinct.sorted.take(k)") =
    Prop.forAll(Gen.listOf(hashGen)) { xs =>
      kmvFold(xs) == kmvNaive(xs)
    }

  property("kmv merge of any partitioning == global fold") =
    Prop.forAll(Gen.listOf(hashGen), Gen.chooseNum(1, 7)) { (xs, parts) =>
      val partials = xs.grouped(math.max(1, xs.length / parts + 1))
        .map(kmvFold).toList
      partials.foldLeft(kmv.zero)(kmv.merge) == kmvNaive(xs)
    }

  property("kmv merge is commutative") =
    Prop.forAll(Gen.listOf(hashGen), Gen.listOf(hashGen)) { (a, b) =>
      kmv.merge(kmvFold(a), kmvFold(b)) == kmv.merge(kmvFold(b), kmvFold(a))
    }

  // ---- stratified bottom-k picks -------------------------------------

  private val strat = new Sampling.BottomKAggregator(5)

  private val pickGen: Gen[StratPick] = for {
    hk <- Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    key <- Gen.chooseNum(0L, 30L)
  } yield StratPick(hk, key)

  private def stratNaive(xs: Seq[StratPick]): Seq[StratPick] =
    xs.sortWith((a, b) => a.hk < b.hk || (a.hk == b.hk && a.key < b.key))
      .take(5)

  private def stratFold(xs: Seq[StratPick]): Seq[StratPick] =
    xs.foldLeft(strat.zero)(strat.reduce)

  property("stratified fold == sort.take(quota)") =
    Prop.forAll(Gen.listOf(pickGen)) { xs =>
      stratFold(xs) == stratNaive(xs)
    }

  property("stratified merge of partials == global fold") =
    Prop.forAll(Gen.listOf(pickGen), Gen.chooseNum(1, 7)) { (xs, parts) =>
      val partials = xs.grouped(math.max(1, xs.length / parts + 1))
        .map(stratFold).toList
      partials.foldLeft(strat.zero)(strat.merge) == stratNaive(xs)
    }

  // ---- native winnow kernel ------------------------------------------

  private val tokenGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa")
  private val docGen: Gen[List[String]] = Gen.listOf(tokenGen)

  private def winnow(tokens: Seq[String], k: Int = 3, w: Int = 4): Set[Long] = {
    val arr = WinnowFingerprints
      .compute(UTF8String.fromString(tokens.mkString(" ")), k, w)
    arr.toLongArray().toSet
  }

  property("winnow: shared run of >= k+w-1 tokens shares a fingerprint") =
    Prop.forAll(docGen, docGen, docGen) { (pre, run0, post) =>
      val run = (run0 ++ List.fill(6)("shared")).take(6) ++ run0.take(3)
      val docA = pre ++ run
      val docB = run ++ post
      winnow(docA).intersect(winnow(docB)).nonEmpty
    }

  property("winnow: fingerprint count bounded by window count, min 1") =
    Prop.forAll(docGen) { toks =>
      val nGrams = toks.length - 2
      val fps = winnow(toks)
      if (nGrams <= 0) fps.isEmpty
      else fps.nonEmpty && fps.size <= math.max(1, nGrams - 3)
    }
}
