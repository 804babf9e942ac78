package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.TopK.{Scored, TopKAggregator}

/** ScalaCheck properties for the bounded-heap top-k aggregator — the
  * algebra partial aggregation depends on: folding any partitioning of
  * the input and merging must equal the global answer.
  */
object TopKProps extends Properties("TopKAggregator") {

  private val k = 5
  private val agg = new TopKAggregator(k)

  private val scoredGen: Gen[Scored] = for {
    id <- Gen.chooseNum(0L, 50L) // small id space → ties are common
    score <- Gen.oneOf(Gen.chooseNum(-1.0, 1.0), Gen.oneOf(0.5, -0.5, 0.0))
  } yield Scored(id, score)

  private def naive(xs: Seq[Scored]): Seq[Scored] =
    xs.sortWith((a, b) =>
      a.score > b.score || (a.score == b.score && a.neighbor_id < b.neighbor_id))
      .take(k)

  private def fold(xs: Seq[Scored]): Seq[Scored] =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("fold == sort.take(k)") =
    Prop.forAll(Gen.listOf(scoredGen)) { xs =>
      fold(xs) == naive(xs)
    }

  property("merge of partition partials == global fold") =
    Prop.forAll(Gen.listOf(scoredGen), Gen.chooseNum(1, 7)) { (xs, parts) =>
      val partials = xs.grouped(math.max(1, xs.length / parts + 1))
        .map(fold).toList
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      merged == naive(xs)
    }

  property("buffer never exceeds k") =
    Prop.forAll(Gen.listOf(scoredGen)) { xs =>
      fold(xs).length <= k
    }
}
