package graft

import scala.util.Random
import graft.operators.Dedup

/** Randomized brute-force differentials for the r9 span/stitch
  * operators: on seeded random corpora over a 3-token alphabet (dense
  * with accidental shared n-grams — the adversarial regime for window
  * logic), the Spark plans must equal a direct Scala reference
  * computed from first principles (covered-position unions, not the
  * islands trick — so the test would catch an island-merge bug).
  */
class SpanOpsRandomSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3

  private def randomCorpus(rnd: Random): Seq[(Long, String)] = {
    val nDocs = 2 + rnd.nextInt(3)
    (1 to nDocs).map { id =>
      val len = 3 + rnd.nextInt(10)
      id.toLong -> Seq.fill(len)("abc".charAt(rnd.nextInt(3)).toString)
        .mkString(" ")
    }
  }

  /** Maximal runs of positions covered by any anchor window. */
  private def runs(toks: Seq[String], anchors: Seq[Int])
  : Set[(Int, Int, String)] = {
    val sorted = anchors.flatMap(p => p until p + k).distinct.sorted
    val groups = sorted.foldLeft(List.empty[List[Int]]) {
      case (g :: rest, p) if g.head == p - 1 => (p :: g) :: rest
      case (acc, p) => List(p) :: acc
    }
    groups.map { g =>
      val s = g.min; val e = g.max
      (s, e - s + 1, toks.slice(s, e + 1).mkString(" "))
    }.toSet
  }

  test("exactSubstringSpans == brute-force covered-position runs " +
    "(25 seeded random corpora)") {
    for (seed <- 1 to 25) {
      val rnd = new Random(seed)
      val corpus = randomCorpus(rnd)
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
      val wins = toks.flatMap { case (id, t) =>
        (0 to t.size - k).map(i => (id, i, t.slice(i, i + k).mkString(" ")))
      }
      val docsOf = wins.groupBy(_._3).map { case (p, ws) =>
        p -> ws.map(_._1).toSet
      }
      val expected = toks.flatMap { case (id, t) =>
        val anchors = wins.collect {
          case (wid, i, p) if wid == id && (docsOf(p) - id).nonEmpty => i
        }
        runs(t, anchors).map { case (s, n, txt) => (id, s, n, txt) }
      }.toSet
      val got = Dedup.exactSubstringSpans(corpus.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
          r.getAs[Int]("span_tokens"), r.getAs[String]("span_text"))).toSet
      assert(got == expected, s"seed $seed corpus $corpus")
    }
  }

  test("selfRepeatSpans == brute-force within-doc runs " +
    "(25 seeded random corpora)") {
    for (seed <- 100 to 124) {
      val rnd = new Random(seed)
      val corpus = randomCorpus(rnd)
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
      val expected = toks.flatMap { case (id, t) =>
        val wins = (0 to t.size - k)
          .map(i => i -> t.slice(i, i + k).mkString(" "))
        val multi = wins.groupBy(_._2).filter(_._2.size > 1)
          .values.flatten.map(_._1).toSeq
        runs(t, multi).map { case (s, n, txt) => (id, s, n, txt) }
      }.toSet
      val got = Dedup.selfRepeatSpans(corpus.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
          r.getAs[Int]("span_tokens"), r.getAs[String]("span_text"))).toSet
      assert(got == expected, s"seed $seed corpus $corpus")
    }
  }

  test("stitchCandidates == brute-force tail/head equality " +
    "(25 seeded random corpora)") {
    for (seed <- 200 to 224) {
      val rnd = new Random(seed)
      val corpus = randomCorpus(rnd)
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
        .filter(_._2.size >= k)
      val expected = (for {
        (a, ta) <- toks; (b, tb) <- toks if a != b
        if ta.takeRight(k) == tb.take(k)
      } yield (a, b, tb.take(k).mkString(" "))).toSet
      val got = Dedup.stitchCandidates(
          corpus.toDF("frag_id", "text"), k).collect()
        .map(r => (r.getAs[Long]("frag_a"), r.getAs[Long]("frag_b"),
          r.getAs[String]("gram"))).toSet
      assert(got == expected, s"seed $seed corpus $corpus")
    }
  }
}
