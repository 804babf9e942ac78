package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Profile}

/** r9 wave-2 operators: shard-boundary stitch recovery, domain
  * balancing cap, one-pass key-column profiler.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("stitchCandidates: recovers the adjacency an overlap chunker " +
    "leaves behind, and nothing else") {
    val overlap = (1 to 8).map(i => s"o$i").mkString(" ")
    val fragA = (1 to 10).map(i => s"a$i").mkString(" ") + " " + overlap
    val fragB = overlap + " " + (1 to 10).map(i => s"b$i").mkString(" ")
    val fragC = (1 to 18).map(i => s"c$i").mkString(" ")
    val frags = Seq((1L, fragA), (2L, fragB), (3L, fragC))
      .toDF("frag_id", "text")
    val got = Dedup.stitchCandidates(frags, 8).collect()
      .map(r => (r.getAs[Long]("frag_a"), r.getAs[Long]("frag_b"),
        r.getAs[String]("gram")))
    assert(got.toSeq == Seq((1L, 2L, overlap)))
  }

  test("stitchCandidates: fragments shorter than k never pair") {
    val short = (1 to 5).map(i => s"s$i").mkString(" ")
    val frags = Seq((1L, short), (2L, short)).toDF("frag_id", "text")
    assert(Dedup.stitchCandidates(frags, 8).count() == 0)
  }

  test("stitchCandidates over chunkOverlap: every full adjacent chunk " +
    "pair of one doc is recovered") {
    // 80 distinct tokens -> starts 0,24,48,72; chunks 0..2 are full
    // 32-token windows, chunk 3 is the 8-token tail. Adjacent pairs
    // (0,1), (1,2), (2,3) all share exactly the 8-token overlap.
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val frags = Curation.chunkOverlap(Seq((7L, text)).toDF("doc_id", "text"))
      .select((col("doc_id") * 10000 + col("chunk_id")).as("frag_id"),
        col("chunk_text").as("text"))
    val got = Dedup.stitchCandidates(frags, 8).collect()
      .map(r => (r.getAs[Long]("frag_a"), r.getAs[Long]("frag_b"))).toSet
    assert(got == Set((70000L, 70001L), (70001L, 70002L),
      (70002L, 70003L)))
  }

  test("domainCap: keeps at most N per source, best score first, " +
    "deterministic tiebreak") {
    // src x: 3 docs with distinct-token scores 5, 3, 3; cap 2 keeps
    // the 5 and the LOWER doc_id of the tied 3s. src y: 1 doc, kept.
    val docs = Seq(
      (1L, "x", (1 to 5).map("t" + _).mkString(" ")),
      (2L, "x", "t1 t2 t3"),
      (3L, "x", "u1 u2 u3"),
      (4L, "y", "v1 v2")).toDF("doc_id", "source", "text")
    val got = Curation.domainCap(docs, 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("score"), r.getAs[Int]("domain_rank"))).toSet
    assert(got == Set((1L, "x", 5, 1), (2L, "x", 3, 2), (4L, "y", 2, 1)))
  }

  test("keyColumnProfile: exact per-column null/distinct/bounds from " +
    "one aggregate") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, 10L), (3L, null), (3L, 30L))
      .toDF("a", "b")
    val got = Profile.keyColumnProfile(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"), r.getAs[Long]("min_val"),
          r.getAs[Long]("max_val"))).toMap
    assert(got("a") == ((4L, 0L, 3L, 1L, 3L)))
    assert(got("b") == ((4L, 1L, 2L, 10L, 30L)))
  }
}
