package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.queries.Tables

/** Corpus-curation contracts: decontamination removes exactly the
  * overlapping docs, the repetition filter is integer-exact, tf-idf
  * ranking is deterministic.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate = train minus contaminationStats ids; planted overlap found") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val eval = docs.filter(col("doc_id") % 50 === 0)
      .select(expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val stats = Curation.contaminationStats(docs, eval)
    val contaminated = stats.collect().map(_.getAs[Long]("doc_id")).toSet
    // every planted source doc shares its own tail 8-grams with eval
    val planted = docs.filter(col("doc_id") % 50 === 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(planted.subsetOf(contaminated))
    val clean = Curation.decontaminate(docs, eval)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val all = docs.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(clean == all -- contaminated)
  }

  test("repetition filter: hand-built repetitive doc fails, diverse doc passes") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // diverse: keep
      (2L, "x x x x x x x x y z") // 80% one token, repeated bigrams: drop
    ).toDF("doc_id", "text")
    val rows = Curation.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(rows(1L) && !rows(2L))
  }

  test("sequence packing: offsets are contiguous per shard, chunks respect seqLen") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Curation.packSequences(docs, seqLen = 512, shards = 32)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("start_offset"),
        r.getAs[Long]("seq_idx")))
    rows.groupBy(_._1).foreach { case (_, docsInShard) =>
      val sorted = docsInShard.sortBy(_._2)
      // each doc starts exactly where the previous one ended
      sorted.foldLeft(0L) { case (expected, (_, _, n, start, seqIdx)) =>
        assert(start == expected)
        assert(seqIdx == start / 512)
        expected + n
      }
    }
    assert(rows.nonEmpty)
  }

  test("tf-idf: a corpus-unique term outranks ubiquitous terms") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common other other")
    ).toDF("doc_id", "text")
    val top = Curation.tfidfTopK(docs, k = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("token")).toMap
    assert(top(1L) == "rare") // df=1 beats tf=2 of the everywhere-term
    assert(top(2L) == "common") // only term present
    assert(top(3L) == "other")
    // ubiquitous term: ln(3/3) = 0 → score 0 everywhere
    val zero = Curation.tfidfTopK(docs, k = 3)
      .filter(col("token") === "common").collect()
    assert(zero.forall(_.getAs[java.math.BigDecimal]("score").signum == 0))
  }
}
