package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-heap exact top-k as a typed `Aggregator` — the scale
  * refinement over the window-rank form (PLANS.md, q_knn_brute note).
  *
  * Why: `row_number().over(partitionBy(query).orderBy(score))` shuffles
  * EVERY scored row to its query's partition and sorts corpus-sized
  * groups. A partial-aggregating top-k keeps at most k rows per query per
  * map partition, so the shuffle carries k·partitions rows and nothing is
  * ever globally sorted — the difference between shuffling the corpus and
  * shuffling the answer.
  */
object TopK {

  case class Scored(neighbor_id: Long, score: Double)

  /** Keeps the k largest by (score desc, neighbor_id asc) — the same
    * total order as the window form, so results are identical.
    */
  class TopKAggregator(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.neighbor_id < b.neighbor_id)

    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.sizeIs >= k && better(buf.last, x)) buf
      else ((buf :+ x).sortWith(better)).take(k)

    def zero: Seq[Scored] = Vector.empty
    def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
    def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      (a ++ b).sortWith(better).take(k)
    def finish(r: Seq[Scored]): Seq[Scored] = r
    def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact knn with the aggregator: same contract as
    * `Similarity.bruteTopK` (ranked, rounded decimal scores), different
    * physical shape — partial top-k per partition, merge, no window sort.
    */
  def bruteTopKAgg(queries: DataFrame, corpus: DataFrame,
                   k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    // round BEFORE ranking: ties must break exactly as the window/oracle
    // form does (which orders on the rounded decimal, then id)
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qe"), col("ce")), 6).as("score"))
      .as[(Long, Long, Double)](Encoders.tuple(
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble))
    val agg = new TopKAggregator(k)
    scored
      .groupByKey(_._1)(Encoders.scalaLong)
      .mapValues(t => Scored(t._2, t._3))(Encoders.product[Scored])
      .agg(agg.toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"),
        col("col.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.score").cast(DecimalType(10, 6)).as("score"))
  }
}
