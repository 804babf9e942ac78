package graft

import graft.operators.SkewJoin

/** Salted join: same rows as the plain join, deterministic across runs. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join == plain inner join on skewed data") {
    // one dominant key (hot) + a tail
    val large = ((1 to 5000).map(i => (1L, i)) ++
      (1 to 50).map(i => (2L, i)) ++ (1 to 50).map(i => (3L, i)))
      .toDF("k", "line")
    val small = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched"))
      .toDF("k", "label")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Int]("line"),
        r.getAs[String]("label"))).toSet

    val plain = rows(large.join(small, Seq("k"), "inner"))
    val salted = rows(SkewJoin.saltedInnerJoin(large, small, "k",
      saltCols = Seq("line")))
    assert(salted == plain)
    assert(plain.size == 5050)
    // deterministic: a second run produces the identical set
    assert(rows(SkewJoin.saltedInnerJoin(large, small, "k",
      Seq("line"))) == salted)
  }
}
