package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Mixing

/** Corpus-mixing and winnowing contracts. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"))

  private def targets =
    docs.select(col("source")).distinct()
      .withColumn("share",
        (expr("CAST(substring(source, 4) AS INT)") + 1) / lit(210.0))

  test("mix: kept fraction tracks the target share; p=1 sources keep all") {
    val plan = Mixing.mixPlan(docs, "source", "doc_id", targets).cache()
    val n = docs.count().toDouble
    val stats = plan.groupBy(col("source"))
      .agg(first(col("p")).as("p"), count(lit(1)).as("n_s"),
        sum(when(col("keep"), 1).otherwise(0)).as("kept"))
      .collect()
    stats.foreach { r =>
      val (p, ns, kept) = (r.getDouble(1), r.getLong(2), r.getLong(3))
      assert(p > 0 && p <= 1.0)
      if (p == 1.0) assert(kept == ns, s"${r.getString(0)} must keep all")
      // hash-lottery tolerance: 25 draws per source, generous band
      else assert(math.abs(kept - p * ns) <= 8,
        s"${r.getString(0)}: kept $kept vs expected ${p * ns}")
    }
    // shares are skewed (src0 share 1/210 → p<1; src19 share 20/210 → p=1
    // on a balanced 20-source corpus where uniform share is 1/20)
    val bySource = stats.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bySource("src0") < 1.0 && bySource("src19") == 1.0)
    plan.unpersist()
  }

  test("sources absent from the recipe pass through at p = 1") {
    val partial = targets.filter(col("source") =!= "src0")
    val plan = Mixing.mixPlan(docs, "source", "doc_id", partial)
    val src0 = plan.filter(col("source") === "src0")
    assert(src0.count() == docs.filter(col("source") === "src0").count())
    assert(src0.filter(!col("keep") || col("p") =!= 1.0).count() == 0)
  }

  test("mix is deterministic and mix() output composition is a subset") {
    val a = Mixing.mix(docs, "source", "doc_id", targets)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val b = Mixing.mix(docs, "source", "doc_id", targets)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(a == b && a.nonEmpty && a.size < docs.count())
  }

  test("native winnow == declarative winnow, array-exact, incl. edge docs") {
    val real = graft.queries.Tables.documents(spark, sf)
      .select(col("text"))
      .unionByName(Seq("a b c", "x y", "", "one two three four five six")
        .toDF("text"))
    val diff = real.select(
        TextOps.winnow(col("text"), 3, 4).as("decl"),
        TextOps.winnowNative(col("text"), 3, 4).as("nat"))
      .filter(not(col("decl") <=> col("nat")))
    assert(diff.count() == 0)
    // and from SQL via the registered function name
    real.createOrReplaceTempView("winnow_probe")
    val sqlDiff = spark.sql(
      """SELECT * FROM winnow_probe
        |WHERE NOT (graft_winnow(text, 3, 4) <=>
        |  graft_winnow(text, 3, 4))""".stripMargin)
    assert(sqlDiff.count() == 0)
  }

  test("winnow: shared long runs share a fingerprint; short docs covered") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "PREFIX alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "tiny doc here"),     // 3 tokens → 1 gram → its own min
      (4L, "two words"),         // < k tokens → no fingerprints
      (5L, "completely different content with other tokens entirely now")
    ).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
        explode(TextOps.winnow(col("text"), 3, 4)).as("fp"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // docs 1/2 share an 8-token run ≥ k+w-1=6 → guaranteed common fp
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
    // unrelated doc shares nothing with doc 1
    assert(fps(1L).intersect(fps(5L)).isEmpty)
    assert(fps(3L).size == 1)
    assert(!fps.contains(4L))
    // compression: fingerprints ≪ grams (6 grams, w=4 → ≤ 3 windows)
    assert(fps(1L).size <= 3)
  }
}
