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

  test("salting spreads a hot key's rows across shuffle partitions") {
    import org.apache.spark.sql.functions._
    // every row carries the SAME key: the worst case — one task gets
    // the whole key under a plain hash partitioning
    val large = (1 to 5000).map(i => (1L, i)).toDF("k", "line")
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy(spark_partition_id().as("p")).count()
      .agg(max("count")).head.getLong(0)
    val unsalted = maxPartRows(large.repartition(16, col("k")))
    val salted = maxPartRows(large
      .withColumn("__salt", pmod(xxhash64(col("line")), lit(16)))
      .repartition(16, col("k"), col("__salt")))
    assert(unsalted == 5000L) // the hot key lands in ONE partition
    assert(salted <= 5000L / 4) // salt spreads it at least 4 ways
  }

  test("AQE skew-join handling is live in the session (first line of defense)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  test("AQE actually splits a skewed sort-merge partition at runtime") {
    import org.apache.spark.sql.functions._
    // thresholds lowered so the 5000-row hot key trips detection in-test;
    // at production sizes the defaults (5x median AND 256 MB) fire the
    // same mechanism
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = (1 to 5000).map(i => (1L, i)) ++
        (1 to 64).map(i => (i.toLong + 1, i))
      val large = hot.toDF("k", "line")
      val small = (1 to 65).map(i => (i.toLong, s"d$i")).toDF("k", "label")
      val joined = large.join(small, Seq("k"))
      // collect() executes THIS df's own queryExecution — count() would
      // plan a separate query and leave this one un-finalized
      assert(joined.collect().length == 5000 + 64)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split SMJ in:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
