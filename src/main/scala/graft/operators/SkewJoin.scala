package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys (builder brief).
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime and is the first line of defense — leave it on. Explicit
  * salting remains the tool when one key dominates so hard that even a
  * split partition's build side overflows, or when the join must stay a
  * hash join: the skewed (large) side spreads each key across
  * `saltBuckets` sub-partitions; the small side replicates each row to
  * every bucket. Shuffle parallelism for a hot key goes from 1 task to
  * `saltBuckets` tasks at the cost of replicating the small side.
  *
  * The salt is DETERMINISTIC (hash of the salt columns, not rand()) so
  * task retries and speculative execution reproduce identical rows —
  * rand() in a join key breaks exactly-once semantics on retry.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, salted.
    *
    * `saltCols`: columns of `large` whose hash spreads rows of one key
    * across buckets — any columns that vary within a key (a line number,
    * an id). Must be non-null.
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      saltCols: Seq[String],
                      saltBuckets: Int = 16): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(saltCols.map(col): _*), lit(saltBuckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
