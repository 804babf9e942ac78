package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Rendezvous (highest-random-weight) shard assignment — the stable
  * router a 100 TB ingest needs in front of any sharded store (state
  * stores, ANN index shards, per-shard dedup snapshots): each key goes
  * to the shard with the highest salted hash weight. Unlike `key mod
  * n`, which remaps ~(n−1)/n of ALL keys when n changes, rendezvous
  * moves a key ONLY when the new shard wins its lottery — exactly 1/(n+1)
  * of keys in expectation, and every moved key moves TO the new shard
  * (the spec gates that as an exact property, not a statistic).
  *
  * Cost is `shards` hashes per row in one codegen'd projection — no
  * shuffle, no state; md5-derived weights keep it deterministic and
  * DuckDB-replicable like every hash surface here. For shard counts in
  * the thousands, switch the literal array to a broadcast shard table
  * and a max_by aggregate (same semantics, one extra keyed reduce).
  */
object Shard {

  /** The winning shard in 0‥shards−1 for `key`: argmax by (weight,
    * shard) — array_max's lexicographic struct compare, ties broken
    * toward the higher shard id in both engines.
    */
  def rendezvousShard(key: Column, shards: Int): Column =
    array_max(array((0 until shards).map(s =>
      struct(
        TextOps.fingerprint64(concat(key.cast("string"), lit(s":$s")))
          .as("w"),
        lit(s).as("s"))): _*)).getField("s")
}
