package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.Sketch

/** Incremental KMV distinct-count over a stream — the sketch's
  * mergeability ([[Sketch.KmvAggregator]]'s fold/merge algebra,
  * property-gated in R5AggregatorProps) carried into Structured
  * Streaming: state per group is the SAME bounded distinct bottom-k the
  * batch aggregator holds (≤ k longs), updated per micro-batch via
  * `mapGroupsWithState`, so after ANY prefix of micro-batches the
  * emitted estimate equals the batch estimate over the rows seen so far
  * — the live-cardinality dashboard primitive (distinct users/tokens so
  * far, per key) with O(k) state per group and no re-scan.
  *
  * Batch execution of the same function (Spark runs mapGroupsWithState
  * per-group once, state discarded) degenerates to exactly
  * [[Sketch.kmvDistinctByGroup]] — StreamingSketchSpec pins streaming
  * == batch through sliced micro-batches.
  */
object StreamingSketch {

  case class GroupHash(g: String, h: Long)
  case class KmvEstimate(g: String, k_actual: Int, hk: Long,
                         estimate: Double)

  def kmvStream(hashed: Dataset[GroupHash], k: Int = 64)
      : Dataset[KmvEstimate] = {
    val agg = new Sketch.KmvAggregator(k)
    hashed
      .groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Seq[Long], KmvEstimate](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupHash],
         state: GroupState[Seq[Long]]) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, r.h)
          }
          state.update(buf)
          val s = agg.finish(buf)
          KmvEstimate(g, s.k_actual, s.hk, Sketch.estimate(k, s))
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[KmvEstimate])
  }

  case class HllEstimate(g: String, zeros: Int, estimate: Double)

  /** Incremental HLL over a stream — the register sketch (the mergeable
    * artifact warehouses actually exchange) next to [[kmvStream]]'s
    * order-statistics one: state per group is the dense 64-register
    * vector (the SAME ≤64-small-ints state the batch aggregate shuffles),
    * updated per micro-batch via [[Sketch.hllUpdate]] and estimated via
    * [[Sketch.hllEstimate]] — so after ANY prefix of micro-batches the
    * emitted (zeros, estimate) equals [[Sketch.hllDistinctByGroup]] over
    * the rows seen so far. O(64) state per group, no re-scan, and the
    * state vector itself merges by per-register max across shards/days.
    */
  def hllStream(hashed: Dataset[GroupHash]): Dataset[HllEstimate] =
    hashed
      .groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Vector[Int], HllEstimate](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupHash],
         state: GroupState[Vector[Int]]) =>
          val regs = rows.foldLeft(
            state.getOption.getOrElse(Vector.fill(64)(0))) {
            (r, row) => Sketch.hllUpdate(r, row.h)
          }
          state.update(regs)
          HllEstimate(g, regs.count(_ == 0), Sketch.hllEstimate(regs))
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[HllEstimate])

  case class GroupToken(g: String, token: String)
  case class CmsCells(g: String, cells: Seq[Long])

  /** Incremental count-min over a stream — the third sketch twin
    * (KMV: order statistics; HLL: registers; CMS: counters): state per
    * group is the flattened depth×width counter matrix, each incoming
    * token bumps its `depth` md5-salted cells with EXACTLY the bucket
    * arithmetic of the batch sketch ([[Sketch.cmsHeavyHitters]]'s
    * `fingerprint64(token || ":cms:" || r) % width`), so after any
    * prefix of micro-batches a token's min-over-depth estimate equals
    * the batch sketch built over the rows seen so far — the live
    * heavy-hitters dashboard primitive. O(depth·width) state per group
    * regardless of stream length; cell matrices merge by element-wise
    * SUM across shards/days (the CMS linearity the batch build's
    * map-side partials already exploit).
    */
  def cmsStream(tokens: Dataset[GroupToken], depth: Int = 3,
                width: Int = 256): Dataset[CmsCells] =
    tokens
      .groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Array[Long], CmsCells](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupToken],
         state: GroupState[Array[Long]]) =>
          val cells = state.getOption
            .getOrElse(new Array[Long](depth * width))
          val md = java.security.MessageDigest.getInstance("MD5")
          rows.foreach { row =>
            var r = 0
            while (r < depth) {
              val b = (fp60(md, row.token + ":cms:" + r)
                % width.toLong).toInt
              cells(r * width + b) += 1
              r += 1
            }
          }
          state.update(cells)
          CmsCells(g, cells.toSeq)
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[CmsCells])

  case class GroupCents(g: String, vc: Long)
  case class QuantRow(p: String, rank: Long, bin: Long, est_x2: Long)
  case class HdrQuantiles(g: String, n: Long, qs: Seq[QuantRow])

  /** Incremental HDR-histogram quantiles over a stream — the fourth
    * sketch twin (KMV: order statistics; HLL: registers; CMS: counters;
    * HDR: bin counts): state per group is the (bin → count) map —
    * ≤ ~16·64 entries regardless of stream length — updated with
    * EXACTLY the batch bin arithmetic ([[Sketch.hdrBin]]) and read out
    * with the batch rank semantics ([[Sketch.hdrQuantilesFromBins]]),
    * so after any prefix of micro-batches the emitted (rank, bin,
    * midpoint) rows equal [[Sketch.hdrQuantiles]] over the rows seen so
    * far — the live latency/price-percentile dashboard primitive. Bin
    * maps merge by per-bin SUM across shards/days, like every state in
    * this file. Values arrive as integer cents (`vc`); `est_x2` is the
    * bin midpoint in half-cents (batch `est` = est_x2/200 exactly).
    */
  def hdrStream(values: Dataset[GroupCents],
                ps: Seq[String] = Seq("0.50", "0.95", "0.99"))
      : Dataset[HdrQuantiles] =
    values
      .groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Map[Long, Long], HdrQuantiles](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupCents],
         state: GroupState[Map[Long, Long]]) =>
          var bins = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { r =>
            if (r.vc >= 1) {
              val b = Sketch.hdrBin(r.vc)
              bins = bins.updated(b, bins.getOrElse(b, 0L) + 1L)
            }
          }
          state.update(bins)
          val qs = Sketch.hdrQuantilesFromBins(bins, ps)
            .map { case (p, _, rank, bin, x2) =>
              QuantRow(p, rank, bin, x2) }
          HdrQuantiles(g, bins.valuesIterator.sum, qs)
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[HdrQuantiles])

  case class KeyedRow(k: String, ord: Long)

  /** Streaming twin of [[graft.operators.Sampling.rateLimit]] — the
    * per-key ingest throttle live: state per (key, window) is ONE long
    * (rows admitted so far); each micro-batch admits its group's rows
    * in `ord` order until the cap, then drops. After any prefix of
    * in-order micro-batches the admitted set per key is exactly the
    * batch operator's first-`maxPerKey` rows; out-of-order arrival
    * degrades gracefully to first-N-by-arrival — precisely the
    * trade a real stream makes. O(1) state per key, no buffering.
    *
    * WINDOWING CONTRACT (ADVICE r7): time windows must be pre-folded
    * into `k` by the caller (e.g. `user × hour-bucket`), which mints a
    * new state entry per window — so a LONG-RUNNING deployment must
    * pass `stateTtl = Some(...)`: expired window keys are then evicted
    * by a processing-time timeout (TTL of idleness, re-armed on every
    * update) and live state is bounded by the keys active inside one
    * TTL span. Without it state grows by one long per (key, window)
    * for the stream's lifetime. The default stays `None` (NoTimeout)
    * because a processing-time timeout makes the stateful operator
    * request a batch per trigger forever, so `processAllAvailable()`
    * never sees a no-new-data round — finite replays (tests, backfills)
    * want NoTimeout; 24/7 streams want the TTL and a real trigger.
    */
  def rateLimitStream(rows: org.apache.spark.sql.Dataset[KeyedRow],
                      maxPerKey: Int = 2,
                      stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[KeyedRow] =
    rows.groupByKey(_.k)(Encoders.STRING)
      .flatMapGroupsWithState[Long, KeyedRow](
        org.apache.spark.sql.streaming.OutputMode.Append,
        stateTtl.fold(GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.ProcessingTimeTimeout))(
        rateLimitFn(maxPerKey, stateTtl))(
        Encoders.scalaLong, Encoders.product[KeyedRow])

  /** The [[rateLimitStream]] state-update function, exposed so the TTL
    * eviction branch is unit-testable with `TestGroupState` (a timeout
    * firing inside a live query is timing-dependent; the function's
    * contract is not).
    */
  def rateLimitFn(maxPerKey: Int, stateTtl: Option[String])
      : (String, Iterator[KeyedRow], GroupState[Long]) => Iterator[KeyedRow] =
    (_: String, it: Iterator[KeyedRow], state: GroupState[Long]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val used = state.getOption.getOrElse(0L)
        val room = math.max(0L, maxPerKey - used).toInt
        val take = it.toIndexedSeq.sortBy(_.ord).take(room)
        state.update(used + take.size)
        stateTtl.foreach(state.setTimeoutDuration)
        take.iterator
      }

  case class GroupDay(g: String, day: Int)
  case class DayCount(day: Int, n: Long)
  case class DecayHist(g: String, n_events: Long, ref_day: Int,
                       days: Seq[DayCount])

  /** Incremental state for [[graft.query.Analytics.decayCounts]] —
    * the freshness-weighted mixing signal live (VERDICT r9 #4): the
    * decayed sum itself is NOT mergeable state (its dyadic weights
    * re-scale every time the reference date advances), but the
    * (total, per-day count map) pair IS — day counts merge by sum,
    * the reference day by max, and the weighted readout is a pure
    * function of (histogram, global ref). So the twin splits exactly
    * there: this operator maintains the bounded per-group histogram
    * via `mapGroupsWithState`, and [[decayFromHistograms]] is the
    * stateless finish that applies the batch operator's integer
    * 2^(20−k) weights under the GLOBAL max day (the batch reference
    * is corpus-wide, which no single group's state can know).
    *
    * State is bounded by construction: days at hl ≥ 21 relative to
    * the group's own max have weight 0 under ANY global ref ≥ it
    * (refs only advance), so they are pruned eagerly — ≤ 21·halfLife
    * day entries per group regardless of stream length, while
    * `n_events` keeps counting every event like the batch COUNT(*).
    */
  def decayStream(events: Dataset[GroupDay], halfLifeDays: Int = 30)
      : Dataset[DecayHist] =
    events.groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[(Long, Map[Int, Long]), DecayHist](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupDay],
         state: GroupState[(Long, Map[Int, Long])]) =>
          var (total, days) = state.getOption
            .getOrElse((0L, Map.empty[Int, Long]))
          rows.foreach { r =>
            total += 1L
            days = days.updated(r.day, days.getOrElse(r.day, 0L) + 1L)
          }
          val ref = days.keysIterator.max
          val kept = days.filter {
            case (d, _) => ref - d < (20 + 1) * halfLifeDays
          }
          state.update((total, kept))
          DecayHist(g, total, ref,
            kept.toSeq.sortBy(_._1).map(e => DayCount(e._1, e._2)))
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[DecayHist])

  /** Stateless finish for [[decayStream]]: the batch
    * [[graft.query.Analytics.decayCounts]] arithmetic — half-life
    * buckets against the 1-row broadcast GLOBAL max day, integer
    * 2^(20−k) weights, one division — applied to the emitted
    * histograms. Output schema matches the batch operator
    * (`groupCol`, n_events, decayed_count), so the parity spec
    * compares frames directly.
    */
  def decayFromHistograms(hists: org.apache.spark.sql.DataFrame,
                          groupCol: String = "event_type",
                          halfLifeDays: Int = 30)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val ref = hists.agg(max(col("ref_day")).as("r"))
    hists.select(col("g"), col("n_events"),
        explode(col("days")).as("dc"))
      .crossJoin(broadcast(ref))
      .withColumn("hl", expr(s"(r - dc.day) DIV $halfLifeDays"))
      .withColumn("wfp",
        when(col("hl") <= 20,
          expr("CAST(1 AS BIGINT) << (20 - hl)") * col("dc.n"))
          .otherwise(lit(0L)))
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n_events")).as("n_events"),
        round(sum(col("wfp")).cast("double") / (1L << 20).toDouble, 6)
          .as("decayed_count"))
  }

  case class UnitSpend(k: Long, post: Boolean, v: Long)
  case class UnitPrePost(k: Long, pre: Long, post: Long)

  /** Incremental state for [[graft.query.Analytics.diffInDiff]] —
    * the experiment readout live: per-unit (pre, post) integer-dollar
    * sums merge by addition (two longs per customer, unit-bounded
    * state), and the whole Welch-on-changes surface (hash arms, cell
    * means, DiD, SE, t) is a pure function of the finished unit
    * table — the cusumStream split joint. Contract: order-less units
    * enter the stream with a zero row so the control/treat counts
    * match the batch left join.
    */
  def didStream(rows: Dataset[UnitSpend]): Dataset[UnitPrePost] =
    rows.groupByKey(_.k)(Encoders.scalaLong)
      .mapGroupsWithState[(Long, Long), UnitPrePost](
        GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[UnitSpend],
         state: GroupState[(Long, Long)]) =>
          var (pre, post) = state.getOption.getOrElse((0L, 0L))
          it.foreach { r => if (r.post) post += r.v else pre += r.v }
          state.update((pre, post))
          UnitPrePost(k, pre, post)
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[UnitPrePost])

  /** Stateless finish for [[didStream]]: re-derive the md5 ':did'
    * arm from the unit key and replay the batch Welch-on-changes
    * arithmetic through the shared `Analytics.didFinish`.
    */
  def didFromUnits(units: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.query.Analytics.didFinish(
      units.select(col("pre"), col("post"),
        pmod(graft.functions.TextOps.fingerprint64(
          concat(col("k").cast("string"),
            lit(":did"))), lit(2L)).as("arm")))
  }

  /** Incremental state shared by BOTH batch-only experiment tests of
    * r13 (r13 VERDICT #5) — [[graft.query.Analytics.propZTest]] and
    * [[graft.query.Analytics.mcnemar]]: per-unit (pre, post) 0/1
    * ACTIVITY flags, merged by integer max — the exact sufficient
    * statistic for conversion (any post-split order) and for the
    * discordant pre/post cells alike, two longs per customer
    * (unit-bounded, the [[didStream]] state shape). Rows: one
    * (k, post, v=1) per order plus the order-less-unit zero row
    * (k, post=true, v=0), mirroring each batch operator's customer
    * left join. Both finishes below replay the factored batch tails
    * verbatim.
    */
  def flagStream(rows: Dataset[UnitSpend]): Dataset[UnitPrePost] =
    rows.groupByKey(_.k)(Encoders.scalaLong)
      .mapGroupsWithState[(Long, Long), UnitPrePost](
        GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[UnitSpend],
         state: GroupState[(Long, Long)]) =>
          var (pre, post) = state.getOption.getOrElse((0L, 0L))
          it.foreach { r =>
            val f = if (r.v > 0L) 1L else 0L
            if (r.post) post = math.max(post, f)
            else pre = math.max(pre, f)
          }
          state.update((pre, post))
          UnitPrePost(k, pre, post)
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[UnitPrePost])

  /** Stateless finish for the two-proportion z twin: cv IS the post
    * flag; the md5 ':prop' arm re-derives from the unit key; the
    * pooled-variance z replays through the shared
    * `Analytics.propZTestFinish`.
    */
  def propZTestFromFlags(units: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.query.Analytics.propZTestFinish(
      units.select(col("post").as("cv"),
        pmod(graft.functions.TextOps.fingerprint64(
          concat(col("k").cast("string"),
            lit(":prop"))), lit(2L)).as("arm")))
  }

  /** Stateless finish for the McNemar twin: the discordant cells are
    * integer aggregates of the finished flag table, replayed through
    * the shared `Analytics.mcnemarFinish`.
    */
  def mcnemarFromFlags(units: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.mcnemarFinish(
      units.select(org.apache.spark.sql.functions.col("pre"),
        org.apache.spark.sql.functions.col("post")))

  case class PhraseLang(phrase: String, en: Boolean)
  case class PhraseCounts(phrase: String, ya: Long, yb: Long)

  /** Incremental state for [[graft.operators.Retrieval
    * .distinctivePhrases]] — the Monroe log-odds corpus comparison
    * live: per-phrase (en, other) instance counts merge by integer
    * addition, and the WHOLE log-odds surface (informative prior,
    * corpus totals, δ, z, the top-k cut) is a pure function of the
    * finished count table, so the twin splits at the same joint as
    * [[decayStream]]/[[cusumStream]]: bounded per-key state here,
    * the batch arithmetic verbatim in [[distinctiveFromCounts]].
    * State is two longs per DISTINCT phrase (vocabulary-bounded,
    * like the cms/kmv token streams), never instance-sized; phrase
    * extraction is per-document stateless and happens upstream.
    */
  def phraseCountStream(rows: Dataset[PhraseLang])
      : Dataset[PhraseCounts] =
    rows.groupByKey(_.phrase)(Encoders.STRING)
      .mapGroupsWithState[(Long, Long), PhraseCounts](
        GroupStateTimeout.NoTimeout) {
        (p: String, it: Iterator[PhraseLang],
         state: GroupState[(Long, Long)]) =>
          var (ya, yb) = state.getOption.getOrElse((0L, 0L))
          it.foreach { r => if (r.en) ya += 1L else yb += 1L }
          state.update((ya, yb))
          PhraseCounts(p, ya, yb)
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[PhraseCounts])

  /** Stateless finish for [[phraseCountStream]]: the batch
    * [[graft.operators.Retrieval.distinctivePhrases]] tail over the
    * emitted counts — same output schema, so the parity spec
    * compares frames directly.
    */
  def distinctiveFromCounts(counts: org.apache.spark.sql.DataFrame,
                            k: Int = 20, alpha0: Double = 100.0)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.operators.Retrieval.distinctiveFinish(
      counts.select(col("phrase"), col("ya"), col("yb")), k, alpha0)
  }

  case class TypeDayCents(g: String, day: Int, cents: Long)
  case class DayCents(day: Int, cents: Long)
  case class CusumHist(g: String, days: Seq[DayCents])

  /** Incremental state for [[graft.query.Analytics.cusumDrift]] — the
    * sequential drift monitor live. The CUSUM statistic itself is NOT
    * mergeable (its reference mean and every prefix re-scale as new
    * days arrive), but the per-type (day → cents-total) histogram IS:
    * day totals merge by integer sum, and the whole closed-form
    * surface — reference rational (Σx, n), scaled prefix P′, running
    * min, alarm — is a pure function of the finished histogram. The
    * twin therefore splits at the same joint as [[decayStream]]:
    * bounded per-group state here, the batch arithmetic verbatim in
    * [[cusumFromHistograms]].
    *
    * State is bounded by the CALENDAR, not the stream: one entry per
    * distinct active day per type (a decade of daily totals is ~3.7k
    * longs), while every event folds into its day's integer total.
    */
  def cusumStream(events: Dataset[TypeDayCents]): Dataset[CusumHist] =
    events.groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Map[Int, Long], CusumHist](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[TypeDayCents],
         state: GroupState[Map[Int, Long]]) =>
          var days = state.getOption.getOrElse(Map.empty[Int, Long])
          rows.foreach { r =>
            days = days.updated(r.day,
              days.getOrElse(r.day, 0L) + r.cents)
          }
          state.update(days)
          CusumHist(g,
            days.toSeq.sortBy(_._1).map(e => DayCents(e._1, e._2)))
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[CusumHist])

  /** Stateless finish for [[cusumStream]]: the SAME code as the batch
    * operator — both this and [[graft.query.Analytics.cusumDrift]]
    * delegate to the shared `Analytics.cusumFinish` (the
    * kmFinish/benfordFinish pattern), so the n-scaled integer prefix
    * sum, the 0-seeded running min, and the threshXMean·Σx alarm
    * cannot drift apart. Output schema matches the batch operator
    * (event_type, day, day_total_cents, cusum_scaled, alarm), so the
    * parity spec compares frames directly.
    */
  def cusumFromHistograms(hists: org.apache.spark.sql.DataFrame,
                          threshXMean: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.query.Analytics.cusumFinish(
      hists
        .select(col("g").as("event_type"), explode(col("days")).as("dc"))
        .select(col("event_type"),
          date_from_unix_date(col("dc.day")).as("day"),
          col("dc.cents").as("x")),
      threshXMean)
  }

  case class UserSeen(user_id: Long)

  /** STREAMING DISTINCT (first-sight) — each user id is emitted
    * exactly once across the stream's lifetime (one boolean of state
    * per key, the rate-limiter's shape with maxPerKey = 1 and an
    * identity payload). This is the mergeable half of the streaming
    * SRM twin: the guardrail needs DISTINCT units per arm, and
    * "distinct" is the one aggregate a histogram cannot carry — the
    * per-key seen flag is its exact sufficient statistic. The
    * stateless finish is the batch operator itself:
    * `Analytics.srmCheck` over the emitted first sights (the arm
    * re-derives from the same content hash, so nothing but the user
    * id ever enters the stream).
    */
  def firstSightStream(users: Dataset[UserSeen]): Dataset[UserSeen] =
    users.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[Boolean, UserSeen](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (u: Long, _: Iterator[UserSeen], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(UserSeen(u)) }
      }(Encoders.scalaBoolean, Encoders.product[UserSeen])

  /** Stateless SEASONALITY readout over the SAME [[cusumStream]]
    * day-histogram state — the third estimator off one persisted
    * sufficient statistic (CUSUM drift, and now the dow profile):
    * shared `Analytics.seasonalityFinish`, so the parity spec
    * compares frames directly against the batch operator.
    */
  def seasonalityFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.query.Analytics.seasonalityFinish(
      hists
        .select(col("g").as("event_type"), explode(col("days")).as("dc"))
        .select(col("event_type"),
          date_from_unix_date(col("dc.day")).as("day"),
          col("dc.cents").as("x")))
  }

  /** Stateless MANN-KENDALL readout over the SAME [[cusumStream]]
    * day-histogram state — the FIFTH estimator off one persisted
    * sufficient statistic (CUSUM, seasonality, sign-flip, SRM-family,
    * and now the trend test): the day → cents map IS the daily
    * series, so the exact-integer S/tie/variance arithmetic replays
    * verbatim through the shared `Analytics.mannKendallFinish`.
    */
  def mannKendallFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.mannKendallFinish(dailyFromHistograms(hists))

  /** The per-type (event_type, day, x, t) daily frame rebuilt from
    * the persisted [[cusumStream]] histograms — exactly what the
    * batch `Analytics.dailySeries` derives from the raw events (the
    * histogram holds the same per-day integer totals; the dense t
    * index orders by the same calendar day).
    */
  private def dailyFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    hists
      .select(col("g").as("event_type"), explode(col("days")).as("dc"))
      .select(col("event_type"),
        date_from_unix_date(col("dc.day")).as("day"),
        col("dc.cents").as("x"))
      .withColumn("t", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))))
  }

  /** Stateless THEIL-SEN readout over the SAME [[cusumStream]]
    * day-histogram state — the robust-slope companion to the
    * Mann-Kendall readout, off one persisted sufficient statistic;
    * the rank-median pair arithmetic replays verbatim through the
    * shared `Analytics.theilSenFinish`.
    */
  def theilSenFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.theilSenFinish(dailyFromHistograms(hists))

  /** Stateless LAG-k AUTOCORRELATION readout over the SAME
    * [[cusumStream]] day-histogram state — the persistence view,
    * exact integer-dollar deviation products through the shared
    * `Analytics.acfFinish`.
    */
  def acfFromHistograms(hists: org.apache.spark.sql.DataFrame,
                        maxLag: Int = 7)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.acfFinish(dailyFromHistograms(hists), maxLag)

  /** Stateless PETTITT changepoint readout over the SAME
    * [[cusumStream]] day-histogram state — rank-based changepoint
    * location through the shared `Analytics.pettittFinish` (cp_day
    * reads the calendar day the histogram already carries).
    */
  def pettittFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.pettittFinish(dailyFromHistograms(hists))

  /** Stateless SES readout over the SAME [[cusumStream]]
    * day-histogram state — the forecasting member: the smoothing
    * recursion is order-dependent, but the t-ORDERED day histogram
    * is its exact sufficient statistic, so the sorted fold replays
    * verbatim through the shared `Analytics.sesFinish`.
    */
  def sesFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.sesFinish(dailyFromHistograms(hists))

  /** Stateless HOLT level+trend readout over the SAME state. */
  def holtFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.holtFinish(dailyFromHistograms(hists))

  /** The shared two-series (day, x, y) pivot from the persisted
    * [[cusumStream]] histograms: the per-type day map IS the daily
    * cents series, so days where BOTH types fired reconstruct exactly
    * [[graft.query.Analytics.xyDaily]]'s calendar pivot (per-day sums
    * over ≤ 2 histogram rows equal the batch per-day totals — exact
    * integers).
    */
  private def xyFromHistograms(hists: org.apache.spark.sql.DataFrame,
                               typeX: String, typeY: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    hists.filter(col("g").isin(typeX, typeY))
      .select(col("g"), explode(col("days")).as("dc"))
      .groupBy(col("dc.day").as("dayi"))
      .agg(sum(when(col("g") === typeX, col("dc.cents"))
          .otherwise(0L)).as("x"),
        sum(when(col("g") === typeY, col("dc.cents"))
          .otherwise(0L)).as("y"),
        max(when(col("g") === typeX, 1L).otherwise(0L)).as("hx"),
        max(when(col("g") === typeY, 1L).otherwise(0L)).as("hy"))
      .filter(col("hx") === 1L && col("hy") === 1L)
      .select(date_from_unix_date(col("dayi")).as("day"),
        col("x"), col("y"))
  }

  /** Stateless KENDALL τ-b readout over the SAME [[cusumStream]]
    * day-histogram state — the SIXTH estimator off one persisted
    * sufficient statistic (VERDICT r12 #3): τ is a pure function of
    * the joined daily series, which [[xyFromHistograms]] rebuilds
    * exactly; the S/tie/variance arithmetic replays verbatim through
    * the shared `Analytics.kendallTauFinish`.
    */
  def kendallTauFromHistograms(hists: org.apache.spark.sql.DataFrame,
                               typeX: String = "view",
                               typeY: String = "purchase")
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.kendallTauFinish(
      xyFromHistograms(hists, typeX, typeY))

  /** Stateless GRANGER readout over the SAME [[cusumStream]]
    * day-histogram state — the SEVENTH estimator (VERDICT r12 #3):
    * the lag frame, the 14 exact Gram moments and both nested-model
    * solves replay verbatim through the shared
    * `Analytics.grangerFinish` over the rebuilt daily series.
    */
  def grangerFromHistograms(hists: org.apache.spark.sql.DataFrame,
                            typeX: String = "view",
                            typeY: String = "purchase")
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.grangerFinish(
      xyFromHistograms(hists, typeX, typeY), typeX, typeY)

  /** Stateless SIGN-FLIP readout over the SAME [[cusumStream]]
    * day-histogram state — the FOURTH estimator off one persisted
    * sufficient statistic (CUSUM, seasonality, and now Fisher's
    * randomization test): the two types' day maps full-outer join
    * into the daily diff (0 where one side is silent — exactly the
    * batch conditional aggregate), and the shared
    * `Analytics.signFlipFinish` replays the batch arithmetic.
    */
  def signFlipFromHistograms(hists: org.apache.spark.sql.DataFrame,
                             typeX: String = "view",
                             typeY: String = "purchase",
                             b: Int = 64)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val daily = hists
      .filter(col("g").isin(typeX, typeY))
      .select(col("g"), explode(col("days")).as("dc"))
      .select(col("g"), col("dc.day").as("dayi"),
        col("dc.cents").as("cents"))
    val x = daily.filter(col("g") === typeX)
      .select(col("dayi"), col("cents").as("x"))
    val y = daily.filter(col("g") === typeY)
      .select(col("dayi"), col("cents").as("y"))
    graft.query.Analytics.signFlipFinish(
      x.join(y, Seq("dayi"), "full_outer")
        .select(date_from_unix_date(col("dayi")).as("day"),
          (coalesce(col("x"), lit(0L)) - coalesce(col("y"), lit(0L)))
            .as("d")),
      b)
  }

  case class CustMonthCents(cust: Long, m: Int, cents: Long)
  case class MonthCents(m: Int, cents: Long)
  case class CustHist(cust: Long, months: Seq[MonthCents])

  /** Incremental state for [[graft.query.Analytics.ltvCohorts]] —
    * cohort LTV live on an order feed. The cohort itself (first-order
    * month) is NOT incrementally monotone: a late-arriving EARLY
    * order must re-age its customer's whole curve. The per-customer
    * (month → cents) integer histogram is the sufficient statistic
    * that makes that correction exact — the stateless finish
    * (`Analytics.ltvFinish`) re-derives cohorts from scratch each
    * readout. State is bounded by active months per customer.
    */
  def ltvStream(orders: Dataset[CustMonthCents]): Dataset[CustHist] =
    orders.groupByKey(_.cust)(Encoders.scalaLong)
      .mapGroupsWithState[Map[Int, Long], CustHist](
        GroupStateTimeout.NoTimeout) {
        (c: Long, rows: Iterator[CustMonthCents],
         state: GroupState[Map[Int, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Int, Long])
          rows.foreach { r =>
            m = m.updated(r.m, m.getOrElse(r.m, 0L) + r.cents)
          }
          state.update(m)
          CustHist(c, m.toSeq.sortBy(_._1)
            .map(e => MonthCents(e._1, e._2)))
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[CustHist])

  /** Stateless finish for [[ltvStream]] — the shared
    * `Analytics.ltvFinish` over the exploded histograms; output
    * schema matches the batch operator for direct parity compare.
    */
  def ltvFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.query.Analytics.ltvFinish(hists
      .select(col("cust").as("o_custkey"),
        explode(col("months")).as("mc"))
      .select(col("o_custkey"), col("mc.m").cast("long").as("m"),
        col("mc.cents").as("cents")))
  }

  case class PriorityDur(g: String, t: Long, ev: Int)
  case class DurCell(t: Long, d: Long, c: Long)
  case class KmHist(g: String, cells: Seq[DurCell])

  /** Incremental state for [[graft.query.Analytics.kaplanMeier]] —
    * survival curves over a CONTINUOUS feed of completed/censored
    * durations. The estimator itself (at-risk counts, cumulative
    * product) re-ranks with every arrival, but the per-priority
    * (t → (events, censored)) histogram is mergeable integer state —
    * the third instance of the decayStream joint: persist the
    * sufficient statistic, leave the estimator to the stateless
    * finish. State is bounded by the duration range in days per
    * priority, not by order volume.
    */
  def kmStream(durs: Dataset[PriorityDur]): Dataset[KmHist] =
    durs.groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Map[Long, (Long, Long)], KmHist](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[PriorityDur],
         state: GroupState[Map[Long, (Long, Long)]]) =>
          var cells = state.getOption
            .getOrElse(Map.empty[Long, (Long, Long)])
          rows.foreach { r =>
            val (d, c) = cells.getOrElse(r.t, (0L, 0L))
            cells = cells.updated(r.t,
              if (r.ev == 1) (d + 1L, c) else (d, c + 1L))
          }
          state.update(cells)
          KmHist(g, cells.toSeq.sortBy(_._1)
            .map { case (t, (d, c)) => DurCell(t, d, c) })
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[KmHist])

  /** Stateless finish for [[kmStream]]: exactly the batch
    * [[graft.query.Analytics.kaplanMeier]] estimator (shared
    * `kmFinish` — at-risk windows, 1e6 fixed-point ln sums, the d = n
    * sentinel) applied to the emitted histograms; output schema
    * matches the batch operator, so the parity spec compares frames
    * directly.
    */
  def kmFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.query.Analytics.kmFinish(kmHistTimes(hists))
  }

  /** Stateless Nelson-Aalen readout over the SAME [[kmStream]]
    * histograms — one persisted sufficient statistic now feeds two
    * estimators (KM survival and NA cumulative hazard), which is the
    * point of persisting the histogram rather than the curve: the
    * shared `Analytics.naFinish` applies the batch arithmetic
    * verbatim, so the parity spec compares frames directly against
    * [[graft.query.Analytics.nelsonAalen]].
    */
  def naFromHistograms(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.naFinish(kmHistTimes(hists))

  /** The (priority, t, d, c) frame under both histogram readouts. */
  private def kmHistTimes(hists: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    hists
      .select(col("g").as("priority"), explode(col("cells")).as("dc"))
      .select(col("priority"), col("dc.t").as("t"),
        col("dc.d").as("d"), col("dc.c").as("c"))
  }

  case class DigitOne(digit: Int)
  case class DigitCount(digit: Int, n_obs: Long)

  /** Incremental state for [[graft.query.Analytics.benford]] — the
    * first-digit audit live on an order feed: the per-digit count is
    * the textbook mergeable statistic (one long per digit, nine
    * groups total), and the expected-share / χ² arithmetic is the
    * stateless finish. The fraud-screen version of the
    * sufficient-statistic joint: state is CONSTANT-sized (9 cells)
    * no matter how many orders stream through.
    */
  def benfordStream(digits: Dataset[DigitOne]): Dataset[DigitCount] =
    digits.groupByKey(_.digit)(Encoders.scalaInt)
      .mapGroupsWithState[Long, DigitCount](GroupStateTimeout.NoTimeout) {
        (d: Int, rows: Iterator[DigitOne], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          DigitCount(d, n)
      }(Encoders.scalaLong, Encoders.product[DigitCount])

  /** Stateless finish for [[benfordStream]]: exactly the batch
    * Benford arithmetic over the 9-row digit histogram; output
    * schema matches the batch operator.
    */
  def benfordFromCounts(counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.query.Analytics.benfordFinish(counts)

  case class DigestDoc(sha: String, doc_id: Long, n_bytes: Long)
  case class DupGroup(sha: String, keeper_doc_id: Long, n: Long,
                      total_bytes: Long)

  /** Streaming twin of [[graft.operators.Multimodal.mediaDedup]] —
    * exact-digest dedup over a CONTINUOUS media ingest: the stream
    * carries (digest, doc_id, n_bytes) — digests shuffle, payloads
    * never do, exactly the batch operator's asymmetry — and state per
    * digest is three longs (min doc_id, count, byte total), updated
    * by pure min/sum merges. After any prefix of micro-batches the
    * emitted groups filtered to n > 1 equal the batch operator over
    * the rows seen so far; a newly-arrived blob whose digest is
    * already live is flagged a duplicate in ITS OWN micro-batch — the
    * don't-store-it-twice signal a crawl ingest wants live rather
    * than at the next compaction run. O(1) state per distinct digest
    * (the keyspace IS the dedup index; a 24/7 deployment bounds it
    * with the [[rateLimitStream]] TTL pattern if digests churn).
    */
  def mediaDedupStream(rows: Dataset[DigestDoc]): Dataset[DupGroup] =
    rows.groupByKey(_.sha)(Encoders.STRING)
      .mapGroupsWithState[(Long, Long, Long), DupGroup](
        GroupStateTimeout.NoTimeout) {
        (sha: String, it: Iterator[DigestDoc],
         state: GroupState[(Long, Long, Long)]) =>
          var (keeper, n, bytes) = state.getOption
            .getOrElse((Long.MaxValue, 0L, 0L))
          it.foreach { r =>
            keeper = math.min(keeper, r.doc_id)
            n += 1L
            bytes += r.n_bytes
          }
          state.update((keeper, n, bytes))
          DupGroup(sha, keeper, n, bytes)
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[DupGroup])

  case class BandSig(band: Int, bv: Long, doc_id: Long,
                     w0: Long, w1: Long, w2: Long, w3: Long)
  case class SigDoc(doc_id: Long, w0: Long, w1: Long, w2: Long,
                    w3: Long)
  case class BucketState(band: Int, bv: Long, n: Long,
                         docs: Seq[SigDoc])

  /** Streaming twin of
    * [[graft.operators.Multimodal.mediaNearDupPairs]]' banded
    * candidate index — perceptual near-dup detection over a
    * CONTINUOUS media ingest. The batch hot-bucket exclusion is NOT
    * incrementally monotone (a bucket crossing `maxBucketDocs` late
    * would retract every pair it already produced), so the twin
    * splits at the decayStream joint: this operator maintains the
    * per-(band, band-word) signature bucket — the full arrival count
    * plus the member signatures WHILE the bucket is within the cap
    * (past it the member list is dropped: state stays ≤ cap
    * signatures per bucket and the count alone keeps growing) — and
    * [[neardupFromBuckets]] is the stateless finish that generates
    * pairs from surviving buckets and verifies exact Hamming, exactly
    * the batch semantics. The stream carries band words and signature
    * words only — payloads never enter it (the mediaDedupStream
    * asymmetry).
    */
  def neardupStream(rows: Dataset[BandSig], maxBucketDocs: Int = 100)
      : Dataset[BucketState] =
    rows.groupByKey(r => (r.band, r.bv))(
        Encoders.product[(Int, Long)])
      .mapGroupsWithState[(Long, Seq[SigDoc]), BucketState](
        GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), it: Iterator[BandSig],
         state: GroupState[(Long, Seq[SigDoc])]) =>
          var (n, docs) = state.getOption.getOrElse((0L, Seq.empty))
          val seen = scala.collection.mutable.Set(docs.map(_.doc_id): _*)
          it.foreach { r =>
            if (!seen.contains(r.doc_id)) {
              seen += r.doc_id
              n += 1L
              docs = if (n <= maxBucketDocs)
                docs :+ SigDoc(r.doc_id, r.w0, r.w1, r.w2, r.w3)
              else Seq.empty // past the cap: drop members, keep counting
            }
          }
          if (n > maxBucketDocs) docs = Seq.empty
          state.update((n, docs))
          BucketState(key._1, key._2, n, docs)
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[BucketState])

  /** Stateless finish for [[neardupStream]]: within-bucket pair
    * generation (a < b) from buckets at-or-under the cap, one
    * distinct across bands, popcount-of-XOR Hamming verify — the
    * batch operator's exact tail, so the parity spec compares pair
    * frames directly.
    */
  def neardupFromBuckets(buckets: org.apache.spark.sql.DataFrame,
                         maxHamming: Int = 8,
                         maxBucketDocs: Int = 100)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val pairs = buckets.filter(col("n") <= maxBucketDocs)
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("cast(bit_count(a.w0 ^ b.w0) + bit_count(a.w1 ^ b.w1)" +
          " + bit_count(a.w2 ^ b.w2) + bit_count(a.w3 ^ b.w3)" +
          " as int)").as("hamming"))
      .distinct()
    pairs.filter(col("hamming") <= maxHamming)
  }

  /** JVM twin of TextOps.fingerprint64 (md5 hex → first 15 digits →
    * long): non-negative (< 2⁶⁰), so plain `%` is pmod.
    */
  private def fp60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { // 15 hex digits = 7.5 bytes
      val b = d(i) & 0xff
      h = if (i == 7) (h << 4) | (b >> 4) else (h << 8) | b
      i += 1
    }
    h
  }
}
