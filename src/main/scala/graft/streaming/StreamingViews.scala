package graft.streaming

import graft.core.{FlumeLog, FlumeView}
import graft.views.Stats
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming-maintained views: the reference's per-view build loop
  * (`/root/reference/index.js:24-80`) as a Structured Streaming query.
  * Each micro-batch is the (viewSince, logSince] delta in seq order; the
  * checkpoint is the view cursor, so restart resumes incrementally —
  * exactly flume's `gt: view.since` replay contract. */
final class StreamingViewRunner(
    log: FlumeLog,
    view: FlumeView,
    mapper: Option[DataFrame => DataFrame] = None,
    checkpointDir: Option[String] = None,
    viewVersion: Int = 1) {

  private val seqCol = log.seqCol

  val query: StreamingQuery = {
    // Start the stream AT the view's own cursor (a seek): on a fresh
    // checkpoint the first batch is exactly (view.since, logSince] — the
    // reference build loop's `gt: upto` (`/root/reference/index.js:39`).
    // The view cursor is the source of truth; the checkpoint, when
    // present, wins (initial offsets are only consulted before the first
    // commit) and is an optimization, not a correctness requirement —
    // losing it no longer replays the log into a durable view.
    //
    // The checkpoint location is namespaced by the view VERSION: a
    // version bump wipes the view back to since = -1, and a stale
    // checkpoint whose committed offset is past the regressed cursor
    // would silently skip every seq ≤ that offset. A new version ⇒ a
    // fresh checkpoint ⇒ the stream reseeks to the (wiped) view cursor.
    val base = log.readStreamFrom(view.since)
    val src = mapper.fold(base)(f => f(base))
    var w = src.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val upto = batch.agg(max(col(seqCol))).head().getLong(0)
          // foreachBatch is at-least-once: a crash between a durable
          // absorb and the checkpoint commit replays the same batch on
          // restart. The replayed batch spans the identical seq interval,
          // so upto ≤ view.since detects it — skipping makes recovery
          // exactly-once for merge-style views (reduce/bloom/sketch)
          // whose absorb is not idempotent, not just the delta-protocol
          // views (hashtable/index) whose batch=<upto> overwrite is.
          if (upto > view.since) view.absorb(batch, upto)
        }
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", s"$d/v$viewVersion"))
    w.start()
  }

  /** Block until the view has absorbed everything appended so far — the
    * streaming analog of the read gate (`/root/reference/wrap.js:29-61`). */
  def awaitParity(): Unit = query.processAllAvailable()

  def stop(): Unit = query.stop()
}

/** Event-time analytics over the live log — the windowed-aggregation
  * family flume cannot express (SURVEY §2.4: no watermarks/event-time in
  * the reference; total seq order makes lateness impossible there). All
  * state is Spark-managed (HDFSBackedStateStore / RocksDB at scale).
  *
  * ==Streaming-state ERASURE (the takedown's state-store half)==
  * Every per-key machine takes an `erase` control stream — a streaming
  * DataFrame of retracted keys (the key column named like the event
  * stream's; event-time arms also need the machine's ts column, stamped
  * with the takedown time). Erase rows UNION into the event stream with
  * a sentinel flag, so they ride the same keyed shuffle to the key's
  * state partition — cluster-correct with no side channel. On arrival
  * the key's state is removed (mapGroupsWithState `state.remove()` also
  * drops its timeout; the TWS processor clears its ValueState and
  * deletes its timers, or an expired timer would re-emit the erased
  * snapshot), events of the same batch are dropped WITH it (they are
  * the erased user's data), and Update-mode machines emit an
  * empty-state tombstone snapshot so a latest-per-key consumer
  * overwrites its copy; Append-mode machines emit nothing (their
  * emitted history lives in the sink — retract it there, the views'
  * `retractWhere`). Later batches rebuild the key from zero.
  *
  * WATERMARK interaction: an erase row is an event — its event time
  * must be STRICTLY ahead of the stream's watermark or it is dropped
  * as late data (the late filter is inclusive — stamp erase requests
  * past the current max event time, e.g. at the takedown's wall-clock
  * time; the row itself advances the watermark like any other event).
  * In practice the takedown appends key rows to a control log whose
  * live tail feeds `erase` — the same intent-logged path as
  * [[graft.views.Retraction]], extended to the state stores. */
object StreamingViews {

  /** State-eviction knob shared by every per-key state machine below
    * (`idleTtl`): `None` (default) keeps state for every key ever seen —
    * byte-identical to the historical behavior; `Some(duration)` arms a
    * processing-time timeout per key, re-armed on every batch the key
    * appears in, so a key idle longer than the TTL is EVICTED at the
    * next triggered batch.
    *
    * Eviction semantics (documented per operator, uniform in shape):
    * the Update-mode snapshot machines (funnel / retention / type-set /
    * running-stats) emit the key's final snapshot one last time on
    * eviction — idempotent for a latest-per-key consumer — then drop
    * the state; the Append-mode emitters (paths / anomaly) emit nothing
    * (no n-gram or flag completes on an idle deadline). A key that
    * reactivates after eviction starts FRESH: a new funnel attempt at
    * stage 0, a new cohort dated at the reactivation (long-idle
    * returners count as new users), an empty type set / stats / window.
    * When full-history semantics are required, the batch operator over
    * the durable log IS the rebuild path — the same log-replay contract
    * every view relies on. At 100 TB this is the knob that bounds a
    * long-lived live view's state store to its ACTIVE key population
    * instead of every key ever seen.
    *
    * Operational caveat (Spark engine semantics, not ours): arming a
    * processing-time timeout makes `shouldRunAnotherBatch` permanently
    * true — the engine schedules timeout-sweep batches on EVERY trigger
    * tick, data or not. Pair `idleTtl` with a real trigger interval
    * (`Trigger.ProcessingTime("1 minute")` or similar); the default
    * run-ASAP trigger busy-loops sweeps, and
    * `StreamingQuery.processAllAvailable` never returns (it waits for a
    * no-work quiesce that timeout scheduling forbids) — gate tests and
    * parity checks on sink contents instead. */
  private def timeoutConf(idleTtl: Option[String]): GroupStateTimeout =
    idleTtl.fold(GroupStateTimeout.NoTimeout)(_ => GroupStateTimeout.ProcessingTimeTimeout)

  /** `evictAfter`: the EVENT-TIME eviction twin of [[timeoutConf]]'s
    * `idleTtl`, on every machine below. `Some(duration)` arms a
    * watermark-based `EventTimeTimeout` per key at (the key's max event
    * time this batch) + duration: the key evicts when the GLOBAL
    * watermark — a pure function of the event times in the data —
    * passes that deadline. Where `idleTtl` depends on wall-clock sweep
    * scheduling (checkpoint-recovery replay can evict differently than
    * the original run), `evictAfter` eviction is deterministic under
    * replay of the same log — the reference's totally-ordered
    * deterministic-replay semantic (`/root/reference/README.md:222-223`)
    * carried over to state eviction. Eviction SEMANTICS per operator
    * are identical to `idleTtl`'s (snapshot re-emit on the Update-mode
    * machines, silence on the Append-mode ones; reactivation starts
    * fresh). Operationally it is also the cheaper knob: no
    * processing-time sweep batches, so `processAllAvailable` still
    * quiesces. Exactly one of `idleTtl` / `evictAfter` may be set; the
    * machines without an event-time column take `tsCol` (epoch ms)
    * alongside. Spark requires the watermarked column to survive into
    * the stateful operator's child output, so the evict-arm plans carry
    * one extra timestamp column the fold ignores.
    *
    * INPUT-SIDE caveat — `evictAfter` is MORE than an
    * eviction-determinism twin of `idleTtl`: arming it adds
    * `withWatermark` to the input, and Spark drops rows whose event
    * time is older than the GLOBAL watermark minus `lateness` BEFORE
    * they reach the state machine. With cross-key event-time skew a
    * lagging key can lose events entirely — input loss `idleTtl` never
    * has (no watermark, every row is folded). The `lateness` parameter
    * (default "0 seconds") is the knob: it is the allowed cross-key
    * skew, and a deployment with straggling partitions should set it to
    * the expected skew bound. The default stays 0 because eviction
    * determinism is the point of this mode — a lateness window delays
    * every eviction by that bound, and for the in-order durable-log
    * replay these views are built for (seq order == time order per the
    * reference's total order) a late row cannot occur. Pinned by
    * StreamingSpec "evictAfter drops rows behind the watermark". */
  private def requireOneEviction(idleTtl: Option[String], evictAfter: Option[String]): Unit =
    require(idleTtl.isEmpty || evictAfter.isEmpty,
      "choose ONE eviction mode: idleTtl (processing-time) or evictAfter (event-time)")

  /** The small duration vocabulary `evictAfter` accepts, in ms. */
  private def durationMs(s: String): Long = {
    val pat = "(\\d+)\\s*(milliseconds?|millis?|ms|seconds?|secs?|s|minutes?|mins?|hours?|h|days?|d)".r
    s.trim.toLowerCase match {
      case pat(n, u) =>
        val mult =
          if (u.startsWith("milli") || u == "ms") 1L
          else if (u.startsWith("sec") || u == "s") 1000L
          else if (u.startsWith("min")) 60000L
          else if (u.startsWith("hour") || u == "h") 3600000L
          else 86400000L
        n.toLong * mult
      case _ => throw new IllegalArgumentException(s"cannot parse duration: '$s'")
    }
  }

  /** Arm the event-time deadline: the key's last activity + the TTL,
    * clamped above the current watermark (Spark rejects a deadline the
    * watermark has already passed — such a key evicts next batch). */
  private def armEventTimeout(state: GroupState[_], evictMs: Long, maxEtMs: Long): Unit =
    state.setTimeoutTimestamp(math.max(maxEtMs + evictMs, state.getCurrentWatermarkMs() + 1))

  /** Tumbling event-time counts with a watermark: late rows beyond
    * `watermark` are dropped, windows close and emit once (append mode). */
  def tumblingCounts(
      stream: DataFrame,
      tsCol: String,
      window_ : String = "1 hour",
      watermark: String = "30 minutes",
      aggCol: String = "value"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_).as("w"))
      .agg(count(lit(1)).as("cnt"), sum(col(aggCol)).as("sum_v"))
      .select(col("w.start").as("window_start"), col("cnt"), col("sum_v"))

  /** Per-key session windows (gap-based) on the stream. */
  def sessionCounts(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol), col("w.start").as("session_start"), col("cnt"))

  /** Streaming exact dedup: emit only the first record per key, with
    * state bounded by the watermark — the streaming half of the dedup
    * family (a pretraining ingest pipeline drops repeats at the door
    * rather than re-scanning the corpus). */
  def dedupStream(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: Option[String] = None,
      watermark: String = "1 hour"): DataFrame =
    tsCol match {
      case Some(ts) => stream.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
      case None => stream.dropDuplicates(keyCols)
    }

  /** [[runningStatsPerKey]] on the `transformWithState` API (Spark 4's
    * arbitrary-stateful-processing surface, the successor to
    * mapGroupsWithState): the same per-key Welford merge, held in a
    * typed `ValueState` inside a [[org.apache.spark.sql.streaming.StatefulProcessor]].
    * What TWS buys at scale: state lives in the RocksDB state store
    * (disk-backed, not executor-heap-bound — the provider TWS requires),
    * state variables are schema-evolvable and independently TTL-able,
    * and one processor can hold several typed states. The final per-key
    * state is micro-batching-invariant, so the SAME batch aggregate
    * oracles both implementations (`q_stream_state` / `q_stream_state_tws`). */
  /** `stateTtl`: the TWS-native eviction knob — per-VARIABLE state TTL
    * (`TTLConfig`), the API surface [[timeoutConf]]'s per-key timeouts
    * approximate on mapGroupsWithState. Semantics differ and are the
    * point of having both: TWS TTL expires SILENTLY (an expired key's
    * next read sees empty state and restarts — no final-snapshot
    * re-emission), is enforced per state variable rather than per key
    * function, and is cleaned up by the state store itself (RocksDB
    * compaction filters at scale) rather than by scheduled sweep
    * batches. Requires `TimeMode.ProcessingTime`, which — like the
    * mapGroupsWithState timeouts — keeps `shouldRunAnotherBatch` true:
    * pair with a real trigger interval and gate tests on sink contents. */
  /** `evictAfter` on the TWS surface: a per-key EVENT-TIME TIMER
    * (`getHandle.registerTimer`, `TimeMode.EventTime`) re-armed at
    * (the key's max event time this batch) + TTL — the deterministic
    * twin of `stateTtl`'s processing-time expiry, with the
    * mapGroupsWithState `evictAfter` SEMANTICS (the expired key's
    * final snapshot re-emits from `handleExpiredTimer`, then the state
    * clears), where `stateTtl` expires SILENTLY. Like every event-time
    * path: no sweep batches, `processAllAvailable` quiesces, replay
    * from a checkpoint evicts identically. Takes `tsCol` (epoch ms) +
    * `lateness` for the required watermark. */
  def runningStatsPerKeyTws(
      stream: DataFrame,
      keyCol: String,
      valueCol: String,
      stateTtl: Option[java.time.Duration] = None,
      evictAfter: Option[String] = None,
      tsCol: Option[String] = None,
      lateness: String = "0 seconds",
      erase: Option[DataFrame] = None): Dataset[(Long, Stats)] = {
    require(stateTtl.isEmpty || evictAfter.isEmpty,
      "choose ONE eviction mode: stateTtl (processing-time) or evictAfter (event-time)")
    val spark = stream.sparkSession
    import spark.implicits._
    evictAfter match {
      case Some(d) =>
        require(tsCol.nonEmpty, "evictAfter needs tsCol (epoch ms) as the event-time column")
        val ev = stream.select(col(keyCol).cast("long"), col(valueCol).cast("double"),
          timestamp_millis(col(tsCol.get).cast("long")).as("__et"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0.0),
            timestamp_millis(col(tsCol.get).cast("long")), lit(true))))
          .withWatermark("__et", lateness)
          .as[(Long, Double, java.sql.Timestamp, Boolean)]
          .groupByKey(_._1)
          .transformWithState(new WelfordEventTimeProcessor(durationMs(d)),
            org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Update())
      case None =>
        val (ttlConf, timeMode) = stateTtl match {
          case Some(d) => (org.apache.spark.sql.streaming.TTLConfig(d),
            org.apache.spark.sql.streaming.TimeMode.ProcessingTime())
          case None => (org.apache.spark.sql.streaming.TTLConfig.NONE,
            org.apache.spark.sql.streaming.TimeMode.None())
        }
        val ev = stream.select(col(keyCol).cast("long"), col(valueCol).cast("double"),
          lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0.0), lit(true))))
          .as[(Long, Double, Boolean)]
          .groupByKey(_._1)
          .transformWithState(new WelfordProcessor(ttlConf), timeMode, OutputMode.Update())
    }
  }

  /** Trailing-window state for [[rollingAnomalyPerKey]]: the last
    * `lookback` values of one key, in seq order. */
  final case class TrailingWindow(vals: Seq[Double])

  /** One flagged observation — schema-aligned with the batch
    * [[graft.ops.TimeSeries.rollingZscore]] so both share an oracle. */
  final case class AnomalyHit(key: Long, seq: Long, value: Double,
      sum_base: Double, sd_base: Double, n_base: Long, zscore: Option[Double])

  // Spark's Round(double, 4): BigDecimal.valueOf + HALF_UP — shared so
  // the streaming emission rounds exactly like the batch plan
  private def r4(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The [[graft.ops.TimeSeries.rollingZscore]] anomaly gate as per-key
    * streaming state (`flatMapGroupsWithState`, Append): a ring buffer
    * of each key's trailing `lookback` values scores every arriving
    * observation against its own history and emits ONLY the flagged
    * ones — the live-telemetry form, state O(lookback) per key, no
    * window re-scan per micro-batch. Rows are processed in `seqCol`
    * order within each batch (sorted here); across batches the source
    * must deliver per-key in seq order — the log stream source
    * contract (`README.md:222`), same assumption as every view. */
  /** The per-key scoring walk shared by both eviction arms: rows =
    * (seq, value), sorted here; returns the new window and the hits. */
  private def anomalyFold(key: Long, rows: Seq[(Long, Double)], vals0: Vector[Double],
      lookback: Int, minObs: Int, z: Double): (Vector[Double], Seq[AnomalyHit]) = {
    var vals = vals0
    val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyHit]
    rows.sortBy(_._1).foreach { case (seq, x) =>
      val n = vals.length
      if (n >= minObs) {
        var sum = 0.0
        vals.foreach(sum += _)
        val mean = sum / n
        var m2 = 0.0
        vals.foreach(v => m2 += (v - mean) * (v - mean))
        val sd = math.sqrt(m2 / n)
        val dev = math.abs(x - mean)
        if (dev >= z * sd && dev > 0)
          out += AnomalyHit(key, seq, x, r4(mean * n), r4(sd), n,
            if (sd > 0) Some(r4((x - mean) / sd)) else None)
      }
      vals = (vals :+ x).takeRight(lookback)
    }
    (vals, out.toSeq)
  }

  def rollingAnomalyPerKey(
      stream: DataFrame,
      keyCol: String,
      seqCol: String,
      valueCol: String,
      lookback: Int = 10,
      minObs: Int = 5,
      z: Double = 2.5,
      idleTtl: Option[String] = None,
      evictAfter: Option[String] = None,
      tsCol: Option[String] = None,
      lateness: String = "0 seconds",
      erase: Option[DataFrame] = None): Dataset[AnomalyHit] = {
    requireOneEviction(idleTtl, evictAfter)
    val spark = stream.sparkSession
    import spark.implicits._
    evictAfter match {
      case Some(d) =>
        require(tsCol.nonEmpty, "evictAfter needs tsCol (epoch ms) as the event-time column")
        val evictMs = durationMs(d)
        val ev = stream.select(col(keyCol).cast("long"), col(seqCol).cast("long"),
          col(valueCol).cast("double"),
          timestamp_millis(col(tsCol.get).cast("long")).as("__et"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0L), lit(0.0),
            timestamp_millis(col(tsCol.get).cast("long")), lit(true))))
          .withWatermark("__et", lateness)
          .as[(Long, Long, Double, java.sql.Timestamp, Boolean)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[TrailingWindow, AnomalyHit](
            OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
            case (_, _, state: GroupState[TrailingWindow]) if state.hasTimedOut =>
              state.remove()
              Iterator.empty
            case (key, rows, state: GroupState[TrailingWindow]) =>
              val rs = rows.toSeq
              if (rs.exists(_._5)) { state.remove(); Iterator.empty }
              else {
                armEventTimeout(state, evictMs, rs.iterator.map(_._4.getTime).max)
                val (vals, out) = anomalyFold(key, rs.map(r => (r._2, r._3)),
                  state.getOption.fold(Vector.empty[Double])(_.vals.toVector),
                  lookback, minObs, z)
                state.update(TrailingWindow(vals))
                out.iterator
              }
          }
      case None =>
        val ev = stream.select(col(keyCol).cast("long"), col(seqCol).cast("long"),
          col(valueCol).cast("double"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(
            col(keyCol).cast("long"), lit(0L), lit(0.0), lit(true))))
          .as[(Long, Long, Double, Boolean)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[TrailingWindow, AnomalyHit](
            OutputMode.Append(), timeoutConf(idleTtl)) {
            case (_, _, state: GroupState[TrailingWindow]) if state.hasTimedOut =>
              // evicted = cold telemetry key: its trailing window is gone;
              // reactivation rebuilds history from scratch (minObs gate)
              state.remove()
              Iterator.empty
            case (key, rows, state: GroupState[TrailingWindow]) =>
              val rs = rows.toSeq
              if (rs.exists(_._4)) { state.remove(); Iterator.empty }
              else {
                idleTtl.foreach(state.setTimeoutDuration)
                val (vals, out) = anomalyFold(key, rs.map(r => (r._2, r._3)),
                  state.getOption.fold(Vector.empty[Double])(_.vals.toVector),
                  lookback, minObs, z)
                state.update(TrailingWindow(vals))
                out.iterator
              }
          }
    }
  }

  /** Per-key funnel progress for [[funnelPerKey]]: how many stages are
    * matched, the seq where each fired, and the ts of the LAST matched
    * stage (the gap anchor for the time-bounded form; 0 when unused). */
  final case class FunnelProgress(stage: Int, seqs: Seq[Long], lastTs: Long = 0L)

  /** The [[graft.ops.Funnel]] ordered funnel as LIVE per-key state: a
    * (stage, seqs) cursor per key advances whenever the next expected
    * stage type arrives — O(stages) state per key, each event touched
    * once, emissions carry the key's current progress (Update mode).
    * Rows are processed in seq order within a batch; across batches the
    * source must deliver per-key in seq order (the log stream source
    * contract), the same assumption as [[rollingAnomalyPerKey]]. The
    * FINAL state per key equals the batch funnel — they share an
    * oracle.
    *
    * Time-bounded form (`tsCol` + `maxGap`, the batch operator's
    * expiring-funnel twin): a stage beyond the first advances only
    * while its ts is within `maxGap` of the gap ANCHOR — the previous
    * CHOSEN stage's ts (`gapFrom = "prev"`), or stage 1's for the
    * total-conversion-window form (`"first"`, ClickHouse
    * `windowFunnel`) — the greedy seq-order walk, so final state still
    * equals [[graft.ops.Funnel.funnel]] with the same gap mode. The
    * single `lastTs` field IS the anchor: updated per advance in
    * `"prev"`, pinned at stage 1 in `"first"`. */
  /** The greedy seq-order advance shared by both eviction arms: rows =
    * (seq, ms, type), sorted by seq here. */
  private def funnelAdvance(p0: FunnelProgress, rows: Seq[(Long, Long, String)],
      stages: Seq[String], maxGap: Option[Long], gapFrom: String): FunnelProgress = {
    var p = p0
    rows.sortBy(_._1).foreach { case (seq, ms, t) =>
      if (p.stage < stages.length && t == stages(p.stage) &&
          (maxGap.isEmpty || p.stage == 0 || ms - p.lastTs <= maxGap.get)) {
        val anchor = if (gapFrom == "first" && p.stage > 0) p.lastTs else ms
        p = FunnelProgress(p.stage + 1, p.seqs :+ seq, anchor)
      }
    }
    p
  }

  def funnelPerKey(
      stream: DataFrame,
      keyCol: String,
      seqCol: String,
      typeCol: String,
      stages: Seq[String],
      tsCol: Option[String] = None,
      maxGap: Option[Long] = None,
      gapFrom: String = "prev",
      idleTtl: Option[String] = None,
      evictAfter: Option[String] = None,
      lateness: String = "0 seconds",
      erase: Option[DataFrame] = None): Dataset[(Long, Seq[Long], Int)] = {
    require(maxGap.isEmpty || tsCol.nonEmpty, "maxGap needs tsCol to measure gaps on")
    require(gapFrom == "prev" || gapFrom == "first", s"gapFrom must be prev|first, got $gapFrom")
    requireOneEviction(idleTtl, evictAfter)
    val spark = stream.sparkSession
    import spark.implicits._
    val ts = tsCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    evictAfter match {
      case Some(d) =>
        require(tsCol.nonEmpty, "evictAfter needs tsCol (epoch ms) as the event-time column")
        val evictMs = durationMs(d)
        val ev = stream.select(col(keyCol).cast("long"), col(seqCol).cast("long"), ts.as("__ts"),
          col(typeCol), timestamp_millis(ts).as("__et"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0L), lit(0L),
            lit(""), timestamp_millis(col(tsCol.get).cast("long")), lit(true))))
          .withWatermark("__et", lateness)
          .as[(Long, Long, Long, String, java.sql.Timestamp, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[FunnelProgress, (Long, Seq[Long], Int)](
            GroupStateTimeout.EventTimeTimeout) {
            case (k, _, state: GroupState[FunnelProgress]) if state.hasTimedOut =>
              val p = state.get
              state.remove()
              (k, p.seqs, p.stage)
            case (k, rows, state: GroupState[FunnelProgress]) =>
              val rs = rows.toSeq
              if (rs.exists(_._6)) { state.remove(); (k, Nil, 0) }
              else {
                armEventTimeout(state, evictMs, rs.iterator.map(_._5.getTime).max)
                val p = funnelAdvance(state.getOption.getOrElse(FunnelProgress(0, Nil)),
                  rs.map(r => (r._2, r._3, r._4)), stages, maxGap, gapFrom)
                state.update(p)
                (k, p.seqs, p.stage)
              }
          }
      case None =>
        val ev = stream.select(col(keyCol).cast("long"), col(seqCol).cast("long"),
          ts.as("__ts"), col(typeCol), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(
            col(keyCol).cast("long"), lit(0L), lit(0L), lit(""), lit(true))))
          .as[(Long, Long, Long, String, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[FunnelProgress, (Long, Seq[Long], Int)](timeoutConf(idleTtl)) {
            case (k, _, state: GroupState[FunnelProgress]) if state.hasTimedOut =>
              // evicted = abandoned funnel: the final snapshot re-emits (a
              // latest-per-key consumer already holds it), then the cursor
              // drops; reactivation starts a NEW attempt at stage 0
              val p = state.get
              state.remove()
              (k, p.seqs, p.stage)
            case (k, rows, state: GroupState[FunnelProgress]) =>
              val rs = rows.toSeq
              // ERASURE tombstone (see the erasure notes on the object):
              // state + timeout drop, same-batch events drop with them
              if (rs.exists(_._5)) { state.remove(); (k, Nil, 0) }
              else {
                idleTtl.foreach(state.setTimeoutDuration)
                val p = funnelAdvance(state.getOption.getOrElse(FunnelProgress(0, Nil)),
                  rs.map(r => (r._2, r._3, r._4)), stages, maxGap, gapFrom)
                state.update(p)
                (k, p.seqs, p.stage)
              }
          }
    }
  }

  /** Per-key retention state for [[retentionPerKey]]: the key's cohort
    * (earliest activity period seen so far) and every distinct activity
    * period. */
  final case class RetentionProgress(cohortS: Long, periods: Seq[Long])

  /** [[graft.ops.Retention.retention]] as LIVE per-key state: each key
    * carries (first-seen period, distinct activity periods) and every
    * batch it appears in emits the key's full (cohort, offsets)
    * snapshot (Update mode). Snapshots are self-revising — a
    * late-arriving EARLIER period moves the cohort and re-derives every
    * offset, which an incremental per-(cohort, offset) count could
    * never retract — and strictly grow (a state change always adds a
    * period), so the latest snapshot per key is simply the one with
    * the most offsets and the final snapshots aggregate to exactly the
    * batch operator's answer: they share an oracle.
    *
    * State is O(distinct periods) per key — bounded by the key's
    * active days, the same cardinality the batch operator's activity
    * distinct carries per key; day granularity means ≤ 365 longs per
    * key-year, far below any hot-key threshold. */
  def retentionPerKey(
      stream: DataFrame,
      keyCol: String,
      periodCol: String,
      periodSeconds: Long = 86400L,
      idleTtl: Option[String] = None,
      evictAfter: Option[String] = None,
      lateness: String = "0 seconds",
      erase: Option[DataFrame] = None): Dataset[(Long, Long, Seq[Long])] = {
    requireOneEviction(idleTtl, evictAfter)
    val spark = stream.sparkSession
    import spark.implicits._
    evictAfter match {
      case Some(d) =>
        // the activity period IS the event time here (epoch seconds)
        val evictMs = durationMs(d)
        val ev = stream.select(col(keyCol).cast("long"), col(periodCol).cast("long"),
          timestamp_seconds(col(periodCol).cast("long")).as("__et"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0L),
            timestamp_seconds(col(periodCol).cast("long")), lit(true))))
          .withWatermark("__et", lateness)
          .as[(Long, Long, java.sql.Timestamp, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[RetentionProgress, (Long, Long, Seq[Long])](
            GroupStateTimeout.EventTimeTimeout) {
            case (k, _, state: GroupState[RetentionProgress]) if state.hasTimedOut =>
              val p = state.get
              state.remove()
              (k, p.cohortS * 1000L, p.periods.map(x => (x - p.cohortS) / periodSeconds))
            case (k, rows, state: GroupState[RetentionProgress]) =>
              val rs = rows.toSeq
              if (rs.exists(_._4)) { state.remove(); (k, 0L, Nil) }
              else {
                armEventTimeout(state, evictMs, rs.iterator.map(_._3.getTime).max)
                val prev = state.getOption.getOrElse(RetentionProgress(Long.MaxValue, Nil))
                val ps = (prev.periods.toSet ++ rs.map(_._2)).toSeq.sorted
                val cohort = ps.head
                state.update(RetentionProgress(cohort, ps))
                (k, cohort * 1000L, ps.map(p => (p - cohort) / periodSeconds))
              }
          }
      case None =>
        val ev = stream.select(col(keyCol).cast("long"), col(periodCol).cast("long"),
          lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0L), lit(true))))
          .as[(Long, Long, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[RetentionProgress, (Long, Long, Seq[Long])](timeoutConf(idleTtl)) {
            case (k, _, state: GroupState[RetentionProgress]) if state.hasTimedOut =>
              // evicted = cohort finalized: the key's last snapshot re-emits
              // and its history drops; a long-idle returner starts a NEW
              // cohort dated at reactivation (counts as a new user). Full
              // first-touch attribution = rebuild from the log (batch op).
              val p = state.get
              state.remove()
              (k, p.cohortS * 1000L, p.periods.map(x => (x - p.cohortS) / periodSeconds))
            case (k, rows, state: GroupState[RetentionProgress]) =>
              val rs = rows.toSeq
              if (rs.exists(_._3)) { state.remove(); (k, 0L, Nil) }
              else {
                idleTtl.foreach(state.setTimeoutDuration)
                val prev = state.getOption.getOrElse(RetentionProgress(Long.MaxValue, Nil))
                val ps = (prev.periods.toSet ++ rs.map(_._2)).toSeq.sorted
                val cohort = ps.head
                state.update(RetentionProgress(cohort, ps))
                (k, cohort * 1000L, ps.map(p => (p - cohort) / periodSeconds))
              }
          }
    }
  }

  /** Per-key distinct-type state for [[typeSetPerKey]]. */
  final case class TypeSet(types: Seq[String])

  /** The distinct (key, type) activity table behind
    * [[graft.ops.Affinity.typeAffinity]] as LIVE per-key state — the
    * last of the log-analytics quartet to get a streaming twin. Each
    * key carries its sorted distinct type set and emits the full
    * snapshot every batch it appears in (Update mode); snapshots
    * strictly grow (a state change always adds a type), so latest =
    * largest, and exploding the final snapshots reproduces the batch
    * operator's `base` table exactly — support/lift then follow from
    * the same arithmetic and the twins share an oracle. Pair expansion
    * and the global counts stay OUT of the state machine on purpose:
    * lift depends on the global key population, which no per-key
    * emission can maintain incrementally — the read-side aggregate is
    * where that join belongs (the [[retentionPerKey]] discipline).
    *
    * State is O(|type vocabulary|) per key — bounded by the event-type
    * alphabet, not event count. */
  def typeSetPerKey(
      stream: DataFrame,
      keyCol: String,
      typeCol: String,
      idleTtl: Option[String] = None,
      evictAfter: Option[String] = None,
      tsCol: Option[String] = None,
      lateness: String = "0 seconds",
      erase: Option[DataFrame] = None): Dataset[(Long, Seq[String])] = {
    requireOneEviction(idleTtl, evictAfter)
    val spark = stream.sparkSession
    import spark.implicits._
    evictAfter match {
      case Some(d) =>
        require(tsCol.nonEmpty, "evictAfter needs tsCol (epoch ms) as the event-time column")
        val evictMs = durationMs(d)
        val ev = stream.select(col(keyCol).cast("long"), col(typeCol),
          timestamp_millis(col(tsCol.get).cast("long")).as("__et"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(""),
            timestamp_millis(col(tsCol.get).cast("long")), lit(true))))
          .withWatermark("__et", lateness)
          .as[(Long, String, java.sql.Timestamp, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[TypeSet, (Long, Seq[String])](
            GroupStateTimeout.EventTimeTimeout) {
            case (k, _, state: GroupState[TypeSet]) if state.hasTimedOut =>
              val p = state.get
              state.remove()
              (k, p.types)
            case (k, rows, state: GroupState[TypeSet]) =>
              val rs = rows.toSeq
              if (rs.exists(_._4)) { state.remove(); (k, Nil) }
              else {
                armEventTimeout(state, evictMs, rs.iterator.map(_._3.getTime).max)
                val prev = state.getOption.getOrElse(TypeSet(Nil))
                val ts = (prev.types.toSet ++ rs.map(_._2)).toSeq.sorted
                state.update(TypeSet(ts))
                (k, ts)
              }
          }
      case None =>
        val ev = stream.select(col(keyCol).cast("long"), col(typeCol), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(""), lit(true))))
          .as[(Long, String, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[TypeSet, (Long, Seq[String])](timeoutConf(idleTtl)) {
            case (k, _, state: GroupState[TypeSet]) if state.hasTimedOut =>
              // evicted = affinity membership finalized: final snapshot
              // re-emits, set drops; reactivation rebuilds an empty set
              val p = state.get
              state.remove()
              (k, p.types)
            case (k, rows, state: GroupState[TypeSet]) =>
              val rs = rows.toSeq
              if (rs.exists(_._3)) { state.remove(); (k, Nil) }
              else {
                idleTtl.foreach(state.setTimeoutDuration)
                val prev = state.getOption.getOrElse(TypeSet(Nil))
                val ts = (prev.types.toSet ++ rs.map(_._2)).toSeq.sorted
                state.update(TypeSet(ts))
                (k, ts)
              }
          }
    }
  }

  /** Per-key path state for [[pathsPerKey]]: the ms of the key's last
    * event and the trailing n−1 event types of its CURRENT session. */
  final case class PathWindow(hasLast: Boolean, lastMs: Long, tail: Seq[String])

  /** [[graft.ops.Paths.topPaths]]'s n-gram generation as LIVE per-key
    * state (the quartet's last batch-only member): a trailing window of
    * n−1 event types per key slides along the session, emitting each
    * completed n-gram exactly once (Append mode) — so the emission
    * table grouped by path equals the batch operator's counts and they
    * share an oracle. A session break (gap ≥ `gapMs` vs the previous
    * event) resets the window, exactly the batch `new_s` rule.
    *
    * State is O(n) per key — two strings and a long at the default
    * trigram setting, the smallest state machine here. Rows are
    * processed in (ms, seq) order within a batch; across batches the
    * source must deliver per-key in event-time order — a stricter
    * contract than funnel's seq order, satisfied when ts is assigned
    * at append (monotone with seq per key, as in the events fixture);
    * a late cross-batch event would need the retention view's
    * self-revising-snapshot form instead, at O(history) state. */
  /** The sliding n-gram walk shared by both eviction arms: rows =
    * (ms, seq, type), sorted by (ms, seq) here. */
  private def pathsFold(st0: PathWindow, rows: Seq[(Long, Long, String)],
      gapMs: Long, n: Int): (PathWindow, Seq[String]) = {
    var st = st0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    rows.sortBy(r => (r._1, r._2)).foreach { case (ms, _, et) =>
      val window =
        if (!st.hasLast || ms - st.lastMs >= gapMs) Seq(et)
        else st.tail :+ et
      if (window.length == n) out += window.mkString(">")
      st = PathWindow(hasLast = true, ms, window.takeRight(n - 1))
    }
    (st, out.toSeq)
  }

  def pathsPerKey(
      stream: DataFrame,
      keyCol: String,
      msCol: String,
      seqCol: String,
      typeCol: String,
      gapMs: Long = 600000L,
      n: Int = 3,
      idleTtl: Option[String] = None,
      evictAfter: Option[String] = None,
      lateness: String = "0 seconds",
      erase: Option[DataFrame] = None): Dataset[String] = {
    require(n >= 2, "a path needs at least 2 steps")
    requireOneEviction(idleTtl, evictAfter)
    val spark = stream.sparkSession
    import spark.implicits._
    evictAfter match {
      case Some(d) =>
        // msCol IS the event time; evictAfter ≥ gapMs agrees with the
        // session rule (the next event would reset the window anyway)
        val evictMs = durationMs(d)
        val ev = stream.select(col(keyCol).cast("long"), col(msCol).cast("long"),
          col(seqCol).cast("long"), col(typeCol),
          timestamp_millis(col(msCol).cast("long")).as("__et"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"),
            col(msCol).cast("long"), lit(0L), lit(""),
            timestamp_millis(col(msCol).cast("long")), lit(true))))
          .withWatermark("__et", lateness)
          .as[(Long, Long, Long, String, java.sql.Timestamp, Boolean)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[PathWindow, String](
            OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
            case (_, _, state: GroupState[PathWindow]) if state.hasTimedOut =>
              state.remove()
              Iterator.empty
            case (_, rows, state: GroupState[PathWindow]) =>
              val rs = rows.toSeq
              if (rs.exists(_._6)) { state.remove(); Iterator.empty }
              else {
                armEventTimeout(state, evictMs, rs.iterator.map(_._5.getTime).max)
                val (st, out) = pathsFold(
                  state.getOption.getOrElse(PathWindow(false, 0L, Nil)),
                  rs.map(r => (r._2, r._3, r._4)), gapMs, n)
                state.update(st)
                out.iterator
              }
          }
      case None =>
        val ev = stream.select(col(keyCol).cast("long"), col(msCol).cast("long"),
          col(seqCol).cast("long"), col(typeCol), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(
            col(keyCol).cast("long"), lit(0L), lit(0L), lit(""), lit(true))))
          .as[(Long, Long, Long, String, Boolean)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[PathWindow, String](
            OutputMode.Append(), timeoutConf(idleTtl)) {
            case (_, _, state: GroupState[PathWindow]) if state.hasTimedOut =>
              // evicted = session closed on an idle deadline: no n-gram
              // completes; with ttl ≥ gapMs this agrees with the session
              // rule — the next event would have reset the window anyway
              state.remove()
              Iterator.empty
            case (_, rows, state: GroupState[PathWindow]) =>
              val rs = rows.toSeq
              if (rs.exists(_._5)) { state.remove(); Iterator.empty }
              else {
                idleTtl.foreach(state.setTimeoutDuration)
                val (st, out) = pathsFold(
                  state.getOption.getOrElse(PathWindow(false, 0L, Nil)),
                  rs.map(r => (r._2, r._3, r._4)), gapMs, n)
                state.update(st)
                out.iterator
              }
          }
    }
  }

  /** Custom incremental state via mapGroupsWithState: running
    * count/mean/M2 per key, merged with Welford — the streaming analog of
    * the reduce view, keyed. Demonstrates arbitrary user state where
    * built-in aggs don't fit (`KeyValueGroupedDataset.mapGroupsWithState`). */
  /** The Welford fold shared by both eviction arms (and bit-identical
    * to [[WelfordProcessor]]'s). */
  private def statsFold(prev: Option[Stats], values: Iterator[Double]): Stats = {
    val batch = values.foldLeft(Stats(0, 0.0, 0.0)) { (s, v) =>
      val n = s.n + 1
      val d = v - s.mean
      val mean = s.mean + d / n
      Stats(n, mean, s.m2 + d * (v - mean))
    }
    prev.fold(batch)(_.merge(batch))
  }

  def runningStatsPerKey(
      stream: DataFrame,
      keyCol: String,
      valueCol: String,
      idleTtl: Option[String] = None,
      evictAfter: Option[String] = None,
      tsCol: Option[String] = None,
      lateness: String = "0 seconds",
      erase: Option[DataFrame] = None): Dataset[(Long, Stats)] = {
    requireOneEviction(idleTtl, evictAfter)
    val spark = stream.sparkSession
    import spark.implicits._
    evictAfter match {
      case Some(d) =>
        require(tsCol.nonEmpty, "evictAfter needs tsCol (epoch ms) as the event-time column")
        val evictMs = durationMs(d)
        val ev = stream.select(col(keyCol).cast("long"), col(valueCol).cast("double"),
          timestamp_millis(col(tsCol.get).cast("long")).as("__et"), lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0.0),
            timestamp_millis(col(tsCol.get).cast("long")), lit(true))))
          .withWatermark("__et", lateness)
          .as[(Long, Double, java.sql.Timestamp, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[Stats, (Long, Stats)](GroupStateTimeout.EventTimeTimeout) {
            case (key, _, state: GroupState[Stats]) if state.hasTimedOut =>
              val p = state.get
              state.remove()
              (key, p)
            case (key, rows, state: GroupState[Stats]) =>
              val rs = rows.toSeq
              if (rs.exists(_._4)) { state.remove(); (key, Stats(0, 0.0, 0.0)) }
              else {
                armEventTimeout(state, evictMs, rs.iterator.map(_._3.getTime).max)
                val merged = statsFold(state.getOption, rs.iterator.map(_._2))
                state.update(merged)
                (key, merged)
              }
          }
      case None =>
        val ev = stream.select(col(keyCol).cast("long"), col(valueCol).cast("double"),
          lit(false).as("__erase"))
        erase.fold(ev)(e => ev.union(e.select(col(keyCol).cast("long"), lit(0.0), lit(true))))
          .as[(Long, Double, Boolean)]
          .groupByKey(_._1)
          .mapGroupsWithState[Stats, (Long, Stats)](timeoutConf(idleTtl)) {
            case (key, _, state: GroupState[Stats]) if state.hasTimedOut =>
              // evicted = counters flushed: final snapshot re-emits, then
              // the key restarts from zero on reactivation
              val p = state.get
              state.remove()
              (key, p)
            case (key, rows, state: GroupState[Stats]) =>
              val rs = rows.toSeq
              if (rs.exists(_._3)) { state.remove(); (key, Stats(0, 0.0, 0.0)) }
              else {
                idleTtl.foreach(state.setTimeoutDuration)
                val merged = statsFold(state.getOption, rs.iterator.map(_._2))
                state.update(merged)
                (key, merged)
              }
          }
    }
  }
}

/** Per-key Welford state as a Spark 4 `StatefulProcessor`: one typed
  * `ValueState[Stats]`, updated with the same fold/merge as the
  * mapGroupsWithState twin (bit-identical state transitions, so the two
  * implementations share an oracle). */
/** The event-time-evicting Welford processor: same fold as
  * [[WelfordProcessor]], plus one per-key EVENT-TIME timer re-armed on
  * every batch the key appears in at (max event time) + `evictMs`,
  * clamped above the current watermark. When the watermark passes the
  * deadline, [[handleExpiredTimer]] re-emits the key's final snapshot
  * (idempotent for a latest-per-key consumer — the mapGroupsWithState
  * `evictAfter` semantic, deliberately different from `stateTtl`'s
  * silent expiry) and clears the state: a reactivated key restarts
  * from zero. Eviction is a pure function of the event times, so
  * checkpoint replay evicts identically. */
private[streaming] class WelfordEventTimeProcessor(evictMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double, java.sql.Timestamp, Boolean), (Long, Stats)] {
  @transient private var state: org.apache.spark.sql.streaming.ValueState[Stats] = _

  override def init(
      outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[Stats]("welford",
      org.apache.spark.sql.Encoders.product[Stats],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double, java.sql.Timestamp, Boolean)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Stats)] = {
    val rs = rows.toSeq
    if (rs.exists(_._4)) {
      // ERASURE tombstone: state AND the pending eviction timer drop —
      // an expired timer would otherwise re-emit the erased snapshot
      state.clear()
      getHandle.listTimers().toList.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      return Iterator.single((key, Stats(0, 0.0, 0.0)))
    }
    val batch = rs.iterator.map(_._2).foldLeft(Stats(0, 0.0, 0.0)) { (s, v) =>
      val n = s.n + 1
      val d = v - s.mean
      val mean = s.mean + d / n
      Stats(n, mean, s.m2 + d * (v - mean))
    }
    val merged = Option(state.get()).fold(batch)(_.merge(batch))
    state.update(merged)
    // one live timer per key: drop the stale deadline, arm the new one.
    // Materialize the timer list BEFORE deleting — deleteTimer while
    // iterating a state-store-backed iterator is provider-dependent
    // (passes under RocksDB, undefined under the default HDFS store).
    getHandle.listTimers().toList.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer(math.max(
      rs.iterator.map(_._3.getTime).max + evictMs,
      timerValues.getCurrentWatermarkInMs() + 1))
    Iterator.single((key, merged))
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(Long, Stats)] = {
    val last = Option(state.get())
    state.clear()
    last.iterator.map(s => (key, s))
  }
}

private[streaming] class WelfordProcessor(
    ttl: org.apache.spark.sql.streaming.TTLConfig =
      org.apache.spark.sql.streaming.TTLConfig.NONE)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double, Boolean), (Long, Stats)] {
  @transient private var state: org.apache.spark.sql.streaming.ValueState[Stats] = _

  override def init(
      outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[Stats]("welford",
      org.apache.spark.sql.Encoders.product[Stats], ttl)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double, Boolean)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Stats)] = {
    val rs = rows.toSeq
    if (rs.exists(_._3)) {
      state.clear()
      return Iterator.single((key, Stats(0, 0.0, 0.0)))
    }
    val batch = rs.iterator.map(_._2).foldLeft(Stats(0, 0.0, 0.0)) { (s, v) =>
      val n = s.n + 1
      val d = v - s.mean
      val mean = s.mean + d / n
      Stats(n, mean, s.m2 + d * (v - mean))
    }
    val merged = Option(state.get()).fold(batch)(_.merge(batch))
    state.update(merged)
    Iterator.single((key, merged))
  }
}
