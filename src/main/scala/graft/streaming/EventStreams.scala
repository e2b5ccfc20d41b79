package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` schema (SURVEY.md §7.2
  * M4): event-time tumbling/sliding/session windows with watermarks, plus a
  * custom stateful sessionizer via flatMapGroupsWithState.
  *
  * Every transform takes a DataFrame that may be either a `readStream`
  * source or a static batch frame — the plans are identical (that's the
  * point of Structured Streaming), and the batch forms are what the
  * DuckDB-checked queries q30-q32 pin down semantically.
  *
  * Scale notes: watermark + windowed agg keeps per-key state bounded by
  * (watermark horizon / slide) windows; state lives in the state store,
  * partitioned by grouping key — the same hash-shuffle discipline as batch.
  */
object EventStreams {

  /** Streaming SRM arm counts — all-time distinct users per experiment
    * arm (arm = portable hash of user_id mod 2), maintained
    * continuously: the live twin of the batch q286 guardrail, because a
    * ramp bug shows up in the assignment stream long before a batch
    * audit runs. State contract: the dedup holds ONE entry per distinct
    * user — POPULATION-bounded, not stream-length-bounded (the q94
    * unbounded-state lesson applies to time-derived dedup keys; this
    * key set is the user population itself, the same per-user-state
    * shape as the q102 profile store). Downstream the per-arm counts
    * are an ordinary complete-mode aggregation over the deduped
    * append stream. */
  def armCounts(events: DataFrame): DataFrame =
    events.select(col("user_id"))
      .dropDuplicates("user_id")
      .select((graft.functions.TextOps.portableHash(
        concat(lit("arm:"), col("user_id").cast("string"))) % 2)
        .as("arm"))
      .groupBy(col("arm")).agg(count(lit(1)).as("n_users"))

  /** Declared source schema for an events file stream, derived from the
    * feed's own parquet footer at stream start (streams require a declared
    * schema — no inference at runtime). The feed's physical ts type has
    * already flipped once (TIMESTAMP(NANOS)/ns-long → TIMESTAMP(MICROS));
    * a statically declared form would break the stream source on the next
    * regeneration while the batch path survives, so the declared schema
    * is read from the same footer the batch reader sees — under the same
    * session confs (nanosAsLong, inferTimestampNTZ), so stream and batch
    * agree on the arrival type by construction, and
    * [[graft.sources.Tables.normalizeTs]] stays the one downstream
    * adaptation point for whatever form arrives. The footer read is one
    * driver-side metadata fetch — O(1), not a data scan. */
  def eventSchemaFor(spark: org.apache.spark.sql.SparkSession,
                     feedPath: String): StructType =
    spark.read.parquet(feedPath).schema

  /** Tumbling 1-minute event-time windows; late data beyond the watermark
    * is dropped (streaming) / ignored (batch: no-op). */
  def tumblingCounts(events: DataFrame,
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n"), col("total"))

  /** Sliding 2-hour windows advancing hourly. */
  def slidingCounts(events: DataFrame,
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("w_start"), col("n"), col("total"))

  /** Session windows: built-in session_window with a 30-minute gap —
    * the streaming twin of the batch lag/cumsum sessionizer (q30). */
  def sessionCounts(events: DataFrame,
                    watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total"))

  /** Stream-stream inner join with event-time range: purchases within 30
    * minutes after a click by the same user. Both sides carry watermarks
    * and the join has a time-range condition, so each side's buffered
    * state is bounded — the requirement for unbounded-stream joins. */
  def clickPurchaseJoin(clicks: DataFrame,
                        purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("value"))
  }

  // ---- custom state: flatMapGroupsWithState sessionizer ----

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionBuf(startSec: Long, lastSec: Long, n: Int, total: Double)
  case class ClosedSession(user_id: Long, start_sec: Long, end_sec: Long,
                           n_events: Int, total_value: Double)

  case class Ev2(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class UserProgress(lastSec: Long, n: Long)
  case class EnrichedEv(user_id: Long, event_id: Long, sec: Long,
                        gap_sec: Long, seq: Long)

  /** Stateful per-user event enrichment via flatMapGroupsWithState: each
    * event is annotated with the gap (seconds) since that user's previous
    * event (−1 for the first ever) and the user's running event index —
    * the dwell-time / nth-interaction features a training pipeline derives
    * from clickstreams. Unlike a batch lag() window this carries state
    * ACROSS micro-batches: per user the state is two longs, O(1) forever.
    * Events inside a batch are sorted by (ts, event_id) so tie order — and
    * therefore the oracle (lag/row_number over the same ordering) — is
    * deterministic. */
  def enrichStateful(events: Dataset[Ev2]): Dataset[EnrichedEv] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserProgress, EnrichedEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev2], state: GroupState[UserProgress]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(UserProgress(-1L, 0L))
          val out = sorted.map { e =>
            val sec = e.ts.getTime / 1000L
            val gap = if (st.lastSec < 0) -1L else sec - st.lastSec
            st = UserProgress(sec, st.n + 1)
            EnrichedEv(user, e.event_id, sec, gap, st.n)
          }
          state.update(st)
          out.iterator
      }
  }

  case class Ev3(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                 cents: Long)
  case class EwmaBuf(prior: Seq[Long]) // newest first, bounded to 16
  case class EwmaEv(user_id: Long, event_id: Long, num: Long, denom: Long,
                    is_spike: Boolean, is_dip: Boolean)

  /** Streaming EWMA + anomaly gate — the stateful twin of batch q184:
    * the same dyadic integer arithmetic (α=1/2 over the trailing 16
    * events: numerator = one Horner pass newest-first, denominator =
    * 2^n − 1, anomaly predicates compare integers), but the baseline is
    * CARRIED ACROSS MICRO-BATCHES in per-user state — the last ≤16
    * integer cents, O(1) per key forever. This is the deployment shape
    * of q184: flag a metric spike the moment its event arrives, not at
    * the end of a batch job. Events inside a batch are sorted by
    * (ts-to-nanos, event_id) so tie order matches the batch oracle's
    * window order. NOTE the `it.toSeq` sort buffers one key's slice of
    * ONE micro-batch transiently (carried state stays O(1)); a 100-TB
    * deployment bounds that buffer by sizing the trigger interval /
    * `maxFilesPerTrigger`, exactly as it bounds shuffle spill. */
  def ewmaStateful(events: Dataset[Ev3]): Dataset[EwmaEv] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaBuf, EwmaEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev3], state: GroupState[EwmaBuf]) =>
          val sorted = it.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var prior = state.getOption.getOrElse(EwmaBuf(Nil)).prior
          val out = sorted.map { e =>
            val num = prior.foldLeft(0L)((a, x) => a * 2 + x)
            val denom = (1L << prior.length) - 1
            val spike = denom > 0 && e.cents * denom > num * 3
            val dip = denom > 0 && e.cents * denom * 3 < num
            prior = (e.cents +: prior).take(16)
            EwmaEv(user, e.event_id, num, denom, spike, dip)
          }
          state.update(EwmaBuf(prior))
          out.iterator
      }
  }

  /** One row of the tagged AS-OF stream: a dimension version-update
    * (`is_fact` = 0, payload `cents`) or a fact to enrich (`is_fact` = 1).
    * `usec` is event time in epoch micros — full ts resolution, so the
    * "version at or before the fact" comparison matches a timestamp
    * oracle exactly. */
  case class TagEv(user_id: Long, event_id: Long, usec: Long,
                   is_fact: Int, cents: Long)
  /** Carried per-key state: the CURRENT dimension version (its event
    * time, tie-breaking id, payload) plus the version ordinal — four
    * longs per key, O(1) forever. */
  case class AsofState(usec: Long, eid: Long, cents: Long, seq: Long)
  case class AsofEv(user_id: Long, event_id: Long, usec: Long,
                    valid_cents: Option[Long], ver_seq: Long)

  /** Streaming AS-OF (point-in-time) enrichment — the deployment shape
    * of batch q189's temporal join: a live fact stream enriched against
    * a slowly-changing dimension, with the dimension's CURRENT version
    * carried per key in `flatMapGroupsWithState` state. Both flows ride
    * ONE tagged stream (the asof-union trick lifted into streaming —
    * exactly how a CDC bus delivers dim updates and facts on one topic):
    * within a batch rows sort by (usec, is_fact, event_id) so a version
    * dated at the same instant as a fact is visible to it (dims first),
    * and across micro-batches the state hands every later fact the last
    * version adopted — the two-batch spec pins that a version change
    * between batches re-routes subsequent facts. Facts that predate
    * every version keep a NULL enrichment (the honest AS-OF miss).
    *
    * A version OLDER than the current one (out-of-order across a batch
    * boundary) is ignored — the same "late data beyond the reorder
    * horizon is dropped" contract a watermark gives windowed aggs; in a
    * bounded single-batch replay the in-batch sort makes the result
    * equal the batch interval-join oracle. State is four longs per key;
    * the per-batch `it.toSeq` sort is trigger-interval-bounded (see
    * [[ewmaStateful]]'s note). */
  def asofEnrichStateful(tagged: Dataset[TagEv]): Dataset[AsofEv] = {
    import tagged.sparkSession.implicits._
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TagEv], state: GroupState[AsofState]) =>
          val sorted = it.toSeq.sortBy(e => (e.usec, e.is_fact, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AsofEv]
          sorted.foreach { e =>
            if (e.is_fact == 0) {
              if (st == null || e.usec > st.usec ||
                  (e.usec == st.usec && e.event_id > st.eid))
                st = AsofState(e.usec, e.event_id, e.cents,
                  (if (st == null) 0L else st.seq) + 1L)
            } else {
              out += (if (st == null)
                AsofEv(user, e.event_id, e.usec, None, 0L)
              else
                AsofEv(user, e.event_id, e.usec, Some(st.cents), st.seq))
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** One CDC change event: op ∈ {I, U, D} on the per-user row, payload
    * `cents`. */
  case class CdcEv(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                   op: String, cents: Long)
  /** Carried per-key state: row presence + change count — two scalars,
    * O(1) forever. */
  case class CdcSt(present: Boolean, n: Long)
  case class CdcOut(user_id: Long, event_id: Long, op: String,
                    was_present: Boolean, exists_after: Boolean,
                    value_cents: Option[Long], effect: String,
                    n_changes: Long)

  /** Streaming CDC apply — the stateful twin of batch q116: a
    * change-event bus (insert/update/delete per primary key) applied to
    * a keyed table AS THE EVENTS ARRIVE, each change classified against
    * the row's presence carried across micro-batches (`was_present` is
    * the column only state can provide: an upsert is an `insert` the
    * first time and an `update` after, and a delete of an absent row is
    * the idempotent `noop_delete` a real apply pipeline must tolerate —
    * the at-least-once-delivery case). Upsert semantics: I and U both
    * materialize the payload (so replaying I∘D∘U converges to U's row,
    * matching q116's last-op batch readout); D clears presence and
    * yields a NULL value. State is two scalars per key; within a batch
    * events sort by (ts-to-nanos, event_id) so tie order matches the
    * batch window oracle (`it.toSeq` is trigger-bounded, see
    * [[ewmaStateful]]'s note). */
  def cdcApplyStateful(events: Dataset[CdcEv]): Dataset[CdcOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcSt, CdcOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[CdcEv], state: GroupState[CdcSt]) =>
          val sorted = it.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var st = state.getOption.getOrElse(CdcSt(present = false, 0L))
          val out = sorted.map { e =>
            val was = st.present
            val after = e.op != "D"
            val effect =
              if (e.op == "D") { if (was) "delete" else "noop_delete" }
              else if (was) "update" else "insert"
            st = CdcSt(after, st.n + 1)
            CdcOut(user, e.event_id, e.op, was, after,
              if (after) Some(e.cents) else None, effect, st.n)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Stateful sessionizer WITH event-time timeout — the production form
    * [[sessionizeStateful]]'s scaladoc promises: a session also closes
    * when the user goes idle past the gap and the WATERMARK proves no
    * in-gap event can still arrive (`GroupStateTimeout.EventTimeTimeout`
    * + `setTimeoutTimestamp(lastSec + gap)`), so idle users' sessions
    * flush instead of squatting in the state store forever — the state-
    * HYGIENE half of the bounded-state story (NoTimeout bounds state per
    * key; the timeout bounds the number of LIVE keys). Sessions closed
    * by a successor event emit exactly as before; a timed-out flush
    * emits on the timeout invocation (empty iterator, hasTimedOut) and
    * removes the state. In a bounded replay, sessions idle less than
    * (gap + watermark delay) before the stream's end are un-flushable —
    * the same finalization boundary as the outer joins (q147). */
  def sessionizeTimeout(events: Dataset[Ev], gapSec: Long)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionBuf]) =>
          if (!it.hasNext && state.hasTimedOut) {
            val b = state.get
            state.remove()
            Iterator.single(
              ClosedSession(user, b.startSec, b.lastSec, b.n, b.total))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val closed = Seq.newBuilder[ClosedSession]
            var buf = state.getOption.orNull
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000L
              buf match {
                case null =>
                  buf = SessionBuf(sec, sec, 1, e.value)
                case b if sec - b.lastSec > gapSec =>
                  closed += ClosedSession(user, b.startSec, b.lastSec,
                    b.n, b.total)
                  buf = SessionBuf(sec, sec, 1, e.value)
                case b =>
                  buf = SessionBuf(b.startSec, sec, b.n + 1,
                    b.total + e.value)
              }
            }
            if (buf != null) {
              state.update(buf)
              state.setTimeoutTimestamp((buf.lastSec + gapSec) * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Custom stateful sessionizer: emits a session when a subsequent event
    * arrives more than `gapSec` after the previous one. State per user is
    * one open-session buffer — O(1) per key regardless of stream length;
    * the `it.toSeq` sort below buffers one key's per-batch slice only,
    * bounded by the trigger interval (see [[ewmaStateful]]'s note).
    * (NoTimeout keeps it deterministic for tests; production would add
    * EventTimeTimeout to flush idle sessions at the watermark — see
    * [[sessionizeTimeout]].) */
  def sessionizeStateful(events: Dataset[Ev], gapSec: Long)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionBuf]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val closed = Seq.newBuilder[ClosedSession]
          var buf = state.getOption.orNull
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000L
            buf match {
              case null =>
                buf = SessionBuf(sec, sec, 1, e.value)
              case b if sec - b.lastSec > gapSec =>
                closed += ClosedSession(user, b.startSec, b.lastSec, b.n,
                  b.total)
                buf = SessionBuf(sec, sec, 1, e.value)
              case b =>
                buf = SessionBuf(b.startSec, sec, b.n + 1, b.total + e.value)
            }
          }
          if (buf != null) state.update(buf)
          closed.result().iterator
      }
  }
}
