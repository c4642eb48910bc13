package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators beyond the upsert (SURVEY §2.11
  * Spark-native extensions): watermarked windowed aggregation and
  * stateful sessionization.
  *
  *  - `windowedCounts`: the canonical watermark + tumbling-window agg.
  *    State is bounded by the watermark: closed windows are emitted
  *    (Append mode) and dropped from the store, so memory is
  *    O(open windows), not O(stream length).
  *  - `sessionize`: gap-based sessions via
  *    `flatMapGroupsWithState` + event-time timeout — the custom-state
  *    escape hatch for semantics window functions can't express. State
  *    per key is one open session; the watermark timeout closes idle
  *    sessions and frees their state.
  *
  * Both have exact batch twins (`windowedCountsBatch`,
  * `sessionizeBatch`) asserted equal in StreamingSpec — the
  * streaming/batch parity the Dataset API promises.
  */
object StreamOps {

  // ------------------------------------------------- windowed aggregate

  /** Tumbling-window event counts with a watermark. `feed` must carry
    * event_time/event_type/value (StreamingUpsert.eventFeed shape). */
  def windowedCounts(feed: DataFrame, windowLen: String,
                     lateness: String): DataFrame =
    feed.withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("double")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch twin: identical plan minus the watermark. */
  def windowedCountsBatch(feed: DataFrame, windowLen: String): DataFrame =
    feed.groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("double")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  // ---------------------------------------------------- streaming dedup

  /** Streaming ingest dedup: drop re-deliveries of the same key while
    * keeping state bounded. `dropDuplicatesWithinWatermark` holds each
    * seen key only until the watermark passes its event time, so state
    * is O(keys per watermark window) — the property that makes exact
    * dedup feasible on an unbounded ingest feed (a plain
    * `dropDuplicates` on a stream accumulates state forever). The
    * at-scale composition: this removes ingest re-deliveries
    * exactly; content-level dedup (minhash et al., [[graft.operators.Dedup]])
    * runs downstream in batch. */
  def dedupStream(feed: DataFrame, lateness: String): DataFrame =
    feed.withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin: keyed dedup, arbitrary survivor within a key (the
    * streaming side keeps the first arrival; parity is per key set,
    * not per surviving payload). */
  def dedupStreamBatch(feed: DataFrame): DataFrame =
    feed.dropDuplicates("event_id")

  // ------------------------------------------------------ sessionization

  case class Event(user_id: Long, event_time: Timestamp)
  case class SessionState(start: Long, last: Long, n: Int) // micros
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int)

  /** Timestamp ↔ epoch micros without precision loss (getTime alone
    * drops sub-millisecond digits; events carry microseconds). */
  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** Gap-based sessionization: events for a user belong to one session
    * while consecutive gaps stay under `gapMs`. Streaming side uses
    * event-time timeout so a session closes (and its state is freed)
    * once the watermark passes last_event + gap. */
  def sessionize(feed: DataFrame, gapMs: Long,
                 lateness: String): Dataset[Session] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed.withWatermark("event_time", lateness)
      .select(col("user_id"), col("event_time")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val gapUs = gapMs * 1000L
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, fromMicros(s.start),
              fromMicros(s.last), s.n))
          } else {
            // fold sorted events into sessions; emit every closed one
            val ts = rows.map(e => toMicros(e.event_time)).toArray.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(uid, fromMicros(s.start),
                    fromMicros(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000L + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join — the last Structured Streaming join
    * class the library was missing: clicks and purchases arrive as
    * (branches of) a stream, and each click pairs with the same
    * user's purchases inside the following `gapMs`. Both sides are
    * watermarked and the join condition carries BOTH event-time
    * bounds, which is exactly what lets Spark bound the state store:
    * a click's state is held only until the watermark passes
    * click_time + gap, a purchase's until it can no longer precede a
    * live click. Inner-join results emit as matches arrive (the
    * watermark only gates state eviction), so no sentinel flush is
    * needed. [[intervalJoinBatch]] is the static twin the spec pins
    * equal; the declared `events_interval_join` query is the same
    * semantics in bin-explode form with its own DuckDB oracle. */
  def intervalJoinStream(feed: DataFrame, gapMs: Long,
                         lateness: String): DataFrame =
    intervalJoin(feed, gapMs, Some(lateness))

  /** Static twin of [[intervalJoinStream]] — identical plan minus the
    * watermarks. */
  def intervalJoinBatch(feed: DataFrame, gapMs: Long): DataFrame =
    intervalJoin(feed, gapMs, None)

  /** One definition for both twins, so the interval semantics cannot
    * drift between them: the lateness option is the ONLY difference. */
  private def intervalJoin(feed: DataFrame, gapMs: Long,
                           lateness: Option[String]): DataFrame = {
    def marked(df: DataFrame, tsCol: String) =
      lateness.fold(df)(df.withWatermark(tsCol, _))
    val clicks = marked(
      feed.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("event_time").as("click_time")), "click_time")
    val purchases = marked(
      feed.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"),
          col("event_time").as("purchase_time")), "purchase_time")
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_time") >= col("click_time") &&
          col("purchase_time") <
            col("click_time") + expr(s"INTERVAL $gapMs MILLISECONDS"),
        "inner")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("purchase_time")) - unix_micros(col("click_time")))
          .as("lag_us"))
  }

  /** Batch twin via window functions: a new session starts where the
    * gap to the previous event exceeds gapMs; session id = running sum
    * of starts. */
  def sessionizeBatch(feed: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("event_time")
    feed.select(col("user_id"), col("event_time"))
      .withColumn("prev", lag(col("event_time"), 1).over(byUser))
      .withColumn("new_session",
        // unix_micros, not cast("long"): the cast truncates to whole
        // seconds while the streaming path compares microseconds —
        // sub-second gaps (or gapMs < 1000) would split differently.
        when(col("prev").isNull ||
          unix_micros(col("event_time")) -
            unix_micros(col("prev")) > gapMs * 1000L, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("event_time").as("session_start"),
        max("event_time").as("session_end"),
        count(lit(1)).cast("int").as("n_events"))
      .drop("session_id")
  }

  // ------------------------------------------------ markov transitions

  case class TransEvent(user_id: Long, event_id: Long,
                        event_time: Timestamp, event_type: String)
  case class TransState(lastUs: Long, lastId: Long, lastType: String)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of the `events_markov_transitions` batch query's
    * TRANSITION STREAM: per user, emit (from_type, to_type) for every
    * consecutive event pair in (event_time, event_id) order, chaining
    * across micro-batches through one tiny state record per user (the
    * last seen event — O(active users), the irreducible minimum for
    * sequence semantics; an event-time timeout could evict idle users
    * at the cost of mis-chaining their next arrival, so eviction is
    * left to the operator's retention policy). Rows are sorted within
    * each batch; ACROSS batches the operator assumes per-user
    * event-time-ordered arrival (the replay/backfill contract the
    * sessionizer documents) — an out-of-order straddler would chain
    * from the wrong predecessor. Emission is immediate (Append mode,
    * no timeout): a transition is known the moment its second event
    * arrives, so no watermark sentinel is needed. Downstream counts
    * over the emitted pairs reproduce the batch query's matrix —
    * StreamOpsSpec pins exactly that. */
  def markovTransitions(feed: DataFrame): Dataset[Transition] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed.select(col("user_id"), col("event_id"), col("event_time"),
        col("event_type")).as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TransEvent],
         state: GroupState[TransState]) =>
          val sorted = rows.toArray
            .sortBy(e => (toMicros(e.event_time), e.event_id))
          var cur = state.getOption
          val out = List.newBuilder[Transition]
          sorted.foreach { e =>
            cur.foreach(s => out += Transition(uid, s.lastType, e.event_type))
            cur = Some(TransState(toMicros(e.event_time), e.event_id,
              e.event_type))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Batch twin: the same transition stream via a keyed window. */
  def markovTransitionsBatch(feed: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("event_time"), col("event_id"))
    feed.select(col("user_id"), col("event_id"), col("event_time"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("to_type"))
  }

  // ------------------------------------------------- ordered funnel

  case class FunnelState(t1: Long, t2: Long, t3: Long) // micros; -1 = unset
  case class StageDone(user_id: Long, stage: Int)

  /** Streaming twin of `events_funnel_ordered`'s per-user stage
    * progression: one state record per user holding the first
    * qualifying timestamp of each stage (first view; first click
    * strictly after it; first purchase strictly after that), emitting
    * (user_id, stage) ONCE when a stage first completes — so counting
    * emitted rows per stage live-reproduces the batch funnel. Same
    * chaining/ordering contract as [[markovTransitions]] (sorted
    * within batch, per-user event-time-ordered arrival across
    * batches); emission is immediate, state is three longs per
    * engaged user. */
  def funnelStages(feed: DataFrame): Dataset[StageDone] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed.select(col("user_id"), col("event_id"), col("event_time"),
        col("event_type")).as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageDone](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TransEvent],
         state: GroupState[FunnelState]) =>
          val sorted = rows.toArray
            .sortBy(e => (toMicros(e.event_time), e.event_id))
          val prior = state.getOption
          var s = prior.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = List.newBuilder[StageDone]
          sorted.foreach { e =>
            val t = toMicros(e.event_time)
            e.event_type match {
              case "view" if s.t1 < 0 =>
                s = s.copy(t1 = t); out += StageDone(uid, 1)
              case "click" if s.t1 >= 0 && s.t2 < 0 && t > s.t1 =>
                s = s.copy(t2 = t); out += StageDone(uid, 2)
              case "purchase" if s.t2 >= 0 && s.t3 < 0 && t > s.t2 =>
                s = s.copy(t3 = t); out += StageDone(uid, 3)
              case _ =>
            }
          }
          // Store ONLY engaged users (r13 ADVICE): a user whose events
          // never advanced a stage keeps no record, and an unchanged
          // returning user skips the redundant write — state stays
          // O(engaged users), the documented three-longs contract. An
          // EMPTY record persisted by the pre-gate code (a checkpoint
          // written before r14) is removed on the key's next batch, so
          // migrated checkpoints converge to the same bound.
          val empty = FunnelState(-1L, -1L, -1L)
          if (s == empty) { if (prior.isDefined) state.remove() }
          else if (!prior.contains(s)) state.update(s)
          out.result().iterator
      }
  }
}
