package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event analytics (SURVEY.md §2
  * #30-31): the same logical aggregations expressed over an unbounded
  * source with watermarks. Input is any streaming DataFrame with the events
  * schema (`ts` as TIMESTAMP event time).
  *
  * Scale: windowed aggregation state is bounded by the watermark horizon ×
  * |event_type|; session state by |active users|. Both are keyed state in
  * the state store — shuffle-partitioned, no driver state.
  */
object EventsStream {

  /** Tumbling 1-hour windows per event_type, 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding (hopping) 1-hour windows every 15 minutes per event_type —
    * the streaming twin of `Relational.eventsSlidingAgg` (each event lands
    * in width/slide = 4 open windows; state bounded by watermark horizon ×
    * 4 × |event_type|). Batch≡stream equality is replay-spec-asserted on
    * the real events parquet. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Trailing-7-day rolling daily totals — the STREAMING form of the
    * `revenue_moving_avg` contribution-explode: each event is exploded to
    * the 7 day-windows it contributes to (ts + 0..6 days) and aggregated by
    * target day, so a day's rolling total accretes incrementally as events
    * arrive — exactly why the batch operator avoids the global RANGE
    * window, which has no streaming equivalent at all. State is bounded by
    * the watermark horizon × 7 day-windows. Batch≡stream equality is
    * replay-spec-asserted against the identical batch formulation. */
  def movingDailySum(events: DataFrame): DataFrame =
    events
      .select(col("ts"), col("value"))
      .withColumn("t_ts", explode(array((0 to 6).map(d =>
        col("ts") + expr(s"INTERVAL $d DAYS")): _*)))
      // the watermark column is shifted up to +6 days ahead of real event
      // time, so the delay must ABSORB the shift: with a bare 10-minute
      // delay, one event's +6d contribution advances the watermark ~6 days
      // and every later on-time event loses its 6 trailing-window
      // contributions in update/append mode (spec replays two batches in
      // update mode to pin this)
      .withWatermark("t_ts", "6 days 10 minutes")
      .groupBy(window(col("t_ts"), "1 day"))
      .agg(count(lit(1)).as("n_contrib"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("day_start"), col("n_contrib"),
        col("sum_value"))

  /** Streaming exact dedup (the LLM-pipeline dedup op on an unbounded
    * source): state bounded by the watermark horizon, keyed by event_id. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join each streaming event to a static
    * dimension (user → tier here), then the windowed rollup per (tier,
    * event_type). The static side is planned per micro-batch as an
    * ordinary broadcast hash join — the standard way a 100 TB pipeline
    * attaches slowly-changing reference data to a live stream without
    * stream-stream join state. */
  def enrichedWindowedCounts(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(userDim), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("tier"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("tier"),
        col("event_type"), col("n"))

  /** Stream-stream interval join — the streaming twin of the batch range
    * join (`Relational.rangeJoinCounts`): each purchase matched to the
    * same user's views from the preceding `windowSec`. Both sides carry
    * watermarks and the join condition bounds the event-time range, so
    * each side's buffered state is the watermark horizon + window — never
    * unbounded. (Batch buckets time to make the range an equi-join; a
    * streaming join instead bounds retention with the same inequality.) */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
      windowSec: Long = 60): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 minutes")
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 minutes")
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowSec seconds") &&
        col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts"))
  }

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, start_epoch: Long, end_epoch: Long, n_events: Long)

  /** Gap-based sessionization with custom keyed state
    * (flatMapGroupsWithState + event-time timeout): a session closes when
    * the watermark passes its end + gap. Streaming twin of
    * Relational.sessionize. */
  def sessionize(events: Dataset[Ev], gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(userId, s.start, s.end, s.n))
      } else {
        val sorted = evs.map(e => e.ts.getTime / 1000).toSeq.sorted
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { sec =>
          cur match {
            case Some(s) if sec - s.end <= gapSec =>
              cur = Some(s.copy(end = math.max(s.end, sec), n = s.n + 1))
            case Some(s) =>
              closed ::= SessionOut(userId, s.start, s.end, s.n)
              cur = Some(SessionState(sec, sec, 1))
            case None =>
              cur = Some(SessionState(sec, sec, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.end + gapSec) * 1000 + 1)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class TypedEv(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class FunnelState(first_view: Long, first_purchase: Long)
  case class FunnelOut(user_id: Long, first_view_sec: Long,
                       first_purchase_sec: Long, converted: Boolean)

  /** Streaming funnel: per-user first-view/first-purchase tracking with
    * mapGroupsWithState — the stream twin of `Relational.funnelConversion`'s
    * per-user stage, emitting each user's CURRENT funnel position on every
    * update (Update mode; the batch query's rollup is a downstream agg over
    * the latest row per user). State is two longs per user — bounded by the
    * user population, not the event volume. -1 marks "not yet seen", and
    * conversion uses the SAME strict first_purchase > first_view rule. */
  def funnelStates(events: Dataset[TypedEv]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[TypedEv],
           state: GroupState[FunnelState]): FunnelOut = {
      var s = state.getOption.getOrElse(FunnelState(-1L, -1L))
      evs.foreach { e =>
        val sec = e.ts.getTime / 1000
        if (e.event_type == "view" && (s.first_view < 0 || sec < s.first_view))
          s = s.copy(first_view = sec)
        if (e.event_type == "purchase" && (s.first_purchase < 0 || sec < s.first_purchase))
          s = s.copy(first_purchase = sec)
      }
      state.update(s)
      FunnelOut(userId, s.first_view, s.first_purchase,
        s.first_view >= 0 && s.first_purchase > s.first_view)
    }

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
