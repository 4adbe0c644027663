package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming layer (SURVEY §2.10 extension — the reference is
  * batch-only; the `events` table exists to prove the streaming-shaped
  * capability).
  *
  * The windowed aggregations are the SAME functions EventOps registers for
  * batch: one definition, two execution modes — that is the Spark-first
  * answer to "streaming support". The streaming entry points add a
  * watermark, which bounds state: at 100 TB/day the state store only holds
  * windows newer than the watermark horizon, and late data past it is
  * dropped deterministically.
  */
object EventStream {
  private val D182 = DecimalType(18, 2)

  /** Tumbling event-time aggregation; batch and streaming share this. */
  def tumblingAgg(events: DataFrame, windowDur: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D182)).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Streaming variant: watermark bounds the state store and admits
    * bounded-late data. Append-mode capable (final windows only). */
  def tumblingStream(events: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame =
    tumblingAgg(events.withWatermark("ts", watermarkDelay), windowDur)

  /** Sliding event-time aggregation (each event lands in dur/slide
    * windows); same code drives batch (EventOps.ev_sliding) and, with a
    * watermark, streaming. */
  def slidingAgg(events: DataFrame, windowDur: String, slide: String)
      : DataFrame =
    events
      .groupBy(window(col("ts"), windowDur, slide).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D182)).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  def slidingStream(events: DataFrame, windowDur: String, slide: String,
      watermarkDelay: String): DataFrame =
    slidingAgg(events.withWatermark("ts", watermarkDelay), windowDur, slide)

  /** Session-window aggregation (gap-merged); session_window is
    * streaming-capable — with a watermark the state store holds only
    * open sessions. Same code as EventOps.ev_session_window. */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D182)).cast("double").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("session_value"))

  def sessionStream(events: DataFrame, gap: String,
      watermarkDelay: String): DataFrame =
    sessionAgg(events.withWatermark("ts", watermarkDelay), gap)

  val streamingOutputMode: OutputMode = OutputMode.Append()

  /** Per-user running totals via mapGroupsWithState — the custom-state
    * primitive for logic windows can't express (counters, sessions with
    * dynamic gaps, CEP-ish patterns). State is one small tuple per key,
    * partitioned by user_id, so it scales horizontally with keys. */
  case class UserEvent(user_id: Long, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n
          var tot = prev.total
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          next
      }
  }
}
