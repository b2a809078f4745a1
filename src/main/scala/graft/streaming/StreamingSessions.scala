package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state — the
  * `flatMapGroupsWithState` analog of the batch `q_events_sessions`
  * operator (gap > gapSec starts a new session).
  *
  * State per user is three longs (last event time, event count, session
  * count): O(users) state regardless of stream length, expired nothing —
  * counts are cumulative. Each micro-batch's events for a user are sorted
  * in memory (bounded by the user's per-batch volume); cross-batch order is
  * event-time order up to the watermark, late data beyond it is dropped by
  * the upstream `withWatermark`.
  */
object StreamingSessions {

  final case class UserEvent(user_id: Long, ts: Timestamp)
  final case class SessState(lastTs: Long, nEvents: Long, nSessions: Long)
  final case class SessCount(user_id: Long, n_events: Long, n_sessions: Long)

  private def updateUser(gapSec: Long)(userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[SessState]): Iterator[SessCount] = {
    val sorted = events.toArray.sortBy(_.ts.getTime)
    if (sorted.isEmpty) return Iterator.empty
    var s = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val t = e.ts.getTime / 1000L
      val newSession = s.lastTs == Long.MinValue || t - s.lastTs > gapSec
      s = SessState(t, s.nEvents + 1,
        s.nSessions + (if (newSession) 1L else 0L))
    }
    state.update(s)
    Iterator.single(SessCount(userId, s.nEvents, s.nSessions))
  }

  /** Fold a STREAMING (user_id, ts) dataset into cumulative per-user
    * (n_events, n_sessions) updates. Output mode: Update (one row per user
    * per micro-batch that saw that user). */
  def sessionCounts(events: Dataset[UserEvent], gapSec: Long = 600L)
      : Dataset[SessCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateUser(gapSec))
  }

  /** The equivalent batch computation (the q_events_sessions shape) — the
    * oracle the streaming fold must agree with on a closed input. */
  def batchSessionCounts(events: DataFrame, gapSec: Long = 600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("gap",
        unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
      .withColumn("brk",
        when(col("gap").isNull || col("gap") > gapSec, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("brk")).as("n_sessions"))
  }
}
