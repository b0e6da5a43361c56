package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the custom-state counterpart of the
  * batch `q_sessionize` query: per-user session ids assigned by a
  * 30-minute inactivity gap, with the (last event time, current session)
  * carried in `GroupState` across micro-batches. This is the
  * `KeyValueGroupedDataset.flatMapGroupsWithState` surface a continuous
  * training-data pipeline uses for interaction logs; identical semantics
  * to the batch window formulation when events arrive time-ordered per
  * key (verified against it in StreamingSpec).
  */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, ts_us: Long)
  final case class SessionState(last_ts_us: Long, session_id: Long)
  final case class Sessionized(user_id: Long, event_id: Long, session_id: Long)

  val DefaultGapUs: Long = 1800000000L // 30 min

  def assign(
      events: Iterator[Event],
      state: Option[SessionState],
      gapUs: Long): (Seq[Sessionized], SessionState) = {
    // iterator order within a batch is arbitrary: sort by event time
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOrElse(SessionState(Long.MinValue, 0L))
    val out = sorted.map { e =>
      val newSession = st.last_ts_us != Long.MinValue && e.ts_us - st.last_ts_us > gapUs
      st = SessionState(e.ts_us, if (newSession) st.session_id + 1 else st.session_id)
      Sessionized(e.user_id, e.event_id, st.session_id)
    }
    (out, st)
  }

  /** Streaming form: state lives in the state store, one entry per user. */
  def stream(spark: SparkSession, events: Dataset[Event],
             gapUs: Long = DefaultGapUs): Dataset[Sessionized] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Sessionized](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val (out, st) = assign(it, state.getOption, gapUs)
          state.update(st)
          out.iterator
      }
  }

  /** Convenience reader: the events parquet table as a typed stream.
    * File streams watch DIRECTORIES; a single-file path (like the driver's
    * `events.parquet`) is handled by streaming its parent with a filename
    * glob. */
  def eventsStream(spark: SparkSession, path: String): Dataset[Event] = {
    import spark.implicits._
    val schema = spark.read.parquet(path).schema
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // FileStreamSource accepts a directory or a GLOB, never a plain file
    // path — wrap a file's name in {} to make it a single-match glob
    val streamPath = if (fs.getFileStatus(p).isDirectory) path
                     else new org.apache.hadoop.fs.Path(p.getParent, s"{${p.getName}}").toString
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 8)
      .parquet(streamPath)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[Event]
  }
}
