package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event-table operators (SURVEY.md §2c
  * streaming row). Batch-checkable equivalents live in
  * [[graft.queries.Relational]] (`q_window_tumbling` etc.) — the driver's
  * DuckDB oracle validates the window semantics there; these are the
  * `readStream`-shaped versions with watermarks and state.
  *
  * Scale notes: all of these are keyed-state operators — state is
  * partitioned by (window/user) key across executors, watermarks bound state
  * size, and sinks are idempotent by (key, window) for exactly-once output.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Tumbling-window counts with late-data drop. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window counts. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("n"))

  /** Session windows per user (gap-based). */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes",
      gap: String = "15 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("sstart"), col("user_id"), col("n"))

  /** Streaming dedup on (user_id, event_type) within the watermark horizon. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(Seq("user_id", "event_type"))

  /** Custom keyed state: running per-user event count + running value sum,
    * via mapGroupsWithState (the engine's stateful-operator surface,
    * replacing the reference's per-node server state). */
  def runningUserTotals(events: Dataset[Event]): Dataset[(Long, Long, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        case (user, batch, state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          batch.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          (user, n, s)
      }
  }

  /** Convenience: file-stream source over a directory of event parquet. */
  def readEventStream(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Idempotent parquet sink with checkpointing. */
  def writeParquetSink(df: DataFrame, path: String, checkpoint: String,
      mode: OutputMode = OutputMode.Append()) =
    df.writeStream.outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .format("parquet").option("path", path)
}
