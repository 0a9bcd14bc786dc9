package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators (SURVEY §F): the reference's "streaming"
  * is processing-time pipelining (pages flow to subscribers as fetched,
  * `website.rs:7888-8690`); the Spark-native analogues are:
  *
  *  - a streaming page/event feed with watermarked tumbling-window
  *    aggregation (the subscriber-side analytics shape), and
  *  - per-key session state via `flatMapGroupsWithState` (the per-host
  *    crawl-state shape: last-emit times, counts).
  *
  * The frontier LOOP itself stays a driver micro-batch iteration —
  * Structured Streaming cannot express self-referential feedback
  * (frontier → fetch → frontier) natively.
  */
object StreamOps {

  /** Watermarked tumbling-window counts per event type over a streaming
    * events source.
    */
  def windowedEventCounts(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // parquet NTZ → event-time
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  final case class HostEvent(host: String, n: Long)
  final case class HostAgg(host: String, total: Long, batches: Int)

  /** Stateful per-host accumulation — the politeness/host-state shape kept
    * in streaming state (`mapGroupsWithState` family).
    */
  def perHostRunningState(spark: SparkSession, events: Dataset[HostEvent]): Dataset[HostAgg] = {
    import spark.implicits._
    events.groupByKey(_.host)
      .flatMapGroupsWithState[HostAgg, HostAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[HostEvent], state: GroupState[HostAgg]) =>
          val prev = state.getOption.getOrElse(HostAgg(host, 0L, 0))
          val add = rows.map(_.n).sum
          val next = HostAgg(host, prev.total + add, prev.batches + 1)
          state.update(next)
          Iterator.single(next)
      }
  }
}
