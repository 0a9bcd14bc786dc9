package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs: the streaming windowed agg must equal the
  * batch computation of the same window; stateful per-host state must
  * accumulate across micro-batches.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("streaming tumbling-window agg equals batch result") {
    spark.sparkContext.setLogLevel("ERROR")
    // the file-stream source needs a DIRECTORY feed; stage the events file
    val feed = java.nio.file.Files.createTempDirectory("events_feed")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      feed.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(feed.toString)
    // complete mode over the full file feed == the batch answer
    val agg = StreamOps.windowedEventCounts(stream)
    // complete mode: every window emitted once the feed drains — must equal
    // the batch computation exactly (append mode would hold back windows
    // newer than the watermark on a single-batch feed)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // window_start is TIMESTAMP on the stream side and TIMESTAMP_NTZ in the
    // batch plan (session tz = UTC makes them the same instant) — compare as
    // formatted strings
    val streamed = spark.table("win_out").collect()
      .map(r => (r.get(0).toString.replace('T', ' ').take(16), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.queries.Queries.stTumblingWindow(spark, dir).collect()
      .map(r => (r.get(0).toString.replace('T', ' ').take(16), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed windows disagree with batch: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
  }

  test("flatMapGroupsWithState accumulates per-host state across batches") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamOps.HostEvent]
    val out = StreamOps.perHostRunningState(spark, source.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("host_state").start()
    source.addData(StreamOps.HostEvent("a.com", 2), StreamOps.HostEvent("b.com", 1))
    q.processAllAvailable()
    source.addData(StreamOps.HostEvent("a.com", 3))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("host_state").as[StreamOps.HostAgg].collect()
    val aFinal = rows.filter(_.host == "a.com").maxBy(_.batches)
    assert(aFinal.total == 5 && aFinal.batches == 2, rows.mkString(","))
    assert(rows.filter(_.host == "b.com").map(_.total).max == 1)
  }
}
