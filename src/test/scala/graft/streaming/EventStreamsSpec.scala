package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming operator tests, driven by MemoryStream (same code path a
  * Kafka/file source exercises), plus a readStream smoke over the
  * driver's events.parquet. */
class EventStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("streaming-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def ts(secs: Long): Timestamp = new Timestamp(secs * 1000)

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowedTypeCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      input.addData(
        EventStreams.Event(1, ts(0), 1, "click", 1.0),
        EventStreams.Event(2, ts(60), 1, "click", 2.0),
        EventStreams.Event(3, ts(301), 2, "view", 5.0)) // next 5-min window
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("event_type", "cnt", "total_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionization with flatMapGroupsWithState emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS(), gapSecs = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10s apart (one session); times start at 100s
      // because the initial watermark is 0 and events at ts <= watermark
      // are dropped as late
      input.addData(
        EventStreams.Event(1, ts(100), 1, "click", 1.0),
        EventStreams.Event(2, ts(110), 1, "click", 1.0))
      q.processAllAvailable()
      // user 1 again far beyond the gap: closes the first session
      input.addData(EventStreams.Event(3, ts(600), 1, "click", 1.0))
      q.processAllAvailable()
      val afterClose = spark.table("sessions").as[EventStreams.UserSession].collect()
      assert(afterClose.exists(s => s.user_id == 1 && s.n_events == 2
        && s.start_ts == 100000 && s.end_ts == 110000), s"got ${afterClose.toSeq}")
      // advancing the watermark way past user 1's last event + gap times
      // out the open session
      input.addData(EventStreams.Event(4, ts(10000), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(5, ts(20000), 2, "click", 1.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sessions").as[EventStreams.UserSession].collect()
      assert(afterTimeout.exists(s => s.user_id == 1 && s.start_ts == 600000),
        s"expected timed-out session for user 1, got ${afterTimeout.toSeq}")
    } finally q.stop()
  }

  test("streaming exact dedup keeps first doc per fingerprint across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.dedupStream(
        input.toDF().toDF("ts", "doc_id", "text"), "text", "10 minutes")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    try {
      input.addData((ts(10), 1L, "alpha doc"), (ts(11), 2L, "beta doc"),
        (ts(12), 3L, "alpha doc")) // in-batch duplicate
      q.processAllAvailable()
      input.addData((ts(20), 4L, "alpha doc"), (ts(21), 5L, "gamma doc")) // cross-batch dup
      q.processAllAvailable()
      val kept = spark.table("dedup_docs").select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kept.map(_._2) == Set("alpha doc", "beta doc", "gamma doc"))
      assert(kept.count(_._2 == "alpha doc") == 1) // duplicates dropped
      assert(!kept.exists(_._1 == 4L)) // the cross-batch duplicate too
    } finally q.stop()
  }

  test("readStream over the driver's events parquet matches batch counts") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.Tables.load(spark, dir, "events")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.Tables.normalizeEventTs(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    val q = stream.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName("ev_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_counts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = batch.groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == expected)
    } finally q.stop()
  }

  test("followWithin pairs only same-user B events inside the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.followWithin(input.toDF(), "click", "purchase",
        within = "1 hour", watermark = "1 minute")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    // base WELL past epoch 0: event times near the epoch collide with
    // the join's initial state watermark and rows are dropped as late
    val base = 1000000L
    try {
      input.addData(
        EventStreams.Event(1, ts(base), 1, "click", 0.0),
        EventStreams.Event(2, ts(base + 1800), 1, "purchase", 1.0), // in window
        EventStreams.Event(3, ts(base + 3601), 1, "purchase", 2.0), // past 1h
        EventStreams.Event(4, ts(base + 600), 2, "purchase", 3.0),  // other user
        EventStreams.Event(5, ts(base + 900), 1, "view", 4.0))      // wrong type
      q.processAllAvailable()
      val rows = spark.table("funnel")
        .select("a_user", "a_ts", "b_ts").collect()
      assert(rows.length == 1, rows.mkString(", "))
      assert(rows.head.getLong(0) == 1L)
      assert(rows.head.getTimestamp(2) == ts(base + 1800))
    } finally q.stop()
  }
}
