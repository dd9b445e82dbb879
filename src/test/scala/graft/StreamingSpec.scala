package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingCrawl
import graft.streaming.StreamingCrawl.{ScheduledFetch, StreamRequest}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("politeness gate spaces per-host fetches by the delay, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = CrawlConfig(delayMs = 100)
    val input = MemoryStream[StreamRequest]
    val gated = StreamingCrawl.politenessGate(input.toDS(), cfg)
    val q = gated.writeStream
      .format("memory").queryName("gated").outputMode("append").start()
    try {
      input.addData(
        StreamRequest("a.test", "http://a.test/1", 1000),
        StreamRequest("a.test", "http://a.test/2", 1000),
        StreamRequest("b.test", "http://b.test/1", 1000))
      q.processAllAvailable()
      input.addData(StreamRequest("a.test", "http://a.test/3", 1050))
      q.processAllAvailable()
      val rows = spark.table("gated").as[ScheduledFetch].collect().toSeq
      val aTimes = rows.filter(_.host == "a.test").map(_.scheduledTMs).sorted
      assert(aTimes === Seq(1000, 1100, 1200), s"a.test schedule: $aTimes")
      // state carried across micro-batches: /3 arrived at 1050 but had to
      // wait for lastT(1100) + delay
      assert(rows.filter(_.host == "b.test").map(_.scheduledTMs) === Seq(1000))
      // per-host spacing invariant
      for ((_, hs) <- rows.groupBy(_.host)) {
        val ts = hs.map(_.scheduledTMs).sorted
        ts.sliding(2).foreach {
          case Seq(x, y) => assert(y - x >= cfg.delayMs)
          case _ =>
        }
      }
    } finally q.stop()
  }

  test("windowed host stats aggregate scheduled fetches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScheduledFetch]
    val stats = StreamingCrawl.hostWindowStats(input.toDS().toDF())
    val q = stats.writeStream
      .format("memory").queryName("hstats").outputMode("complete").start()
    try {
      input.addData(
        ScheduledFetch("a.test", "u1", 0),
        ScheduledFetch("a.test", "u2", 30000),
        ScheduledFetch("a.test", "u3", 61000),
        ScheduledFetch("b.test", "u4", 5000))
      q.processAllAvailable()
      val rows = spark.table("hstats")
        .select("host", "fetches").as[(String, Long)].collect().toMap
      // a.test has 2 in the first minute window + 1 in the second
      assert(spark.table("hstats").count() === 3)
      assert(rows.nonEmpty)
    } finally q.stop()
  }

  test("adaptive gate: response latencies retune the slot delay across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCrawl.SlotEvent
    val cfg = CrawlConfig(delayMs = 100, autothrottle = true,
      autothrottleStartDelayMs = 400, autothrottleMaxDelayMs = 5000)
    val input = MemoryStream[SlotEvent]
    val gated = StreamingCrawl.adaptivePolitenessGate(input.toDS(), cfg)
    val q = gated.writeStream
      .format("memory").queryName("adaptive").outputMode("append").start()
    try {
      // batch 1: two requests at the START delay (max(100, 400) = 400)
      input.addData(
        SlotEvent("a.test", "http://a.test/1", 1000),
        SlotEvent("a.test", "http://a.test/2", 1000))
      q.processAllAvailable()
      // batch 2: a fast 200 (latency 100) lowers the delay via _adjust_delay
      // (target 100, mean 250 → 250) BEFORE the same-batch request schedules
      input.addData(
        SlotEvent("a.test", "resp", 1500, latencyMs = 100, status = 200),
        SlotEvent("a.test", "http://a.test/3", 1500))
      q.processAllAvailable()
      // batch 3: a fast 503 must NOT lower the delay (non-200 rule)
      input.addData(
        SlotEvent("a.test", "resp", 1700, latencyMs = 10, status = 503),
        SlotEvent("a.test", "http://a.test/4", 1700))
      q.processAllAvailable()
      val times = spark.table("adaptive").as[ScheduledFetch].collect()
        .map(_.scheduledTMs).sorted.toSeq
      // 1000, 1000+400, max(1400+250, 1500), max(1650+250, 1700)
      assert(times === Seq(1000L, 1400L, 1650L, 1900L), s"schedule: $times")
    } finally q.stop()
  }
}
