package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape gates: the properties the 100 TB story depends on
  * must hold in the ACTUAL Catalyst plans, not just in prose — predicate
  * pushdown reaching the parquet scan, column pruning, broadcast joins for
  * dimension tables, map-side partial aggregation, and no cartesian product
  * where an equi-join is intended. A regression here is a performance bug
  * even while results stay correct. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filters push down to the parquet scan and columns are pruned") {
    val p = plan("q_httperror_filter")
    assert(p.contains("PushedFilters:") &&
      p.matches("(?s).*PushedFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      s"expected event_type in PushedFilters:\n$p")
    // projection needs only 3 of the events columns
    assert(!p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string,ts:timestamp,value:double>"),
      "scan must not read all columns for a 1-column projection")
  }

  test("dimension joins broadcast (no shuffle of the fact side for dims)") {
    val p = plan("q_broadcast_dim_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"nation/region joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("counter aggregation is map-side partial (two-phase HashAggregate)") {
    val p = plan("q_counter_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial + final HashAggregate:\n$p")
  }

  test("first-wins dedup via struct-min aggregation has no window sort in the engine form") {
    // the ENGINE's first-wins is a groupBy(min(struct)) — pin the aggregate
    // shape on an equivalent mini-plan (q_first_wins_dedup intentionally
    // demonstrates the window form for the DuckDB oracle)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, 2, "a"), (1, 1, "b")).toDF("k", "ord", "v")
      .groupBy($"k").agg(min(struct($"ord", $"v")).as("r"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), s"struct-min must not plan a window:\n$p")
    assert(p.contains("Aggregate") || p.contains("HashAggregate") ||
      p.contains("SortAggregate"))
  }

  test("anti-join dedup keeps an equi-join (no cartesian) and prunes the seen side") {
    val p = plan("q_dupefilter_anti_join")
    assert(p.contains("LeftAnti"), s"expected LEFT ANTI join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("fair-share budget allocation plans no window (and allocates the cap)") {
    import spark.implicits._
    // 60 slots with varying demand and per-slot caps — the step-1b input shape
    val withState = (0 until 60).flatMap { i =>
      Seq.fill(1 + i % 9)((f"h$i%03d.test", 3 + i % 5))
    }.toDF("slot", "slotCap")
    val cfg = CrawlConfig(maxFetchesPerEpoch = 100)
    val (budgets, handle) =
      graft.operators.CrawlEngine.fairShareBudgets(spark, cfg, withState)
    val p = budgets.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the round-2 form ranked over-F slots with Window.orderBy(slot) — a
    // single-task sort at 10^6 slots; the rewrite must never plan a Window
    assert(!p.contains("Window"), s"fair share must not plan a window:\n$p")
    // allocation sanity: per-slot usable units sum to ≤ cap, and the fair
    // share is tight (adding one more unit to every unsatisfied slot busts it)
    val perSlot = budgets.groupBy($"slot")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"),
        org.apache.spark.sql.functions.min($"slotBudget").as("b"),
        org.apache.spark.sql.functions.min($"slotCap").as("c"))
      .as[(String, Long, Long, Long)].collect()
    val used = perSlot.map { case (_, rows, b, c) =>
      math.min(math.min(rows, c), b) }.sum
    assert(used <= 100, s"allocated $used > cap")
    val unsatisfied = perSlot.count { case (_, rows, b, c) => math.min(rows, c) > b }
    assert(used + unsatisfied > 100, "allocation is not max-min tight")
    if (handle != null) handle.unpersist()
  }

  test("fair-share +1 remainder uses Java-String (UTF-16) slot order, like the oracle") {
    import spark.implicits._
    // two slots sharing a prefix, diverging on a supplementary char
    // (U+1F600, surrogates D83D DE00) vs a high-BMP char (U+FFE5): UTF-8
    // byte order sorts the yen slot first, UTF-16 code-unit order (the
    // oracle's Scala .sorted) sorts the emoji slot first — the remainder
    // must follow the oracle's collation
    val emoji = "a😀"
    val yen = "a￥"
    assert(emoji < yen) // Java String order — the contract's "ascending"
    val withState = (Seq.fill(3)(emoji) ++ Seq.fill(3)(yen))
      .map(s => (s, 3)).toDF("slot", "slotCap")
    // demand 3 per slot, cap 5 → F=2, remainder 1 → the FIRST over-F slot
    // in ascending (Java) order gets the extra unit: the emoji slot
    val cfg = CrawlConfig(maxFetchesPerEpoch = 5)
    val (budgets, handle) =
      graft.operators.CrawlEngine.fairShareBudgets(spark, cfg, withState)
    val bySlot = budgets.groupBy($"slot")
      .agg(org.apache.spark.sql.functions.min($"slotBudget").as("b"))
      .as[(String, Long)].collect().toMap
    assert(bySlot(emoji) === 3L, s"emoji slot must get the +1: $bySlot")
    assert(bySlot(yen) === 2L, s"yen slot must stay at F: $bySlot")
    if (handle != null) handle.unpersist()
  }

  test("httpcache admit bound is finite and monotone (round-4 verdict #1)") {
    import graft.operators.CrawlEngine.cacheAdmit
    assert(cacheAdmit(10, 0) === 11) // budget + stop row
    assert(cacheAdmit(10, 5) === 16) // + the slot's cached rows
    assert(cacheAdmit(0, 0) === 1)
    assert(cacheAdmit(Int.MaxValue, Long.MaxValue) === Int.MaxValue) // clamps
    for (c <- 0L until 5L)
      assert(cacheAdmit(3, c) < cacheAdmit(3, c + 1))
  }

  test("httpcache membership resolution is Bloom-gated (non-maybe rows never join)") {
    import spark.implicits._
    import graft._
    import graft.operators.CrawlEngine
    import graft.urlkit.UrlKit
    // 5 frontier rows on one host; the cache table holds fps of rows 1 and 3
    val urls = (0 until 5).map(j => s"http://h0.test/p/$j")
    val frontier = urls.zipWithIndex.map { case (u, i) =>
      FrontierRow(u, UrlKit.fingerprint(u), "h0.test", 0, 0, isStart = true,
        -1, i.toLong, 0, 0, 0, dontFilter = false)
    }.toDS()
    val pages = urls.map(u => PageRow(u, 200, null,
      "<html></html>".getBytes("UTF-8"), null, 10)).toDS().toDF()
      .withColumnRenamed("url", "canonical")
    val httpCache = Seq(1, 3)
      .map(j => (UrlKit.toHex(UrlKit.fingerprint(urls(j))), 0L, 200,
        Option.empty[String]))
      .toDF("fpHex", "storedTMs", "status", "cacheControl")
    val cfg = CrawlConfig(httpcacheEnabled = true, robotsObey = false)
    def run(bloom: Option[org.apache.spark.broadcast.Broadcast[
        graft.plans.BloomShards]]): Map[String, Long] = {
      val r = CrawlEngine.runEpoch(spark, cfg, 0, 0L, frontier,
        Seq.empty[String].toDF("fpHex"),
        spark.emptyDataset[HostState],
        spark.emptyDataset[CrawlEngine.RobotsCacheRow],
        spark.emptyDataset[CookieRow],
        pages, Seq.empty[(String, Array[Byte])].toDF("host", "body"),
        null, null, withMedia = false, httpCache = httpCache,
        cacheBloom = bloom)
      val c = r.counters
      r.cleanup()
      c
    }
    // an EMPTY bloom says "definitely not cached" for every row: the exact
    // join must never see them — no hits even though the table has the fps.
    // (A real filter has no false negatives, so this path can only fire for
    // genuinely-uncached rows; the test proves the join is bloom-gated.)
    val emptyBloom = spark.sparkContext.broadcast(
      graft.plans.BloomShards.create(1024, 0.03))
    val without = run(Some(emptyBloom))
    assert(without.getOrElse("httpcache/hit", 0L) === 0L,
      s"empty bloom must suppress the exact join: $without")
    assert(without.getOrElse("httpcache/miss", 0L) === 5L)
    // no bloom supplied: every row joins → the 2 cached fps hit
    val withJoin = run(None)
    assert(withJoin.getOrElse("httpcache/hit", 0L) === 2L, s"$withJoin")
    assert(withJoin.getOrElse("httpcache/miss", 0L) === 3L)
    emptyBloom.destroy()
  }

  test("simhash bit-votes ride ONE shuffle (map-side partial, no bit explosion)") {
    val p = plan("q_simhash_bitvote")
    assert(!p.contains("Window"), s"bit votes must not plan a window:\n$p")
    // formatted explain names each node twice (tree line + detail section):
    // count detail headers so "one Generate node" means the token explode only
    assert("(?m)^\\(\\d+\\) Generate".r.findAllIn(p).size <= 1,
      s"only the token explode may Generate — no per-bit explosion:\n$p")
    val shuffles = "(?m)^\\(\\d+\\) Exchange$".r.findAllIn(p).size
    assert(shuffles === 1,
      s"the 60 bit-vote sums must ride a single partial-agg shuffle, got $shuffles:\n$p")
    assert("partial_sum".r.findAllIn(p).size >= 60,
      s"expected 60 map-side partial sums:\n$p")
  }

  test("minhash LSH candidates come from a band equi-join, never all-pairs") {
    val p = plan("q_minhash_band_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band bucketing must plan an equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"expected an equi-join on (band, bkey):\n$p")
    // r6 shape: the 8 signature mins are per-row array_min over the gram
    // array (no Generate, no SortAggregate, no Exchange before the band
    // join) and the bands table is localCheckpoint'd so the self-join reads
    // the materialized RDD twice instead of recomputing the signatures
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"both join sides must read the checkpointed bands table:\n$p")
    assert(!p.contains("SortAggregate") && !p.contains("Generate"),
      s"signatures must be per-row (no explode/sort-agg in the edge plan):\n$p")
  }

  test("embedding near-dup argmax is an aggregate, not a window over the join") {
    val p = plan("q_embedding_neardup")
    assert(!p.contains("Window"),
      s"nearest-neighbor argmax must be max_by aggregation, not a window:\n$p")
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r.findAllIn(p).nonEmpty)
  }
}
