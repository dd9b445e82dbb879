package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark main for the optimization rounds (guide §1: measure first,
  * isolate with the noop sink, capture plans). NOT part of the driver
  * contract — `graft.Bench` stays the frozen harness; this one exists so
  * individual queries can be timed/explained without re-running the full
  * battery.
  *
  * Usage:
  *   runMain graft.BenchExtra count q1 q2 ...   — time fn(...).count() (driver methodology)
  *   runMain graft.BenchExtra noop  q1 q2 ...   — time a noop-sink write (all columns computed)
  *   runMain graft.BenchExtra explain q1 ...    — print explain("formatted") per query
  *   query list "all" = every SparkEntry query. Env: SPARK_GRAFT_SF_DIR,
  *   SPARK_GRAFT_CPUS, GRAFT_BENCH_REPS (default 1).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("count")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "1").toInt
    val names0 = args.drop(1).toSeq
    val names =
      if (names0.isEmpty || names0 == Seq("all")) SparkEntry.queries.keys.toSeq.sorted
      else names0
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("GRAFT_LOG_LEVEL", "ERROR"))
    // same warmup as Bench so first-query numbers are comparable
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q_counter_agg").foreach { fn =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      mode match {
        case "explain" =>
          println(s"==== $name ====")
          fn(spark, sfDir).explain("formatted")
        case m =>
          val secs = (1 to reps).map { _ =>
            spark.sparkContext.setJobDescription(s"benchextra:$name")
            val t0 = System.nanoTime()
            if (m == "noop")
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            else
              fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"""{"query":"$name","mode":"$m","secs":[${secs.map(s => f"$s%.3f").mkString(",")}]}""")
          Console.flush()
      }
    }
    spark.stop()
  }
}
