package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.PlanTool <queryName> [sfDir]` prints the
  * formatted physical plan of a SparkEntry query — used to verify predicate
  * pushdown (PushedFilters), column pruning (ReadSchema), broadcast joins
  * and whole-stage codegen spans. */
object PlanTool {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanTool <query> [sfDir]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions) // graft_* SQL functions
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
