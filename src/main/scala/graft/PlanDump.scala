package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit harness for the new-operator ritual: prints the EXECUTED
  * physical plan of a registered query (the same string PlanSpec's BNL
  * gate inspects) so BroadcastNestedLoopJoin build sides can be
  * visually confirmed tiny before a query is audited into the
  * allowlist.
  *
  * Usage: tools/run.sh graft.PlanDump <query>[,<query>...] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
