package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query with plan dump + timing.
  * Usage: graft.Explain <queryName> [sfDir] [explain]
  * Spark confs are injectable via -Dspark.* system properties.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("explain"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    // time construction + execution together: iterative operators
    // (pagerank, BFS, k-means) run their loops EAGERLY at construction
    // via localCheckpoint, so timing only the write would report a
    // fraction of the real cost (observed: pagerank "0.23 s" vs the
    // true ~5 s). This matches what Bench measures.
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[explain] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
