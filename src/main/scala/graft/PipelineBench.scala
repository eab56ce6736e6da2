package graft

import org.apache.spark.sql.SparkSession

import graft.queries.ElbSynth
import graft.sources.StaticGeoProvider

/** Times the COMPLETE reference pipeline equivalent (main(),
  * elb_logs.py:398-437) at scale: synthesizes ELB lines from the sf
  * events table into gzip files, then runs extract → cache refresh →
  * enrich → filter → features → sessionize → rolling → all four report
  * sinks, end to end including all I/O. One JSON line on stdout.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = java.nio.file.Files.createTempDirectory("graft-plb").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the input: gzip'd log files, ~16 files like an ELB prefix
    ElbSynth.lines(Tables.events(spark, sfDir))
      .select("value").repartition(16)
      .write.option("compression", "gzip").text(s"$work/logs")

    val t0 = System.nanoTime()
    val featured = ElbPipeline.run(
      spark, s"$work/logs/*.gz", s"$work/cache.parquet", s"$work/out",
      StaticGeoProvider(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(s"$work/out/cleaned_logs").count()
    println(f"""{"metric":"pipeline_total","value":$secs%.3f,"unit":"sec","rows":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
