package graft.sources

import org.apache.spark.sql.DataFrame

/** Output writers (reference elb_logs.py:343-394). All columnar-parquet
  * or header-CSV, matching the reference's formats; partitioning on the
  * cleaned-log sink mirrors its Hive layout so downstream readers prune
  * by date/country for free.
  */
object Sinks {

  /** Hive-partitioned parquet (reference `export_cleaned_logs`,
    * elb_logs.py:343-349). Partition keys are low-cardinality
    * (date × country ≈ thousands of dirs/day at worst); Spark writes one
    * file per (task, partition-key) — at cluster scale pair this with a
    * `repartition(partitionCols)` upstream if small-file pressure shows.
    */
  def cleanedLogs(df: DataFrame, basePath: String): Unit =
    df.write.mode("append")
      .partitionBy("request_year", "request_month", "request_day", "countryCode")
      .parquet(basePath)

  /** Flat parquet (reference elb_logs.py:367,390,225). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Header CSV, no index column (reference elb_logs.py:377,391). */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Overwrite a parquet path that the writing plan may itself be
    * reading (the geo-cache upsert, reference elb_logs.py:225). Spark
    * cannot overwrite an input in place, so write to a sibling temp dir
    * and atomically swap via the Hadoop FileSystem.
    */
  def overwriteInPlace(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "._staging")
    val fs = target.getFileSystem(hconf)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(tmp, target)
  }
}
