package graft.sources

import org.apache.spark.sql.DataFrame

/** Output writers (reference elb_logs.py:343-394). All columnar-parquet
  * or header-CSV, matching the reference's formats; partitioning on the
  * cleaned-log sink mirrors its Hive layout so downstream readers prune
  * by date/country for free.
  */
object Sinks {

  /** Hive-partitioned parquet (reference `export_cleaned_logs`,
    * elb_logs.py:343-349). Without the repartition, every write task
    * opens a file in every partition dir it touches — numTasks ×
    * numPartitionKeys small files (measured: the dominant cost of the
    * whole pipeline at sf0.1). Clustering rows by the partition keys
    * first writes one file per populated (year, month, day, country)
    * dir.
    */
  def cleanedLogs(df: DataFrame, basePath: String): Unit = {
    import org.apache.spark.sql.functions.col
    val keys = Seq("request_year", "request_month", "request_day", "countryCode")
    df.repartition(keys.map(col): _*)
      .write.mode("append")
      .partitionBy(keys: _*)
      .parquet(basePath)
  }

  /** Flat parquet (reference elb_logs.py:367,390,225). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Header CSV, no index column (reference elb_logs.py:377,391).
    * Timestamps keep full microseconds — Spark's default CSV pattern
    * truncates to milliseconds, silently losing precision the
    * reference's pandas `to_csv` preserves (tools/ref_diff.py caught
    * the drift on the error-summary `time` column).
    */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  /** ORC sink — the second columnar format a lakehouse ingests from
    * (Hive-era producers emit ORC; a complete engine reads it without a
    * conversion hop). Snappy, same as the parquet sinks.
    */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSON-lines sink — the interchange format crawl/API producers
    * actually hand a training pipeline. One JSON object per line;
    * Spark's writer escapes newlines/quotes/unicode inside values, so
    * free-text columns round-trip byte-exactly.
    */
  def jsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Avro sink — the row-oriented interchange format of Kafka/streaming
    * producers (the third leg of the format gate, round-17 directive).
    * Spark 4 ships the implementation inside spark-sql but does NOT
    * register the "avro" short name in DataSourceRegister (the
    * lookup's special case still points at the external module), so
    * address the FileFormat by class.
    */
  val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def avro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(AvroFormat).save(path)

  /** Overwrite a parquet path that the writing plan may itself be
    * reading (the geo-cache upsert, reference elb_logs.py:225). Spark
    * cannot overwrite an input in place, so write to a sibling temp dir
    * and swap via the Hadoop FileSystem.
    *
    * The swap renames the CURRENT data aside before renaming staging into
    * place (never delete-then-rename: a crash between the two would lose
    * the accumulated cache with no copy left). Every rename result is
    * checked; on failure the old data is restored or still present under
    * `path._old`.
    */
  def overwriteInPlace(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "._staging")
    val old = new org.apache.hadoop.fs.Path(path + "._old")
    val fs = target.getFileSystem(hconf)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a past crash
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, old))
      throw new java.io.IOException(s"could not move $target aside to $old")
    if (!fs.rename(tmp, target)) {
      val rolledBack = hadTarget && fs.rename(old, target)
      if (hadTarget && !rolledBack)
        throw new java.io.IOException(
          s"could not move staging $tmp into $target AND rollback failed: " +
            s"previous cache data is intact under $old — restore it manually")
      throw new java.io.IOException(s"could not move staging $tmp into $target" +
        (if (rolledBack) s" (previous data restored at $target)" else ""))
    }
    if (hadTarget) fs.delete(old, true)
  }
}
