package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Expression-level micro-benchmarks over synthetic data, for changes
  * whose cost is invisible at sf0.1 (where per-query fixed overhead
  * dominates) but material at cluster scale. Each case times the SAME
  * logical computation in two formulations through the noop sink and
  * prints one JSON line per case.
  *
  * Current case: the LSH bucket id — codegen'd LongArrayDot per plane
  * (what [[Similarity.lshBucket]] ships) vs the interpreted
  * `aggregate(zip_with(...))` higher-order-function chain it replaced.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_MB_ROWS", "2000000").toLong
    val dims = 64
    val bits = 8
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic quantized vectors: dims longs in [-128, 127]
    val vecs = spark.range(rows).select(col("id"),
        transform(sequence(lit(0), lit(dims - 1)),
          i => pmod(col("id") * lit(2654435761L) + i * lit(40503L), lit(256)) - 128)
          .as("q"))
      .persist()
    vecs.count() // materialize outside the timed region

    // the interpreted HOF formulation lshBucket used before round 7
    def hofBucket = (0 until bits).map { j =>
      val signs = typedLit((0 until dims).map(i => Similarity.planeSign(j, i).toLong))
      val dot = aggregate(zip_with(col("q"), signs, (x, s) => x * s),
        lit(0L), (a, x) => a + x)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String, bucket: org.apache.spark.sql.Column): Double = {
      val samples = (1 to 3).map { _ =>
        time(vecs.select(bucket.as("bucket"))
          .write.format("noop").mode("overwrite").save())
      }.sorted
      samples(1) // median of 3
    }

    run("warmup", Similarity.lshBucket(col("q"), bits, dims))
    val codegen = run("codegen", Similarity.lshBucket(col("q"), bits, dims))
    val hof = run("hof", hofBucket)
    println(f"""{"metric":"lsh_bucket_micro","rows":$rows,"dims":$dims,"bits":$bits,"codegen_sec":$codegen%.3f,"hof_sec":$hof%.3f,"speedup":${hof / codegen}%.2f}""")
    spark.stop()
  }
}
