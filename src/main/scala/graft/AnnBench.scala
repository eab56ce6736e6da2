package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-vs-probe cost split for the persisted ANN index
  * (`ann_index_pruned`'s lifecycle): the registered query pays the
  * one-time index construction INSIDE its timing, which buries the
  * number that matters at 100 TB — the steady-state probe cost of a
  * query batch against the already-built cell-bucketed table. This
  * main times the two halves separately (build once; probe
  * `SPARK_GRAFT_REPEATS`× through the noop sink, warm median
  * reported) and prints one JSON line.
  *
  * Usage: tools/run.sh graft.AnnBench [sfDir]
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val c = Tables.embeddings(spark, sfDir)
    c.count() // materialize the scan cache outside the timed halves

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // same dials as the registered ann_index_pruned query
    var idx: graft.operators.Similarity.AnnIndex = null
    val buildSec = timed {
      idx = graft.operators.Similarity.annIndexBuild(
        c, "vec_id", "embedding", nCentroids = 16, trainRounds = 2,
        subspaces = 16, dims = 64, codebookSize = 256, pqTrainRounds = 3,
        table = "graft_ann_bench_index", buckets = 16)
    }
    val probeSecs = (1 to repeats).map { _ =>
      timed {
        graft.operators.Similarity.annIndexProbe(
            c.where(col("vec_id") < 10), idx, "vec_id", "embedding",
            k = 5, probes = 12)
          .write.format("noop").mode("overwrite").save()
      }
    }.sorted
    val med = probeSecs(probeSecs.size / 2)
    println(f"""{"metric":"ann_build_probe","build_sec":$buildSec%.3f,"probe_median_sec":$med%.3f,"probe_secs":[${probeSecs.map(s => f"$s%.3f").mkString(",")}],"repeats":$repeats,"sf":"$sfDir"}""")
    graft.operators.Partitioning.dropTable(spark, "graft_ann_bench_index")
    spark.stop()
  }
}
