package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF+PQ probe-count sweep (BASELINE.md round-11): recall@5 and
  * ADC-scored candidate rows at several `probes` dials over a larger
  * cell count than the registered query's toy 16, so the
  * probes/nCells scaling claim rests on a measured curve rather than
  * one dial setting.
  *
  * Scored rows are recomputed from the SAME trained router
  * ([[graft.operators.Clustering.lloydCentroids]] is memoized per
  * (session, plan, dials), so the cells here are identical to the ones
  * [[graft.operators.Similarity.ivfPqTopK]] probes): Σ_q Σ_{probed
  * cells} |cell| − self-hits.
  *
  * Usage: tools/run.sh graft.PqSweep [sfDir] [nCells] [probesCsv]
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nCells = if (args.length > 1) args(1).toInt else 64
    val probesList =
      if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(4, 8, 12)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Clustering, Similarity}

    val corpus = Tables.distributed(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 10)
    val truth = Similarity
      .bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val nQ = truth.select("query_id").distinct().count()

    // cell sizes + per-query probed cells from the same memoized router
    val cents = Clustering
      .lloydCentroids(corpus, "vec_id", "embedding", nCells, 2)
    val cellSizes = Clustering.assign(corpus, "vec_id", "embedding", cents)
      .groupBy("cluster").agg(count(lit(1)).as("n")).localCheckpoint()

    probesList.foreach { probes =>
      val t0 = System.nanoTime()
      val routed = Similarity.ivfPqTopK(corpus, queries, "vec_id",
        "embedding", k = 5, nCentroids = nCells, probes = probes,
        trainRounds = 2, subspaces = 16, dims = 64, codebookSize = 256,
        pqTrainRounds = 3)
        .select("query_id", "neighbor_id").localCheckpoint()
      val wall = (System.nanoTime() - t0) / 1e9
      val hits = truth.join(routed, Seq("query_id", "neighbor_id")).count()
      // probed cells per query = the `probes` nearest by exact distance
      // with ties to the smaller cell id — the identical ordering
      // ivfPqTopK's packed argmin produces
      val ranked = Clustering.cellDistances(queries, "vec_id", "embedding", cents)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("vec_id").orderBy(col("dist2"), col("cluster"))))
        .where(col("rk") <= probes)
      val scanned = ranked.join(cellSizes, "cluster")
        .agg(sum(col("n"))).head().getLong(0)
      val flatRows = corpus.count() * nQ
      println(f"""{"n_cells":$nCells,"probes":$probes,"recall_at_5":${hits.toDouble / (nQ * 5)}%.3f,"scored_rows":$scanned,"flat_rows":$flatRows,"scan_fraction":${scanned.toDouble / flatRows}%.3f,"wall_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
