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
  * Usage: tools/run.sh graft.PqSweep [sfDir] [nCells] [probesCsv] [method]
  * with method ∈ {ivfpq (default), ivf_train} — ivf_train sweeps the
  * un-quantized trained-IVF rung (round-12: the √n-dial recall proof
  * at sf1, BASELINE.md "Round-12 ANN dials").
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nCells = if (args.length > 1) args(1).toInt else 64
    val probesList =
      if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(4, 8, 12)
    val method = if (args.length > 3) args(3) else "ivfpq"
    val corpusMode = if (args.length > 4) args(4) else "table"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Clustering, Similarity}

    // corpusMode "planted": a deterministic 20k-vector corpus with 90
    // planted Gaussian-ish clusters (center spread ±1.0, point noise
    // ±0.1). The driver fixtures are ISOTROPIC (within-label cosine ≈
    // cross-label ≈ 0, measured in BASELINE.md "Round-12 ANN dials"),
    // and no index can localize neighbors that aren't localized — the
    // planted corpus is the recall proof for the REAL embedding shape
    // (clustered), the table corpus the honest curve for the worst one.
    val corpus = (if (corpusMode == "planted") {
      val nVecs = 20000L
      val kPlant = 90
      def u01(saltCol: org.apache.spark.sql.Column) =
        conv(substring(md5(saltCol), 1, 15), 16, 10).cast("long")
          .cast("double") / lit(1.152921504606847e18)
      spark.range(nVecs).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i => {
          val cl = pmod(col("id"), lit(kPlant.toLong))
          val center = u01(concat(lit("pc:"), cl.cast("string"),
            lit(":"), i.cast("string"))) * 2.0 - 1.0
          val noise = u01(concat(lit("pn:"), col("id").cast("string"),
            lit(":"), i.cast("string"))) * 0.2 - 0.1
          (center + noise).cast("float")
        }).as("embedding"))
    } else Tables.distributed(spark, sfDir, "embeddings"))
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
      val approx =
        if (method == "ivf_train")
          Similarity.ivfTrainedTopK(corpus, queries, "vec_id", "embedding",
            k = 5, nCentroids = nCells, probes = probes, trainRounds = 2)
        else
          Similarity.ivfPqTopK(corpus, queries, "vec_id",
            "embedding", k = 5, nCentroids = nCells, probes = probes,
            trainRounds = 2, subspaces = 16, dims = 64, codebookSize = 256,
            pqTrainRounds = 3)
      val routed = approx
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
      println(f"""{"method":"$method%s","n_cells":$nCells,"probes":$probes,"recall_at_5":${hits.toDouble / (nQ * 5)}%.3f,"scored_rows":$scanned,"flat_rows":$flatRows,"scan_fraction":${scanned.toDouble / flatRows}%.3f,"wall_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
