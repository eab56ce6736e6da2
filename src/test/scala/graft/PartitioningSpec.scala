package graft

import org.apache.spark.sql.functions._

import graft.operators.Partitioning

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    // the in-memory catalog is fresh each JVM but the warehouse dirs
    // persist — clear orphans or saveAsTable refuses the location
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Partitioning.writeBucketed(
      Tables.orders(spark, sf), "b_orders", "o_custkey", 4)
    Partitioning.writeBucketed(
      Tables.customer(spark, sf).withColumn("o_custkey", $"c_custkey"),
      "b_customer", "o_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$physical")
      assert(joined.count() === Tables.orders(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("persisted ANN index: bucket pruning selects only probed cells' " +
      "buckets, rows equal the composed ivfpq path") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(73)
    val df = (0L until 120L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val qs = df.where(col("vec_id") === 1L)
    def run(fn: => org.apache.spark.sql.DataFrame) =
      fn.orderBy("query_id", "rank").collect().toSeq
    val bucketed = Similarity.ivfPqBucketedTopK(df, qs, "vec_id",
      "embedding", k = 5, nCentroids = 16, probes = 4, trainRounds = 2,
      subspaces = 16, codebookSize = 32, pqTrainRounds = 2,
      table = "graft_ann_index_spec", buckets = 16)
    // ONE query probing 4 of 16 cells: the index scan must read at
    // most 4 of the 16 buckets (cells can collide in a bucket hash,
    // so ≤ probes, and strictly fewer than all)
    val plan = bucketed.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(sel.get.group(1).toInt <= 4 && sel.get.group(2).toInt == 16,
      s"expected <=4 of 16 buckets, got ${sel.get.matched}")
    // and the pruned path returns exactly the composed path's rows
    val composed = Similarity.ivfPqTopK(df, qs, "vec_id", "embedding",
      k = 5, nCentroids = 16, probes = 4, trainRounds = 2,
      subspaces = 16, codebookSize = 32, pqTrainRounds = 2)
    assert(run(bucketed) == run(composed))
    graft.operators.Partitioning.dropTable(spark, "graft_ann_index_spec")
  }

  test("range-sorted layout prunes scan rows for range predicates") {
    val sf = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft-range").toFile
    val e = Tables.events(spark, sf).select("event_id", "ts", "user_id")
    val total = e.count()
    // INT96 (Spark's legacy default) carries no usable min/max stats —
    // range pruning on timestamps needs the modern micros physical type
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      Partitioning.writeSortedByRange(e, s"$tmp/sorted", "ts", 8)
      // unsorted control: same rows, random layout → every row group
      // spans the full ts range and nothing can be skipped
      e.repartition(8).write.parquet(s"$tmp/unsorted")
    } finally spark.conf.unset("spark.sql.parquet.outputTimestampType")

    val bounds = e.agg(min($"ts"), max($"ts")).head()
    val lo = bounds.getTimestamp(0)
    val hi = new java.sql.Timestamp(
      lo.getTime + (bounds.getTimestamp(1).getTime - lo.getTime) / 20)

    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path).filter($"ts" >= lo && $"ts" <= hi)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val sorted = scanRows(s"$tmp/sorted")
    val unsorted = scanRows(s"$tmp/unsorted")
    assert(unsorted === total, "unsorted layout cannot skip any row group")
    assert(sorted < total / 2,
      s"sorted layout should skip most row groups: scanned $sorted of $total")
  }

  test("zValue2 interleaves bits exactly (golden reference)") {
    def zRef(a: Int, b: Int): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((a >> i) & 1).toLong << (2 * i)
        z |= ((b >> i) & 1).toLong << (2 * i + 1)
        i += 1
      }
      z
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535),
      (65535, 65535), (0x1234, 0xABCD), (40503, 2654))
    val df = cases.toDF("a", "b")
      .withColumn("z", Partitioning.zValue2($"a", $"b"))
    df.select("a", "b", "z").as[(Int, Int, Long)].collect().foreach {
      case (a, b, z) => assert(z === zRef(a, b), s"z($a, $b)")
    }
  }

  test("z-ordered layout prunes 2-D box scans a linear sort cannot") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    // 200k points, both coordinates uniform over [0, 65536)
    val pts = spark.range(0, 200000).select(
      $"id",
      pmod($"id" * 2654435761L, lit(65536L)).as("x"),
      pmod($"id" * 40503L + 17L, lit(65536L)).as("y"))
    val total = pts.count()
    // pruning works at row-group granularity — shrink groups so the
    // layouts differ INSIDE files too, not just at file boundaries
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 32 * 1024)
    try {
      Partitioning.writeZOrdered(pts, s"$tmp/zorder", "x", "y", 16)
      // linear control: same rows sorted by x only — a box query prunes
      // on x but every surviving row group spans the full y range
      Partitioning.writeSortedByRange(pts, s"$tmp/linear", "x", 16)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }

    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter($"x" < 4096L && $"y" < 4096L)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val zorder = scanRows(s"$tmp/zorder")
    val linear = scanRows(s"$tmp/linear")
    assert(zorder < linear / 2,
      s"z-order should beat the linear sort on a 2-D box: z=$zorder linear=$linear total=$total")
  }

  test("hilbert-clustered layout prunes 2-D box scans a linear sort cannot") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hilbert").toFile
    val pts = spark.range(0, 200000).select(
      $"id",
      pmod($"id" * 2654435761L, lit(65536L)).as("x"),
      pmod($"id" * 40503L + 17L, lit(65536L)).as("y"))
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 32 * 1024)
    try {
      Partitioning.writeHilbertClustered(pts, s"$tmp/hilbert", "x", "y", 16)
      Partitioning.writeSortedByRange(pts, s"$tmp/linear", "x", 16)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter($"x" < 4096L && $"y" < 4096L)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val hilbert = scanRows(s"$tmp/hilbert")
    val linear = scanRows(s"$tmp/linear")
    assert(hilbert < linear / 2,
      s"hilbert should beat the linear sort on a 2-D box: h=$hilbert linear=$linear")
  }

  test("shardBalance conserves rows/weight, bounds shards, is layout-independent") {
    val df = (0 until 5000).map(i => (i.toLong, (i % 97 + 1).toLong))
      .toDF("k", "w")
    val out = Partitioning.shardBalance(df, "k", "w", shards = 16)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).forall(s => s >= 0 && s < 16))
    assert(rows.map(_.getLong(1)).sum == 5000L, "rows conserved")
    assert(rows.map(_.getLong(2)).sum ==
      (0 until 5000).map(i => (i % 97 + 1).toLong).sum, "weight conserved")
    // micro shares: each floor-truncated, so the sum sits in
    // (1e6 - #shards, 1e6]
    val shareSum = rows.map(_.getLong(3)).sum
    assert(shareSum > 1000000L - 16 && shareSum <= 1000000L, s"$shareSum")
    // a uniform unique key spreads within ~3x of fair share
    assert(rows.map(_.getLong(1)).max < 3L * 5000 / 16)
    val again = Partitioning.shardBalance(
      df.repartition(7, col("w")), "k", "w", shards = 16).collect()
    assert(rows.toSet == again.toSet, "layout-independent")
  }

  test("shardBalance exposes a degenerate key: one shard takes all rows") {
    val df = (0 until 100).map(i => (42L, i.toLong)).toDF("k", "w")
    val rows = Partitioning.shardBalance(df, "k", "w", shards = 8).collect()
    assert(rows.length == 1, "single key -> single shard row")
    assert(rows.head.getLong(3) == 1000000L, "that shard holds 100% micro")
  }

  test("compact collapses a fragmented directory to the byte-target file count") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toFile
    try {
      // fragment: 40 tiny files
      spark.range(20000).select(col("id"), md5(col("id").cast("string")).as("pad"))
        .repartition(40).write.parquet(s"$tmp/frag")
      def files(p: String) = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val fragFiles = files(s"$tmp/frag")
      assert(fragFiles.length === 40)
      val total = fragFiles.map(_.length).sum
      // target ~quarter of the data per file → expect ceil(total/target)
      val target = total / 4
      Partitioning.compact(spark, s"$tmp/frag", s"$tmp/out", target)
      val out = files(s"$tmp/out")
      assert(out.length === ((total + target - 1) / target).toInt,
        s"expected byte-driven count, got ${out.length}")
      assert(out.length < 10)
      // content identical
      assert(spark.read.parquet(s"$tmp/out")
        .exceptAll(spark.read.parquet(s"$tmp/frag")).count() === 0)
      assert(spark.read.parquet(s"$tmp/frag")
        .exceptAll(spark.read.parquet(s"$tmp/out")).count() === 0)
      // refuses in-place
      intercept[IllegalArgumentException] {
        Partitioning.compact(spark, s"$tmp/frag", s"$tmp/frag", target)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

  test("salting spreads a hot key across shuffle partitions") {
    // one key carries 90% of the probe rows — the classic skew shape
    val probe = spark.range(0, 2000).select(
      when($"id" < 1800, lit(7L)).otherwise($"id" % 50).as("k"),
      $"id".as("uid"))
    val build = spark.range(0, 50).select($"id".as("k"), ($"id" * 10).as("v"))

    def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
      df.select("uid").rdd.mapPartitions(it => Iterator(it.size.toLong))
        .collect().max

    // force shuffle joins with static partitioning so the join output's
    // partition sizes expose exactly what the join shuffled on
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plainMax = maxPartitionRows(probe.join(build, Seq("k")))
      val saltedMax = maxPartitionRows(
        Partitioning.saltedJoin(probe, build, "k", "uid", saltFactor = 8))
      assert(plainMax >= 1800, s"hot key should pile into one partition, got $plainMax")
      assert(saltedMax <= plainMax / 2,
        s"salting should spread the hot key: max $saltedMax vs plain $plainMax")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("runtime bloom-filter pruning injects on a selective dim join") {
    // At cluster scale this optimizer feature is ON by default: it
    // builds a bloom filter from the (selective) dim side and prunes
    // the fact scan before the shuffle — the 100 TB fact-join saver.
    // Locally the application side is far under the 10 GB default
    // threshold, so the test lowers it to prove the rewrite fires.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val sf = "/root/testdata/sf0.001"
      val fact = Tables.orders(spark, sf)
      val dim = Tables.customer(spark, sf).where($"c_acctbal" > 9000)
      val j = fact.join(dim, fact("o_custkey") === dim("c_custkey"))
      assert(j.queryExecution.optimizedPlan.toString.contains("bloom"),
        "runtime bloom filter should inject into the fact side")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join returns exactly the plain join's rows") {
    val sf = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Partitioning.saltedJoin(
        orders, customer, "o_custkey", probeUniqueCol = "o_orderkey")
      .select("o_orderkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // left joins preserve unmatched probe rows too
    val leftSalted = Partitioning.saltedJoin(
      orders.limit(50), customer.where($"o_custkey" < 0),
      "o_custkey", "o_orderkey", joinType = "left")
    assert(leftSalted.count() === 50)
  }

  test("salted join plans the salted EXCHANGE, never a broadcast") {
    // round-16 verdict: the planner broadcast the 8×-replicated build
    // side at bench SF — result-correct but the opposite of the
    // operator's reason to exist (the salt only changes anything when
    // both sides exchange on (key, salt)). Pin the physical shape.
    val sf = "/root/testdata/sf0.001"
    val salted = Partitioning.saltedJoin(
      Tables.orders(spark, sf),
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey", probeUniqueCol = "o_orderkey")
    salted.collect()
    val plan = salted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastHashJoin"),
      s"salted join must not broadcast the replicated build side:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must be the (key, salt)-keyed shuffled hash join:\n$plan")
  }
}
