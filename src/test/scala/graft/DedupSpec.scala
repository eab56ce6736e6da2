package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) =
    spark.range(n).select(
      $"id".as("vec_id"),
      array(lit(1.0f), lit(0.0f)).as("embedding"))

  test("embeddingNearDups refuses inputs over the cartesian cap") {
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(vecs(5), "vec_id", "embedding",
        threshold = 0.9, maxRows = 3)
    }
    assert(e.getMessage.contains("embeddingNearDupsLsh"))
  }

  test("embeddingNearDups under the cap still finds identical vectors") {
    val pairs = Dedup.embeddingNearDups(vecs(3), "vec_id", "embedding",
      threshold = 0.9).count()
    assert(pairs === 3) // all 3 unordered pairs of identical unit vectors
  }

  test("sampled embedding twin: identity below the cap, md5-rule subset above it") {
    // below the cap the filter keeps everything: twin == baseline
    val all = Dedup.embeddingNearDups(vecs(40), "vec_id", "embedding", 0.9)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val twin = Dedup.embeddingNearDupsSampled(vecs(40), "vec_id", "embedding",
      0.9, capRows = 100).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(twin === all)
    // above the cap: pairs are EXACTLY the baseline restricted to the
    // driver-replayed kept set (u40·n < cap·2^40 on the 40-bit md5)
    val n = 500L; val cap = 60L
    def kept(id: Long): Boolean = {
      val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"esamp:$id")
      java.lang.Long.parseLong(h.substring(0, 10), 16) * n < cap * (1L << 40)
    }
    val keptIds = (0L until n).filter(kept)
    assert(keptIds.size > cap / 2 && keptIds.size < cap * 2, s"got ${keptIds.size}")
    val expected = Dedup.embeddingNearDups(
      vecs(n.toInt).where($"vec_id".isin(keptIds: _*)),
      "vec_id", "embedding", 0.9)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val got = Dedup.embeddingNearDupsSampled(vecs(n.toInt), "vec_id",
      "embedding", 0.9, capRows = cap)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(got === expected)
  }

  test("simhashPairs == brute-force hamming over fingerprints (pigeonhole exactness)") {
    // mix of exact dups, near-dups (one/two words changed), and
    // unrelated texts; maxHamming=3 < blocks=4 makes block-LSH exact,
    // so the result must equal the all-pairs hamming filter computed
    // from the PUBLIC fingerprints
    def base(i: Int) = s"alpha beta gamma delta epsilon zeta eta theta w$i"
    val docs = (
      (1L to 3L).map(i => (i, base(0))) ++             // 3 exact copies
      Seq((4L, base(0) + " extra"), (5L, base(1)),
          (6L, "totally different words about spark engines running fast"),
          (7L, "totally different words about spark engines running slow"))
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "text", "doc_id")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val fps = docs.select(col("doc_id"), Dedup.simhash(col("text"), 32).as("fp"))
      .as[(Long, Long)].collect()
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got === want)
    assert(want.exists(_._3 == 0L), "fixture must contain exact dups")
    assert(want.size < fps.length * (fps.length - 1) / 2,
      "fixture must exclude some pairs")
  }

  test("incrementalDups flags fresh copies of base docs, leaves originals clean") {
    // distinctive 12-word texts so 3-shingle minhash separates them
    def txt(seed: Int) = (0 until 12).map(j => s"w${seed}x$j").mkString(" ")
    val base = Seq((1L, txt(1)), (2L, txt(2)), (3L, txt(3))).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, txt(2)),   // exact copy of base doc 2 → dup_of 2
      (11L, txt(99))   // novel text → clean
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDups(base, fresh, "text", "doc_id")
      .select("doc_id", "dup_of", "is_dup").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((10L, 2L, true), (11L, -1L, false)))
  }

  test("the base band table round-trips through parquet — the persist-once workflow") {
    // production shape: the corpus band table is computed once and
    // persisted; each day's batch joins the STORED table. The stored
    // bands must reproduce exactly what an inline computation matches.
    def txt(seed: Int) = (0 until 12).map(j => s"w${seed}x$j").mkString(" ")
    val base = Seq((1L, txt(1)), (2L, txt(2)), (3L, txt(3))).toDF("doc_id", "text")
    val fresh = Seq((10L, txt(3)), (11L, txt(42))).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bands").toFile
    try {
      val bands = Dedup.lshBands(
        Dedup.minhashSignatureTable(base, "doc_id", "text", 3, 9), "doc_id", 9, 3)
      bands.write.parquet(s"$tmp/bands")
      val stored = spark.read.parquet(s"$tmp/bands")
        .select(col("band_idx"), col("band_hash"), col("doc_id").as("_base_id"))
      // match the fresh side against the STORED table (same join shape
      // as incrementalDups' internals)
      val freshBands = Dedup.lshBands(
        Dedup.minhashSignatureTable(fresh, "doc_id", "text", 3, 9), "doc_id", 9, 3)
      val viaStore = freshBands.join(stored, Seq("band_idx", "band_hash"))
        .groupBy("doc_id").agg(min("_base_id").as("dup_of"))
        .as[(Long, Long)].collect().sorted.toSeq
      val direct = Dedup.incrementalDups(base, fresh, "text", "doc_id")
        .where(col("is_dup")).select("doc_id", "dup_of")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(viaStore === direct && viaStore === Seq((10L, 3L)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

  test("10k identical docs: the skew guard caps the bucket self-join at O(cap²)+O(n)") {
    // Every doc identical → all 3 bands collapse to one bucket each. An
    // unguarded self-join would emit ~n²/2 ≈ 50M pairs; the guard must
    // keep the candidate list near n (kept-subset pairs + star edges).
    val n = 10000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit("a b c d e f g h i j k l").as("text"))
    val cap = 64
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id", bucketCap = cap)
      .persist()
    val nPairs = pairs.count()
    // upper bound: kept-subset pairs (binomial ~cap per band, allow 3x
    // headroom) + one star edge per dropped doc
    assert(nPairs < 3L * (3 * cap) * (3 * cap) / 2 + n,
      s"guard failed: $nPairs pairs for $n identical docs (cap $cap)")
    assert(nPairs >= n - 1, s"connectivity needs >= ${n - 1} edges, got $nPairs")
    // connectivity is EXACT: all n docs form one cluster labeled 0
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    assert(cc.count() === n.toLong)
    assert(cc.where(col("cluster") =!= 0L).count() === 0L,
      "every doc must join the min-id component")
    pairs.unpersist()
  }

  test("ngram Jaccard: identical-doc corpus stays bounded and unskewed corpora are unchanged") {
    Dedup.clearSkewCache()
    // adversarial: every doc identical — the unguarded formulation
    // would emit (and BROADCAST) n²/2 candidate pairs
    val n = 5000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit("a b c d e f g h i j k l").as("text"))
    val cap = 64
    val nPairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", bucketCap = cap)
      .count()
    assert(nPairs < 3L * (3 * cap) * (3 * cap) / 2,
      s"guard failed: $nPairs verified pairs for $n identical docs")
    // natural corpus: guarded output must equal the historical shape
    // (every returned pair fully verified with an exact jaccard)
    val natural = (1 to 200).map(i => (i.toLong,
      if (i % 50 == 0) "alpha beta gamma delta epsilon zeta"
      else s"w$i w${i + 1} w${i + 2} w${i + 3} unique$i text here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(natural, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
    val clique = Seq(50L, 100L, 150L, 200L).combinations(2)
      .map(s => (s(0), s(1))).toSet
    assert(clique.subsetOf(pairs.map(p => (p._1, p._2)).toSet),
      s"all 6 identical-doc pairs must survive the guard: ${pairs.toSeq}")
    assert(pairs.filter(p => clique((p._1, p._2))).forall(_._3 == 1.0))
  }

  test("skew guard output is bit-identical when no bucket exceeds the cap") {
    def txt(seed: Int) = (0 until 12).map(j => s"w${seed}x$j").mkString(" ")
    val docs = (1 to 20).map(i => (i.toLong, txt(i % 5))).toDF("doc_id", "text")
    val guarded = Dedup.minhashCandidates(docs, "text", "doc_id", bucketCap = 10000)
      .as[(Long, Long)].collect().sorted.toSeq
    // cap larger than any bucket → same pairs as an effectively
    // unguarded run (cap = corpus size bounds every bucket)
    val unguarded = Dedup.minhashCandidates(docs, "text", "doc_id", bucketCap = 20)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(guarded === unguarded && guarded.nonEmpty)
  }

  test("embedding LSH skew guard: identical vectors stay one cluster, not O(n²) pairs") {
    val n = 2000
    val dims = 8
    val ident = spark.range(n).select(col("id").as("vec_id"),
      array((0 until dims).map(_ => lit(0.5f)): _*).as("embedding"))
    val pairs = Dedup.embeddingNearDupsLsh(ident, "vec_id", "embedding",
      threshold = 0.99, bits = 4, dims = dims, bucketCap = 32).persist()
    val nPairs = pairs.count()
    assert(nPairs < 32L * 32 / 2 * 3 + n,
      s"guard failed: $nPairs pairs for $n identical vectors")
    // identical vectors: every pair that IS emitted has cosine 1, and
    // the star edges keep all n vectors in one connected cluster
    val cc = Dedup.connectedComponents(pairs, "vec_a", "vec_b")
    assert(cc.count() === n.toLong)
    assert(cc.where(col("cluster") =!= 0L).count() === 0L)
    pairs.unpersist()
  }

  test("connectedComponents labels every node with its component's min id") {
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // pair 10-11, triangle 20-21-22 with a redundant edge
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(edges, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
  }

  test("deep path graph (diameter 300 >> maxIter) converges via the star fallback") {
    // adversarial chain: label propagation alone would need 300 rounds;
    // the star contraction finishes it in logarithmic rounds
    val rnd = new scala.util.Random(42)
    val edges = rnd.shuffle((0L until 300L).map(i => (i, i + 1)).toVector)
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(edges, "doc_a", "doc_b", maxIter = 25)
      .as[(Long, Long)].collect()
    assert(cc.length === 301)
    assert(cc.forall(_._2 == 0L), "every chain node labels to the minimum 0")
  }

  test("random graphs: hybrid labels match brute-force union-find minima") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Vector.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // brute-force union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val truth = nodes.map { v =>
      val root = find(v.toInt)
      // min id in the component = min over nodes sharing the root
      v -> nodes.filter(u => find(u.toInt) == root).min
    }.toMap
    // force the star path with propagationRounds = 0 as well as hybrid
    for (pr <- Seq(0, 8)) {
      val cc = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"),
          "doc_a", "doc_b", maxIter = 25, propagationRounds = pr)
        .as[(Long, Long)].collect().toMap
      assert(cc === truth, s"propagationRounds=$pr")
    }
  }

  test("prefixFilterJoin is lossless: equals brute force on a random corpus") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (1L to 40L).map(i => (i, doc(12 + rnd.nextInt(30))))
    // planted near-dups: append two words to a copy
    val dups = bases.take(8).map { case (i, t) => (i + 100L, t + " alpha beta") }
    val docs = (bases ++ dups).toDF("doc_id", "text")

    val fast = Dedup.prefixFilterJoin(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // brute force with the same shingles and threshold
    val sh = docs.select(col("doc_id").as("doc"),
      explode(Dedup.shingles(col("text"), 3)).as("sh"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val brute = sh.select(col("doc").as("doc_a"), col("sh"))
      .join(sh.select(col("doc").as("doc_b"), col("sh")), "sh")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc").as("doc_a"), col("sz").as("size_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("sz").as("size_b")), "doc_b")
      .where(lit(8) * col("inter") >= lit(3) * (col("size_a") + col("size_b")))
      .select("doc_a", "doc_b", "inter", "size_a", "size_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fast === brute)
    // every planted pair is found (small suffix edit keeps J >= 0.6)
    val pairs = fast.map(p => (p._1, p._2))
    for (i <- 1L to 8L) assert(pairs.contains((i, i + 100L)), s"missing planted $i")
    // collision soft-assert (round-13 ADVICE): the engine counts
    // intersections on 60-bit md5-prefix hashes; a corpus-wide
    // collision would skew those counts vs the string-exact brute
    // force — make that failure mode loud and named
    val collisions = sh.select(col("sh"), Dedup.shingleU(col("sh")).as("u"))
      .distinct().groupBy("u").agg(countDistinct(col("sh")).as("n"))
      .where(col("n") > 1).count()
    assert(collisions === 0L, "60-bit shingle-hash collision in fixture")
  }

  test("the set-similarity family shares ONE shingle index per (corpus, k)") {
    // ssjoin, containment and ngram-jaccard all consume the same
    // ranked-shingle + sorted-array artifacts; running all three over
    // the same corpus plan must build the index exactly once (the
    // round-15 directive: at 100 TB the ranked table is an index you
    // build once, not a pipeline you re-run per query)
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k m"),
      (3L, "zz yy xx ww vv uu tt ss rr qq pp oo")
    ).toDF("doc_id", "text")
    val before = Dedup.shingleIndexCount
    Dedup.prefixFilterJoin(docs, "text", "doc_id").collect()
    assert(Dedup.shingleIndexCount == before + 1, "first call must build")
    Dedup.containmentPairs(docs, "doc_id", "text", 3, 9, 10).collect()
    Dedup.ngramJaccardPairs(docs, "text", "doc_id").collect()
    Dedup.prefixFilterJoin(docs, "text", "doc_id", tauNum = 1, tauDen = 2).collect()
    assert(Dedup.shingleIndexCount == before + 1,
      "later family members (and other thresholds) must reuse the index, not rebuild")
  }

  test("duplicated spans: cross-doc and within-doc repeats merge into maximal spans") {
    val docs = Seq(
      (1L, "a b c d e f"),          // shares "a b c d" with doc 2
      (2L, "x y a b c d q r"),
      (3L, "z z1 z2 z3"),           // nothing duplicated
      (4L, "p q r s p q r t"),      // within-doc repeat of "p q r"
      (5L, "w1 w2")                 // shorter than k: no grams at all
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "n_spans", "dup_tokens", "dup_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      // grams "a b c","b c d" dup; positions {1,2} merge: span 2-1+3 = 4
      (1L, 6L, 1L, 4L, 0.666667),
      (2L, 8L, 1L, 4L, 0.5),
      (3L, 4L, 0L, 0L, 0.0),
      // "p q r" at pos 1 and 5: gap 4 > k so TWO spans of 3
      (4L, 8L, 2L, 6L, 0.75),
      (5L, 2L, 0L, 0L, 0.0)))
  }

  test("duplicated spans: adjacent islands within k merge; beyond k split") {
    // "m n o" duplicated at pos 1 and 4 in the same doc (gap 3 = k):
    // intervals [1,3] and [4,6] touch -> one merged span of 6
    val docs = Seq(
      (1L, "m n o m n o"),
      (2L, "m n o a1 a2 a3 a4 a5 m n o") // gap 8 > k: two spans of 3
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "n_spans", "dup_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L, 6L), (2L, 2L, 6L)))
  }

  test("starComponents handles cliques, pairs, and empty input") {
    val clique = for (a <- 0L until 6L; b <- 0L until a) yield (a, b)
    val edges = (clique ++ Seq((50L, 60L))).toDF("a", "b")
    val cc = Dedup.starComponents(edges, maxRounds = 20).as[(Long, Long)].collect().toMap
    assert((0L until 6L).forall(cc(_) == 0L))
    assert(cc(50L) === 50L && cc(60L) === 50L)
    assert(Dedup.starComponents(Seq.empty[(Long, Long)].toDF("a", "b"), 5).count() === 0)
  }

  test("semanticDedup drops the higher id of an identical pair, keeps the rest") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),  // exact dup of 1 -> same cluster, dropped
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(df, "vec_id", "embedding", k = 2, tau = 0.9)
      .collect().map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("kept")).toMap
    assert(r === Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("semanticDedup is invariant to input partitioning") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.semanticDedup(d, "vec_id", "embedding", k = 4, tau = 0.4)
        .collect().map(x =>
          (x.getAs[Long]("vec_id"), x.getAs[Long]("kept"))).toSet
    assert(run(df) === run(df.repartition(9)))
  }

  test("containmentPairs is lossless: equals brute force on a random corpus") {
    // same discipline as the prefixFilterJoin losslessness case: the
    // round-12 containment-prefix candidate filter must find EVERY
    // pair the full inverted-index self-join finds
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(47)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (1L to 40L).map(i => (i, doc(12 + rnd.nextInt(30))))
    // planted containments: a long prefix of the base doc
    val trunc = bases.take(10).map { case (i, t) =>
      (i + 100L, t.split(" ").dropRight(1).mkString(" "))
    }
    val docs = (bases ++ trunc).toDF("doc_id", "text")

    val fast = Dedup
      .containmentPairs(docs, "doc_id", "text", shingleK = 3,
        tauNum = 9, tauDen = 10)
      .select("doc_a", "doc_b", "n_shared", "size_a")
      .as[(Long, Long, Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id").as("doc"),
      explode(Dedup.shingles(col("text"), 3)).as("sh"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val brute = sh.select(col("doc").as("doc_a"), col("sh"))
      .join(sh.select(col("doc").as("doc_b"), col("sh")), "sh")
      .where(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("doc").as("doc_a"), col("sz").as("size_a")), "doc_a")
      .where(lit(10) * col("n_shared") >= lit(9) * col("size_a"))
      .select("doc_a", "doc_b", "n_shared", "size_a")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast === brute)
    // every planted truncation is flagged as contained in its base
    val pairs = fast.map(p => (p._1, p._2))
    for (i <- 1L to 10L)
      assert(pairs.contains((i + 100L, i)), s"missing planted $i")
    // collision soft-assert (round-13 ADVICE): see the
    // prefixFilterJoin losslessness case
    val collisions = sh.select(col("sh"), Dedup.shingleU(col("sh")).as("u"))
      .distinct().groupBy("u").agg(countDistinct(col("sh")).as("n"))
      .where(col("n") > 1).count()
    assert(collisions === 0L, "60-bit shingle-hash collision in fixture")
  }

  test("containmentPairs flags the contained side only") {
    val words = (1 to 10).map(i => s"w$i")
    val df = Seq(
      (1L, words.mkString(" ")),            // 8 shingles
      (2L, words.take(5).mkString(" ")),    // 3 shingles, all in doc 1
      (3L, "x1 x2 x3 x4 x5 x6")             // unrelated
    ).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(df, "doc_id", "text", shingleK = 3, tauNum = 9, tauDen = 10)
      .collect()
    assert(r.length === 1)
    val p = r.head
    assert(p.getAs[Long]("doc_a") === 2L && p.getAs[Long]("doc_b") === 1L)
    assert(p.getAs[Long]("n_shared") === 3L && p.getAs[Long]("size_a") === 3L)
    assert(p.getAs[Double]("containment") === 1.0)
  }

  test("containmentPairs emits both orientations for exact duplicates") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f")
    ).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(df, "doc_id", "text", shingleK = 3, tauNum = 9, tauDen = 10)
      .collect().map(p => (p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b"))).toSet
    assert(r === Set((1L, 2L), (2L, 1L)))
  }

  test("normalized near-exact dedup collapses case/punct/space variants only") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "HELLO  WORLD !!"),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val groups = df.select(col("doc_id"), md5(norm).as("h"))
      .groupBy("h").agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n")).toMap
    assert(groups === Map(1L -> 3L, 4L -> 1L))
  }

  test("dedup_weights: every cluster's weights sum to exactly 1 sampled unit") {
    // the invariant the down-weighting exists for: a dup family's
    // expected sampled mass is 1 no matter how many copies were crawled
    val out = graft.queries.DocQueries.dedupWeights(spark, "/root/testdata/sf0.001")
    val perCluster = out.groupBy("cluster")
      .agg(org.apache.spark.sql.functions.sum("weight").as("w"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      // n * (1.0/n) sums of identical doubles: exact for n ≤ 2^52
      assert(math.abs(r.getAs[Double]("w") - 1.0) < 1e-12,
        s"cluster ${r.get(0)}: weight sum ${r.getAs[Double]("w")} over ${r.getAs[Long]("n")} docs")
    }
    assert(out.count() === 500) // every sf0.001 doc weighted exactly once
  }

  test("dedup_recall dial: stricter bands measurably lower LSH candidate recall") {
    // the round-17 evaluation-gate contract: band/row parameters are a
    // measured dial, not folklore. Moderate-overlap pairs (12 of 20
    // words shared -> ~0.43 shingle Jaccard) are caught by 3 bands of
    // 3 with fair probability but need ALL 9 minhashes equal under a
    // single band of 9 — so candidate counts must strictly drop.
    import spark.implicits._
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo")
    def text(seed: Int, words: Int): String =
      (0 until words).map(i => vocab((seed * 7 + i * 5) % vocab.length))
        .mkString(" ")
    val base = (1 to 40).map(i => (i.toLong, text(i, 20)))
    val twins = (1 to 40).map(i =>
      (i.toLong + 1000, text(i, 12))) // 12-word prefix of the 20
    val corpus = (base ++ twins).toDF("doc_id", "text")
    val truth = graft.operators.Dedup
      .prefixFilterJoin(corpus, "text", "doc_id")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must plant true near-dup pairs")
    def hits(rowsPerBand: Int): Int = {
      val cand = graft.operators.Dedup.minhashCandidates(
        corpus, "text", "doc_id",
        shingleK = 3, numHashes = 9, rowsPerBand = rowsPerBand)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (cand intersect truth).size
    }
    val loose = hits(rowsPerBand = 3)
    val strict = hits(rowsPerBand = 9)
    assert(strict < loose,
      s"one band of 9 must recall strictly fewer true pairs than 3 bands " +
        s"of 3 on the planted fixture: strict=$strict loose=$loose " +
        s"truth=${truth.size}")
  }
}
