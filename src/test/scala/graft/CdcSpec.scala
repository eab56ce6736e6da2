package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GearChunks
import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String, maskBits: Int = 6, minLen: Int = 16,
      maxLen: Int = 256): Seq[String] = {
    val arr = GearChunks.split(UTF8String.fromString(s), maskBits, minLen, maxLen)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def randText(n: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) {
      sb.append(('a' + rnd.nextInt(26)).toChar)
      if (rnd.nextInt(6) == 0) sb.append(' ')
    }
    sb.toString.take(n)
  }

  test("gear chunking is lossless: concat(chunks) == text") {
    for (seed <- 1 to 5; n <- Seq(0, 1, 15, 16, 100, 5000)) {
      val t = randText(n, seed * 31 + n)
      assert(chunksOf(t).mkString == t, s"n=$n seed=$seed")
    }
    // multi-byte UTF-8: byte-level split may cut inside a char, but the
    // byte concatenation still reconstructs the original exactly
    val uni = "héllo wörld ✓ " * 400
    val arr = GearChunks.split(UTF8String.fromString(uni), 6, 16, 256)
    val bytes = (0 until arr.numElements())
      .flatMap(i => arr.getUTF8String(i).getBytes.toSeq)
    assert(bytes == UTF8String.fromString(uni).getBytes.toSeq)
  }

  test("gear chunk lengths respect [minLen, maxLen] except the final tail") {
    val t = randText(20000, 7)
    val cs = chunksOf(t, maskBits = 6, minLen = 16, maxLen = 256)
    assert(cs.size > 10, s"expected many chunks, got ${cs.size}")
    for (c <- cs.init) {
      assert(c.length >= 16 && c.length <= 256, s"len=${c.length}")
    }
    assert(cs.last.length <= 256)
    // avg chunk size should be in the ballpark of 2^maskBits + minLen
    val avg = cs.map(_.length).sum.toDouble / cs.size
    assert(avg > 24 && avg < 512, s"avg=$avg")
  }

  test("gear boundaries resynchronize after an edit (the CDC property)") {
    val t = randText(20000, 42)
    val edited = t.substring(0, 10000) + "XYZZY" + t.substring(10000)
    val a = chunksOf(t)
    val b = chunksOf(edited)
    // chunks strictly before the edit are untouched
    var offset = 0
    var idx = 0
    while (idx < a.size && offset + a(idx).length <= 10000) {
      assert(b(idx) == a(idx), s"pre-edit chunk $idx changed")
      offset += a(idx).length
      idx += 1
    }
    assert(idx > 0, "test needs at least one pre-edit chunk")
    // downstream, boundaries re-lock onto content: the LAST chunks of
    // both versions coincide again (a fixed-size chunker would shift
    // every boundary after the insertion instead)
    val tailMatch = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(tailMatch.size >= 3,
      s"expected >=3 identical tail chunks, got ${tailMatch.size}")
  }

  test("Md5WindowChunks matches the literal HOF chain the oracle replays") {
    // the exact rule the DuckDB oracle runs, spelled with Spark's own
    // builtin HOFs — the compiled expression must agree row-for-row
    val hofHashes =
      """filter(
        |  zip_with(
        |    concat(array(1), transform(_bnds, b -> b + 1)),
        |    concat(_bnds, array(length(text))),
        |    (s, e) -> IF(e >= s, md5(substring(text, s, e - s + 1)), NULL)),
        |  h -> h IS NOT NULL)""".stripMargin
    val bnds =
      """filter(sequence(16, greatest(length(text), 16)),
        |  p -> p <= length(text)
        |    AND substring(md5(substring(text, p - 15, 16)), 1, 2) = '00')""".stripMargin
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .unionAll(Seq("", "x", "a" * 15, "b" * 16, randText(4000, 3)).toDF("text"))
    val both = docs
      .withColumn("_bnds", expr(bnds))
      .select(
        expr(hofHashes).as("hof"),
        graft.operators.Cdc.md5Chunks(col("text")).as("fast"),
        length(col("text")).as("len"))
      .select(col("hof"),
        expr("transform(fast, c -> c.h)").as("fast_h"),
        expr("aggregate(transform(fast, c -> c.len), 0, (a, x) -> a + x)").as("fast_bytes"),
        col("len"))
    val bad = both.where(not(col("hof") <=> col("fast_h")) ||
      col("fast_bytes") =!= col("len")).count()
    assert(bad == 0)
  }

  test("sharedChunkPairs: planted near-dups pair, boilerplate hubs are capped out") {
    val base = randText(3000, 99)
    val nearDup = base.substring(0, 1500) + "EDIT" + base.substring(1500)
    val unrelated = randText(3000, 100)
    val boiler = randText(600, 101)
    // 10 docs all sharing ONE boilerplate blob (a hub chunk set), plus
    // a planted near-dup pair and one unrelated doc
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)) ++
      (10L to 19L).map(i => (i, boiler + randText(50, i.toInt)))
    val df = docs.toDF("doc_id", "text")
    val pairs = graft.operators.Cdc
      .sharedChunkPairs(df, "doc_id", "text", minShared = 1, maxDf = 5)
      .as[(Long, Long, Long)].collect().toSeq
    // the near-dup pair survives with multiple shared chunks
    val planted = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(planted.exists(_._3 >= 2), s"planted pair missing: $pairs")
    // the 10-doc boilerplate family exceeds maxDf=5 -> its hub chunks
    // are excluded and no boilerplate-only pair appears
    assert(!pairs.exists(p => p._1 >= 10L && p._2 >= 10L),
      s"boilerplate family must be df-capped out: $pairs")
  }

  test("gearChunks column runs inside a projection over the corpus") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), Cdc.gearChunks(col("text")).as("chunks"))
      .select(col("doc_id"), size(col("chunks")).as("n"),
        expr("aggregate(transform(chunks, c -> length(c)), 0, (a, x) -> a + x)").as("total"),
        length(col("text")).as("len"))
    // With default (maskBits=8, min=64) most sf0.001 docs are 1-3 chunks;
    // the invariant that matters: per-doc chunk bytes == doc bytes.
    val bad = df.where(col("total") =!= col("len")).count()
    assert(bad == 0)
  }
}
