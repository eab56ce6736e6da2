package graft

import org.apache.spark.sql.functions._

import graft.functions.{NormalizeText, WinnowMinMd5}
import graft.operators.{TextAnalysis => T}

/** Pins the round-13 scan kernels against the builtin-regex / HOF twins
  * they replaced on the corpus hot path: [[NormalizeText]] (both modes)
  * and [[WinnowMinMd5]]. The registered queries' oracles re-derive the
  * regex formulations independently in DuckDB, so kernel == twin here
  * plus the driver's hash gate closes the loop.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  /** Adversarial inputs: unicode (multibyte, uppercase-É folds to a
    * non-ASCII lowercase), every \s class member, runs of separators at
    * every position, punctuation inside and between words, digits,
    * empty and separator-only strings, short texts below the winnow
    * gram size.
    */
  private val cases = Seq(
    "Hello, World!",
    "  leading and trailing  ",
    "tabs\tand\nnewlinesvt\fff\rcr",
    "a.b",                       // strip: "ab"; space: "a b"
    "a . b",
    "punct---runs___between words",
    "ÉÀ unicode Ωmega naïve café",
    "MiXeD CaSe 123 DIGITS 456",
    "!!!",
    "",
    " ",
    "one",
    "one two",
    "one two three four",        // < 5 tokens: whole-text winnow gram
    "one two three four five",
    "one two three four five six seven eight",
    "dup dup dup dup dup dup dup",
    "x  double  spaces  keep  empty  tokens  y")

  private def df = cases.toDF("text")

  test("NormalizeText strip mode == the three-pass regex twin") {
    val got = df.select(
      NormalizeText.normalize_text(col("text"), punctToSpace = false).as("k"),
      NormalizeText.stripTwin(col("text")).as("t"))
      .collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) === r.getString(1), s"strip mismatch on '$in'")
    }
  }

  test("NormalizeText space mode == the three-pass regex twin") {
    val got = df.select(
      NormalizeText.normalize_text(col("text"), punctToSpace = true).as("k"),
      NormalizeText.spaceTwin(col("text")).as("t"))
      .collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) === r.getString(1), s"space mismatch on '$in'")
    }
  }

  test("WinnowMinMd5 == the array_min(transform(shingles, md5)) twin") {
    val got = df.select(
      WinnowMinMd5.winnow_min_md5(col("text"), 5).as("k"),
      T.winnowMinTwin(col("text")).as("t"))
      .collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) === r.getString(1), s"winnow mismatch on '$in'")
    }
  }

  test("kernels == twins across the documents corpus (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      NormalizeText.normalize_text(col("text"), punctToSpace = false).as("ks"),
      NormalizeText.stripTwin(col("text")).as("ts"),
      NormalizeText.normalize_text(col("text"), punctToSpace = true).as("kp"),
      NormalizeText.spaceTwin(col("text")).as("tp"),
      WinnowMinMd5.winnow_min_md5(col("text"), 5).as("kw"),
      T.winnowMinTwin(col("text")).as("tw"))
      .where(col("ks") =!= col("ts") || col("kp") =!= col("tp") ||
        col("kw") =!= col("tw"))
      .count()
    assert(diff === 0L)
  }

  /** The interpreted HOF gram builder the PositionalGrams kernel
    * replaced at phrase_search / text_lm_score / dedup_substring —
    * verbatim the pre-round-14 formulation.
    */
  private def gramsTwin(text: org.apache.spark.sql.Column, k: Int,
      hashed: Boolean): org.apache.spark.sql.Column = {
    val words = split(text, " ")
    val raw = transform(sequence(lit(1), size(words) - (k - 1)),
      i => concat_ws(" ", slice(words, i, lit(k))))
    when(size(words) >= k, if (hashed) transform(raw, g => md5(g)) else raw)
      .otherwise(array().cast("array<string>"))
  }

  test("PositionalGrams (raw + hashed, k=2,3,5) == the HOF twins") {
    for (k <- Seq(2, 3, 5)) {
      val got = df.select(
        graft.functions.PositionalGrams
          .positional_grams(col("text"), k, hashed = false).as("kr"),
        gramsTwin(col("text"), k, hashed = false).as("tr"),
        graft.functions.PositionalGrams
          .positional_grams(col("text"), k, hashed = true).as("kh"),
        gramsTwin(col("text"), k, hashed = true).as("th"))
        .collect()
      got.zip(cases).foreach { case (r, in) =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"raw gram mismatch on '$in' (k=$k)")
        assert(r.getSeq[String](2) === r.getSeq[String](3),
          s"hashed gram mismatch on '$in' (k=$k)")
      }
    }
  }

  test("PositionalGramHash64 == conv(substring(md5(gram),1,15),16,10) twin") {
    // the 60-bit long the SQL oracles replay as
    // CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
    for (k <- Seq(1, 2, 3)) {
      val got = df.select(
        graft.functions.PositionalGrams
          .positional_gram_hashes64(col("text"), k).as("kh"),
        gramsTwin(col("text"), k, hashed = false).as("raw"))
        .select(col("kh"),
          transform(col("raw"), g =>
            conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("th"))
        .collect()
      got.zip(cases).foreach { case (r, in) =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1),
          s"hash64 gram mismatch on '$in' (k=$k)")
      }
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      graft.functions.PositionalGrams
        .positional_gram_hashes64(col("text"), 2).as("kh"),
      transform(gramsTwin(col("text"), 2, hashed = false), g =>
        conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("th"))
      .where(col("kh") =!= col("th")).count()
    assert(diff === 0L)
  }

  test("GramDistinctCount: repNgramFraction == the HOF twin") {
    for (n <- Seq(2, 3)) {
      val got = df.select(
        T.repNgramFraction(col("text"), n).as("k"),
        T.repNgramFractionTwin(col("text"), n).as("t"))
        .collect()
      got.zip(cases).foreach { case (r, in) =>
        assert(r.getDouble(0) === r.getDouble(1),
          s"rep fraction mismatch on '$in' (n=$n)")
      }
    }
  }

  test("PositionalGrams kernels == twins across the documents corpus (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      graft.functions.PositionalGrams
        .positional_grams(col("text"), 2, hashed = false).as("kr"),
      gramsTwin(col("text"), 2, hashed = false).as("tr"),
      graft.functions.PositionalGrams
        .positional_grams(col("text"), 4, hashed = true).as("kh"),
      gramsTwin(col("text"), 4, hashed = true).as("th"),
      T.repNgramFraction(col("text"), 3).as("kd"),
      T.repNgramFractionTwin(col("text"), 3).as("td"))
      .where(col("kr") =!= col("tr") || col("kh") =!= col("th") ||
        col("kd") =!= col("td"))
      .count()
    assert(diff === 0L)
  }

  /** The interpreted per-bit HOF fold the SimhashText kernel replaced
    * at Dedup.simhash/simhashPairs — verbatim the pre-round-14
    * formulation (null text yields 0 via the when/otherwise fallthrough,
    * which Dedup.simhash mirrors with a coalesce around the kernel).
    */
  private def simhashTwin(text: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    val hashes = transform(array_distinct(split(text, " ")), w => md5(w))
    (0 until bits).map { j =>
      val bitSum = aggregate(hashes, lit(0),
        (acc, h) => acc + when(
          substring(h, j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
          lit(1)).otherwise(lit(-1)))
      when(bitSum >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("SimhashText (bits=16,32) == the per-bit aggregate HOF twin") {
    for (bits <- Seq(16, 32)) {
      val got = (cases :+ (null: String)).toDF("text").select(
        graft.operators.Dedup.simhash(col("text"), bits).as("k"),
        simhashTwin(col("text"), bits).as("t"))
        .collect()
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) === r.getLong(1),
          s"simhash mismatch on case $i (bits=$bits)")
      }
    }
  }

  test("SimhashText == twin across the documents corpus (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      graft.operators.Dedup.simhash(col("text"), 16).as("k16"),
      simhashTwin(col("text"), 16).as("t16"),
      graft.operators.Dedup.simhash(col("text"), 32).as("k32"),
      simhashTwin(col("text"), 32).as("t32"))
      .where(col("k16") =!= col("t16") || col("k32") =!= col("t32"))
      .count()
    assert(diff === 0L)
  }

  test("null propagates; fingerprint md5 matches the inline formulation") {
    val rows = Seq[(java.lang.Long, String)]((1L, null), (2L, "A b!"))
      .toDF("id", "text")
      .select(col("id"), T.fingerprint(col("text")).as("fp"),
        WinnowMinMd5.winnow_min_md5(col("text"), 5).as("w"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getString(1) ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex("a b"))
    assert(rows(1).getString(2) ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex("A b!"))
  }
}
