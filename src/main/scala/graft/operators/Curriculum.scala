package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering for training data — the "easy first" schedule
  * curriculum-learning pipelines feed their trainer: documents stage
  * by length quartile (short → long), and WITHIN each stage the
  * sources interleave round-robin in a deterministically shuffled
  * order, so no stage opens with a single-source run.
  *
  * Scale shape: staging uses NO global sort — the exact quartile
  * thresholds come from the (token_count → rows) histogram (one
  * map-side-combining aggregate over ≤ distinct-count rows, collected
  * driver-side like a broadcast dim), and the stage label is then a
  * map-only CASE. The within-(stage, source) position uses
  * [[Packing.groupedCumSum]]'s two-phase prefix sum (tasks bounded by
  * the range-partition slice, never by group size), and the
  * interleaved rank is ARITHMETIC: given the tiny per-(stage, source)
  * count table (stages × sources rows, collected driver-side like the
  * stage-threshold histogram and baked into the
  * [[graft.functions.CurriculumRank]] codegen kernel), the
  * round-robin rank of (pos, source) within its stage is
  *
  *   Σ_{s'} min(pos−1, c_{s'})  +  |{s' ≤ source : c_{s'} ≥ pos}|
  *
  * — rows of earlier rounds, plus earlier sources still alive in this
  * round. No `Window.partitionBy(stage)` total order anywhere in the
  * plan (with stages=4 that window is four tasks carrying the whole
  * corpus at 100 TB); the windowed formulation survives only as the
  * sf-small verification twin ([[curriculumOrderWindowed]], pinned
  * equal by CurriculumSpec).
  *
  * Determinism: token counts are integers, thresholds are exact lower
  * quantiles (stages·cum ≥ k·n — the lower-median discipline), the
  * shuffle key is the public md5 draw, every tie breaks on ids.
  */
object Curriculum {

  /** (id, source, tokens, stage, pos, curriculum_rank): stage ∈
    * [1, stages] ascending difficulty (token count), `pos` the row's
    * deterministically-shuffled slot within (stage, source),
    * `curriculum_rank` the round-robin interleaved order within the
    * stage.
    */
  def curriculumOrder(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, stages: Int = 4,
      salt: String = "curr"): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    require(stages >= 2 && stages <= 64, s"stages in [2,64], got $stages")
    val toks = tokenCounts(df, idCol, textCol, sourceCol)
    // ONE histogram collect at (token_count, source) granularity —
    // |token-value domain| × |sources| rows, dim-sized — yields BOTH
    // the stage thresholds (marginal over sources) AND the
    // per-(stage, source) count table driver-side, where the count
    // table then bakes into a codegen kernel
    // ([[graft.functions.CurriculumRank]] — the IvfProbeCells
    // pattern): the interleave rank is one tight primitive loop per
    // row. The round-12 shape instead collected the marginal
    // histogram, broadcast-joined a lazily-recomputed count table
    // back, and folded it with two interpreted `aggregate` HOF
    // lambdas per row — one extra full token-kernel corpus pass and
    // O(|sources|) interpreted Column evaluation on every row.
    val hist2 = toks.groupBy(col("tokens"), col(sourceCol))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val thresholds = thresholdsOf(
      hist2.groupBy(_._1).view.mapValues(_.map(_._3).sum)
        .toArray.sortBy(_._1), stages)
    // sources in Spark's BINARY string order — what `s' <= source`
    // compares in the windowed twin (UTF8 byte order, not Java's
    // UTF-16 char order; they diverge past the BMP)
    val sources = hist2.map(_._2).distinct
      .sortWith((a, b) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    val srcIdx = sources.zipWithIndex.toMap
    val counts = Array.fill(stages, sources.length)(0L)
    hist2.foreach { case (v, s, c) =>
      val stage = 1 + thresholds.count(t => v > t)
      counts(stage - 1)(srcIdx(s)) += c
    }
    val labeled = labelFromThresholds(toks, idCol, thresholds, salt)
    positionsOf(labeled, idCol, sourceCol)
      .withColumn("curriculum_rank",
        graft.functions.CurriculumRank.curriculum_rank(
          col("stage"), col("pos"), col(sourceCol), sources, counts)
          .cast("int"))
      .select(col(idCol), col(sourceCol), col("tokens"), col("stage"),
        col("pos"), col("curriculum_rank"))
  }

  /** Token counts + histogram-derived stage labels + the deterministic
    * md5 shuffle draw — the pre-position half of the curriculum, from
    * which BOTH the per-(stage, source) count table and the positioned
    * rows derive.
    */
  private def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    df.select(col(idCol), col(sourceCol),
      TextAnalysis.bpeTokenCount(col(textCol)).cast("long").as("tokens"))

  /** Exact stage thresholds from the (token_count → rows) histogram:
    * thr_k = min{v : stages·cum(v) ≥ k·n}, k = 1..stages-1.
    */
  private def thresholdsOf(hist: Array[(Long, Long)],
      stages: Int): Seq[Long] = {
    val n = hist.map(_._2).sum
    var cum = 0L
    val cums = hist.map { case (v, c) => cum += c; (v, cum) }
    (1 until stages).map { k =>
      cums.find { case (_, cc) => stages.toLong * cc >= k.toLong * n }
        .map(_._1).getOrElse(Long.MaxValue)
    }
  }

  private def labelFromThresholds(toks: DataFrame, idCol: String,
      thresholds: Seq[Long], salt: String): DataFrame = {
    val stageCol = thresholds.foldLeft(lit(1)) { (acc, t) =>
      acc + when(col("tokens") > t, 1).otherwise(0)
    }
    toks.withColumn("stage", stageCol.cast("int"))
      .withColumn("_draw",
        md5(concat(lit(s"$salt:"), col(idCol).cast("string"))))
  }

  private def labeledTokens(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, stages: Int,
      salt: String): DataFrame = {
    require(stages >= 2 && stages <= 64, s"stages in [2,64], got $stages")
    val toks = tokenCounts(df, idCol, textCol, sourceCol)
    val hist = toks.groupBy("tokens").agg(count(lit(1)).as("c"))
      .orderBy("tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    labelFromThresholds(toks, idCol, thresholdsOf(hist, stages), salt)
  }

  /** The deterministic within-(stage, source) position via the
    * two-phase prefix sum.
    */
  private def positionsOf(labeled: DataFrame, idCol: String,
      sourceCol: String): DataFrame =
    Packing.groupedCumSum(labeled, Seq("stage", sourceCol),
        Seq("_draw", idCol), lit(1L), "_pos")
      .withColumn("pos", col("_pos").cast("int"))
      .drop("_pos", "_draw")

  /** Shared front half of both curriculum formulations: token counts,
    * histogram-derived stage labels, and the deterministic
    * within-(stage, source) position via the two-phase prefix sum.
    */
  private def stagedPositions(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, stages: Int,
      salt: String): DataFrame =
    positionsOf(labeledTokens(df, idCol, textCol, sourceCol, stages, salt),
      idCol, sourceCol)

  /** The windowed twin of [[curriculumOrder]] — per-stage
    * `row_number()` total order, O(stages) tasks carrying the whole
    * corpus. NOT registered as an engine query (scale-killer at
    * 100 TB); kept as the sf-small verification oracle that pins the
    * arithmetic interleave rank ≡ the windowed rank (CurriculumSpec).
    */
  private[graft] def curriculumOrderWindowed(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, stages: Int = 4,
      salt: String = "curr"): DataFrame = {
    val wRank = Window.partitionBy(col("stage"))
      .orderBy(col("pos"), col(sourceCol), col(idCol))
    stagedPositions(df, idCol, textCol, sourceCol, stages, salt)
      .withColumn("curriculum_rank", row_number().over(wRank))
      .select(col(idCol), col(sourceCol), col("tokens"), col("stage"),
        col("pos"), col("curriculum_rank"))
  }

  /** Token-budget subsampling — the "X tokens per domain" selection a
    * mixture-weighted pretraining corpus is actually built from (row
    * fractions lie when document lengths differ; budgets are spent in
    * TOKENS): per source, documents are taken in deterministic
    * md5-shuffled order while the running token total stays within
    * `tokensPerSource`; the first document over the line is dropped
    * (documents are atomic — no partial takes).
    *
    * Scale shape: the per-source running total uses
    * [[Packing.groupedCumSum]]'s two-phase prefix sum, NOT a
    * `Window.partitionBy(source)` — real pretraining mixtures put
    * 80–90% of documents in one web-crawl source, so a per-source
    * window is one task sorting most of the corpus. The two-phase
    * formulation bounds every task by the range-partition slice size
    * regardless of source skew. Exact integer token counts and
    * cumulative sums, the public md5 draw, id tie-breaks: identical
    * selection on any engine at any parallelism.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, tokensPerSource: Long,
      salt: String = "tokbudget"): DataFrame = {
    require(tokensPerSource > 0,
      s"tokensPerSource must be positive, got $tokensPerSource")
    val toks = df.select(col(idCol), col(sourceCol),
        TextAnalysis.bpeTokenCount(col(textCol)).cast("long").as("tokens"))
      .withColumn("_draw",
        md5(concat(lit(s"$salt:"), col(idCol).cast("string"))))
    Packing.groupedCumSum(toks, Seq(sourceCol), Seq("_draw", idCol),
        col("tokens"), "cum_tokens")
      .where(col("cum_tokens") <= tokensPerSource)
      .select(col(idCol), col(sourceCol), col("tokens"), col("cum_tokens"))
  }
}
