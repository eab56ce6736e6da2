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
    // The (token_count, source) histogram stays IN SPARK (round 14 —
    // previously collected whole, and |token-value domain| × |sources|
    // is unbounded in principle: a long-doc corpus has ~max-doc-tokens
    // distinct counts). One token-kernel corpus pass builds it
    // (persisted, dim-sized); the stage thresholds reduce its marginal
    // in-plan ([[thresholdsFromHist]] — stages−1 longs reach the
    // driver), and the driver then collects only the per-(stage,
    // source) count table — provably ≤ stages × |sources| rows — which
    // bakes into the [[graft.functions.CurriculumRank]] codegen kernel
    // (the IvfProbeCells pattern): the interleave rank is one tight
    // primitive loop per row. The round-12 shape instead broadcast-
    // joined a lazily-recomputed count table back and folded it with
    // two interpreted `aggregate` HOF lambdas per row.
    val hist2 = toks.groupBy(col("tokens"), col(sourceCol))
      .agg(count(lit(1)).as("c")).persist()
    val thresholds = thresholdsFromHist(
      hist2.groupBy("tokens").agg(sum("c").as("c")), stages)
    val stageCounts = hist2
      .groupBy(stageColOf(thresholds).as("stage"), col(sourceCol))
      .agg(sum("c").as("c")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    hist2.unpersist()
    // sources in Spark's BINARY string order — what `s' <= source`
    // compares in the windowed twin (UTF8 byte order, not Java's
    // UTF-16 char order; they diverge past the BMP)
    val sources = stageCounts.map(_._2).distinct
      .sortWith((a, b) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    val srcIdx = sources.zipWithIndex.toMap
    val counts = Array.fill(stages, sources.length)(0L)
    stageCounts.foreach { case (stage, s, c) =>
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

  /** Exact stage thresholds reduced IN-PLAN from the (tokens → c)
    * marginal histogram: thr_k = min{v : stages·cum(v) ≥ k·n},
    * k = 1..stages-1 — only stages−1 longs ever reach the driver
    * (round 14; previously the whole histogram was collected, which is
    * ~max-doc-tokens rows on a long-doc corpus). The cumulative count
    * runs as a single-partition window — bounded, because the input has
    * one row per DISTINCT token count, not per document (and this
    * threshold job executes eagerly at plan-build, so the registered
    * query's own plan never carries it).
    */
  private def thresholdsFromHist(marg: DataFrame, stages: Int): Seq[Long] = {
    val n = marg.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    val w = Window.orderBy("tokens")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val aggs = (1 until stages).map { k =>
      min(when(lit(stages.toLong) * col("cum") >= lit(k.toLong) * lit(n),
        col("tokens"))).as(s"thr_$k")
    }
    val row = marg.withColumn("cum", sum("c").over(w))
      .agg(aggs.head, aggs.tail: _*).head()
    (1 until stages).map { k =>
      if (row.isNullAt(k - 1)) Long.MaxValue else row.getLong(k - 1)
    }
  }

  /** `1 + Σ_k [tokens > thr_k]` — the stage label of a `tokens` value. */
  private def stageColOf(thresholds: Seq[Long]): Column =
    thresholds.foldLeft(lit(1)) { (acc, t) =>
      acc + when(col("tokens") > t, 1).otherwise(0)
    }.cast("int")

  private def labelFromThresholds(toks: DataFrame, idCol: String,
      thresholds: Seq[Long], salt: String): DataFrame =
    toks.withColumn("stage", stageColOf(thresholds))
      .withColumn("_draw",
        md5(concat(lit(s"$salt:"), col(idCol).cast("string"))))

  private def labeledTokens(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, stages: Int,
      salt: String): DataFrame = {
    require(stages >= 2 && stages <= 64, s"stages in [2,64], got $stages")
    val toks = tokenCounts(df, idCol, textCol, sourceCol)
    val thresholds = thresholdsFromHist(
      toks.groupBy("tokens").agg(count(lit(1)).as("c")), stages)
    labelFromThresholds(toks, idCol, thresholds, salt)
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
