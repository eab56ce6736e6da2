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
  * count table (stages × sources rows, broadcast like a dim), the
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
    val staged = stagedPositions(df, idCol, textCol, sourceCol, stages, salt)
    // tiny per-(stage, source) count table → one sorted struct array
    // per stage (sources are a dim-sized domain), broadcast-hash-joined
    // back on `stage`; the interleave rank is then pure row-local
    // arithmetic over that ≤|sources| array — no per-stage total order.
    val cnts = staged.groupBy(col("stage"), col(sourceCol))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("stage"))
      .agg(array_sort(collect_list(struct(col(sourceCol).as("s"),
        col("c")))).as("_cnts"))
    val pos = col("pos").cast("long")
    val earlierRounds = aggregate(col("_cnts"), lit(0L),
      (acc, x) => acc + least(pos - 1L, x.getField("c")))
    val thisRound = aggregate(col("_cnts"), lit(0L),
      (acc, x) => acc + when(x.getField("c") >= pos &&
        x.getField("s") <= col(sourceCol), 1L).otherwise(0L))
    staged.join(broadcast(cnts), "stage")
      .withColumn("curriculum_rank",
        (earlierRounds + thisRound).cast("int"))
      .select(col(idCol), col(sourceCol), col("tokens"), col("stage"),
        col("pos"), col("curriculum_rank"))
  }

  /** Shared front half of both curriculum formulations: token counts,
    * histogram-derived stage labels, and the deterministic
    * within-(stage, source) position via the two-phase prefix sum.
    */
  private def stagedPositions(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, stages: Int,
      salt: String): DataFrame = {
    require(stages >= 2 && stages <= 64, s"stages in [2,64], got $stages")
    val toks = df.select(col(idCol), col(sourceCol),
      TextAnalysis.bpeTokenCount(col(textCol)).cast("long").as("tokens"))
    // exact stage thresholds from the value histogram: thr_k =
    // min{v : stages·cum(v) ≥ k·n}, k = 1..stages-1
    val hist = toks.groupBy("tokens").agg(count(lit(1)).as("c"))
      .orderBy("tokens").collect()
    val n = hist.map(_.getLong(1)).sum
    val thresholds = {
      var cum = 0L
      val cums = hist.map { r => cum += r.getLong(1); (r.getLong(0), cum) }
      (1 until stages).map { k =>
        cums.find { case (_, cc) => stages.toLong * cc >= k.toLong * n }
          .map(_._1).getOrElse(Long.MaxValue)
      }
    }
    val stageCol = thresholds.foldLeft(lit(1)) { (acc, t) =>
      acc + when(col("tokens") > t, 1).otherwise(0)
    }
    val labeled = toks.withColumn("stage", stageCol.cast("int"))
      .withColumn("_draw",
        md5(concat(lit(s"$salt:"), col(idCol).cast("string"))))
    Packing.groupedCumSum(labeled, Seq("stage", sourceCol),
        Seq("_draw", idCol), lit(1L), "_pos")
      .withColumn("pos", col("_pos").cast("int"))
      .drop("_pos", "_draw")
  }

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
