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
  * map-only CASE. The within-stage shuffle position is a (stage,
  * source)-partitioned window; only the final interleaved rank
  * partitions by stage alone (`stages` tasks — acceptable for a
  * verification surface; a 100 TB writer would emit (stage, pos,
  * source) and let the epoch reader merge-interleave instead of
  * materializing a total order).
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
    val wPos = Window.partitionBy(col("stage"), col(sourceCol))
      .orderBy(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))),
        col(idCol))
    val wRank = Window.partitionBy(col("stage"))
      .orderBy(col("pos"), col(sourceCol), col(idCol))
    toks.withColumn("stage", stageCol.cast("int"))
      .withColumn("pos", row_number().over(wPos))
      .withColumn("curriculum_rank", row_number().over(wRank))
  }

  /** Token-budget subsampling — the "X tokens per domain" selection a
    * mixture-weighted pretraining corpus is actually built from (row
    * fractions lie when document lengths differ; budgets are spent in
    * TOKENS): per source, documents are taken in deterministic
    * md5-shuffled order while the running token total stays within
    * `tokensPerSource`; the first document over the line is dropped
    * (documents are atomic — no partial takes).
    *
    * Shape: one shuffle on the source key for the cumulative-sum
    * window, nothing else — the same cost as any per-group running
    * total, skew-bounded by documents-per-source. Exact integer token
    * counts and cumulative sums, the public md5 draw, id tie-breaks:
    * identical selection on any engine at any parallelism.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, tokensPerSource: Long,
      salt: String = "tokbudget"): DataFrame = {
    require(tokensPerSource > 0,
      s"tokensPerSource must be positive, got $tokensPerSource")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))),
        col(idCol))
    df.select(col(idCol), col(sourceCol),
        TextAnalysis.bpeTokenCount(col(textCol)).cast("long").as("tokens"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .where(col("cum_tokens") <= tokensPerSource)
  }
}
