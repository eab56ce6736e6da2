package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
  * feature distribution resembles a TARGET corpus, by the
  * log-likelihood ratio of two bag-of-hashed-ngrams models. The
  * pretraining-curation step between "dedup everything" and "train":
  * given 100 TB of crawl and a small high-quality target (Wikipedia,
  * textbooks), keep the crawl slice that looks like the target.
  *
  * Determinism/parity discipline (the repo's rule: no float logs — a
  * log-prob sum's rounding order can't be hash-verified across
  * engines): the per-bucket log ratio is quantized to INTEGER BITS,
  * `ilog2(x) = length(bin(x)) − 1` (exact in both engines), so a
  * document's score is
  *
  *   Σ_grams [ilog2(c_t[b]+1) − ilog2(c_r[b]+1)] + n_grams·Δnorm,
  *
  * with Δnorm = ilog2(T_r+B) − ilog2(T_t+B) the totals correction
  * (smoothed model: p[b] = (c[b]+1)/(T+B)). A 1-bit-quantized LLR
  * ranks slightly coarser than the float LLR; it is exactly
  * reproducible on any engine, which is what a 100 TB curation run
  * must be to audit.
  *
  * Scale shape: features are word uni+bigrams hashed to `buckets`
  * buckets (md5-prefix mod B — the public-draw idiom). The bucket
  * count table is ≤B rows built by ONE map-side-combining aggregate
  * with conditional counts (target vs raw in the same pass), then
  * BROADCAST back onto the exploded gram rows — the corpus never
  * shuffles on bucket; the only data-sized exchange is the final
  * per-doc aggregate (~1 partial row per doc per task). Totals are two
  * longs collected driver-side (broadcast-dim precedent:
  * [[Curriculum]]'s threshold histogram).
  */
object Dsir {

  /** One-generator word uni+bigram explode: each doc emits 2n−1 gram
    * rows (n unigrams + n−1 bigrams) from a single index explode with
    * `element_at` lookups — EVERYTHING on the codegen row path. The
    * obvious `transform(...)` bigram array costs ~10× here: HOF
    * lambdas evaluate interpreted per element (the
    * minhashSignatureTable lesson), and at 100 TB the gram pass IS the
    * operator. `keep` columns ride alongside the grams.
    */
  private def gramExplode(base: DataFrame, keep: Seq[String],
      textCol: String): DataFrame = {
    val ws = col("_ws")
    val n = size(ws)
    base.withColumn("_ws", split(col(textCol), " "))
      .select(keep.map(col) :+ ws :+
        explode(sequence(lit(0), n * 2 - 2)).as("_k"): _*)
      .select(keep.map(col) :+
        when(col("_k") < n, element_at(ws, col("_k") + 1))
          .otherwise(concat(element_at(ws, col("_k") - n + 1), lit(" "),
            element_at(ws, col("_k") - n + 2))).as("_g"): _*)
  }

  /** bucket = md5-prefix(gram) mod `buckets`, on the codegen row path. */
  private def bucketOf(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** floor(log2(x)) for x ≥ 1, exact on both engines. */
  private[graft] def ilog2(x: Column): Column =
    (length(bin(x)) - 1).cast("long")

  /** (id, _b) gram-bucket rows of a corpus — the stream-safe feature
    * explode shared by the batch operator and the streaming twin.
    */
  private[graft] def gramRows(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    gramExplode(df, Seq(idCol), textCol)
      .select(col(idCol), bucketOf(col("_g"), buckets).as("_b"))

  /** The trained DSIR model of `df`: the ≤`buckets`-row conditional
    * count table plus (T_raw, T_tgt, Σlr) driver-side totals. The
    * count table is COLLECTED (≤B rows, a few KB) and rebuilt as a
    * LocalRelation — the lloydCentroids index-state pattern — so the
    * scorer's broadcast never re-executes the model subtree (leaving
    * it lazy re-ran the whole corpus gram pass at broadcast-build
    * time), and the three totals fall out of the collected rows with
    * zero extra jobs.
    */
  def bucketModel(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int): (DataFrame, Long, Long, Long) = {
    val spark = df.sparkSession
    val rows = gramExplode(
        df.select(col(idCol), targetPred.as("_tgt"), col(textCol)),
        Seq(idCol, "_tgt"), textCol)
      .select(col("_tgt"), bucketOf(col("_g"), buckets).as("_b"))
      .groupBy(col("_b"))
      .agg(count(lit(1)).as("_cr"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bits(x: Long): Long = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val tRaw = rows.map(_._2).sum
    val tTgt = rows.map(_._3).sum
    val totLr = rows.map { case (_, cr, ct) =>
      cr * (bits(ct + 1) - bits(cr + 1)) }.sum
    import spark.implicits._
    (rows.toSeq.toDF("_b", "_cr", "_ct"), tRaw, tTgt, totLr)
  }

  /** Score (id, _b) gram rows against a broadcast model: LEFT join (a
    * gram the model never saw keeps its row with zero counts — the +1
    * smoothing prices it as maximally rare), per-doc bit-LLR sum, and
    * the exact cross-multiplied above-model-mean selection. Stream-safe:
    * stateless narrow work plus ONE stateful per-doc aggregate.
    */
  private[graft] def scoreAgainst(grams: DataFrame, idCol: String,
      stats: DataFrame, tRaw: Long, totLr: Long): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    grams.join(broadcast(stats), Seq("_b"), "left")
      .select(col(idCol),
        coalesce(col("_cr"), lit(0L)).as("_cr"),
        coalesce(col("_ct"), lit(0L)).as("_ct"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(ilog2(col("_ct") + 1) - ilog2(col("_cr") + 1)).as("dsir_lr"))
      .select(col(idCol), col("n_grams"), col("dsir_lr"),
        (col("dsir_lr").cast(dec) * lit(tRaw).cast(dec) >
          col("n_grams").cast(dec) * lit(totLr).cast(dec)).as("selected"))
  }

  /** Per-document DSIR readout over `df`: (id, n_grams, dsir_score,
    * selected), scored against the hashed-ngram model of the rows
    * matching `targetPred` (the high-quality target slice) relative to
    * the whole of `df` (the raw model). `selected` marks documents
    * whose PER-GRAM score beats the corpus mean per-gram score —
    * "more target-like than the average document", the relative
    * threshold importance resampling actually keeps (an absolute
    * score>0 cut is meaningless when target and raw vocabularies
    * overlap: the smoothed LLR of in-distribution text is a negative
    * constant and selection lives in the differences). The comparison
    * is the exact integer cross-multiplication
    * `lr · T_raw > n_grams · Σlr` carried out in DECIMAL(38,0)
    * (HUGEINT in the oracle) so it never overflows at corpus scale;
    * the normalization term cancels on both sides. Σlr and T_raw come
    * off the ≤B-row bucket table driver-side, like any broadcast dim.
    */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 16 && buckets <= (1 << 20),
      s"buckets in [16, 2^20], got $buckets")
    // ONE pass builds both models (B-bounded conditional counts,
    // map-side combined); totals + the corpus-wide bit-LLR mass are
    // three longs driver-side (Σlr = Σ_b cr·(ilog2(ct+1) − ilog2(cr+1))
    // — every gram instance in bucket b contributes b's bit ratio)
    val (stats, tRaw, tTgt, totLr) =
      bucketModel(df, idCol, textCol, targetPred, buckets)
    require(tTgt > 0, "dsirSelect: target slice has no features")
    val dNorm = (63 - java.lang.Long.numberOfLeadingZeros(tRaw + buckets)) -
      (63 - java.lang.Long.numberOfLeadingZeros(tTgt + buckets))
    val scored = scoreAgainst(gramRows(df, idCol, textCol, buckets),
        idCol, stats, tRaw, totLr)
      .select(col(idCol), col("n_grams"),
        (col("dsir_lr") + col("n_grams") * lit(dNorm.toLong))
          .as("dsir_score"),
        col("selected"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score"),
        coalesce(col("selected"), lit(false)).as("selected"))
  }

  /** Fixed-budget DSIR importance draw — the actual RESAMPLING step of
    * Xie et al. 2023 §2.3: where [[dsirSelect]]'s above-mean cut keeps
    * a data-dependent fraction, the paper's pipeline draws exactly
    * `budgetDocs` documents without replacement with probability ∝
    * exp(score) — equivalently (Gumbel-top-k) the budget-largest
    * values of score + Gumbelᵢ. The repo's no-float-logs discipline
    * quantizes BOTH terms to integer bits:
    *
    *   - score is already the integer bit-LLR of [[dsirSelect]];
    *   - Gumbel(0,1)/ln2 = −log2 E, E ~ Exp(ln2): from the public
    *     60-bit draw u = md5₆₀(salt:id), the quantized −log2 U is
    *     z = max(59 − ilog2(u+1), 0) (z is geometric — EXACTLY
    *     ⌊−log2 U⌋ for U = (u+1)/2⁶⁰), the 20 low bits of u append a
    *     uniform fraction, and the bit-quantized Gumbel is
    *     g = 20 − ilog2(z·2²⁰ + (u mod 2²⁰) + 1) ∈ [−6, 20].
    *
    * The 1-bit quantization coarsens the draw exactly like the score
    * quantization coarsens the LLR — documented, deterministic, and
    * bit-reproducible on any engine (ties broken by (u, id)).
    *
    * Scale shape: scoring is [[dsirSelect]] (broadcast model, one
    * data-sized exchange); the top-budget selection is BUDGET-AWARE
    * (round 14). A draw of ≤ `takeCap` docs — the common regime: the
    * paper's budget is a tiny fraction of the crawl — plans as
    * `TakeOrderedAndProject`: a bounded k-entry heap per partition,
    * merged once, with rank attached to the ≤budget survivors by one
    * single-partition window over an already-single-partition bounded
    * input. NO data-sized exchange: the corpus is scanned once and
    * only 200-ish rows ever move. Budgets above the cap fall back to
    * [[Packing.groupedCumSum]]'s two-phase prefix sum over
    * (−key, u, id) — a RANGE-partitioned global order (every task
    * bounded by its slice; the audited global-sort shape, not a
    * single-task window).
    *
    * Output: the `budgetDocs` drawn docs as (id, n_grams, dsir_score,
    * gumbel_key, rank), rank 1-based in (key desc, u asc, id asc)
    * order. Fewer than `budgetDocs` rows iff the corpus is smaller
    * than the budget.
    */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, budgetDocs: Long, buckets: Int = 4096,
      salt: String = "dsirg", takeCap: Int = 65536): DataFrame = {
    require(budgetDocs > 0, s"budgetDocs must be positive, got $budgetDocs")
    val scored = dsirSelect(df, idCol, textCol, targetPred, buckets)
    val u = conv(substring(md5(concat(lit(s"$salt:"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val keyed = scored
      .withColumn("_u", u)
      .withColumn("_z", greatest(lit(59L) - ilog2(col("_u") + 1), lit(0L)))
      .withColumn("_eq",
        col("_z") * lit(1048576L) + pmod(col("_u"), lit(1048576L)) + 1L)
      .withColumn("gumbel_key",
        col("dsir_score") + lit(20L) - ilog2(col("_eq")))
      .withColumn("_nk", -col("gumbel_key"))
    val ranked =
      if (budgetDocs <= takeCap) {
        // bounded top-k: per-partition budget-entry heaps, one merge
        // (TakeOrderedAndProject — SinglePartition output), rank by a
        // window over the ≤budget surviving rows. The draw's data-sized
        // work is exactly one corpus scan.
        val order = Seq(col("_nk"), col("_u"), col(idCol))
        keyed.orderBy(order: _*).limit(budgetDocs.toInt)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(order: _*))
            .cast("long"))
      } else {
        Packing.groupedCumSum(keyed, Seq.empty, Seq("_nk", "_u", idCol),
            lit(1L), "rank")
          .where(col("rank") <= budgetDocs)
      }
    ranked.select(col(idCol), col("n_grams"), col("dsir_score"),
      col("gumbel_key"), col("rank"))
  }
}
