package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: documents are concatenated
  * into one global token stream (ordered by a unique id) and cut into
  * fixed-budget packs ("concat-and-chunk" — the packing rule most
  * pre-training pipelines use). The output maps every document to its
  * global token offset and the pack range it lands in; a writer can
  * then group by pack id to emit training sequences.
  *
  * The interesting part at scale is the GLOBAL prefix sum: a naive
  * `Window.orderBy(id)` puts the whole corpus in ONE partition. This
  * implementation uses the classic two-phase formulation instead:
  *
  *   1. range-partition by id (so partitions are ordered slices) and
  *      cumulative-sum WITHIN each partition — fully parallel;
  *   2. aggregate one total per partition (O(numPartitions) rows),
  *      prefix-sum that tiny table (a single-task window over ~100s of
  *      rows, not the corpus), and broadcast-join the partition offsets
  *      back.
  *
  * No collect(), no single-partition pass over the data; the only
  * global step touches one row per partition. This is exactly how
  * Spark's own rangepartitioner-style global operations scale.
  */
object Packing {

  /** Adds `start_offset`: the row's start position in the global
    * concatenated stream of `weightCol`, ordered by `idCol` (which must
    * be unique — ties would make the order, and thus offsets,
    * ambiguous). Weights are validated (≥ 1) INSIDE the offset
    * computation, so the check is part of `start_offset`'s lineage and
    * cannot be projection-pruned away by a caller that never reads the
    * validated column (a zero/negative/null weight corrupts every
    * subsequent offset, and downstream `sequence(start, end)` walks
    * BACKWARDS for inverted spans).
    */
  def globalOffsets(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val id = col(idCol)
    val guardedW = when(col(weightCol).cast("long") >= 1,
        col(weightCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"globalOffsets: $weightCol must be >= 1, got "),
        col(weightCol).cast("string"),
        lit(s" at $idCol="), id.cast("string"))))
    // CORRECTNESS INVARIANT: both plan branches below (the local cumsum
    // and the partition-totals aggregate) contain the same range
    // exchange, and the RangePartitioner's sampled boundaries must be
    // IDENTICAL in both or `_pid` silently diverges and offsets corrupt.
    // With spark.sql.exchange.reuse (default true; AQE stage reuse
    // likewise keys on the canonicalized plan) the two exchanges dedupe
    // into one physical shuffle, so the boundaries are shared by
    // construction — PackingSpec asserts the ReusedExchange is present.
    // If a session disables reuse, pin the slices by materializing them
    // once instead. localCheckpoint (eager), not persist(): a persist'd
    // plan stays registered in the CacheManager until an unpersist this
    // lazy API has no place to issue (session-lifetime leak per call),
    // while localCheckpoint blocks are reclaimed by the ContextCleaner
    // when the plan is GC'd. Eagerness also closes the conf-staleness
    // window: the slices are computed HERE, so flipping
    // spark.sql.exchange.reuse between building and executing the
    // returned DataFrame cannot change which boundaries `_pid` used.
    // Storage is one slim pass over the input — callers project down to
    // (id, weight) before packing.
    val reuse = df.sparkSession.conf
      .get("spark.sql.exchange.reuse", "true").toBoolean
    // ordered slices: partition p holds ids strictly below partition p+1
    val parts0 = df.repartitionByRange(id).withColumn("_pid", spark_partition_id())
    val parts = if (reuse) parts0 else parts0.localCheckpoint()
    val local = parts.withColumn("_cum",
      sum(guardedW).over(
        Window.partitionBy("_pid").orderBy(id)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // partition totals need only a partial-aggregating sum (NOT the
    // cumsum branch — that would recompute the sort+window); the bare
    // orderBy window then runs over O(numPartitions) rows, not the data
    val prefix = parts.groupBy("_pid")
      .agg(sum(guardedW).as("_ptotal"))
      .withColumn("_prefix",
        coalesce(sum("_ptotal").over(
          Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_prefix")
    local.join(broadcast(prefix), "_pid")
      .withColumn("start_offset",
        col("_cum") - col(weightCol).cast("long") + col("_prefix"))
      .drop("_pid", "_cum")
  }

  /** Grouped running total WITHOUT a per-group total-order window —
    * the grouped twin of [[globalOffsets]]'s two-phase prefix sum.
    * `Window.partitionBy(group).orderBy(order)` puts each group's
    * ENTIRE row set in one task: with a real pretraining mixture
    * (80–90% of documents in one web-crawl source) or a 4-stage
    * curriculum, that is a handful of tasks carrying the whole corpus.
    * Here instead:
    *
    *   1. range-partition by (group ++ order) — partitions are ordered
    *      slices of the composite key space, so within any group,
    *      partition order IS the row order — and cumulative-sum within
    *      (partition, group): every window partition is bounded by the
    *      SLICE size (corpus/numPartitions), never by group size;
    *   2. aggregate one total per (partition, group) — O(partitions +
    *      groups) rows since a partition holds slices of at most a few
    *      groups — prefix-sum that tiny table per group, and
    *      broadcast-join the offsets back.
    *
    * Same exchange-reuse invariant as [[globalOffsets]]: both branches
    * contain the identical range exchange, deduped by
    * spark.sql.exchange.reuse (localCheckpoint pin when disabled).
    *
    * Adds `outCol` = inclusive running `weight` total within
    * `groupCols` ordered by `orderCols` (the combined (group ++ order)
    * key must be unique — callers tie-break on ids). `orderCols` must
    * name MATERIALIZED columns (compute any md5 draw into a column
    * first): the range partitioner and the in-slice window must sort
    * the exact same values.
    */
  def groupedCumSum(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], weight: Column, outCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val keyCols = (groupCols ++ orderCols).map(col)
    val reuse = df.sparkSession.conf
      .get("spark.sql.exchange.reuse", "true").toBoolean
    val parts0 = df.repartitionByRange(keyCols: _*)
      .withColumn("_pid", spark_partition_id())
    val parts = if (reuse) parts0 else parts0.localCheckpoint()
    val local = parts.withColumn("_cum",
      sum(weight).over(
        Window.partitionBy(col("_pid") +: gc: _*)
          .orderBy(orderCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val prefix = parts.groupBy(col("_pid") +: gc: _*)
      .agg(sum(weight).as("_ptotal"))
      .withColumn("_prefix",
        coalesce(sum("_ptotal").over(
          Window.partitionBy(gc: _*).orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid") +: gc :+ col("_prefix"): _*)
    local.join(broadcast(prefix), "_pid" +: groupCols)
      .withColumn(outCol, col("_cum") + col("_prefix"))
      .drop("_pid", "_cum", "_prefix")
  }

  /** Concat-and-chunk pack assignment: with pack budget B, a document
    * starting at global offset s with w tokens occupies packs
    * floor(s/B) .. floor((s+w-1)/B) (documents straddle pack boundaries
    * — they are split, not padded, exactly like GPT-style pre-training
    * batches). Emits one row per document with its pack span.
    */
  def packAssignments(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    // Weight validation (>= 1) lives inside globalOffsets, on
    // start_offset's lineage — see its doc. Pack spans use `DIV`
    // (exact long division; offsets are non-negative so it IS floor):
    // `floor(a / b)` on longs goes through DOUBLE division in Spark,
    // which misrounds once offsets approach 2⁵³ — real at 100 TB token
    // streams.
    globalOffsets(df, idCol, weightCol)
      .withColumn("_end_off",
        col("start_offset") + col(weightCol).cast("long") - 1)
      .withColumn("start_pack",
        expr(s"start_offset DIV CAST($budget AS BIGINT)"))
      .withColumn("end_pack", expr(s"_end_off DIV CAST($budget AS BIGINT)"))
      .withColumn("n_packs", col("end_pack") - col("start_pack") + 1)
      .drop("_end_off")
  }

  /** Sliding-window character chunking (the RAG/embedding-prep shape):
    * windows of `size` chars every `stride` chars, last window
    * truncated, single window for texts shorter than `size`. A narrow
    * generate-and-explode — embarrassingly parallel, output rows ≈
    * totalChars/stride. Returns the chunk TEXT itself (`chunk`) plus
    * `chunk_idx`/`chunk_len` — a RAG/embedding-prep consumer feeds the
    * text to an embedder; callers that only need a fingerprint project
    * it away (as the `doc_chunks` driver query does with md5).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "chunk size and stride must be positive")
    // stride > size would leave unsampled gaps AND make the count
    // formula emit a phantom zero-length tail chunk (e.g. size=2,
    // stride=5, len=4 plans a window starting past the text)
    require(stride <= size,
      s"chunk stride ($stride) must be <= size ($size): windows must tile")
    val len = length(col(textCol))
    // integer-arithmetic chunk count: 1 + ceil((len-size)/stride), all
    // in LONG so the identical formula runs in the SQL oracle
    val nChunks = when(len <= size, lit(1L))
      .otherwise(floor((len - size + stride - 1) / lit(stride)) + 1)
    df.withColumn("_ci", explode(sequence(lit(0L), nChunks.cast("long") - 1)))
      .select(
        col(idCol),
        col("_ci").cast("int").as("chunk_idx"),
        substring(col(textCol), (col("_ci") * stride + 1).cast("int"), lit(size))
          .as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
  }
}
