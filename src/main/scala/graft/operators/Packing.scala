package graft.operators

import org.apache.spark.sql.DataFrame
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
    * ambiguous).
    */
  def globalOffsets(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val id = col(idCol)
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
      sum(col(weightCol).cast("long")).over(
        Window.partitionBy("_pid").orderBy(id)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // partition totals need only a partial-aggregating sum (NOT the
    // cumsum branch — that would recompute the sort+window); the bare
    // orderBy window then runs over O(numPartitions) rows, not the data
    val prefix = parts.groupBy("_pid")
      .agg(sum(col(weightCol).cast("long")).as("_ptotal"))
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

  /** Concat-and-chunk pack assignment: with pack budget B, a document
    * starting at global offset s with w tokens occupies packs
    * floor(s/B) .. floor((s+w-1)/B) (documents straddle pack boundaries
    * — they are split, not padded, exactly like GPT-style pre-training
    * batches). Emits one row per document with its pack span.
    */
  def packAssignments(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    // Weights must be >= 1: a zero-weight row would compute
    // end_pack < start_pack, and a downstream explode(sequence(start,
    // end)) silently walks BACKWARDS (Spark's sequence defaults to
    // step -1), emitting spurious descending pack rows. Enforce the
    // contract here with a diagnosable error instead.
    val w = when(col(weightCol).cast("long") >= 1, col(weightCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"packAssignments: $weightCol must be >= 1, got "),
        col(weightCol).cast("string"), lit(s" at $idCol="), col(idCol).cast("string"))))
    globalOffsets(df, idCol, weightCol)
      .withColumn("start_pack", floor(col("start_offset") / budget))
      .withColumn("end_pack",
        floor((col("start_offset") + w - 1) / budget))
      .withColumn("n_packs", col("end_pack") - col("start_pack") + 1)
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
