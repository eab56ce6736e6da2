package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GearChunks, Md5WindowChunks}

/** Content-defined chunking for chunk-level dedup — the finer-grained
  * sibling of whole-document exact dedup (Dedup.exact): two documents
  * that share most of their bytes dedup chunk-by-chunk even though
  * their document hashes differ.
  *
  * Two boundary rules, same operator:
  *
  *  - [[gearChunks]] — the SCALE PATH: one codegen pass per document
  *    (functions/GearChunks), O(1) rolling state, no per-position
  *    allocation. Its boundaries derive from a Gear hash, which no SQL
  *    engine reproduces, so it is verified by CdcSpec's invariants
  *    (lossless reconstruction, length bounds, edit-locality) rather
  *    than the DuckDB oracle.
  *
  *  - the PORTABLE md5-window rule used for the oracle-gated queries:
  *    a boundary falls after position p when `md5(text[p-15..p])`
  *    starts with "00" (16-byte window, 1/256 boundary probability ⇒
  *    256-char expected chunks). md5 and substr agree byte-for-byte
  *    across engines, so chunk hashes — and the global dedup ratio
  *    built from them — hash-verify exactly against DuckDB replaying
  *    the rule in pure SQL. Spark evaluates the rule through ONE
  *    compiled expression ([[graft.functions.Md5WindowChunks]], a
  *    tight reused-digest loop); CdcSpec pins its equivalence to the
  *    literal SQL HOF chain the oracle runs.
  */
object Cdc {

  /** Per-chunk (md5-hex, byte length) structs under the portable
    * md5-window rule, in document order. */
  def md5Chunks(textCol: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5WindowChunks(org.apache.spark.sql.GraftBridge.expression(textCol)))

  /** Input plus a `_hashes` column: the per-chunk md5 array under the
    * portable boundary rule. Stateless projection — usable on batch
    * AND streaming DataFrames (the streaming chunk-dedup twin builds
    * on it). */
  def withChunkHashes(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_hashes",
      transform(md5Chunks(col(textCol)), c => c.getField("h")))

  /** One row per document: chunk count and an order-sensitive chunk
    * signature (md5 of the concatenated chunk hashes). */
  def chunkSummary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("_chunks", md5Chunks(col(textCol)))
      .select(
        col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        size(col("_chunks")).cast("long").as("n_chunks"),
        md5(expr("array_join(transform(_chunks, c -> c.h), '')")).as("chunk_sig"))

  /** Corpus-level chunk dedup accounting: total vs distinct chunks and
    * bytes — the "what would chunk-level dedup save" report. One keyed
    * exchange (group by chunk hash), then a scalar rollup. */
  def dedupStats(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(md5Chunks(col(textCol))).as("c"))
      .select(col("c.h").as("h"), col("c.len").cast("long").as("len"))
      .groupBy("h").agg(count(lit(1)).as("cnt"), min(col("len")).as("len"))
      .agg(
        sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("cnt") * col("len")).as("total_bytes"),
        sum(col("len")).as("distinct_bytes"))

  /** Near-dup PAIRS through shared chunks: two documents pair when
    * they share at least `minShared` distinct chunk hashes — the
    * chunk-level sibling of MinHash banding, catching documents that
    * share long byte runs even when their shingle profiles drift.
    *
    * Skew guard, same posture as Contamination's df cap: a chunk
    * appearing in more than `maxDf` documents (boilerplate — headers,
    * license blocks) is excluded BEFORE the self-join, so no bucket
    * exceeds maxDf and the join is O(Σ df²) with df ≤ maxDf, never
    * O(corpus²) on one viral chunk. Dropping hub chunks trades recall
    * only on pairs whose EVERY shared chunk is boilerplate — which is
    * the pair you want to drop anyway.
    */
  def sharedChunkPairs(
      df: DataFrame, idCol: String, textCol: String,
      minShared: Int = 1, maxDf: Int = 100): DataFrame = {
    require(minShared >= 1 && maxDf >= 2, s"bad knobs ($minShared, $maxDf)")
    // the chunk scan is referenced by the df filter AND both self-join
    // sides — persist it rather than lean on exchange reuse re-running
    // the per-byte md5 pass up to 4× (same pattern as prefixFilterJoin)
    val chunks = df
      .select(col(idCol).as("doc"), explode(md5Chunks(col(textCol))).as("c"))
      .select(col("doc"), col("c.h").as("h"))
      .distinct()
      .persist()
    val keep = chunks.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf)
      .select("h")
    val f = chunks.join(keep, "h")
    val out = f.select(col("h"), col("doc").as("doc_a"))
      .join(f.select(col("h"), col("doc").as("doc_b")), "h")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_chunks"))
      .where(col("shared_chunks") >= minShared)
      .localCheckpoint()
    chunks.unpersist()
    out
  }

  /** The fast path: Gear-hash CDC chunks as a column (see
    * [[graft.functions.GearChunks]]). */
  def gearChunks(
      textCol: Column,
      maskBits: Int = 8,
      minLen: Int = 64,
      maxLen: Int = 1024): Column =
    org.apache.spark.sql.GraftBridge.column(
      GearChunks(org.apache.spark.sql.GraftBridge.expression(textCol),
        maskBits, minLen, maxLen))
}
