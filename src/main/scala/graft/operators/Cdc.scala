package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GearChunks

/** Content-defined chunking for chunk-level dedup — the finer-grained
  * sibling of whole-document exact dedup (Dedup.exact): two documents
  * that share most of their bytes dedup chunk-by-chunk even though
  * their document hashes differ.
  *
  * Two formulations, same operator:
  *
  *  - [[gearChunks]] — the SCALE PATH: one codegen pass per document
  *    (functions/GearChunks), O(1) rolling state, no per-position
  *    allocation. Its boundaries derive from a Gear hash, which no SQL
  *    engine reproduces, so it is verified by CdcSpec's invariants
  *    (lossless reconstruction, length bounds, edit-locality) rather
  *    than the DuckDB oracle.
  *
  *  - [[chunkSummary]] / [[dedupStats]] — the PORTABLE twin used for
  *    the oracle-gated queries: a boundary falls after position p when
  *    `md5(text[p-15..p])` starts with "00" (16-byte window, 1/256
  *    boundary probability ⇒ 256-char expected chunks). md5 and substr
  *    agree byte-for-byte across engines, so chunk hashes — and the
  *    global dedup ratio built from them — hash-verify exactly. The
  *    O(n·w) per-position md5 cost is the price of replayability; it
  *    exists to PROVE the semantics the Gear path implements fast.
  */
object Cdc {

  /** Boundary positions of the md5-window formulation (1-based,
    * boundary AFTER position p). The sequence upper bound is clamped
    * with greatest() because Spark's sequence(a, b) runs DESCENDING
    * when a > b — a <16-char document must yield no positions, not a
    * reversed range. */
  private def mdBoundaries(textCol: String): Column = expr(
    s"""filter(sequence(16, greatest(length($textCol), 16)),
       |  p -> p <= length($textCol)
       |    AND substring(md5(substring($textCol, p - 15, 16)), 1, 2) = '00')
       |""".stripMargin)

  /** Per-chunk md5 hashes under the portable boundary rule. */
  private def chunkHashes(textCol: String): Column = {
    expr(
      s"""filter(
         |  zip_with(
         |    concat(array(1), transform(_bnds, b -> b + 1)),
         |    concat(_bnds, array(length($textCol))),
         |    (s, e) -> IF(e >= s, md5(substring($textCol, s, e - s + 1)), NULL)),
         |  h -> h IS NOT NULL)""".stripMargin)
  }

  /** Input plus a `_hashes` column: the per-chunk md5 array under the
    * portable boundary rule. Stateless projection — usable on batch
    * AND streaming DataFrames (the streaming chunk-dedup twin builds
    * on it). */
  def withChunkHashes(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_bnds", mdBoundaries(textCol))
      .withColumn("_hashes", chunkHashes(textCol))

  /** One row per document: chunk count and an order-sensitive chunk
    * signature (md5 of the concatenated chunk hashes). */
  def chunkSummary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withChunkHashes(df, textCol)
      .select(
        col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        size(col("_hashes")).cast("long").as("n_chunks"),
        md5(array_join(col("_hashes"), "")).as("chunk_sig"))

  /** Corpus-level chunk dedup accounting: total vs distinct chunks and
    * bytes — the "what would chunk-level dedup save" report. One keyed
    * exchange (group by chunk hash), then a scalar rollup. */
  def dedupStats(df: DataFrame, textCol: String): DataFrame = {
    val chunks = df
      .withColumn("_bnds", mdBoundaries(textCol))
      .withColumn("_chunks", expr(
        s"""filter(
           |  zip_with(
           |    concat(array(1), transform(_bnds, b -> b + 1)),
           |    concat(_bnds, array(length($textCol))),
           |    (s, e) -> IF(e >= s, substring($textCol, s, e - s + 1), NULL)),
           |  c -> c IS NOT NULL)""".stripMargin))
      .select(explode(col("_chunks")).as("chunk"))
      .select(md5(col("chunk")).as("h"), length(col("chunk")).cast("long").as("len"))
    chunks
      .groupBy("h").agg(count(lit(1)).as("cnt"), min(col("len")).as("len"))
      .agg(
        sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("cnt") * col("len")).as("total_bytes"),
        sum(col("len")).as("distinct_bytes"))
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
