package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize.nfc_normalize

/** Corpus-hygiene transforms a pretraining pipeline runs before any
  * dedup/quality pass: canonical text normalization and cross-corpus
  * boilerplate (repeated-segment) removal, the C4-style "drop any line
  * that repeats across documents" rule re-expressed for Spark.
  *
  * Reference scope: the reference engine normalizes/cleans per-field
  * (e.g. quote strip + case rules in its ELB parser); these operators
  * generalize that to whole-document hygiene at corpus scale.
  */
object Hygiene {

  /** Canonical text form: Unicode NFC (codegen expression — see
    * [[graft.functions.NfcNormalize]]), lowercase, whitespace runs
    * collapsed to single spaces, trimmed. The whole chain is one
    * narrow projection inside whole-stage codegen: no shuffle, no UDF,
    * scales embarrassingly with input splits.
    */
  /** Gopher-style document quality rules (Rae et al. 2021, App. A1.1 —
    * the published heuristic suite behind MassiveText, reused by most
    * pretraining pipelines since). Each rule is an exact integer count
    * or a single integer-ratio divide (bit-identical on any engine);
    * token membership is exact equality on lowercased whitespace
    * tokens. Thresholds are the paper's: 50 ≤ words ≤ 100 000, mean
    * word length in [3, 10], symbol(# or …)-to-word ratio ≤ 0.1,
    * ≤ 90% bullet-started lines (the paper removes only when MORE
    * than 90% of lines open with a bullet), ≤ 30% ellipsis-ended
    * lines, ≥ 80% of
    * words with an alphabetic char, ≥ 2 distinct of 8 English stop
    * words. Pure narrow projection — at 100 TB this is a scan with
    * zero shuffle, the cheapest filter in the pipeline.
    */
  def gopherColumns(text: Column): Seq[Column] = {
    val words = split(trim(text), "\\s+")
    val nWords = greatest(size(words), lit(1))
    val lines = split(text, "\n")
    val nLines = greatest(size(lines), lit(1))
    val lower = transform(words, w => org.apache.spark.sql.functions.lower(w))
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    Seq(
      size(words).as("n_words"),
      TextAnalysis.avgWordLen(text).as("mean_word_len"),
      (size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
        .cast("double") / nWords).as("symbol_word_ratio"),
      (size(filter(lines, l => l.rlike("^\\s*[-*•]")))
        .cast("double") / nLines).as("bullet_line_frac"),
      (size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$")))
        .cast("double") / nLines).as("ellipsis_line_frac"),
      (size(filter(words, w => w.rlike("[a-zA-Z]")))
        .cast("double") / nWords).as("alpha_word_frac"),
      stops.map(s => when(array_contains(lower, s), 1).otherwise(0))
        .reduce(_ + _).cast("int").as("stop_hits"))
  }

  /** `gopher_keep` — the conjunction of all seven Gopher rules over
    * [[gopherColumns]]'s outputs (expects them as columns).
    */
  def gopherKeep: Column =
    (col("n_words") >= 50 && col("n_words") <= 100000 &&
      col("mean_word_len") >= 3 && col("mean_word_len") <= 10 &&
      col("symbol_word_ratio") <= 0.1 &&
      col("bullet_line_frac") <= 0.9 &&
      col("ellipsis_line_frac") <= 0.3 &&
      col("alpha_word_frac") >= 0.8 &&
      col("stop_hits") >= 2).as("gopher_keep")

  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(nfc_normalize(text)), "\\s+", " "))

  /** Cross-corpus repeated-segment removal.
    *
    * Documents are segmented into consecutive `chunkWords`-word spans
    * (the corpus has no line structure; fixed word spans play the role
    * of C4's lines). Any span whose text occurs in at least
    * `minDocFreq` DISTINCT documents is boilerplate and is dropped
    * from every document; survivors are reassembled in original order.
    * Emits one row per input document — a fully-boilerplate document
    * comes back with empty text, so downstream length filters can cull
    * it explicitly rather than it vanishing.
    *
    * Scale shape (100 TB posture):
    *  - segmenting is a per-row generator — no shuffle;
    *  - the document-frequency pass groups on `md5(chunk)` (fixed
    *    16-byte shuffle keys instead of arbitrary-length text) with
    *    map-side partial aggregation;
    *  - the verdict joins back on the same md5 key — two hash
    *    shuffles total, never all-pairs;
    *  - reassembly is one `groupBy(doc)` whose state is bounded by a
    *    single document's chunk list.
    * md5 collisions would need 2⁶⁴⁺ distinct chunks to matter; the
    * exactness caveat is documented rather than paid for.
    */
  def dedupBoilerplate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkWords: Int = 8,
      minDocFreq: Int = 2): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")

    // NULL text folds to "" so the document still emits its row (a
    // NULL array would explode to zero rows and the doc would vanish,
    // breaking the one-row-per-document contract above)
    val w = split(coalesce(col(textCol), lit("")), " ")
    // Chunk starts 0, k, 2k, …, ≤ size-1: the final partial span is a
    // chunk too (dropping it would lose document tail text on
    // reassembly). split() never yields an empty array, so the
    // sequence bound size-1 >= 0 always holds.
    val chunks = docs.select(
        col(idCol),
        explode(transform(
          sequence(lit(0), size(w) - 1, lit(chunkWords)),
          s => struct(
            s.as("start"),
            concat_ws(" ", slice(w, s + 1, lit(chunkWords))).as("chunk"))))
          .as("c"))
      .select(col(idCol), col("c.start").as("start"), col("c.chunk").as("chunk"))
      .withColumn("h", md5(col("chunk")))

    // chunk doc-frequency via ONE window over the h partition — NOT a
    // groupBy(h) + join back: the join formulation evaluates the whole
    // chunk-build subtree TWICE (no exchange reuse — the aggregate's
    // partial phase sits below its exchange, so the two shuffles
    // differ; the round-14 sf10 profile showed two identical 38 s
    // chunk-build stages) and pays a third keyed exchange. Here chunk
    // rows shuffle by h once, df is counted inside the partition, and
    // the only other exchange is the final per-doc reassembly. A
    // corpus-wide boilerplate chunk makes a large h partition in BOTH
    // formulations — the set adds O(df) on top of the partition's own
    // O(df) rows, no new skew class.
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val keep = col("chunk_df") < minDocFreq
    chunks
      .withColumn("chunk_df", size(collect_set(col(idCol)).over(win)))
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(keep,
              struct(col("start"), col("chunk"))))),
            _.getField("chunk")),
          " ").as("clean_text"),
        sum(when(keep, 1L).otherwise(0L)).as("chunks_kept"),
        sum(when(keep, 0L).otherwise(1L)).as("chunks_dropped"))
  }
}
