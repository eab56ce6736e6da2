package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test contamination detection — the decontamination pass every
  * benchmark-respecting training pipeline runs before a split ships:
  * find evaluation documents that share word k-gram shingles with any
  * training document (n-gram overlap is the standard contamination
  * signal, as used by the public GPT-3/PaLM decontamination writeups).
  *
  * Scale posture: the join key is the shingle, and the train side is
  * reduced to its DISTINCT shingles with a document-frequency cap
  * first. The cap is both methodology and skew armor: a shingle that
  * appears in thousands of training docs is boilerplate, not
  * contamination evidence — and it is exactly the hot key that would
  * explode the join. With the cap, per-shingle fan-out is ≤ 1 (the
  * evidence side is distinct), so the shuffle is one row per
  * (test doc, shingle) — linear, no quadratic blowup.
  */
object Contamination {

  /** Per-test-document count of distinct shingles that occur in ≤
    * `maxTrainDf` training documents: (id, n_shared, n_sh, ratio).
    * Test docs with zero shared shingles are absent — the clean
    * majority never appears in the output.
    *
    * Shape note: ONE pass over the exploded test shingles — a LEFT join
    * against the evidence set marks hits, and a single aggregate counts
    * rows (= distinct shingles, the explode input is distinct) and hits
    * together. The tempting alternative — `size(shingles)` in one
    * column and `explode(shingles)` in another — evaluates the
    * higher-order shingle expression twice per row (HOFs are
    * interpreted, and interpreted projections get no common
    * subexpression elimination; measured 2× on this operator).
    */
  def sharedShingles(
      train: DataFrame, test: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 5, maxTrainDf: Long = 20): DataFrame = {
    val evidence = train
      .select(explode(Dedup.shingles(col(textCol), shingleK)).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("train_df"))
      .where(col("train_df") <= maxTrainDf)
      .select(col("sh"), lit(1).as("_hit"))
    test
      .select(col(idCol), explode(Dedup.shingles(col(textCol), shingleK)).as("sh"))
      .join(evidence, Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_sh"), count(col("_hit")).as("n_shared"))
      .where(col("n_shared") > 0)
      .select(col(idCol), col("n_shared"), col("n_sh"),
        (col("n_shared").cast("double") / col("n_sh")).as("contamination_ratio"))
  }
}
