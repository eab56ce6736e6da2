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
    * Test docs with zero shared shingles are absent (inner join) — the
    * clean majority never crosses the wire.
    */
  def sharedShingles(
      train: DataFrame, test: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 5, maxTrainDf: Long = 20): DataFrame = {
    val evidence = train
      .select(explode(Dedup.shingles(col(textCol), shingleK)).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("train_df"))
      .where(col("train_df") <= maxTrainDf)
      .select("sh")
    test
      .select(col(idCol), Dedup.shingles(col(textCol), shingleK).as("shs"))
      .select(col(idCol), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      .join(evidence, "sh")
      .groupBy(col(idCol), col("n_sh"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("n_shared"), col("n_sh"),
        (col("n_shared").cast("double") / col("n_sh")).as("contamination_ratio"))
  }
}
