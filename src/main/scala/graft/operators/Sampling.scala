package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Spark's `sample`/`randomSplit` are seed + PARTITION-LAYOUT dependent:
  * recompaction, AQE, or a different cluster silently reassigns rows
  * between train and test. Everything here keys off `md5(salt:id)`
  * instead — a pure function of the row, so membership is reproducible
  * on any engine, any partitioning, forever; md5 hex is uniform, so
  * lexicographic thresholds give unbiased fractions. Shuffle-free
  * except the per-group cap's window.
  */
object Sampling {

  private def hash(idCol: Column, salt: String): Column =
    md5(concat(lit(salt), lit(":"), idCol.cast("string")))

  /** Threshold hex string h such that P(md5 < h) = fraction. */
  def fractionThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    val scaled = (BigDecimal(fraction) * BigDecimal(BigInt(1) << 128)).toBigInt
      .min((BigInt(1) << 128) - 1)
    String.format("%032x", scaled.bigInteger)
  }

  /** Keep ~fraction of rows, membership decided only by (salt, id). */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame =
    df.where(hash(col(idCol), salt) < lit(fractionThreshold(fraction)))

  /** Assign every row to a named split with the given weights —
    * the reproducible replacement for randomSplit. Weights are
    * normalized; bucket edges are cumulative thresholds over md5 space.
    */
  def assignSplit(
      df: DataFrame, idCol: String, weights: Seq[(String, Double)],
      salt: String = "split", splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    val total = weights.map(_._2).sum
    val edges = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.dropRight(1).map(fractionThreshold)
    val h = hash(col(idCol), salt)
    val expr = weights.init.zip(edges).foldRight(
        lit(weights.last._1): Column) { case (((name, _), edge), rest) =>
      when(h < lit(edge), lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /** Keep at most `cap` rows per group, chosen in md5 order — a
    * deterministic "random" per-group downsample (class balancing,
    * per-domain caps). One shuffle on the group key.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, idCol: String, cap: Int,
      salt: String = "cap"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hash(col(idCol), salt), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap)
      .drop("_rn")
  }
}
