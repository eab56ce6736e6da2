package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket analysis: frequent co-occurring item PAIRS with
  * support / confidence / lift — the association-rule primitive behind
  * "customers who bought X also bought Y".
  *
  * Scale posture (the A-priori discipline):
  *   1. Items below `minItemSupport` are pruned BEFORE any pair is
  *      generated — an infrequent item cannot participate in a frequent
  *      pair (the classic candidate-reduction), and at web scale this
  *      removes the long tail that dominates the catalog.
  *   2. Baskets collapse to sorted distinct-item arrays in ONE
  *      map-side-combining collect_set aggregate, and the C(k,2) pairs
  *      of each basket explode MAP-SIDE from that array (the
  *      triangle-counting device) — so the only shuffles are the basket
  *      aggregate and the final (item_a, item_b) count; there is no
  *      self-join that re-shuffles the row table twice.
  *   3. `maxBasketItems` drops degenerate baskets (a basket with 10k
  *      frequent items would emit 5·10⁷ pairs); the bound makes every
  *      basket's fan-out O(cap²) regardless of input skew.
  *
  * Counts are exact integers; confidence and lift are single double
  * divisions over them (deterministic on any engine), rounded to 6.
  */
object Basket {

  /** Frequent pairs from (basket, item) rows. Output: item_a < item_b,
    * pair_support, support_a, support_b, confidence_a_b = P(b|a),
    * lift = P(a,b) / (P(a)·P(b)) over distinct baskets.
    */
  def frequentPairs(rows: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long, minPairSupport: Long,
      maxBasketItems: Int): DataFrame = {
    val bi = rows.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val itemSupport = bi.groupBy(col("_i")).agg(count(lit(1)).as("_s"))
    frequentPairsIndexed(bi, itemSupport,
      minItemSupport, minPairSupport, maxBasketItems)
  }

  /** [[frequentPairs]] over a PRE-BUILT basket index — the session-
    * artifact path (round 16): `bi` is the DISTINCT (basket `_b`, item
    * `_i`) membership table (when it is a table bucketed by `_b`, the
    * basket collapse below rides the layout with NO exchange) and
    * `itemSupport` the FULL per-item basket counts (`_i`, `_s`) —
    * unthresholded, so one physical artifact serves any support dial.
    * The support table is catalog-sized (one row per distinct item),
    * so the A-priori attach BROADCASTS: the only corpus-sized exchange
    * left in the query is the final pair count.
    */
  def frequentPairsIndexed(bi: DataFrame, itemSupport: DataFrame,
      minItemSupport: Long, minPairSupport: Long,
      maxBasketItems: Int): DataFrame = {
    require(minItemSupport >= 1 && minPairSupport >= 1 && maxBasketItems >= 2)
    // n_baskets counts ALL baskets (before item pruning): lift's P(x)
    // is "fraction of baskets containing x" over the real population.
    val nBaskets = bi.select(col("_b")).distinct()
      .agg(count(lit(1)).as("_n_baskets"))
    val freqItems = itemSupport.where(col("_s") >= minItemSupport)
    // keep only frequent items; broadcast keeps bi's partitioning (a
    // bucketed artifact feeds the basket collapse exchange-free)
    val frequent = bi.join(broadcast(freqItems), Seq("_i"))
    val baskets = frequent.groupBy(col("_b"))
      .agg(sort_array(collect_set(col("_i"))).as("_items"))
      .where(size(col("_items")).between(2, maxBasketItems))
    // C(k,2) pairs via TWO builtin generators (posexplode anchors x,
    // explode(slice) emits every later y) — the nested-transform
    // array-of-structs formulation this replaces is a higher-order
    // function chain, which Spark evaluates INTERPRETED per element
    // (CodegenFallback): at sf10 that one stage was 558 of the
    // query's 939 CPU-seconds. Both generators and the slice are
    // whole-stage-codegen; the ≤maxBasketItems array rides along k
    // intermediate rows per basket, bounded by the basket cap.
    val pairs = baskets
      .select(col("_items"), posexplode(col("_items")))
      .select(col("col").as("_a"),
        explode(slice(col("_items"), col("pos") + 2,
          size(col("_items")))).as("_b"))
      .groupBy(col("_a").as("item_a"), col("_b").as("item_b"))
      .agg(count(lit(1)).as("pair_support"))
      .where(col("pair_support") >= minPairSupport)
    val supA = freqItems.select(col("_i").as("_ia"), col("_s").as("support_a"))
    val supB = freqItems.select(col("_i").as("_ib"), col("_s").as("support_b"))
    pairs
      .join(broadcast(supA), col("item_a") === col("_ia"))
      .join(broadcast(supB), col("item_b") === col("_ib"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("pair_support"),
        col("support_a"), col("support_b"),
        round(col("pair_support").cast("double") / col("support_a"), 6)
          .as("confidence_a_b"),
        round((col("pair_support").cast("double") * col("_n_baskets"))
          / (col("support_a").cast("double") * col("support_b")), 6)
          .as("lift"))
  }
}
