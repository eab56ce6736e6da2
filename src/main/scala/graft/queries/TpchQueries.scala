package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-H flagship queries (Q1 pricing summary, Q3 shipping priority,
  * Q5 local-supplier volume) through the pure-SQL entry path — the
  * standard OLAP credibility check for any engine claiming the
  * reference's analytics surface and beyond.
  *
  * The SQL is written in the dialect intersection of Spark and DuckDB,
  * so the ENGINE AND THE ORACLE RUN THE SAME STRING — the strongest
  * possible equivalence statement. Money arithmetic goes through
  * DECIMAL casts before multiplication (l_discount is a 2-decimal
  * value stored as an inexact DOUBLE; decimal products and sums are
  * exact and engine-independent, where double sums are
  * summation-order-dependent), and every aggregate is CAST to DOUBLE
  * from the same exact decimal on both sides. Averages derive from the
  * exact sums. Q3's LIMIT is made deterministic by a total tie-break
  * (revenue, orderdate, orderkey).
  *
  * Plan shape: Q1 is one hash-aggregate over a pushed-down scan; Q3
  * and Q5 broadcast the small dimension sides at these SFs and plan
  * shuffled hash joins at scale — the join keys are all equi, so AQE
  * picks per-stage.
  */
object TpchQueries {

  private def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.region(spark, sfDir).createOrReplaceTempView("region")
  }

  private val Q1 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(12,2)))
      |    * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  private val Q3 =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  private val Q5 =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** Q13 customer distribution — the outer-join shape Q1/Q3/Q5 don't
    * exercise: a LEFT OUTER join whose filter lives in the ON clause
    * (so orderless customers survive with count 0), aggregated twice
    * (per-customer count, then distribution of counts). The reference
    * TPC-H predicate is on o_comment, which the synthetic tables don't
    * carry; the NOT LIKE lands on o_orderpriority instead — same
    * shape, same NULL-group semantics. count(o_orderkey) (not
    * count(*)) is what makes the no-order group count 0.
    */
  private val Q13 =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey
      |    AND o_orderpriority NOT LIKE '%URGENT%'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q18 large-volume customer — the correlated-semi shape: an IN
    * subquery over an AGGREGATE (orders whose total lineitem quantity
    * exceeds 300), rejoined to customer/orders/lineitem for the
    * per-order report. Spark plans the IN as a left-semi hash join on
    * the aggregated subquery — at scale the semi side is tiny (the
    * HAVING keeps only outlier orders), so it broadcasts and the big
    * lineitem scan never reshuffles for it. Quantity sums go through
    * DECIMAL like Q1; o_totalprice passes through unmodified (no
    * arithmetic → bit-identical on both engines); ORDER BY carries a
    * total tie-break.
    */
  private val Q18 =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin

  /** Q6 forecasting-revenue-change — the pure pushdown query: every
    * predicate (date range, discount band, quantity cap) reaches the
    * parquet scan, and the single global aggregate is two-phase. At
    * 100 TB this is the query where scan pruning IS the runtime.
    */
  private val Q6 =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |  * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q10 returned-item reporting — the 4-table join with a selective
    * fact filter (one quarter, returnflag 'R') and a top-N over a
    * grouped revenue sum. The synthetic customer table carries no
    * address/phone/comment columns, so the report keys are
    * (custkey, name, acctbal, nation) — same join tree and
    * aggregation shape. ORDER BY carries a total tie-break.
    */
  private val Q10 =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |  AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  private def run(sql: String)(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q1" -> run(Q1) _,
    "tpch_q3" -> run(Q3) _,
    "tpch_q5" -> run(Q5) _,
    "tpch_q13" -> run(Q13) _,
    "tpch_q18" -> run(Q18) _,
    "tpch_q6" -> run(Q6) _,
    "tpch_q10" -> run(Q10) _
  )

  val oracle: Map[String, String] = Map(
    "tpch_q1" -> Q1,
    "tpch_q3" -> Q3,
    "tpch_q5" -> Q5,
    "tpch_q13" -> Q13,
    "tpch_q18" -> Q18,
    "tpch_q6" -> Q6,
    "tpch_q10" -> Q10
  )
}
