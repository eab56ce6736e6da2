package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Graph analytics over the customer↔supplier trade graph (an edge per
  * distinct (customer, supplier) pair appearing on some order, walked
  * undirected). The PageRank oracle is the SAME integer-scaled
  * recurrence unrolled as chained CTEs in DuckDB — every intermediate
  * is exact integer arithmetic, so the two engines agree bit-for-bit
  * on all ~1.6k ranks (see Graph.pagerank for why FP PageRank can't be
  * hash-verified).
  */
object GraphQueries {

  private val Iterations = 3
  private val Scale = 1000000000L
  private val Teleport = Scale / 20 * 3

  private def edges(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  def pagerank(spark: SparkSession, sfDir: String): DataFrame =
    Graph.pagerank(edges(spark, sfDir), Iterations, Scale)

  /** The identical recurrence in portable SQL: `//` is DuckDB integer
    * division (Spark-side uses DIV); sums of BIGINT widen to HUGEINT in
    * DuckDB, exact either way, cast back at the end.
    */
  private def oracleSqlFor(iterations: Int): String = {
    val base =
      s"""WITH e0 AS (
         |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         |    's' || CAST(l_suppkey AS VARCHAR) AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (SELECT src, dst FROM e0
         |  UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |pr0 AS (SELECT node, CAST($Scale AS BIGINT) AS rank FROM nodes)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""pr$i AS (
         |  SELECT n.node, CAST($Teleport
         |      + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rank // d.deg) AS contrib
         |    FROM edges e
         |    JOIN pr${i - 1} p ON p.node = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT node, rank FROM pr$iterations"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank" -> (pagerank _)
  )

  val oracle: Map[String, String] = Map(
    "pagerank" -> oracleSqlFor(Iterations)
  )
}
