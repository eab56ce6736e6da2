package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Driver-contract queries for similarity search over `embeddings`:
  * vectors with vec_id < 10 act as queries against the full corpus.
  */
object VecQueries {

  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.distributed(spark, sfDir, "embeddings").select("vec_id", "embedding")

  def topkBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val c = corpus(spark, sfDir)
    Similarity.bruteForceTopK(c, c.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
  }

  def topkLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val c = corpus(spark, sfDir)
    Similarity.lshTopK(c, c.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, bits = 8, dims = 64)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "similarity_topk" -> topkBrute,
    "similarity_lsh" -> topkLsh
  )

  // -- oracle SQL ------------------------------------------------------

  private val qCte: String =
    """q AS (SELECT vec_id,
      |        list_transform(embedding, x -> CAST(round(x * 10000) AS BIGINT)) AS qv
      |      FROM embeddings),
      |n AS (SELECT vec_id, qv,
      |        CAST(list_dot_product(qv, qv) AS BIGINT) AS n2 FROM q)""".stripMargin

  /** Same ±1 hyperplane formula as Similarity.planeSign, in SQL. */
  private[queries] def bucketExpr(qv: String): String = {
    val bitTerms = (0 until 8).map { j =>
      s"""(CASE WHEN CAST(list_dot_product($qv,
         |  list_transform(generate_series(0, 63),
         |    i -> CASE WHEN strpos('89abcdef', substr(md5('$j:' || (i)), 1, 1)) > 0
         |         THEN 1 ELSE -1 END)) AS BIGINT) >= 0
         |  THEN ${1L << j} ELSE 0 END)""".stripMargin
    }
    bitTerms.mkString(" + ")
  }

  val oracle: Map[String, String] = Map(
    "similarity_topk" ->
      s"""WITH $qCte
         |SELECT query_id, neighbor_id, rank, cosine FROM (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    CAST(list_dot_product(a.qv, b.qv) AS BIGINT)::DOUBLE
         |      / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY CAST(list_dot_product(a.qv, b.qv) AS BIGINT)::DOUBLE
         |        / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) DESC, b.vec_id ASC) AS INT) AS rank
         |  FROM n a, n b
         |  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id)
         |WHERE rank <= 5""".stripMargin,
    "similarity_lsh" ->
      s"""WITH $qCte,
         |bk AS (SELECT vec_id, qv, n2,
         |         CAST(${bucketExpr("qv")} AS BIGINT) AS bucket FROM n)
         |SELECT query_id, neighbor_id, rank, cosine, bucket FROM (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         |    CAST(list_dot_product(a.qv, b.qv) AS BIGINT)::DOUBLE
         |      / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY CAST(list_dot_product(a.qv, b.qv) AS BIGINT)::DOUBLE
         |        / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) DESC, b.vec_id ASC) AS INT) AS rank
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 10)
         |WHERE rank <= 5""".stripMargin
  )
}
