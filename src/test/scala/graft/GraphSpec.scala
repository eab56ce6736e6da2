package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L

  test("2-cycle is a fixed point: both ranks stay exactly at scale") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val ranks = Graph.pagerank(edges, iterations = 5, scale = S)
      .as[(String, Long)].collect().toMap
    assert(ranks == Map("a" -> S, "b" -> S))
  }

  test("star graph ranks the hub above the leaves") {
    val leaves = (1 to 8).map(i => s"leaf$i")
    val edges = leaves.flatMap(l => Seq((l, "hub"), ("hub", l)))
      .toDF("src", "dst")
    val ranks = Graph.pagerank(edges, iterations = 4, scale = S)
      .as[(String, Long)].collect().toMap
    val hub = ranks("hub")
    assert(leaves.forall(l => ranks(l) < hub),
      s"hub=$hub leaves=${leaves.map(ranks)}")
    // Leaves are symmetric, so integer arithmetic must give them ALL
    // the identical rank — any spread would mean order-dependence.
    assert(leaves.map(ranks).distinct.size == 1)
  }

  test("ranks are invariant under repartitioning (exact integer arithmetic)") {
    val rnd = new scala.util.Random(7)
    val edges0 = (1 to 400)
      .map(_ => (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}"))
      .filter(e => e._1 != e._2).distinct
    val df = edges0.toDF("src", "dst")
    val undirected = df.union(df.select($"dst".as("src"), $"src".as("dst")))
    val a = Graph.pagerank(undirected.repartition(1), 4, S)
      .as[(String, Long)].collect().sorted.toSeq
    val b = Graph.pagerank(undirected.repartition(13, $"dst"), 4, S)
      .as[(String, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("dangling nodes keep only the teleport mass") {
    // a -> b with no back edge: b receives, a only teleports.
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val ranks = Graph.pagerank(edges, iterations = 1, scale = S)
      .as[(String, Long)].collect().toMap
    assert(ranks("a") == S / 20 * 3) // 0.15 * scale exactly
    assert(ranks("b") == S / 20 * 3 + 85 * S / 100)
  }
}
