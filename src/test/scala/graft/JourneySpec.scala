package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Journey

class JourneySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // user 1: v(1) c(2) P(3, $10) v(4)            -> one 2-touch path + open tail
  // user 2: P(1, $6)                            -> zero-touch conversion
  // user 3: v(1) v(2) c(3) P(4, $9) c(5) P(6, $4) -> 3-touch then 1-touch path
  private lazy val events = Seq(
    (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "click", 0.0),
    (3L, ts(3), 1L, "purchase", 10.0), (4L, ts(4), 1L, "view", 0.0),
    (5L, ts(1), 2L, "purchase", 6.0),
    (6L, ts(1), 3L, "view", 0.0), (7L, ts(2), 3L, "view", 0.0),
    (8L, ts(3), 3L, "click", 0.0), (9L, ts(4), 3L, "purchase", 9.0),
    (10L, ts(5), 3L, "click", 0.0), (11L, ts(6), 3L, "purchase", 4.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  private def attr = Journey.attribution(events,
    userCol = "user_id", tsCol = "ts", idCol = "event_id",
    typeCol = "event_type", valueCol = "value",
    convType = "purchase", touchTypes = Seq("view", "click"))

  test("attribution credits paths by position and drops open segments") {
    val rows = attr.collect().map(r => r.getAs[String]("channel") -> r).toMap
    assert(rows.keySet === Set("view", "click"))

    // view touches: u1 idx1/2 of n=2 (0.5 lin), u3 idx1+idx2 of n=3
    // (1/3 each); ushape: 0.5 + 0.4 + 0.2/(3-2)... wait idx2 of 3 is
    // middle -> 0.2. Totals below are hand-summed.
    val view = rows("view")
    assert(view.getAs[Long]("touches") === 3L)
    // lin: 0.5 + 1/3 + 1/3 = 7/6 = 1.166667
    assert(view.getAs[Double]("conv_linear") === 1.166667)
    // ushape: 0.5 (n=2 first) + 0.4 (n=3 first) + 0.2 (n=3 middle)
    assert(view.getAs[Double]("conv_ushape") === 1.1)
    assert(view.getAs[Long]("conv_first") === 2L) // u1 ts1, u3 ts1
    assert(view.getAs[Long]("conv_last") === 0L)
    // rev: 10*0.5 + 9/3 + 9/3 = 11.0
    assert(view.getAs[Double]("rev_linear") === 11.0)

    val click = rows("click")
    assert(click.getAs[Long]("touches") === 3L)
    // lin: 0.5 (u1) + 1/3 (u3 seg1 last) + 1.0 (u3 seg2 solo) = 1.833333
    assert(click.getAs[Double]("conv_linear") === 1.833333)
    // ushape: 0.5 + 0.4 (n=3 last) + 1.0 (n=1) = 1.9
    assert(click.getAs[Double]("conv_ushape") === 1.9)
    assert(click.getAs[Long]("conv_first") === 1L) // u3 seg2 solo click
    assert(click.getAs[Long]("conv_last") === 3L)  // u1, u3 seg1, u3 seg2
    // rev: 10*0.5 + 9/3 + 4*1.0 = 12.0
    assert(click.getAs[Double]("rev_linear") === 12.0)
  }

  test("zero-touch conversions and trailing touches earn no channel credit") {
    // user 2's purchase has no touches; user 1's trailing view is an
    // open segment — neither contributes a row
    assert(attr.agg(sum("touches")).as[Long].head === 6L)
  }

  test("markov transitions are row-stochastic per source") {
    val m = Journey.markovTransitions(events,
      userCol = "user_id", tsCol = "ts", idCol = "event_id",
      typeCol = "event_type")
    val byPair = m.collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r).toMap
    // u1: v->c, c->P, P->v; u3: v->v, v->c, c->P, P->c, c->P, P->c... no:
    // u3 chain v v c P c P gives v->v v->c c->P P->c c->P.
    // u2: single event, no transition.
    assert(byPair(("view", "click")).getAs[Long]("n") === 2L)
    assert(byPair(("click", "purchase")).getAs[Long]("n") === 3L)
    // view row: dsts click(2) + view(1) -> p(view->click) = 2/3
    assert(byPair(("view", "click")).getAs[Double]("p") === 2.0 / 3.0)
    // every source's probabilities sum to 1 (exact halves/thirds here)
    val sums = m.groupBy("src").agg(sum("p").as("s")).select("s").as[Double]
      .collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
    // total transitions = 11 events - 3 users = 8
    assert(m.agg(sum("n")).as[Long].head === 8L)
  }

  test("abTest reproduces the hand-computed Welch statistic") {
    // user i makes i purchases; variants derive from the same md5 coin
    val n = 20
    val evs = (1 to n).flatMap { u =>
      (1 to u).map(j => ((u * 100 + j).toLong, ts(j), u.toLong, "purchase", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Journey.abTest(evs, "user_id", "event_type", "purchase")
      .collect().head

    def hexA(u: Int): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      ((d(0) >> 4) & 0xf) < 8
    }
    val (a, b) = (1 to n).partition(hexA)
    def moments(xs: Seq[Int]) = {
      val nn = xs.size.toLong
      val s = xs.map(_.toLong).sum
      val q = xs.map(x => x.toLong * x).sum
      (nn, s, q)
    }
    val (na, sa, qa) = moments(a)
    val (nb, sb, qb) = moments(b)
    assert(r.getAs[Long]("n_a") === na && r.getAs[Long]("n_b") === nb)
    assert(r.getAs[Double]("mean_a") === sa.toDouble / na)
    val va = (na * qa - sa * sa).toDouble / (na.toDouble * na * (na - 1))
    val vb = (nb * qb - sb * sb).toDouble / (nb.toDouble * nb * (nb - 1))
    assert(r.getAs[Double]("t_welch") ===
      (sa.toDouble / na - sb.toDouble / nb) / math.sqrt(va + vb))
  }

  test("dauWau counts 7-day rolling actives over observed days only") {
    val day = 86400L
    val evs = Seq(
      (1L, ts(0), 1L, "view", 0.0),           // u1 day0
      (2L, ts(2 * day), 1L, "view", 0.0),     // u1 day2
      (3L, ts(day), 2L, "view", 0.0)          // u2 day1
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Journey.dauWau(evs, "user_id", "ts")
      .collect().map(x => x.getAs[java.sql.Date]("day").toString ->
        (x.getAs[Long]("dau"), x.getAs[Long]("wau"),
          x.getAs[Double]("stickiness"))).toMap
    assert(r("1970-01-01") === ((1L, 1L, 1.0)))
    assert(r("1970-01-02") === ((1L, 2L, 0.5)))
    assert(r("1970-01-03") === ((1L, 2L, 0.5)))
  }

  test("topPaths ranks deterministic prefixes, short histories included") {
    val evs = Seq(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "click", 0.0),
      (3L, ts(1), 2L, "view", 0.0), (4L, ts(2), 2L, "click", 0.0),
      (5L, ts(1), 3L, "signup", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Journey.topPaths(evs, "user_id", "ts", "event_id", "event_type",
      pathLen = 5, topK = 2)
      .collect().map(x => (x.getAs[String]("path"), x.getAs[Long]("n_users")))
    assert(r.toSeq === Seq(("view>click", 2L), ("signup", 1L)))
  }
}
