package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertValue

class HilbertSpec extends SparkSpec {

  import spark.implicits._

  test("bits=3 walk is a bijection onto [0, 64) with grid-adjacent steps") {
    // The two defining properties of the curve, checked EXHAUSTIVELY on
    // the 8×8 grid: every cell gets a unique d covering the full range,
    // and consecutive d values are Manhattan-distance-1 neighbors (the
    // property Z-order lacks — and the whole point of the operator).
    val cells = for (x <- 0 until 8; y <- 0 until 8)
      yield (x.toLong, y.toLong, HilbertValue.xy2d(x, y, 3))
    assert(cells.map(_._3).sorted == (0L until 64L), "bijection onto [0,64)")
    val byD = cells.map { case (x, y, d) => d -> ((x, y)) }.toMap
    (0L until 63L).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step d=$d -> ${d + 1} jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("bits=8 walk is a bijection with adjacent steps (full 256x256)") {
    val d2xy = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = HilbertValue.xy2d(x, y, 8).toInt
      assert(d2xy(d) == null, s"collision at d=$d")
      d2xy(d) = (x, y)
    }
    (0 until 65535).foreach { d =>
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  test("codegen path matches the JVM reference at bits=16; masks and nulls") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { _ =>
      // deliberately exceed 16 bits sometimes: the kernel must mask
      (rnd.nextLong().abs % (1L << 20), rnd.nextLong().abs % (1L << 20))
    }
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        HilbertValue.hilbert_value(col("a"), col("b"), 16).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == HilbertValue.xy2d(a, b, 16), s"($a, $b)")
    }
    val n = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(HilbertValue.hilbert_value(col("a"), col("b"), 16).as("h"))
      .head()
    assert(n.isNullAt(0), "null input must propagate")
  }

  test("hilbert key ranges fragment less than z-order on a 2-D box") {
    // Count the CONTIGUOUS key runs covering the box [0,4096)²: each
    // run is one scan range / one row-group cluster after layout. The
    // Hilbert curve's adjacency gives strictly fewer, larger runs than
    // Morton's diagonal-jumping interleave on the same box.
    def runs(keys: Seq[Long]): Int = {
      val s = keys.sorted
      1 + s.sliding(2).count { case Seq(a, b) => b != a + 1; case _ => false }
    }
    // an UNALIGNED box (a power-of-two-aligned quadrant is one run
    // under BOTH curves — the interesting case is everything else)
    val box = for (x <- 20L until 70L; y <- 20L until 70L) yield (x, y)
    val h = runs(box.map { case (x, y) => HilbertValue.xy2d(x, y, 7) })
    val z = runs(box.map { case (x, y) =>
      // 7-bit Morton interleave, reference-style
      (0 until 7).foldLeft(0L) { (acc, i) =>
        acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
      }
    })
    assert(h < z, s"hilbert runs $h should undercut z-order runs $z")
  }
}
