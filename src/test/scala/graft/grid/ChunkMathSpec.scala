package graft.grid

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's pruning/partition tests
  * (tests/test_jgrid3.py:166-199, tests/worldgrid/test_grids.py:18-41)
  * with seeded random property sampling (the scalatest/scalacheck bridge
  * isn't in the offline cache).
  */
class ChunkMathSpec extends AnyFunSuite {

  val g = ChunkGrid(width = 190, height = 130, fracWidth = 19, fracHeight = 5,
    fracNDates = 3, nDates = 11)

  test("frac num/x/y round-trip") {
    for (fy <- 0 until g.numFracsY; fx <- 0 until g.numFracsX) {
      val n = g.fracNum(fx, fy)
      assert(g.fracX(n) == fx && g.fracY(n) == fy)
    }
  }

  test("every pixel belongs to exactly one fraction (partition exactness)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val x = rnd.nextInt(g.width)
      val y = rnd.nextInt(g.height)
      val owner = g.fracForXY(x, y)
      val owners = g.fracsForRectXY(x, x + 1, y, y + 1)
      assert(owners == Seq(owner))
    }
  }

  test("rect pruning end-exclusive edge cases (test_jgrid3.py:177-199)") {
    // rect exactly one chunk
    assert(g.fracsForRectXY(0, 19, 0, 5) == Seq(0))
    // rect ending on a chunk boundary must not spill into the next chunk
    assert(g.fracsForRectXY(0, 38, 0, 5) == Seq(0, 1))
    assert(g.fracsForRectXY(19, 38, 5, 10) == Seq(g.fracNum(1, 1)))
    // empty rect
    assert(g.fracsForRectXY(5, 5, 0, 10).isEmpty)
    // single pixel in the middle of a chunk
    assert(g.fracsForRectXY(20, 21, 6, 7) == Seq(g.fracNum(1, 1)))
  }

  test("rect pruning covers exactly the intersecting fractions (property)") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 200) {
      val x0 = rnd.nextInt(g.width); val x1 = x0 + 1 + rnd.nextInt(g.width - x0)
      val y0 = rnd.nextInt(g.height); val y1 = y0 + 1 + rnd.nextInt(g.height - y0)
      val pruned = g.fracsForRectXY(x0, x1, y0, y1).toSet
      // brute force: a fraction intersecting the rect either touches the
      // rect border or (fully interior) contains its own chunk origin
      val brute = (for {
        x <- x0 until x1; y <- y0 until y1
        if x == x0 || x == x1 - 1 || y == y0 || y == y1 - 1 ||
          (x % g.fracWidth == 0 && y % g.fracHeight == 0)
      } yield g.fracForXY(x, y)).toSet
      assert(brute == pruned, s"rect ($x0,$x1)x($y0,$y1)")
    }
  }

  test("time chunking with ragged tail (jgrid3.py:151-164)") {
    assert(g.numTimeChunks == 4) // 11 dates / 3 per chunk
    assert(g.timeChunkRange(3) == (9, 11)) // ragged: 2 dates
    assert(g.nDatesInChunk(3) == 2)
    assert(g.timeChunksForRange(0, 11) == Seq(0, 1, 2, 3))
    assert(g.timeChunksForRange(3, 4) == Seq(1))
    assert(g.timeChunksForRange(2, 3) == Seq(0))
    assert(g.timeChunksForRange(5, 5).isEmpty)
  }

  test("MODIS-scale grid constants (worldgrid/grids.py:100-159)") {
    val modis = ChunkGrid(width = 172800, height = 86400,
      fracWidth = 400, fracHeight = 400, fracNDates = 200, nDates = 400)
    assert(modis.numFracsX == 432 && modis.numFracsY == 216)
    // one tile = 12x12 cells of 400px
    assert(modis.fracsForRectXY(0, 4800, 0, 4800).size == 144)
  }
}
