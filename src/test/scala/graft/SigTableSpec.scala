package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SigTable

/** Unit coverage for the compact broadcast signature table behind the
  * minhash estimate kill (the single-materialization replacement for
  * the two broadcast sig joins — see SigTable's doc for why Spark
  * cannot unify those exchanges). End-to-end parity of the path it
  * serves is pinned in DedupSpec ("branch flip, identical pairs").
  */
class SigTableSpec extends AnyFunSuite {

  private def sig(xs: Long*): Array[Long] = xs.toArray

  test("matchCount counts equal components; unknown ids yield -1") {
    val t = SigTable.build(Array(
      1L -> sig(10, 20, 30, 40),
      2L -> sig(10, 99, 30, 41),
      3L -> sig(0, 0, 0, 0)
    ), k = 4)
    assert(t.size === 3)
    assert(t.matchCount(1L, 2L) === 2)
    assert(t.matchCount(2L, 1L) === 2)
    assert(t.matchCount(1L, 1L) === 4)
    assert(t.matchCount(1L, 3L) === 0)
    assert(t.matchCount(1L, 999L) === -1)
    assert(t.matchCount(999L, 1L) === -1)
  }

  test("open addressing survives adversarial ids (dense low bits, probe wraparound)") {
    // ids chosen so the mixed hashes collide modulo small capacities;
    // linear probing must still find every entry.
    val n = 257
    val rows = Array.tabulate(n) { i =>
      val id = i.toLong << 32 // zero low bits pre-mix
      id -> sig(i.toLong, i.toLong + 1)
    }
    val t = SigTable.build(rows, k = 2)
    rows.foreach { case (id, _) =>
      assert(t.matchCount(id, id) === 2, s"id $id not found")
    }
    assert(t.matchCount(rows.head._1, rows.last._1) === 0)
    assert(t.matchCount(-1L, rows.head._1) === -1)
  }

  test("build rejects a signature whose length differs from k") {
    val err = intercept[IllegalArgumentException] {
      SigTable.build(Array(1L -> sig(1, 2, 3)), k = 4)
    }
    assert(err.getMessage.contains("!= k=4"))
  }

  test("empty table answers -1 for everything") {
    val t = SigTable.build(Array.empty[(Long, Array[Long])], k = 8)
    assert(t.size === 0)
    assert(t.matchCount(0L, 0L) === -1)
  }
}
