package graft.operators

/** Compact signature lookup for the map-side MinHash estimate kill:
  * open-addressed long→index table over a flat primitive signature
  * array — ONE copy of the corpus signatures, ~n·(8k+16) bytes with no
  * per-row object or UnsafeRow overhead.
  *
  * This exists because Spark cannot express "probe the same broadcast
  * relation from two join keys" as one materialization: the two
  * BroadcastExchanges are planned over distinct TableCacheQueryStages
  * and AQE's reuse cache never unifies them (verified on the final
  * adaptive plan), so the join formulation carried TWO hashed-relation
  * copies of a 2.7 GB signature table at the 1000× tier — measured as
  * a 142-second full-GC driver freeze that failed the stage. A single
  * compact table broadcast by reference into a compiled expression is
  * strictly less memory than even one hashed relation, and the probe
  * is two O(1) lookups + a k-long compare per pair, in whole-stage
  * codegen.
  */
final class SigTable private (
    ids: Array[Long],
    sigs: Array[Long],
    slots: Array[Int],
    val k: Int
) extends Serializable {

  private def mask: Int = slots.length - 1

  private def find(id: Long): Int = {
    var h = SigTable.mix(id).toInt & mask
    while (true) {
      val s = slots(h)
      if (s == -1) return -1
      if (ids(s) == id) return s
      h = (h + 1) & mask
    }
    -1
  }

  /** Count of equal signature components, or -1 when either id is
    * unknown (callers treat that as estimate 0 — it cannot happen for
    * pairs generated from the same corpus the table was built on).
    */
  def matchCount(a: Long, b: Long): Int = {
    val ia = find(a)
    val ib = find(b)
    if (ia < 0 || ib < 0) return -1
    var c = 0
    var j = 0
    val oa = ia * k
    val ob = ib * k
    while (j < k) {
      if (sigs(oa + j) == sigs(ob + j)) c += 1
      j += 1
    }
    c
  }

  def size: Int = ids.length
}

object SigTable {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Build from collected (id, sig) rows; sig length must be `k`. */
  def build(rows: Array[(Long, Array[Long])], k: Int): SigTable = {
    val n = rows.length
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n * k)
    var cap = 4
    while (cap < n * 2) cap <<= 1
    val slots = Array.fill(cap)(-1)
    val mask = cap - 1
    var i = 0
    while (i < n) {
      val (id, sig) = rows(i)
      require(sig.length == k, s"signature length ${sig.length} != k=$k")
      ids(i) = id
      System.arraycopy(sig, 0, sigs, i * k, k)
      var h = mix(id).toInt & mask
      while (slots(h) != -1) h = (h + 1) & mask
      slots(h) = i
      i += 1
    }
    new SigTable(ids, sigs, slots, k)
  }
}
