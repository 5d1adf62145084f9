package graft

import graft.operators.Upsert

/** MERGE semantics (SURVEY §2.1 S7/S8): new-wins, insert-if-absent,
  * idempotence.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def current = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "name", "v")
  private def updates = Seq((2, "b2", 21.0), (4, "d", 40.0)).toDF("k", "name", "v")

  test("merge: incoming wins on collision, inserts new keys") {
    val got = Upsert.merge(current, updates, Seq("k")).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(1 -> ("a", 10.0), 2 -> ("b2", 21.0), 3 -> ("c", 30.0), 4 -> ("d", 40.0)))
  }

  test("merge is idempotent") {
    val once = Upsert.merge(current, updates, Seq("k"))
    val twice = Upsert.merge(once, updates, Seq("k"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("insertIfAbsent: existing rows win") {
    val got = Upsert.insertIfAbsent(current, updates, Seq("k")).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(1 -> ("a", 10.0), 2 -> ("b", 20.0), 3 -> ("c", 30.0), 4 -> ("d", 40.0)))
  }

  test("merge on composite keys") {
    val cur = Seq((1, "x", 1.0), (1, "y", 2.0)).toDF("k1", "k2", "v")
    val upd = Seq((1, "y", 9.0), (2, "z", 3.0)).toDF("k1", "k2", "v")
    val got = Upsert.merge(cur, upd, Seq("k1", "k2")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == Map((1, "x") -> 1.0, (1, "y") -> 9.0, (2, "z") -> 3.0))
  }
}
