package graft

import org.apache.spark.sql.functions._
import graft.filmdb.{FilmDb, Warehouse}
import graft.operators.Upsert

/** SURVEY §5 differential ETL tests: the warehouse rebuild is
  * deterministic (run twice → identical), and the incremental path —
  * prior-months snapshot MERGEd with the newest month's facts — equals
  * the full rebuild (the reference's ON CONFLICT re-run semantics,
  * §2.9).
  */
class EtlIncrementalSpec extends SparkSpec {

  private def factRows(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, String)] =
    df.select(col("source_paiement_id"), col("date_key"), col("montant").cast("string"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
      .toSet

  test("warehouse rebuild is deterministic: two builds produce identical tables") {
    val a = Warehouse.factPaiement(spark)
    val b = Warehouse.factPaiement(spark)
    assert(factRows(a) == factRows(b))
    val dimA = Warehouse.dimFilm(spark).collect().map(_.toString).sorted
    val dimB = Warehouse.dimFilm(spark).collect().map(_.toString).sorted
    assert(dimA.sameElements(dimB))
  }

  test("incremental month merge equals the full rebuild") {
    val full = Warehouse.factPaiement(spark).cache()
    // split on the July month keys (date_key 2022 07 xx)
    val snapshot = full.filter(col("date_key") < 20220701)
    val julyBatch = full.filter(col("date_key") >= 20220701)
    assert(julyBatch.count() > 0 && snapshot.count() > 0)
    val merged = Upsert.merge(snapshot, julyBatch, Seq("source_paiement_id"))
    assert(factRows(merged) == factRows(full))
    // re-merging the same batch changes nothing (ON CONFLICT idempotence)
    val again = Upsert.merge(merged, julyBatch, Seq("source_paiement_id"))
    assert(factRows(again) == factRows(full))
  }

  test("payment partitions re-unify without loss (S3 UNION ALL semantics)") {
    val p = FilmDb.table(spark, "payment")
    assert(p.count() == 16049L)
    assert(p.select(countDistinct(col("payment_id"))).collect().head.getLong(0) == 16049L)
  }
}
