package graft

import graft.filmdb.{Mesures, Warehouse}
import graft.filmdb.Mesures.Slicers

/** The 15 dashboard measures (SURVEY §2.10) against the published card
  * values (BASELINE.md / film_powerbi.pdf pages 1-3), including slicer
  * propagation.
  */
class MesuresSpec extends SparkSpec {

  private lazy val ready: Unit = { Warehouse.build(spark); () }
  private def f(s: Slicers = Slicers()) = { ready; Mesures.fact(spark, s) }

  test("card measures: CA 67 416,51 / 16 049 paiements / panier 4,20 / 599 actifs") {
    assert(Mesures.caTotal(f()) == BigDecimal("67416.51"))
    assert(Mesures.nbPaiements(f()) == 16049L)
    assert(Mesures.panierMoyen(f()) == BigDecimal("4.20"))
    assert(Mesures.clientsActifs(f()) == 599L)
  }

  test("distinct-count cards: 2 magasins / 108 pays / 597 villes / 599 clients / 1000 films") {
    ready
    assert(Mesures.nbMagasins(spark) == 2L)
    assert(Mesures.nbPays(spark) == 108L)
    assert(Mesures.nbVilles(spark) == 597L)
    assert(Mesures.nbClients(spark) == 599L)
    assert(Mesures.nbFilms(spark) == 1000L)
  }

  test("top-1 label cards render the dashboard strings") {
    assert(Mesures.filmTop(spark, f()) == "TELEGRAPH VOYAGE $231,73")
    assert(Mesures.clientTop(spark, f()) == "KARL SEAL $221,55")
    assert(Mesures.moisRecord(spark, f()) == "mars 2022 $11 413,88")
    assert(Mesures.anneeRecord(spark, f()) == "2022 — 67 417 $")
    assert(Mesures.topCategorie(spark, f()) == "Sports $5 314,21")
  }

  test("Pareto: Sports leads, cumulative ends at total, share at 1.0") {
    val rows = Mesures.caCumulCategories(spark, f()).collect()
    assert(rows.length == 16)
    assert(rows.head.getString(0) == "Sports")
    assert(BigDecimal(rows.head.getDecimal(1)) == BigDecimal("5314.21"))
    assert(BigDecimal(rows.last.getDecimal(2)) == BigDecimal("67416.51"))
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-12)
  }

  test("visual-level measure filter (P12): CA > 4375.85 keeps the top 5 categories") {
    val rows = Mesures.caParCategorie(spark, f(), minCa = Some(BigDecimal("4375.85"))).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("Sports", "Sci-Fi", "Animation", "Drama", "Comedy"),
      "strict > excludes Action at exactly 4375.85")
  }

  test("slicers: store filter reproduces the per-store split; compose with category") {
    assert(Mesures.caTotal(f(Slicers(magasinId = Some(1)))) == BigDecimal("33489.47"))
    assert(Mesures.nbPaiements(f(Slicers(magasinId = Some(2)))) == 7992L)
    val mars = f(Slicers(moisKey = Some(20220301)))
    assert(Mesures.caTotal(mars) == BigDecimal("11413.88"))
    val sportsMars = f(Slicers(moisKey = Some(20220301), categorie = Some("Sports")))
    assert(Mesures.nbPaiements(sportsMars) > 0)
    assert(Mesures.caTotal(sportsMars) < BigDecimal("11413.88"))
  }
}
