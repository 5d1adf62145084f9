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

  test("cartesKpi: the seven page-1 cards agree with the per-measure API in one job") {
    val k = Mesures.cartesKpi(spark, f())
    assert(k.caTotal == BigDecimal("67416.51"))
    assert(k.nbPaiements == 16049L)
    assert(k.panierMoyen == BigDecimal("4.20"))
    assert(k.clientsActifs == 599L)
    assert(k.nbClients == 599L)
    assert(k.nbVilles == 597L)
    assert(k.nbPays == 108L)
    // sliced fact flows through the same single-job path
    assert(Mesures.cartesKpi(spark, f(Slicers(magasinId = Some(1)))).caTotal ==
      BigDecimal("33489.47"))
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

  // -- drill hierarchies (§2.10 model artifacts) --------------------------

  import graft.measures.{Hierarchy, Measures}
  import org.apache.spark.sql.functions.{col, sum}

  private def hierarchies = {
    ready
    Seq(
      "HiérarchieMois" -> Hierarchy(spark.table("dim_date"), "date_key",
        Seq("annee", "trimestre", "mois")),
      "Localisation client" -> Hierarchy(spark.table("dim_client"), "client_key",
        Seq("pays", "ville", "nom_client")),
      "Territoire" -> Hierarchy(spark.table("dim_magasin"), "magasin_key",
        Seq("pays", "ville"))
    )
  }

  test("drill: children sum to parent at every level of all three pbix hierarchies") {
    for ((name, h) <- hierarchies; d <- 1 until h.depth) {
      val parent = Measures.drill(f(), h, d).collect()
        .map(r => r.toSeq.take(d) -> (r.getDouble(d), r.getLong(d + 1))).toMap
      val rolled = Measures.drill(f(), h, d + 1)
        .groupBy(h.levels.take(d).map(col): _*)
        .agg(sum(col("ca")).as("ca"), sum(col("n")).as("n"))
        .collect()
        .map(r => r.toSeq.take(d) -> (r.getDouble(d), r.getLong(d + 1))).toMap
      assert(rolled.keySet == parent.keySet, s"$name level $d key sets")
      for ((k, (ca, n)) <- parent) {
        assert(math.abs(rolled(k)._1 - ca) < 1e-6, s"$name level $d CA at $k")
        assert(rolled(k)._2 == n, s"$name level $d count at $k")
      }
    }
  }

  test("drill: level-1 totals equal the CA Total card for every hierarchy") {
    for ((name, h) <- hierarchies) {
      val l1 = Measures.drill(f(), h, 1).collect()
      assert(math.abs(l1.map(_.getDouble(1)).sum - 67416.51) < 1e-6, s"$name total CA")
      assert(l1.map(_.getLong(2)).sum == 16049L, s"$name total payments")
    }
  }

  test("drillAll: ROLLUP tree has a 67 416,51 grand total and per-level row counts match drill()") {
    for ((name, h) <- hierarchies) {
      val all = Measures.drillAll(f(), h).collect()
      val grand = all.filter(_.getInt(0) == 0)
      assert(grand.length == 1, s"$name grand total row")
      assert(math.abs(grand.head.getDouble(1 + h.depth) - 67416.51) < 1e-6, s"$name grand CA")
      for (d <- 1 to h.depth) {
        val n = all.count(_.getInt(0) == d)
        assert(n == Measures.drill(f(), h, d).count(), s"$name level $d row count")
      }
    }
  }
}
