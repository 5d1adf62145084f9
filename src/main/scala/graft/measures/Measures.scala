package graft.measures

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BI measure layer (SURVEY §2.10): the dashboard's DAX measures as
  * parameterized aggregations over the star schema, with slicer-style
  * filters (§2.2 P11) applied BEFORE aggregation — exactly how a
  * semantic model propagates slicer selections through relationships.
  *
  * Filters restrict dimensions; the fact is filtered by the surviving
  * dimension keys (broadcast semi-joins — dims are small by
  * construction, so slicing never shuffles the fact).
  */
final case class Filters(
    annee: Option[Int] = None,
    mois: Option[Int] = None,
    nation: Option[String] = None
)

object Measures {

  /** Apply slicer filters to the fact through its dimensions. */
  def slice(fact: DataFrame, dimDate: DataFrame, dimClient: DataFrame, f: Filters): DataFrame = {
    var d = dimDate
    f.annee.foreach(a => d = d.filter(col("annee") === a))
    f.mois.foreach(m => d = d.filter(col("mois") === m))
    var c = dimClient
    f.nation.foreach(n => c = c.filter(col("nation") === n))
    val out = fact
      .join(broadcast(d.select("date_key")), Seq("date_key"), "left_semi")
      .join(broadcast(c.select("client_key")), Seq("client_key"), "left_semi")
    out
  }

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** The KPI card row: CA total / nb commandes / panier moyen / clients
    * actifs — one aggregation pass (§2.10 measures 1-4).
    */
  def kpis(fact: DataFrame): DataFrame =
    fact.agg(
      sum(dec(col("montant"))).cast(DoubleType).as("ca_total"),
      count(lit(1)).as("n_commandes"),
      (sum(dec(col("montant"))).cast(DoubleType) / count(lit(1))).as("panier_moyen"),
      countDistinct(col("client_key")).as("clients_actifs")
    )

  /** Top-1 label measure: "NAME $X" (§2.10 KPI cards). */
  def topLabel(fact: DataFrame, dim: DataFrame, dimKey: String, labelCol: String): DataFrame =
    fact
      .groupBy(col(dimKey))
      .agg(sum(dec(col("montant"))).as("ca_dec"))
      .join(broadcast(dim.select(col(dimKey), col(labelCol))), Seq(dimKey))
      .orderBy(col("ca_dec").desc, col(labelCol))
      .limit(1)
      .select(concat(col(labelCol), lit(" $"), col("ca_dec").cast(StringType)).as("libelle"))
}
