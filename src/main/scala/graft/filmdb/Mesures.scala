package graft.filmdb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The dashboard's 15-measure DAX layer (SURVEY §2.10) as Spark
  * aggregations over the warehouse, with the 3 slicers (month / store /
  * category, §2.2 P11) applied to dimensions and propagated to the fact
  * by broadcast semi-joins — relationship filter propagation, J10.
  *
  * Label measures render as the dashboard shows them (French month
  * names, French number formatting: "mars 2022 $11 413,88").
  */
object Mesures {

  /** The dashboard's slicer state. */
  final case class Slicers(
      moisKey: Option[Int] = None, // yyyymm01 month key (v_dim_mois.date_key_mois)
      magasinId: Option[Int] = None, // dim_magasin.source_magasin_id
      categorie: Option[String] = None // dim_categorie.nom_categorie
  )

  /** Fact restricted by the slicers (expects Warehouse.build views). */
  def fact(spark: SparkSession, s: Slicers = Slicers()): DataFrame = {
    var f = spark.table("fact_paiement")
    s.moisKey.foreach { mk =>
      val d = spark.table("dim_date")
        .filter((col("annee") * 10000 + col("mois") * 100 + 1) === mk)
        .select("date_key")
      f = f.join(broadcast(d), Seq("date_key"), "left_semi")
    }
    s.magasinId.foreach { m =>
      val dm = spark.table("dim_magasin").filter(col("source_magasin_id") === m).select("magasin_key")
      f = f.join(broadcast(dm), Seq("magasin_key"), "left_semi")
    }
    s.categorie.foreach { c =>
      val dc = spark.table("dim_categorie").filter(col("nom_categorie") === c).select("categorie_key")
      f = f.join(broadcast(dc), Seq("categorie_key"), "left_semi")
    }
    f
  }

  // -- scalar measures ----------------------------------------------------

  /** The page-1 scalar KPI cards in ONE Spark job. The per-measure
    * functions below are the fine-grained API; a dashboard refresh that
    * calls seven of them pays seven jobs for seven 1-row results. This
    * is the pattern to copy instead: one single-pass aggregate over the
    * (sliced) fact, one over dim_client, cross-joined into a single
    * 1-row collect.
    */
  final case class CartesKpi(
      caTotal: BigDecimal,
      nbPaiements: Long,
      panierMoyen: BigDecimal,
      clientsActifs: Long,
      nbClients: Long,
      nbVilles: Long,
      nbPays: Long)

  def cartesKpi(spark: SparkSession, f: DataFrame): CartesKpi = {
    val fAgg = f.agg(
      sum(col("montant")).as("ca_total"),
      count(lit(1)).as("nb_paiements"),
      countDistinct(col("client_key")).as("clients_actifs"))
    val cAgg = spark.table("dim_client").agg(
      count(lit(1)).as("nb_clients"),
      countDistinct(col("ville")).as("nb_villes"),
      countDistinct(col("pays")).as("nb_pays"))
    val r = fAgg.crossJoin(cAgg).collect().head
    val ca = BigDecimal(r.getDecimal(0))
    val n = r.getLong(1)
    CartesKpi(
      caTotal = ca,
      nbPaiements = n,
      panierMoyen = (ca / n).setScale(2, BigDecimal.RoundingMode.HALF_UP),
      clientsActifs = r.getLong(2),
      nbClients = r.getLong(3),
      nbVilles = r.getLong(4),
      nbPays = r.getLong(5))
  }

  def caTotal(f: DataFrame): BigDecimal = dec(f.agg(sum(col("montant"))))
  def nbPaiements(f: DataFrame): Long = f.count()
  def panierMoyen(f: DataFrame): BigDecimal =
    (caTotal(f) / nbPaiements(f)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
  def clientsActifs(f: DataFrame): Long =
    f.agg(countDistinct(col("client_key"))).collect().head.getLong(0)

  def nbMagasins(spark: SparkSession): Long = spark.table("dim_magasin").count()
  def nbClients(spark: SparkSession): Long = spark.table("dim_client").count()
  def nbVilles(spark: SparkSession): Long =
    spark.table("dim_client").agg(countDistinct(col("ville"))).collect().head.getLong(0)
  def nbPays(spark: SparkSession): Long =
    spark.table("dim_client").agg(countDistinct(col("pays"))).collect().head.getLong(0)
  def nbFilms(spark: SparkSession): Long = spark.table("dim_film").count()

  // -- Pareto measures (W4) ----------------------------------------------

  /** Per-category CA with running cumulative and cumulative share,
    * categories ordered by CA desc (the page-3 combo chart).
    */
  def caCumulCategories(spark: SparkSession, f: DataFrame): DataFrame = {
    val byCat = f
      .join(broadcast(spark.table("dim_categorie")), Seq("categorie_key"))
      .groupBy(col("nom_categorie"))
      .agg(sum(col("montant")).as("ca"))
    val w = Window.orderBy(col("ca").desc, col("nom_categorie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy()
    byCat
      .withColumn("ca_cumul", sum(col("ca")).over(w))
      .withColumn("pct_cumul",
        (sum(col("ca")).over(w).cast(DoubleType) / sum(col("ca")).over(wTot).cast(DoubleType)))
      .orderBy(col("ca").desc, col("nom_categorie"))
  }

  /** Per-category CA with an optional visual-level measure filter
    * (SURVEY §2.2 P12: the pbix "[CA Total] > x" filters — applied
    * AFTER aggregation, unlike slicers).
    */
  def caParCategorie(spark: SparkSession, f: DataFrame, minCa: Option[BigDecimal] = None): DataFrame = {
    val agg = f
      .join(broadcast(spark.table("dim_categorie")), Seq("categorie_key"))
      .groupBy(col("nom_categorie"))
      .agg(sum(col("montant")).as("ca"))
    minCa.fold(agg)(m => agg.filter(col("ca") > lit(m.bigDecimal)))
      .orderBy(col("ca").desc, col("nom_categorie"))
  }

  /** Page-1 box-and-whisker (powerbi/film_powerbi.pdf p.1, SURVEY §2.10
    * model artifacts): quartiles of DAILY CA by `dim_date.Jour_semaine`.
    * Two hash aggregates — daily CA on the fact's date grain, then the
    * five-number summary per weekday (never a per-payment percentile:
    * the visual's population is days, not payments).
    */
  def caQuartilesJourSemaine(spark: SparkSession, f: DataFrame): DataFrame = {
    val daily = f
      .join(
        broadcast(spark.table("dim_date").select(col("date_key"), col("jour_semaine"), col("nom_jour"))),
        Seq("date_key"))
      .groupBy(col("date_key"), col("jour_semaine"), col("nom_jour"))
      .agg(sum(col("montant")).cast(DoubleType).as("ca_jour"))
    daily
      .groupBy(col("jour_semaine"), col("nom_jour"))
      .agg(
        count(lit(1)).as("n_jours"),
        min(col("ca_jour")).as("ca_min"),
        expr("percentile(ca_jour, 0.25)").as("q1"),
        expr("percentile(ca_jour, 0.5)").as("mediane"),
        expr("percentile(ca_jour, 0.75)").as("q3"),
        max(col("ca_jour")).as("ca_max")
      )
      .orderBy(col("jour_semaine"))
  }

  // -- top-1 label cards (W5) --------------------------------------------

  private def top1(df: DataFrame, label: Column, ca: Column): (String, BigDecimal) = {
    val r = df.orderBy(ca.desc, label).limit(1).select(label, ca).collect().head
    (r.getString(0), BigDecimal(r.getDecimal(1)))
  }

  def filmTop(spark: SparkSession, f: DataFrame): String = {
    val (t, ca) = top1(
      f.join(broadcast(spark.table("dim_film").select(col("film_key"), col("titre_film"))), Seq("film_key"))
        .groupBy(col("titre_film")).agg(sum(col("montant")).as("ca")),
      col("titre_film"), col("ca"))
    s"$t $$${frMoney(ca)}"
  }

  def clientTop(spark: SparkSession, f: DataFrame): String = {
    val (n, ca) = top1(
      f.join(broadcast(spark.table("dim_client").select(col("client_key"), col("nom_client"))), Seq("client_key"))
        .groupBy(col("nom_client")).agg(sum(col("montant")).as("ca")),
      col("nom_client"), col("ca"))
    s"$n $$${frMoney(ca)}"
  }

  def moisRecord(spark: SparkSession, f: DataFrame): String = {
    val r = f
      .join(broadcast(spark.table("dim_date").select(col("date_key"), col("debut_mois"))), Seq("date_key"))
      .groupBy(col("debut_mois")).agg(sum(col("montant")).as("ca"))
      .orderBy(col("ca").desc, col("debut_mois")).limit(1)
      .collect().head
    val d = r.getDate(0).toLocalDate
    s"${moisFr(d.getMonthValue)} ${d.getYear} $$${frMoney(BigDecimal(r.getDecimal(1)))}"
  }

  def anneeRecord(spark: SparkSession, f: DataFrame): String = {
    val r = f
      .join(broadcast(spark.table("dim_date").select(col("date_key"), col("annee"))), Seq("date_key"))
      .groupBy(col("annee")).agg(sum(col("montant")).as("ca"))
      .orderBy(col("ca").desc, col("annee")).limit(1)
      .collect().head
    val entier = BigDecimal(r.getDecimal(1)).setScale(0, BigDecimal.RoundingMode.HALF_UP)
    s"${r.getInt(0)} — ${frInt(entier)} $$"
  }

  def topCategorie(spark: SparkSession, f: DataFrame): String = {
    val (c, ca) = top1(
      f.join(broadcast(spark.table("dim_categorie")), Seq("categorie_key"))
        .groupBy(col("nom_categorie")).agg(sum(col("montant")).as("ca")),
      col("nom_categorie"), col("ca"))
    s"$c $$${frMoney(ca)}"
  }

  // -- helpers ------------------------------------------------------------

  private def dec(df: DataFrame): BigDecimal = BigDecimal(df.collect().head.getDecimal(0))

  private val moisFrNoms = Array("janvier", "février", "mars", "avril", "mai", "juin",
    "juillet", "août", "septembre", "octobre", "novembre", "décembre")
  def moisFr(m: Int): String = moisFrNoms(m - 1)

  /** French money rendering: space thousands, comma decimals (11 413,88). */
  def frMoney(x: BigDecimal): String = {
    val s = x.setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val Array(ent, decp) = s.split("\\.")
    frGroup(ent) + "," + decp
  }
  def frInt(x: BigDecimal): String = frGroup(x.toBigInt.toString)
  private def frGroup(digits: String): String =
    digits.reverse.grouped(3).mkString(" ").reverse
}
