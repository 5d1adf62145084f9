package graft.filmdb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's star-schema warehouse ETL re-expressed Spark-first
  * (sql/datawarehouse/insertion_dataware.sql — dblink pulls become
  * DataFrame reads, ON CONFLICT upserts become full recomputes since the
  * source is the system of record; SURVEY §3.2).
  *
  * Surrogate keys: PG identity columns depend on insertion order; here
  * row_number() over the business key — deterministic across runs
  * (SURVEY §1.1). All `::date` truncations follow the source's
  * Europe/Paris session timezone (SURVEY §7.5 item 2).
  */
object Warehouse {

  /** payment_date::date as PG computed it (Europe/Paris session TZ). */
  def localDate(ts: Column): Column = to_date(from_utc_timestamp(ts, "Europe/Paris"))
  def localMonth(d: Column): Column = date_trunc("month", d).cast(DateType)
  def smartKey(d: Column): Column =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast(IntegerType)

  /** dim_date: dense spine over payment date bounds
    * (insertion_dataware.sql:20-37).
    */
  def dimDate(spark: SparkSession): DataFrame = {
    val p = FilmDb.table(spark, "payment")
    p.agg(min(localDate(col("payment_date"))).as("d0"), max(localDate(col("payment_date"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("date"))
      .select(
        smartKey(col("date")).as("date_key"),
        col("date"),
        year(col("date")).as("annee"),
        quarter(col("date")).as("trimestre"),
        month(col("date")).as("mois"),
        dayofmonth(col("date")).as("jour"),
        // Jour_semaine: the pbix computed column behind the page-1
        // box-and-whisker (quartiles of daily CA by weekday). ISO
        // numbering (1=lundi..7=dimanche) + French label, locale-free.
        (weekday(col("date")) + 1).as("jour_semaine"),
        element_at(
          array(Seq("lundi", "mardi", "mercredi", "jeudi", "vendredi", "samedi", "dimanche").map(lit): _*),
          weekday(col("date")) + 1
        ).as("nom_jour"),
        date_trunc("month", col("date")).cast(DateType).as("debut_mois"),
        date_trunc("quarter", col("date")).cast(DateType).as("debut_trimestre"),
        date_trunc("year", col("date")).cast(DateType).as("debut_annee")
      )
  }

  /** dim_categorie (insertion_dataware.sql:42-48). */
  def dimCategorie(spark: SparkSession): DataFrame =
    FilmDb
      .table(spark, "category")
      .select(
        row_number().over(Window.orderBy(col("category_id"))).as("categorie_key"),
        col("category_id").as("source_categorie_id"),
        col("name").as("nom_categorie")
      )

  /** dim_client: customer + geography (insertion_dataware.sql:53-80). */
  def dimClient(spark: SparkSession): DataFrame =
    FilmDb
      .table(spark, "customer")
      .join(FilmDb.table(spark, "address"), Seq("address_id"))
      .join(FilmDb.table(spark, "city"), Seq("city_id"))
      .join(FilmDb.table(spark, "country"), Seq("country_id"))
      .select(
        row_number().over(Window.orderBy(col("customer_id"))).as("client_key"),
        col("customer_id").as("source_client_id"),
        concat_ws(" ", col("first_name"), col("last_name")).as("nom_client"),
        col("email"),
        col("address").as("adresse"),
        col("city").as("ville"),
        col("country").as("pays"),
        col("create_date").as("date_inscription"),
        col("activebool").as("actif")
      )

  /** dim_magasin: store + manager + geo (insertion_dataware.sql:86-104). */
  def dimMagasin(spark: SparkSession): DataFrame =
    FilmDb
      .table(spark, "store")
      .join(
        FilmDb.table(spark, "staff").select(col("staff_id").as("manager_staff_id"),
          col("first_name"), col("last_name")),
        Seq("manager_staff_id")
      )
      .join(FilmDb.table(spark, "address"), Seq("address_id"))
      .join(FilmDb.table(spark, "city"), Seq("city_id"))
      .join(FilmDb.table(spark, "country"), Seq("country_id"))
      .select(
        row_number().over(Window.orderBy(col("store_id"))).as("magasin_key"),
        col("store_id").as("source_magasin_id"),
        concat_ws(" ", col("first_name"), col("last_name")).as("manager"),
        col("address").as("adresse"),
        col("city").as("ville"),
        col("country").as("pays")
      )

  /** dim_film with principal category = MIN(name) per film
    * (insertion_dataware.sql:107-143, SURVEY §2.4 A6; J9 name lookup).
    */
  def dimFilm(spark: SparkSession): DataFrame = {
    val principale = FilmDb
      .table(spark, "film_category")
      .join(FilmDb.table(spark, "category"), Seq("category_id"))
      .groupBy(col("film_id"))
      .agg(min(col("name")).as("categorie_principale"))
    FilmDb
      .table(spark, "film")
      .join(principale, Seq("film_id"), "left")
      .join(
        broadcast(dimCategorie(spark).select(col("categorie_key"), col("nom_categorie"))),
        col("nom_categorie") === col("categorie_principale"),
        "left"
      )
      .select(
        row_number().over(Window.orderBy(col("film_id"))).as("film_key"),
        col("film_id").as("source_film_id"),
        col("title").as("titre_film"),
        col("length").cast(IntegerType).as("duree_minutes"),
        col("rental_rate").cast(DecimalType(6, 2)).as("prix_location"),
        col("rating").as("classification"),
        col("categorie_key")
      )
  }

  /** fact_paiement: grain = one payment; business keys resolved to
    * surrogates, smart date key (insertion_dataware.sql:151-192).
    */
  def factPaiement(spark: SparkSession): DataFrame = {
    val p = FilmDb.table(spark, "payment")
    val base = p
      .join(FilmDb.table(spark, "rental").select(col("rental_id"), col("inventory_id")), Seq("rental_id"))
      .join(broadcast(FilmDb.table(spark, "inventory").select(col("inventory_id"), col("film_id"))), Seq("inventory_id"))
      .join(broadcast(FilmDb.table(spark, "staff").select(col("staff_id"), col("store_id"))), Seq("staff_id"))
      .select(
        col("payment_id").as("source_paiement_id"),
        localDate(col("payment_date")).as("d"),
        col("amount").cast(DecimalType(12, 2)).as("montant"),
        col("store_id").as("source_magasin_id"),
        col("customer_id").as("source_client_id"),
        col("film_id").as("source_film_id")
      )
    base
      .join(broadcast(dimMagasin(spark).select(col("magasin_key"), col("source_magasin_id"))), Seq("source_magasin_id"), "left")
      .join(broadcast(dimClient(spark).select(col("client_key"), col("source_client_id"))), Seq("source_client_id"), "left")
      .join(broadcast(dimFilm(spark).select(col("film_key"), col("categorie_key"), col("source_film_id"))), Seq("source_film_id"), "left")
      .select(
        col("source_paiement_id"),
        smartKey(col("d")).as("date_key"),
        col("magasin_key"),
        col("client_key"),
        col("film_key"),
        col("categorie_key"),
        col("montant")
      )
  }

  /** All six tables, dependency-ordered, cached (ETL §3.2 load order —
    * lazy Spark evaluation makes ordering implicit; cache because every
    * DW query fans out from fact + dims).
    */
  def build(spark: SparkSession): Map[String, DataFrame] = {
    val tables = Map(
      "dim_date" -> dimDate(spark),
      "dim_categorie" -> dimCategorie(spark),
      "dim_client" -> dimClient(spark),
      "dim_magasin" -> dimMagasin(spark),
      "dim_film" -> dimFilm(spark),
      "fact_paiement" -> factPaiement(spark)
    ).map { case (k, v) => k -> v.cache() }
    tables.foreach { case (k, v) => v.createOrReplaceTempView(k) }
    tables
  }
}
