package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.filmdb.FilmDb

/** The parity tier (SURVEY §5, BASELINE.md): the reference's OWN dataset
  * — loaded from its pg_dump through the PgCopy parser — must reproduce
  * the dashboard's published numbers exactly. Money stays DecimalType
  * end-to-end; month bucketing follows the source's Europe/Paris
  * timestamps (SURVEY §7.5 item 2).
  */
class FilmDbGoldenSpec extends SparkSpec {

  private def t(name: String): DataFrame = FilmDb.table(spark, name)
  private lazy val payment = t("payment").cache()

  private def money(df: DataFrame, col0: String = "ca"): BigDecimal =
    BigDecimal(df.collect().head.getDecimal(df.columns.indexOf(col0)))

  test("CA total 67 416,51 over 16 049 payments, panier moyen 4,20") {
    val row = payment
      .agg(sum(col("amount")).as("ca"), count(lit(1)).as("n"))
      .collect().head
    assert(BigDecimal(row.getDecimal(0)) == BigDecimal("67416.51"))
    assert(row.getLong(1) == 16049L)
    val panier = row.getDecimal(0).doubleValue() / row.getLong(1)
    assert(math.abs(panier - 4.2007) < 0.0001)
  }

  test("per-store split via staff: store 1 = 33 489,47 / 8 057; store 2 = 33 927,04 / 7 992") {
    val got = payment
      .join(broadcast(t("staff").select(col("staff_id"), col("store_id"))), Seq("staff_id"))
      .groupBy(col("store_id"))
      .agg(sum(col("amount")).as("ca"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> ((BigDecimal(r.getDecimal(1)), r.getLong(2))))
      .toMap
    assert(got(1) == ((BigDecimal("33489.47"), 8057L)))
    assert(got(2) == ((BigDecimal("33927.04"), 7992L)))
  }

  test("record month: mars 2022 = 11 413,88 under Europe/Paris bucketing") {
    val monthly = payment
      .groupBy(
        date_trunc("month", from_utc_timestamp(col("payment_date"), "Europe/Paris"))
          .cast(DateType).as("mois")
      )
      .agg(sum(col("amount")).as("ca"))
      .orderBy(col("ca").desc)
      .collect()
    assert(monthly.head.getDate(0).toString == "2022-03-01")
    assert(BigDecimal(monthly.head.getDecimal(1)) == BigDecimal("11413.88"))
    assert(monthly.length == 7, "7 monthly partitions -> 7 months")
  }

  test("weekday box-whisker: quartiles of daily CA by Jour_semaine (pdf p.1)") {
    // Golden computed INDEPENDENTLY from the pg_dump COPY rows (python:
    // daily sums over the Paris-local date, percentile_cont quartiles) —
    // not from this engine. 186 days, total cross-checked to 67 416,51.
    graft.filmdb.Warehouse.build(spark)
    val got = graft.filmdb.Mesures
      .caQuartilesJourSemaine(spark, spark.table("fact_paiement"))
      .collect()
      .map(r => r.getInt(0) -> r)
      .toMap
    assert(got.keySet == (1 to 7).toSet)
    assert(got(1).getString(1) == "lundi" && got(7).getString(1) == "dimanche")
    assert(got.values.map(_.getLong(2)).sum == 186L, "186 distinct payment days")
    // five-number summary, spot-pinned per weekday (2-decimal exact ends,
    // interpolated quartiles to 1e-4)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-4
    assert(close(got(1).getDouble(3), 270.30) && close(got(1).getDouble(7), 418.96))
    assert(close(got(1).getDouble(4), 331.2050) && close(got(1).getDouble(5), 364.13) &&
      close(got(1).getDouble(6), 395.0550), "lundi q1/med/q3")
    assert(close(got(3).getDouble(5), 344.24), "mercredi median")
    assert(close(got(4).getDouble(4), 333.6975) && close(got(4).getDouble(6), 397.3325),
      "jeudi interpolated quartiles (n=26)")
    assert(close(got(5).getDouble(3), 309.32) && close(got(5).getDouble(7), 509.98),
      "vendredi min/max")
    assert(close(got(7).getDouble(3), 160.61) && close(got(7).getDouble(5), 348.08),
      "dimanche min/median")
  }

  test("top film: TELEGRAPH VOYAGE = 231,73") {
    val top = payment
      .join(t("rental").select(col("rental_id"), col("inventory_id")), Seq("rental_id"))
      .join(broadcast(t("inventory").select(col("inventory_id"), col("film_id"))), Seq("inventory_id"))
      .join(broadcast(t("film").select(col("film_id"), col("title"))), Seq("film_id"))
      .groupBy(col("title"))
      .agg(sum(col("amount")).as("ca"))
      .orderBy(col("ca").desc, col("title"))
      .limit(1)
      .collect().head
    assert(top.getString(0) == "TELEGRAPH VOYAGE")
    assert(BigDecimal(top.getDecimal(1)) == BigDecimal("231.73"))
  }

  test("top client: KARL SEAL = 221,55") {
    val top = payment
      .join(broadcast(t("customer").select(col("customer_id"), col("first_name"), col("last_name"))),
        Seq("customer_id"))
      .groupBy(concat_ws(" ", col("first_name"), col("last_name")).as("client"))
      .agg(sum(col("amount")).as("ca"))
      .orderBy(col("ca").desc, col("client"))
      .limit(1)
      .collect().head
    assert(top.getString(0) == "KARL SEAL")
    assert(BigDecimal(top.getDecimal(1)) == BigDecimal("221.55"))
  }

  test("distinct-count KPI cards: 599 clients actifs, 1000 films, 597 villes, 108 pays") {
    assert(payment.select(countDistinct(col("customer_id"))).collect().head.getLong(0) == 599L)
    assert(t("film").count() == 1000L)
    val geo = t("customer")
      .join(t("address"), Seq("address_id"))
      .join(t("city"), Seq("city_id"))
      .join(t("country"), Seq("country_id"))
      .agg(countDistinct(col("city")).as("villes"), countDistinct(col("country")).as("pays"))
      .collect().head
    assert(geo.getLong(0) == 597L)
    assert(geo.getLong(1) == 108L)
  }

  test("all 16 per-category CA values match the dashboard treemap") {
    val expected = Map(
      "Sports" -> "5314.21", "Sci-Fi" -> "4756.98", "Animation" -> "4656.30",
      "Drama" -> "4587.39", "Comedy" -> "4383.58", "Action" -> "4375.85",
      "New" -> "4361.57", "Games" -> "4281.33", "Foreign" -> "4270.67",
      "Family" -> "4226.07", "Documentary" -> "4217.52", "Horror" -> "3722.54",
      "Children" -> "3655.55", "Classics" -> "3639.59", "Travel" -> "3549.64",
      "Music" -> "3417.72"
    ).map { case (k, v) => k -> BigDecimal(v) }
    // principal category per film = MIN(name) (SURVEY §2.4 A6); each film
    // has exactly one category in this dataset, so the pick is total
    val principal = t("film_category")
      .join(broadcast(t("category").select(col("category_id"), col("name"))), Seq("category_id"))
      .groupBy(col("film_id"))
      .agg(min(col("name")).as("categorie"))
    val got = payment
      .join(t("rental").select(col("rental_id"), col("inventory_id")), Seq("rental_id"))
      .join(broadcast(t("inventory").select(col("inventory_id"), col("film_id"))), Seq("inventory_id"))
      .join(broadcast(principal), Seq("film_id"))
      .groupBy(col("categorie"))
      .agg(sum(col("amount")).as("ca"))
      .collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1)))
      .toMap
    assert(got == expected)
  }

  test("open rentals: 183 with NULL return_date of 16 044") {
    val r = t("rental")
    assert(r.count() == 16044L)
    assert(r.filter(col("return_date").isNull).count() == 183L)
  }

  test("film array column: all 1000 special_features arrays parse non-empty") {
    val f = t("film")
    assert(f.filter(size(col("special_features")) > 0).count() == 1000L)
    assert(f.filter(col("original_language_id").isNull).count() == 1000L, "all-null FK column survives")
  }
}
