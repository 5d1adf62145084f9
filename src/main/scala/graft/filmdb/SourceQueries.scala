package graft.filmdb

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's 9 source-schema analytic queries
  * (sql/source_filmdb/requetes_clees.sql) over the registered source
  * views (SourceViews.register first). Spark-dialect adjustments only:
  * casts spelled CAST, interval day extraction via epoch difference;
  * shapes (bounds CTEs, LEFT-join null buckets, HAVING) kept as-is.
  */
object SourceQueries {

  def run(spark: SparkSession, name: String): DataFrame = spark.sql(sql(name))

  def names: Seq[String] = ordered.map(_._1)

  def sql(name: String): String =
    ordered.toMap.getOrElse(name, sys.error(s"unknown source query: $name"))

  private val borne = """
    WITH borne AS (
      SELECT CAST(MIN(payment_date) AS DATE) AS d_debut,
             CAST(MAX(payment_date) AS DATE) AS d_fin
      FROM payment
    )"""

  private val retard =
    "GREATEST(FLOOR((unix_timestamp(r.return_date) - unix_timestamp(r.rental_date)) / 86400) - f.rental_duration, 0)"

  private val ordered: Seq[(String, String)] = Seq(
    // requetes_clees.sql:1-21 — KPI by store and month
    "kpi_magasin_mois" -> s"""$borne
      SELECT s.store_id,
             DATE_TRUNC('month', p.payment_date) AS mois,
             COUNT(DISTINCT r.rental_id) AS nb_locations,
             CAST(SUM(p.amount) AS DECIMAL(10,2)) AS ca,
             CAST(SUM(p.amount) / NULLIF(COUNT(DISTINCT r.rental_id), 0) AS DECIMAL(10,2)) AS panier_moyen
      FROM payment p
      LEFT JOIN rental r ON r.rental_id = p.rental_id
      JOIN staff st ON st.staff_id = p.staff_id
      JOIN store s ON s.store_id = st.store_id
      JOIN borne b ON CAST(p.payment_date AS DATE) BETWEEN b.d_debut AND b.d_fin
      GROUP BY s.store_id, DATE_TRUNC('month', p.payment_date)
      ORDER BY s.store_id, mois""",
    // :25-44 — top categories (LEFT joins + HAVING SUM IS NOT NULL)
    "top_categories" -> s"""$borne
      SELECT c.name AS categorie,
             CAST(SUM(p.amount) AS DECIMAL(10,2)) AS ca,
             COUNT(DISTINCT r.rental_id) AS nb_locations
      FROM payment p
      LEFT JOIN rental r ON r.rental_id = p.rental_id
      LEFT JOIN inventory i ON i.inventory_id = r.inventory_id
      LEFT JOIN film f ON f.film_id = i.film_id
      LEFT JOIN film_category fc ON fc.film_id = f.film_id
      LEFT JOIN category c ON c.category_id = fc.category_id
      JOIN borne b ON CAST(p.payment_date AS DATE) BETWEEN b.d_debut AND b.d_fin
      GROUP BY c.name
      HAVING SUM(p.amount) IS NOT NULL
      ORDER BY ca DESC
      LIMIT 10""",
    // :47-63 — top 10 films
    "top_films" -> s"""$borne
      SELECT f.film_id, f.title,
             CAST(SUM(p.amount) AS DECIMAL(10,2)) AS ca,
             COUNT(*) AS nb_paiements
      FROM payment p
      LEFT JOIN rental r ON r.rental_id = p.rental_id
      LEFT JOIN inventory i ON i.inventory_id = r.inventory_id
      LEFT JOIN film f ON f.film_id = i.film_id
      JOIN borne b ON CAST(p.payment_date AS DATE) BETWEEN b.d_debut AND b.d_fin
      GROUP BY f.film_id, f.title
      HAVING SUM(p.amount) IS NOT NULL
      ORDER BY ca DESC
      LIMIT 10""",
    // :66-74 — mean lateness per store
    "retard_par_magasin" -> s"""
      SELECT s.store_id,
             CAST(AVG($retard) AS DECIMAL(10,2)) AS retard_moy_jours
      FROM rental r
      JOIN inventory i ON i.inventory_id = r.inventory_id
      JOIN film f ON f.film_id = i.film_id
      JOIN store s ON s.store_id = i.store_id
      WHERE r.return_date IS NOT NULL
      GROUP BY s.store_id
      ORDER BY s.store_id""",
    // :79-99 — loyal customers
    "clients_fideles" -> s"""$borne
      SELECT c.customer_id,
             c.first_name || ' ' || c.last_name AS client,
             COUNT(DISTINCT r.rental_id) AS nb_locations,
             CAST(SUM(p.amount) AS DECIMAL(10,2)) AS ca
      FROM customer c
      JOIN rental r ON r.customer_id = c.customer_id
      JOIN payment p ON p.rental_id = r.rental_id
      JOIN borne b ON CAST(p.payment_date AS DATE) BETWEEN b.d_debut AND b.d_fin
      GROUP BY c.customer_id, client
      HAVING COUNT(DISTINCT r.rental_id) >= 5
      ORDER BY nb_locations DESC, ca DESC
      LIMIT 20""",
    // :103-120 — stock rotation
    "rotation_stock" -> """
      WITH loc AS (
        SELECT i.film_id, COUNT(*) AS nb_loc
        FROM rental r JOIN inventory i ON i.inventory_id = r.inventory_id
        GROUP BY i.film_id
      ),
      ex AS (SELECT film_id, COUNT(*) AS nb_ex FROM inventory GROUP BY film_id)
      SELECT f.film_id, f.title,
             COALESCE(loc.nb_loc, 0) AS nb_locations,
             ex.nb_ex,
             CAST(COALESCE(loc.nb_loc, 0) / NULLIF(ex.nb_ex, 0) AS DECIMAL(10,2)) AS rotation_par_exemplaire
      FROM film f
      LEFT JOIN loc ON loc.film_id = f.film_id
      LEFT JOIN ex ON ex.film_id = f.film_id
      ORDER BY rotation_par_exemplaire DESC NULLS LAST
      LIMIT 20""",
    // :124-145 — theoretical availability per store
    "disponibilite_stock" -> """
      WITH out_now AS (
        SELECT i.store_id, COUNT(*) AS nb_sortis
        FROM inventory i JOIN rental r ON r.inventory_id = i.inventory_id
        WHERE r.return_date IS NULL
        GROUP BY i.store_id
      ),
      tot AS (SELECT store_id, COUNT(*) AS nb_total FROM inventory GROUP BY store_id)
      SELECT s.store_id, tot.nb_total,
             COALESCE(out_now.nb_sortis, 0) AS nb_en_cours,
             (tot.nb_total - COALESCE(out_now.nb_sortis, 0)) AS nb_disponibles
      FROM store s
      JOIN tot ON tot.store_id = s.store_id
      LEFT JOIN out_now ON out_now.store_id = s.store_id
      ORDER BY s.store_id""",
    // :149-156 — never-rented films
    "films_jamais_loues" -> """
      SELECT f.film_id, f.title
      FROM film f
      LEFT JOIN inventory i ON i.film_id = f.film_id
      LEFT JOIN rental r ON r.inventory_id = i.inventory_id
      GROUP BY f.film_id, f.title
      HAVING COUNT(r.rental_id) = 0
      ORDER BY f.title""",
    // :160-173 — store x category heatmap
    "ca_magasin_categorie" -> """
      SELECT s.store_id, c.name AS categorie,
             CAST(SUM(p.amount) AS DECIMAL(10,2)) AS ca
      FROM payment p
      JOIN rental r ON r.rental_id = p.rental_id
      JOIN inventory i ON i.inventory_id = r.inventory_id
      JOIN store s ON s.store_id = i.store_id
      JOIN film f ON f.film_id = i.film_id
      JOIN film_category fc ON fc.film_id = f.film_id
      JOIN category c ON c.category_id = fc.category_id
      GROUP BY s.store_id, c.name
      ORDER BY s.store_id, ca DESC""",
    // :179-190 — at-risk customers
    "clients_a_risque" -> s"""
      SELECT c.customer_id,
             c.first_name || ' ' || c.last_name AS client,
             CAST(AVG($retard) AS DECIMAL(10,2)) AS retard_moy,
             COUNT(*) AS nb_locations
      FROM customer c
      JOIN rental r ON r.customer_id = c.customer_id
      JOIN inventory i ON i.inventory_id = r.inventory_id
      JOIN film f ON f.film_id = i.film_id
      WHERE r.return_date IS NOT NULL
      GROUP BY c.customer_id, client
      HAVING COUNT(*) >= 5
      ORDER BY retard_moy DESC, nb_locations DESC
      LIMIT 20"""
  )
}
