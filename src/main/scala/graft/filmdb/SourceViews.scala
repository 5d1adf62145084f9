package graft.filmdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's 20 analytic views (sql/vues.sql) re-expressed over
  * the loaded filmdb tables and registered as temp views — the engine's
  * SQL surface for reference users (SURVEY §2.1 S6).
  *
  * Conventions:
  *   - Source timestamps register pre-shifted to Europe/Paris local time
  *     (psql rendered them that way), so `CAST(ts AS DATE)` and
  *     `DATE_TRUNC` match the reference (SURVEY §7.5 item 2).
  *   - STRING_AGG order is unspecified in PG; here sort-normalized
  *     (array_join(array_sort(collect_list(...)))) — documented
  *     deviation (SURVEY §7.5 item 5).
  *   - Interval day extraction: EXTRACT(DAY FROM ts-ts) becomes
  *     floor(epoch-diff / 86400) (SURVEY §2.8).
  */
object SourceViews {

  private def local(c: org.apache.spark.sql.Column) = from_utc_timestamp(c, "Europe/Paris")

  /** Register the 15 source tables (timezone-localized) + all 20 views. */
  def register(spark: SparkSession): Unit = {
    FilmDb.schemas.keys.foreach { t =>
      val df = FilmDb.table(spark, t)
      val localized = t match {
        case "payment" => df.withColumn("payment_date", local(col("payment_date")))
        case "rental" =>
          df.withColumn("rental_date", local(col("rental_date")))
            .withColumn("return_date", local(col("return_date")))
        case _ => df
      }
      localized.createOrReplaceTempView(t)
    }
    viewSql.foreach { case (_, sql) => spark.sql(sql) }
  }

  def view(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** name -> CREATE statement, in dependency order (vues.sql:2-315). */
  val viewSql: Seq[(String, String)] = Seq(
    // vues.sql:2 — nested two-level STRING_AGG decomposed (SURVEY A10)
    "v_infos_acteurs" -> """
      CREATE OR REPLACE TEMP VIEW v_infos_acteurs AS
      WITH par_cat AS (
        SELECT fa.actor_id, c.category_id, c.name AS categorie,
               array_join(array_sort(collect_list(f.title)), ', ') AS films
        FROM film f
        JOIN film_category fc ON f.film_id = fc.film_id
        JOIN category c ON c.category_id = fc.category_id
        JOIN film_actor fa ON f.film_id = fa.film_id
        GROUP BY fa.actor_id, c.category_id, c.name
      )
      SELECT a.actor_id AS acteur_id, a.first_name AS prenom, a.last_name AS nom,
             array_join(array_sort(collect_set(pc.categorie || ': ' || pc.films)), ' | ') AS films_par_categorie
      FROM actor a
      LEFT JOIN par_cat pc ON pc.actor_id = a.actor_id
      GROUP BY a.actor_id, a.first_name, a.last_name
    """,
    // vues.sql:22
    "v_liste_films" -> """
      CREATE OR REPLACE TEMP VIEW v_liste_films AS
      SELECT f.film_id, f.title AS titre, f.description, c.name AS categorie,
             f.rental_rate AS prix_location, f.length AS duree_minutes,
             f.rating AS classification,
             array_join(array_sort(collect_list(a.first_name || ' ' || a.last_name)), ', ') AS acteurs
      FROM category c
      LEFT JOIN film_category fc ON c.category_id = fc.category_id
      LEFT JOIN film f ON fc.film_id = f.film_id
      JOIN film_actor fa ON f.film_id = fa.film_id
      JOIN actor a ON fa.actor_id = a.actor_id
      GROUP BY f.film_id, f.title, f.description, c.name, f.rental_rate, f.length, f.rating
    """,
    // vues.sql:41
    "v_liste_films_noms_formates" -> """
      CREATE OR REPLACE TEMP VIEW v_liste_films_noms_formates AS
      SELECT f.film_id, f.title AS titre, f.description, c.name AS categorie,
             f.rental_rate AS prix_location, f.length AS duree_minutes,
             f.rating AS classification,
             array_join(array_sort(collect_list(initcap(a.first_name) || ' ' || initcap(a.last_name))), ', ') AS acteurs
      FROM category c
      LEFT JOIN film_category fc ON c.category_id = fc.category_id
      LEFT JOIN film f ON fc.film_id = f.film_id
      JOIN film_actor fa ON f.film_id = fa.film_id
      JOIN actor a ON fa.actor_id = a.actor_id
      GROUP BY f.film_id, f.title, f.description, c.name, f.rental_rate, f.length, f.rating
    """,
    // vues.sql:62
    "v_ventes_par_categorie" -> """
      CREATE OR REPLACE TEMP VIEW v_ventes_par_categorie AS
      SELECT c.name AS categorie, SUM(p.amount) AS total_ventes
      FROM payment p
      JOIN rental r ON p.rental_id = r.rental_id
      JOIN inventory i ON r.inventory_id = i.inventory_id
      JOIN film f ON i.film_id = f.film_id
      JOIN film_category fc ON f.film_id = fc.film_id
      JOIN category c ON fc.category_id = c.category_id
      GROUP BY c.name
      ORDER BY total_ventes DESC
    """,
    // vues.sql:77
    "v_ventes_par_magasin" -> """
      CREATE OR REPLACE TEMP VIEW v_ventes_par_magasin AS
      SELECT (ci.city || ', ' || co.country) AS magasin,
             (m.first_name || ' ' || m.last_name) AS manager,
             SUM(p.amount) AS total_ventes
      FROM payment p
      JOIN rental r ON p.rental_id = r.rental_id
      JOIN inventory i ON r.inventory_id = i.inventory_id
      JOIN store s ON i.store_id = s.store_id
      JOIN address a ON s.address_id = a.address_id
      JOIN city ci ON a.city_id = ci.city_id
      JOIN country co ON ci.country_id = co.country_id
      JOIN staff m ON s.manager_staff_id = m.staff_id
      GROUP BY co.country, ci.city, s.store_id, m.first_name, m.last_name
      ORDER BY co.country, ci.city
    """,
    // vues.sql:95
    "v_liste_personnel" -> """
      CREATE OR REPLACE TEMP VIEW v_liste_personnel AS
      SELECT s.staff_id AS id_personnel,
             (s.first_name || ' ' || s.last_name) AS nom_complet,
             a.address AS adresse, a.postal_code AS code_postal, a.phone AS telephone,
             ci.city AS ville, co.country AS pays, s.store_id AS magasin_id
      FROM staff s
      JOIN address a ON s.address_id = a.address_id
      JOIN city ci ON a.city_id = ci.city_id
      JOIN country co ON ci.country_id = co.country_id
    """,
    // vues.sql:114 — generate_series -> explode(sequence)
    "v_calendrier" -> """
      CREATE OR REPLACE TEMP VIEW v_calendrier AS
      WITH b AS (
        SELECT CAST(MIN(payment_date) AS DATE) AS d_min,
               CAST(MAX(payment_date) AS DATE) AS d_max
        FROM payment
      )
      SELECT gs AS date,
             CAST(EXTRACT(YEAR FROM gs) AS INT) AS annee,
             CAST(EXTRACT(QUARTER FROM gs) AS INT) AS trimestre,
             CAST(EXTRACT(MONTH FROM gs) AS INT) AS mois,
             CAST(EXTRACT(DAY FROM gs) AS INT) AS jour,
             CAST(DATE_TRUNC('month', gs) AS DATE) AS debut_mois,
             CAST(DATE_TRUNC('quarter', gs) AS DATE) AS debut_trimestre,
             CAST(DATE_TRUNC('year', gs) AS DATE) AS debut_annee
      FROM b LATERAL VIEW explode(sequence(b.d_min, b.d_max, interval 1 day)) AS gs
    """,
    // vues.sql:131
    "v_fait_paiement" -> """
      CREATE OR REPLACE TEMP VIEW v_fait_paiement AS
      SELECT p.payment_id AS paiement_id, p.amount AS montant,
             p.payment_date AS date_paiement,
             r.rental_id AS location_id, s.store_id AS magasin_id,
             st.staff_id AS employe_id, c.customer_id AS client_id,
             (c.first_name || ' ' || c.last_name) AS nom_client,
             i.inventory_id AS inventaire_id, f.film_id,
             f.title AS titre_film, cat.category_id AS categorie_id,
             cat.name AS nom_categorie
      FROM payment p
      LEFT JOIN rental r ON r.rental_id = p.rental_id
      LEFT JOIN staff st ON st.staff_id = p.staff_id
      LEFT JOIN store s ON s.store_id = st.store_id
      LEFT JOIN customer c ON c.customer_id = p.customer_id
      LEFT JOIN inventory i ON i.inventory_id = r.inventory_id
      LEFT JOIN film f ON f.film_id = i.film_id
      LEFT JOIN film_category fc ON fc.film_id = f.film_id
      LEFT JOIN category cat ON cat.category_id = fc.category_id
    """,
    // vues.sql:157
    "v_kpi_magasin_mois" -> """
      CREATE OR REPLACE TEMP VIEW v_kpi_magasin_mois AS
      SELECT magasin_id,
             CAST(DATE_TRUNC('month', date_paiement) AS DATE) AS mois,
             COUNT(DISTINCT location_id) AS nb_locations,
             CAST(SUM(montant) AS DECIMAL(12,2)) AS ca,
             CAST(SUM(montant) / NULLIF(COUNT(DISTINCT location_id), 0) AS DECIMAL(12,2)) AS panier_moyen
      FROM v_fait_paiement
      GROUP BY magasin_id, DATE_TRUNC('month', date_paiement)
      ORDER BY magasin_id, mois
    """,
    // vues.sql:169
    "v_kpi_categorie_mois" -> """
      CREATE OR REPLACE TEMP VIEW v_kpi_categorie_mois AS
      SELECT categorie_id, nom_categorie,
             CAST(DATE_TRUNC('month', date_paiement) AS DATE) AS mois,
             CAST(SUM(montant) AS DECIMAL(12,2)) AS ca,
             COUNT(DISTINCT location_id) AS nb_locations
      FROM v_fait_paiement
      GROUP BY categorie_id, nom_categorie, DATE_TRUNC('month', date_paiement)
      ORDER BY mois, ca DESC
    """,
    // vues.sql:181
    "v_revenu_film_mois" -> """
      CREATE OR REPLACE TEMP VIEW v_revenu_film_mois AS
      SELECT film_id, titre_film,
             CAST(DATE_TRUNC('month', date_paiement) AS DATE) AS mois,
             CAST(SUM(montant) AS DECIMAL(12,2)) AS ca,
             COUNT(*) AS nb_paiements
      FROM v_fait_paiement
      GROUP BY film_id, titre_film, DATE_TRUNC('month', date_paiement)
    """,
    // vues.sql:191
    "v_revenu_film_total" -> """
      CREATE OR REPLACE TEMP VIEW v_revenu_film_total AS
      SELECT film_id, titre_film,
             CAST(SUM(montant) AS DECIMAL(12,2)) AS ca_total,
             COUNT(*) AS nb_paiements
      FROM v_fait_paiement
      GROUP BY film_id, titre_film
      ORDER BY ca_total DESC
    """,
    // vues.sql:202
    "v_valeur_client" -> """
      CREATE OR REPLACE TEMP VIEW v_valeur_client AS
      SELECT client_id, nom_client,
             COUNT(DISTINCT location_id) AS nb_locations,
             CAST(SUM(montant) AS DECIMAL(12,2)) AS ca_total,
             CAST(MIN(date_paiement) AS DATE) AS premiere_achat,
             CAST(MAX(date_paiement) AS DATE) AS dernier_achat
      FROM v_fait_paiement
      GROUP BY client_id, nom_client
      ORDER BY nb_locations DESC, ca_total DESC
    """,
    // vues.sql:217 — EXTRACT(DAY FROM interval) -> floor(epoch diff / 86400)
    "v_retard_location" -> """
      CREATE OR REPLACE TEMP VIEW v_retard_location AS
      SELECT r.rental_id AS location_id, r.customer_id AS client_id,
             r.staff_id AS employe_id, i.store_id AS magasin_id,
             r.rental_date AS date_location, r.return_date AS date_retour,
             f.rental_duration AS duree_location_jours,
             CAST(GREATEST(FLOOR((unix_timestamp(r.return_date) - unix_timestamp(r.rental_date)) / 86400) - f.rental_duration, 0) AS INT) AS retard_jours
      FROM rental r
      JOIN inventory i ON i.inventory_id = r.inventory_id
      JOIN film f ON f.film_id = i.film_id
      WHERE r.return_date IS NOT NULL
    """,
    // vues.sql:232 — exact percentile (SURVEY A8)
    "v_retard_par_magasin" -> """
      CREATE OR REPLACE TEMP VIEW v_retard_par_magasin AS
      SELECT magasin_id,
             CAST(AVG(retard_jours) AS DECIMAL(10,2)) AS retard_moyen_jours,
             percentile(retard_jours, 0.5) AS retard_median_jours,
             COUNT(*) AS nb_locations
      FROM v_retard_location
      GROUP BY magasin_id
      ORDER BY magasin_id
    """,
    // vues.sql:241
    "v_retard_par_client" -> """
      CREATE OR REPLACE TEMP VIEW v_retard_par_client AS
      SELECT client_id,
             CAST(AVG(retard_jours) AS DECIMAL(10,2)) AS retard_moyen_jours,
             COUNT(*) AS nb_locations
      FROM v_retard_location
      GROUP BY client_id
      HAVING COUNT(*) >= 5
      ORDER BY retard_moyen_jours DESC
    """,
    // vues.sql:253
    "v_inventaire_magasin" -> """
      CREATE OR REPLACE TEMP VIEW v_inventaire_magasin AS
      SELECT s.store_id AS magasin_id, f.film_id, f.title AS titre_film, COUNT(*) AS exemplaires
      FROM inventory i
      JOIN store s ON s.store_id = i.store_id
      JOIN film f ON f.film_id = i.film_id
      GROUP BY s.store_id, f.film_id, f.title
    """,
    // vues.sql:260
    "v_disponibilite_stock" -> """
      CREATE OR REPLACE TEMP VIEW v_disponibilite_stock AS
      WITH en_cours AS (
        SELECT i.store_id AS magasin_id, COUNT(*) AS nb_en_cours
        FROM inventory i
        JOIN rental r ON r.inventory_id = i.inventory_id
        WHERE r.return_date IS NULL
        GROUP BY i.store_id
      ),
      tot AS (
        SELECT store_id AS magasin_id, COUNT(*) AS nb_total
        FROM inventory GROUP BY store_id
      )
      SELECT t.magasin_id, t.nb_total,
             COALESCE(e.nb_en_cours, 0) AS nb_en_cours,
             (t.nb_total - COALESCE(e.nb_en_cours, 0)) AS nb_disponibles
      FROM tot t LEFT JOIN en_cours e ON e.magasin_id = t.magasin_id
      ORDER BY t.magasin_id
    """,
    // vues.sql:284
    "v_rotation_stock" -> """
      CREATE OR REPLACE TEMP VIEW v_rotation_stock AS
      WITH loc AS (
        SELECT i.film_id, COUNT(*) AS nb_locations
        FROM rental r JOIN inventory i ON i.inventory_id = r.inventory_id
        GROUP BY i.film_id
      ),
      ex AS (SELECT film_id, COUNT(*) AS nb_ex FROM inventory GROUP BY film_id)
      SELECT f.film_id, f.title AS titre_film,
             COALESCE(loc.nb_locations, 0) AS nb_locations,
             ex.nb_ex,
             CAST(COALESCE(loc.nb_locations, 0) / NULLIF(ex.nb_ex, 0) AS DECIMAL(10,2)) AS rotation_par_exemplaire
      FROM film f
      LEFT JOIN loc ON loc.film_id = f.film_id
      LEFT JOIN ex ON ex.film_id = f.film_id
      ORDER BY rotation_par_exemplaire DESC NULLS LAST
    """,
    // vues.sql:308
    "v_films_jamais_loues" -> """
      CREATE OR REPLACE TEMP VIEW v_films_jamais_loues AS
      SELECT f.film_id, f.title AS titre_film
      FROM film f
      LEFT JOIN inventory i ON i.film_id = f.film_id
      LEFT JOIN rental r ON r.inventory_id = i.inventory_id
      GROUP BY f.film_id, f.title
      HAVING COUNT(r.rental_id) = 0
      ORDER BY titre_film
    """
  )
}
