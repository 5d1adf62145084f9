package graft.filmdb

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's 12 warehouse analytic queries + 3 pre-aggregation
  * views (sql/datawarehouse/requetes_clees.sql) over the star schema
  * built by Warehouse.build (temp views dim_* / fact_paiement).
  * Spark-dialect adjustments: `::` casts → CAST, AGE() → months_between
  * over month starts, INTERVAL '11 months' → add_months,
  * TO_CHAR 'Mon YYYY' → date_format 'MMM yyyy'.
  */
object DwQueries {

  def run(spark: SparkSession, name: String): DataFrame = spark.sql(sql(name))

  def names: Seq[String] = ordered.map(_._1)

  def sql(name: String): String =
    ordered.toMap.getOrElse(name, sys.error(s"unknown DW query: $name"))

  /** Register the 3 pre-aggregation views (requetes_clees.sql:270-316). */
  def registerAggViews(spark: SparkSession): Unit = {
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW v_agg_mensuel_magasin AS
      SELECT m.magasin_key,
             CAST(date_trunc('month', d.date) AS DATE) AS mois,
             CAST(SUM(f.montant) AS DECIMAL(14,2)) AS ca,
             COUNT(DISTINCT f.source_paiement_id) AS nb_paiements,
             CAST(CAST(EXTRACT(YEAR FROM d.date) AS INT)*10000 + CAST(EXTRACT(MONTH FROM d.date) AS INT)*100 + 1 AS INT) AS date_key_mois
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      LEFT JOIN dim_magasin m ON m.magasin_key = f.magasin_key
      GROUP BY m.magasin_key, date_trunc('month', d.date),
               CAST(CAST(EXTRACT(YEAR FROM d.date) AS INT)*10000 + CAST(EXTRACT(MONTH FROM d.date) AS INT)*100 + 1 AS INT)
    """)
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW v_agg_mensuel_categorie AS
      SELECT c.categorie_key,
             CAST(date_trunc('month', d.date) AS DATE) AS mois,
             CAST(SUM(f.montant) AS DECIMAL(14,2)) AS ca,
             COUNT(DISTINCT f.source_paiement_id) AS nb_paiements,
             CAST(CAST(EXTRACT(YEAR FROM d.date) AS INT)*10000 + CAST(EXTRACT(MONTH FROM d.date) AS INT)*100 + 1 AS INT) AS date_key_mois
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      LEFT JOIN dim_categorie c ON c.categorie_key = f.categorie_key
      GROUP BY c.categorie_key, date_trunc('month', d.date),
               CAST(CAST(EXTRACT(YEAR FROM d.date) AS INT)*10000 + CAST(EXTRACT(MONTH FROM d.date) AS INT)*100 + 1 AS INT)
    """)
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW v_dim_mois AS
      SELECT DISTINCT
             CAST(date_trunc('month', date) AS DATE) AS mois,
             CAST(annee*10000 + mois*100 + 1 AS INT) AS date_key_mois,
             annee,
             mois AS mois_num,
             CAST(EXTRACT(QUARTER FROM date) AS INT) AS trimestre,
             date_format(date_trunc('month', date), 'MMM yyyy') AS libelle_mois
      FROM dim_date
    """)
  }

  private val ordered: Seq[(String, String)] = Seq(
    // requetes_clees.sql:1-14
    "dw1_kpi_magasin_mois" -> """
      SELECT COALESCE(m.source_magasin_id, -1) AS magasin_id,
             CAST(DATE_TRUNC('month', d.date) AS DATE) AS mois,
             COUNT(DISTINCT f.source_paiement_id) AS nb_paiements,
             CAST(SUM(f.montant) AS DECIMAL(12,2)) AS ca,
             CAST(SUM(f.montant) / NULLIF(COUNT(DISTINCT f.source_paiement_id), 0) AS DECIMAL(12,2)) AS panier_moyen
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      LEFT JOIN dim_magasin m ON m.magasin_key = f.magasin_key
      GROUP BY COALESCE(m.source_magasin_id, -1), DATE_TRUNC('month', d.date)
      ORDER BY magasin_id, mois""",
    // :21-33
    "dw2_top_categories" -> """
      SELECT COALESCE(c.nom_categorie, 'Inconnu') AS nom_categorie,
             CAST(SUM(f.montant) AS DECIMAL(12,2)) AS ca,
             COUNT(DISTINCT f.source_paiement_id) AS nb_paiements
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      LEFT JOIN dim_categorie c ON c.categorie_key = f.categorie_key
      GROUP BY COALESCE(c.nom_categorie, 'Inconnu')
      HAVING SUM(f.montant) IS NOT NULL
      ORDER BY ca DESC
      LIMIT 10""",
    // :39-51
    "dw3_top_films" -> """
      SELECT COALESCE(fi.titre_film, 'Inconnu') AS titre_film,
             CAST(SUM(f.montant) AS DECIMAL(12,2)) AS ca,
             COUNT(*) AS nb_paiements
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      LEFT JOIN dim_film fi ON fi.film_key = f.film_key
      GROUP BY COALESCE(fi.titre_film, 'Inconnu')
      HAVING SUM(f.montant) IS NOT NULL
      ORDER BY ca DESC
      LIMIT 10""",
    // :57-69
    "dw4_clients_fideles" -> """
      SELECT c.source_client_id AS client_id, c.nom_client,
             COUNT(DISTINCT f.source_paiement_id) AS nb_paiements,
             CAST(SUM(f.montant) AS DECIMAL(12,2)) AS ca
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      JOIN dim_client c ON c.client_key = f.client_key
      GROUP BY c.source_client_id, c.nom_client
      HAVING COUNT(DISTINCT f.source_paiement_id) >= 3
      ORDER BY nb_paiements DESC, ca DESC
      LIMIT 50""",
    // :76-103 — INTERVAL '11 months' → add_months
    "dw5_nouveaux_vs_recurrents" -> """
      WITH ref AS (
        SELECT MAX(d.date) AS maxd
        FROM fact_paiement f JOIN dim_date d ON d.date_key = f.date_key
      ),
      premier_achat AS (
        SELECT c.client_key, MIN(d.date) AS first_purchase
        FROM fact_paiement f
        JOIN dim_date d ON d.date_key = f.date_key
        JOIN dim_client c ON c.client_key = f.client_key
        GROUP BY c.client_key
      ),
      periode AS (
        SELECT f.*, d.date
        FROM fact_paiement f
        JOIN dim_date d ON d.date_key = f.date_key
        JOIN ref r ON TRUE
        WHERE d.date BETWEEN CAST(add_months(date_trunc('month', r.maxd), -11) AS DATE) AND r.maxd
      )
      SELECT CASE WHEN p.first_purchase BETWEEN CAST(add_months(date_trunc('month', r.maxd), -11) AS DATE) AND r.maxd
                  THEN 'Nouveau' ELSE 'Récurrent' END AS segment,
             COUNT(DISTINCT pr.source_paiement_id) AS nb_paiements,
             CAST(SUM(pr.montant) AS DECIMAL(12,2)) AS ca
      FROM periode pr
      JOIN premier_achat p ON p.client_key = pr.client_key
      JOIN ref r ON TRUE
      GROUP BY 1
      ORDER BY segment""",
    // :110-117
    "dw6_tendance_mensuelle" -> """
      SELECT CAST(DATE_TRUNC('month', d.date) AS DATE) AS mois,
             CAST(SUM(f.montant) AS DECIMAL(12,2)) AS ca_total
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      GROUP BY DATE_TRUNC('month', d.date)
      ORDER BY mois""",
    // :124-135
    "dw7_heatmap_magasin_categorie" -> """
      SELECT COALESCE(m.source_magasin_id, -1) AS magasin_id,
             COALESCE(c.nom_categorie, 'Inconnu') AS nom_categorie,
             CAST(SUM(f.montant) AS DECIMAL(12,2)) AS ca
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      LEFT JOIN dim_magasin m ON m.magasin_key = f.magasin_key
      LEFT JOIN dim_categorie c ON c.categorie_key = f.categorie_key
      GROUP BY COALESCE(m.source_magasin_id, -1), COALESCE(c.nom_categorie, 'Inconnu')
      ORDER BY magasin_id, ca DESC""",
    // :143-166 — AGE() months → months_between of month starts
    "dw8_cohortes" -> """
      WITH first_buy AS (
        SELECT c.client_key, CAST(DATE_TRUNC('month', MIN(d.date)) AS DATE) AS mois_cohort
        FROM fact_paiement f
        JOIN dim_date d ON d.date_key = f.date_key
        JOIN dim_client c ON c.client_key = f.client_key
        GROUP BY c.client_key
      ),
      activity AS (
        SELECT c.client_key, CAST(DATE_TRUNC('month', d.date) AS DATE) AS mois_activite
        FROM fact_paiement f
        JOIN dim_date d ON d.date_key = f.date_key
        JOIN dim_client c ON c.client_key = f.client_key
      )
      SELECT fb.mois_cohort, a.mois_activite,
             CAST(months_between(a.mois_activite, fb.mois_cohort) AS BIGINT) AS mois_depuis_acquisition,
             COUNT(DISTINCT a.client_key) AS clients_actifs
      FROM first_buy fb
      JOIN activity a ON a.client_key = fb.client_key
      GROUP BY fb.mois_cohort, a.mois_activite
      ORDER BY fb.mois_cohort, a.mois_activite""",
    // :171-196 — recency interval → datediff days
    "dw9_rfm" -> """
      WITH ref AS (
        SELECT MAX(d.date) AS d_ref
        FROM fact_paiement f JOIN dim_date d ON d.date_key = f.date_key
      ),
      base AS (
        SELECT c.client_key, MAX(d.date) AS last_purchase,
               COUNT(DISTINCT f.source_paiement_id) AS freq,
               SUM(f.montant) AS monetary
        FROM fact_paiement f
        JOIN dim_date d ON d.date_key = f.date_key
        JOIN dim_client c ON c.client_key = f.client_key
        GROUP BY c.client_key
      ),
      rfm AS (
        SELECT b.*, datediff((SELECT d_ref FROM ref), b.last_purchase) AS recency_interval
        FROM base b
      )
      SELECT client_key,
             NTILE(5) OVER (ORDER BY recency_interval DESC) AS R_score,
             NTILE(5) OVER (ORDER BY freq ASC) AS F_score,
             NTILE(5) OVER (ORDER BY monetary ASC) AS M_score
      FROM rfm""",
    // :201-224
    "dw10_jours_anormaux" -> """
      WITH daily AS (
        SELECT d.date, SUM(f.montant) AS ca_jour
        FROM fact_paiement f
        JOIN dim_date d ON d.date_key = f.date_key
        GROUP BY d.date
      ),
      stats AS (SELECT AVG(ca_jour) AS mu, STDDEV_POP(ca_jour) AS sigma FROM daily)
      SELECT *
      FROM (
        SELECT dy.date, dy.ca_jour,
               CASE WHEN st.sigma = 0 THEN 0
                    ELSE (dy.ca_jour - st.mu) / st.sigma END AS zscore
        FROM daily dy CROSS JOIN stats st
        WHERE st.sigma > 0
      ) t
      ORDER BY ABS(t.zscore) DESC
      LIMIT 30""",
    // :230-250
    "dw11_croissance" -> """
      WITH m AS (
        SELECT CAST(DATE_TRUNC('month', d.date) AS DATE) AS mois, SUM(f.montant) AS ca
        FROM fact_paiement f JOIN dim_date d ON d.date_key = f.date_key
        GROUP BY DATE_TRUNC('month', d.date)
      )
      SELECT m1.mois, m1.ca AS ca_mois,
             (m1.ca - LAG(m1.ca) OVER (ORDER BY m1.mois)) AS var_mom,
             CASE WHEN LAG(m1.ca) OVER (ORDER BY m1.mois) = 0 THEN NULL
                  ELSE (m1.ca - LAG(m1.ca) OVER (ORDER BY m1.mois)) / LAG(m1.ca) OVER (ORDER BY m1.mois)
             END AS pct_mom,
             (m1.ca - LAG(m1.ca, 12) OVER (ORDER BY m1.mois)) AS var_yoy,
             CASE WHEN LAG(m1.ca, 12) OVER (ORDER BY m1.mois) = 0 THEN NULL
                  ELSE (m1.ca - LAG(m1.ca, 12) OVER (ORDER BY m1.mois)) / LAG(m1.ca, 12) OVER (ORDER BY m1.mois)
             END AS pct_yoy
      FROM m m1
      ORDER BY m1.mois""",
    // :256-268 — rolling 30 ROWS over un-aggregated fact grain (W3:
    // reproduce exactly, resist rangeBetween)
    "dw12_ca_roulant_30j" -> """
      SELECT m.source_magasin_id AS magasin_id, d.date,
             CAST(SUM(f.montant) OVER (
               PARTITION BY m.source_magasin_id
               ORDER BY d.date
               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW
             ) AS DECIMAL(14,2)) AS ca_rolling_30j
      FROM fact_paiement f
      JOIN dim_date d ON d.date_key = f.date_key
      LEFT JOIN dim_magasin m ON m.magasin_key = f.magasin_key
      ORDER BY magasin_id, d.date"""
  )
}
