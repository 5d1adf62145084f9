package graft.views

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Views as the query API (SURVEY §2.1 S6, §3.1): the reference's stable
  * surface is 20+3 CREATE VIEW statements that PG inlines at query time.
  * Spark's analyzer does the same with temp views — this registers the
  * base tables and a layered analytic-view stack (view-on-view, so the
  * inlining path §3.1 step 2 is exercised), making the whole engine
  * queryable through `spark.sql`.
  */
object Views {

  /** Register base tables + analytic views for `dir`. Idempotent. */
  def register(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
      "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")

    // Layer 1: the denormalized fact view (reference v_fait_paiement shape)
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW v_fait_commandes AS
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderstatus,
             c_name, n_name, r_name
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    """)
    // Layer 2: KPI views defined ON the layer-1 view (view inlining)
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW v_kpi_nation_mois AS
      SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca,
             COUNT(*) AS n_commandes
      FROM v_fait_commandes
      GROUP BY n_name, CAST(date_trunc('month', o_orderdate) AS DATE)
    """)
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW v_top_clients AS
      SELECT c_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca,
             COUNT(*) AS n_commandes
      FROM v_fait_commandes
      GROUP BY c_name
    """)
  }
}
