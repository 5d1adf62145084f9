package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Star-schema warehouse build (SURVEY §1.4, §3.2): dimension tables with
  * deterministic surrogate keys, a smart-keyed date dimension, and the
  * fact table resolving business keys to surrogates — the reference's
  * dblink ETL re-expressed as a DAG of DataFrame definitions (lazy
  * evaluation gives the dependency ordering the SQL script hand-rolls).
  *
  * Surrogate keys use row_number() over the business key — deterministic
  * across runs (monotonically_increasing_id is not, and would break
  * golden tests; SURVEY §1.1). The global window is fine for dimension
  * cardinality; a billion-row fact key would switch to
  * zipWithIndex-style per-partition offsets.
  */
object Star {

  /** yyyymmdd smart key (SURVEY §2.8, insertion_dataware.sql:27). */
  def smartDateKey(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast(IntegerType)

  /** Dense calendar dimension spanning the fact's date range (S5 +
    * dim_date shape: annee/trimestre/mois/jour + period starts).
    */
  def dimDate(orders: DataFrame): DataFrame = {
    val spine = orders
      .agg(to_date(min(col("o_orderdate"))).as("d0"), to_date(max(col("o_orderdate"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("jour"))
    spine.select(
      smartDateKey(col("jour")).as("date_key"),
      col("jour"),
      year(col("jour")).as("annee"),
      quarter(col("jour")).as("trimestre"),
      month(col("jour")).as("mois"),
      dayofmonth(col("jour")).as("jour_mois"),
      date_trunc("month", col("jour")).cast(DateType).as("debut_mois"),
      date_trunc("quarter", col("jour")).cast(DateType).as("debut_trimestre"),
      date_trunc("year", col("jour")).cast(DateType).as("debut_annee")
    )
  }

  /** Denormalized customer dimension (dim_client shape: customer +
    * geography flattened, surrogate key over the business key).
    */
  def dimCustomer(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val joined = customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
    joined.select(
      row_number().over(Window.orderBy(col("c_custkey"))).cast(LongType).as("client_key"),
      col("c_custkey").as("source_client_id"),
      col("c_name").as("nom_client"),
      initcap(col("n_name")).as("nation"),
      initcap(col("r_name")).as("region"),
      col("c_acctbal").cast(DecimalType(12, 2)).cast(DoubleType).as("solde")
    )
  }

  /** Fact table: orders resolved to surrogate keys via business-key
    * lookups (J8 smart key + J9 dimension lookup). Dimension joins
    * broadcast — the fact side streams, dims stay small.
    */
  def factOrders(orders: DataFrame, dimClient: DataFrame): DataFrame =
    orders
      .join(
        broadcast(dimClient.select(col("client_key"), col("source_client_id"))),
        orders("o_custkey") === col("source_client_id")
      )
      .select(
        col("o_orderkey").as("source_commande_id"),
        smartDateKey(col("o_orderdate")).as("date_key"),
        col("client_key"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast(DoubleType).as("montant"),
        col("o_orderstatus").as("statut")
      )
}
