package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Relational operator catalog over the synthetic TPC-H-ish tables.
  *
  * Each query re-expresses one operator family from SURVEY.md §2 (the
  * reference's analytic-SQL surface: star joins, left-join+HAVING, anti
  * joins, bounds CTEs, date spines, smart keys, windows, rollups, top-k,
  * string_agg, z-scores, RFM ntiles) Spark-first on the driver fixture.
  *
  * Scale notes are inline per query: every join states its broadcast side,
  * every global window its partitioning caveat.
  */
object RelationalQueries {

  /** Exact money arithmetic: 2-decimal doubles -> DECIMAL(12,2). */
  private def m(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rates (discount/tax, 2 decimals in [0,1]). */
  private def r(c: Column): Column = c.cast(DecimalType(4, 2))
  private def dbl(c: Column): Column = c.cast(DoubleType)

  // ---------------------------------------------------------------------
  // q01 — grouped multi-measure aggregation (SURVEY §2.4 A1/A2/A11, §2.6 O5)
  // Reference shape: requetes_clees.sql CA-per-group blocks. Map-side
  // partial aggregation (HashAggregate partial/final) keeps the shuffle to
  // |groups| rows — scales to 100 TB untouched.
  // ---------------------------------------------------------------------
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dbl(sum(m($"l_quantity"))).as("sum_qty"),
        dbl(sum(m($"l_extendedprice"))).as("sum_base_price"),
        dbl(sum(m($"l_extendedprice") * (lit(1) - r($"l_discount")))).as("sum_disc_price"),
        dbl(sum(m($"l_extendedprice") * (lit(1) - r($"l_discount")) * (lit(1) + r($"l_tax"))))
          .as("sum_charge"),
        count(lit(1)).as("count_order")
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q02 — inner equi-join chain, 5 tables (SURVEY §2.3 J1, star shape J4).
  // lineitem is the fact; orders co-shuffles on the join key; customer/
  // nation/region are dims and broadcast (explicit hint = deterministic
  // plan at any scale; dims stay small while the fact grows).
  // ---------------------------------------------------------------------
  private def q02(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val rg = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(rg), n("n_regionkey") === rg("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(
        dbl(sum(m($"l_extendedprice") * (lit(1) - r($"l_discount")))).as("revenue"),
        count(lit(1)).as("n_lines")
      )
      .orderBy($"r_name", $"n_name")
  }
  private val q02Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q03 — top-k by measure with total-order tiebreak (SURVEY §2.6 O1/O2/O3).
  // Catalyst plans TakeOrderedAndProject: per-partition top-k then a
  // k-row merge on the driver — no global sort even at 100 TB.
  // ---------------------------------------------------------------------
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"c_custkey", $"c_name")
      .agg(dbl(sum(m($"o_totalprice"))).as("ca"), count(lit(1)).as("n_orders"))
      .orderBy($"ca".desc, $"c_custkey".asc)
      .limit(10)
  }
  private val q03Sql =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY ca DESC, c_custkey ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // q04 — LEFT join + HAVING SUM(...) IS NOT NULL (SURVEY §2.3 J2, §2.2 P9,
  // §7.5 item 6): groups made only of unmatched left rows aggregate to a
  // NULL sum and must be dropped — the exact null-bucket semantics of the
  // reference's category query.
  // ---------------------------------------------------------------------
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
      .groupBy($"n_name")
      .agg(dbl(sum(m($"c_acctbal"))).as("total_bal"), count($"c_custkey").as("n_cust"))
      .filter($"total_bal".isNotNull) // HAVING SUM(...) IS NOT NULL (cast keeps nulls)
      .orderBy($"n_name")
  }
  private val q04Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
      |  COUNT(c_custkey) AS n_cust
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |HAVING SUM(CAST(c_acctbal AS DECIMAL(12,2))) IS NOT NULL
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q05 — anti join: customers that never ordered (SURVEY §2.3 J3).
  // Spark-first: left_anti (planned as BroadcastHashJoin/SMJ anti — no
  // wide aggregate needed); the oracle keeps the reference's
  // LEFT-JOIN + HAVING COUNT(...)=0 formulation. Same result set.
  // ---------------------------------------------------------------------
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
  private val q05Sql =
    """SELECT c_custkey, c_name
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |HAVING COUNT(o_orderkey) = 0
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q06 — date bounds from a 1-row aggregate CTE, BETWEEN range join
  // (SURVEY §2.3 J6, §2.2 P8, §2.4 A5). The scalar bounds row broadcasts;
  // Catalyst plans BroadcastNestedLoopJoin — constant-size build side, so
  // the pattern is scale-safe even though it is semantically a no-op filter.
  // ---------------------------------------------------------------------
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val bounds = o.agg(
      to_date(min($"o_orderdate")).as("d0"),
      to_date(max($"o_orderdate")).as("d1")
    )
    o.crossJoin(broadcast(bounds))
      .filter(to_date($"o_orderdate").between($"d0", $"d1"))
      .groupBy(date_trunc("month", $"o_orderdate").cast(DateType).as("mois"))
      .agg(dbl(sum(m($"o_totalprice"))).as("ca"), count(lit(1)).as("n_orders"))
      .orderBy($"mois")
  }
  private val q06Sql =
    """WITH borne AS (
      |  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0, CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders
      |)
      |SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN borne ON CAST(o_orderdate AS DATE) BETWEEN d0 AND d1
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q07 — revenue share vs a cross-joined scalar total (SURVEY §2.3 J7).
  // Share is computed as double/double of two exact decimal sums: decimal
  // division scale rules differ across engines, double division does not.
  // ---------------------------------------------------------------------
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val byNation = o
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name")
      .agg(sum(m($"o_totalprice")).as("ca_dec"))
    val total = byNation.agg(sum($"ca_dec").as("total_dec"))
    byNation
      .crossJoin(broadcast(total))
      .select(
        $"n_name",
        dbl($"ca_dec").as("ca"),
        (dbl($"ca_dec") / dbl($"total_dec")).as("share")
      )
      .orderBy($"n_name")
  }
  private val q07Sql =
    """WITH par_nation AS (
      |  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS ca_dec
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name
      |), tot AS (SELECT SUM(ca_dec) AS total_dec FROM par_nation)
      |SELECT n_name, CAST(ca_dec AS DOUBLE) AS ca,
      |  CAST(ca_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) AS share
      |FROM par_nation CROSS JOIN tot
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q08 — smart yyyymmdd date key (SURVEY §2.3 J8, §2.8): the warehouse's
  // dim_date surrogate, computed as year*10000+month*100+day. Pure
  // arithmetic on the scan — stays inside WholeStageCodegen.
  // ---------------------------------------------------------------------
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .orders(spark, dir)
      .withColumn(
        "date_key",
        (year($"o_orderdate") * 10000 + month($"o_orderdate") * 100 +
          dayofmonth($"o_orderdate")).cast(LongType)
      )
      .groupBy($"date_key")
      .agg(dbl(sum(m($"o_totalprice"))).as("ca"), count(lit(1)).as("n_orders"))
      .orderBy($"date_key")
  }
  private val q08Sql =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate)*10000 + EXTRACT(MONTH FROM o_orderdate)*100 + EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS date_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q09 — dense calendar spine via sequence+explode (SURVEY §2.1 S5), LEFT
  // join to daily aggregates, COALESCE zero-fill (§2.2 P3). The spine is a
  // Generator over a 1-row aggregate — identical shape to the reference's
  // generate_series dim_date build.
  // ---------------------------------------------------------------------
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val spine = o
      .agg(to_date(min($"o_orderdate")).as("d0"), to_date(max($"o_orderdate")).as("d1"))
      .select(explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("jour"))
    val daily = o
      .groupBy(to_date($"o_orderdate").as("jour"))
      .agg(count(lit(1)).as("n_raw"), sum(m($"o_totalprice")).as("ca_dec"))
    spine
      .join(daily, Seq("jour"), "left")
      .select(
        $"jour",
        coalesce($"n_raw", lit(0L)).as("n_orders"),
        coalesce(dbl($"ca_dec"), lit(0.0)).as("ca")
      )
      .orderBy($"jour")
  }
  private val q09Sql =
    """WITH RECURSIVE spine(jour) AS (
      |  SELECT CAST(MIN(o_orderdate) AS DATE) FROM orders
      |  UNION ALL
      |  SELECT CAST(jour + INTERVAL 1 DAY AS DATE) FROM spine
      |  WHERE jour < (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)
      |), daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS jour, COUNT(*) AS n_raw,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS ca_dec
      |  FROM orders GROUP BY 1
      |)
      |SELECT s.jour, COALESCE(n_raw, 0) AS n_orders,
      |       COALESCE(CAST(ca_dec AS DOUBLE), 0.0) AS ca
      |FROM spine s LEFT JOIN daily d ON s.jour = d.jour
      |ORDER BY s.jour""".stripMargin

  // ---------------------------------------------------------------------
  // q10 — exact COUNT(DISTINCT) per group (SURVEY §2.4 A3). Catalyst
  // expands to a two-phase aggregate; exact (not approx_) because the
  // reference's golden numbers are exact counts.
  // ---------------------------------------------------------------------
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name")
      .agg(
        countDistinct($"o_custkey").as("clients_actifs"),
        count($"o_orderkey").as("n_orders")
      )
      .orderBy($"n_name")
  }
  private val q10Sql =
    """SELECT n_name, COUNT(DISTINCT o_custkey) AS clients_actifs, COUNT(o_orderkey) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q11 — global scalar KPI row (SURVEY §2.4 A5/A11, §2.10 measures): the
  // dashboard's card measures in one pass (CA total / nb paiements /
  // panier moyen analogues).
  // ---------------------------------------------------------------------
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .orders(spark, dir)
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_clients"),
        to_date(min($"o_orderdate")).as("premiere_commande"),
        to_date(max($"o_orderdate")).as("derniere_commande"),
        dbl(sum(m($"o_totalprice"))).as("ca_total"),
        (dbl(sum(m($"o_totalprice"))) / count(lit(1))).as("panier_moyen")
      )
  }
  private val q11Sql =
    """SELECT COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_clients,
      |  CAST(MIN(o_orderdate) AS DATE) AS premiere_commande,
      |  CAST(MAX(o_orderdate) AS DATE) AS derniere_commande,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca_total,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS panier_moyen
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------------
  // q12 — CASE WHEN segmentation + per-segment stats (SURVEY §2.2 P5, §2.4
  // A4): the reference's "Nouveau vs Récurrent" split done via CASE, not
  // set ops.
  // ---------------------------------------------------------------------
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .orders(spark, dir)
      .withColumn(
        "segment",
        when($"o_totalprice" < 50000.0, "small")
          .when($"o_totalprice" < 150000.0, "medium")
          .otherwise("large")
      )
      .groupBy($"segment")
      .agg(
        count(lit(1)).as("n_orders"),
        dbl(sum(m($"o_totalprice"))).as("ca"),
        (dbl(sum(m($"o_totalprice"))) / count(lit(1))).as("panier_moyen")
      )
      .orderBy($"segment")
  }
  private val q12Sql =
    """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
      |            WHEN o_totalprice < 150000.0 THEN 'medium'
      |            ELSE 'large' END AS segment,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS panier_moyen
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q13 — exact percentiles (SURVEY §2.4 A8: PERCENTILE_CONT equivalent).
  // Spark's `percentile` is the exact interpolating aggregate (the approx_
  // variant would break oracle parity). l_quantity is integer-valued so
  // the 0.25/0.5/0.75 interpolation is exact in both engines.
  // ---------------------------------------------------------------------
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("mediane"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        count(lit(1)).as("n")
      )
      .orderBy($"l_returnflag")
  }
  private val q13Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5)  AS mediane,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q14 — daily z-score outliers (SURVEY §2.4 A7/A12, §2.3 J7, §2.2 P10,
  // §2.6 O4): aggregate-of-aggregate with STDDEV_POP semantics. Mean and
  // sigma are derived from exact decimal sums (sum, sum of squares) so
  // both engines compute identical doubles; built-in stddev_pop would be
  // evaluation-order-dependent on doubles.
  // ---------------------------------------------------------------------
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .groupBy(to_date($"o_orderdate").as("jour"))
      .agg(sum(m($"o_totalprice")).cast(DecimalType(15, 2)).as("ca_dec"))
    val stats = daily.agg(
      sum($"ca_dec").as("s1"),
      sum($"ca_dec" * $"ca_dec").as("s2"),
      count(lit(1)).as("n")
    )
    daily
      .crossJoin(broadcast(stats))
      .withColumn("moyenne", dbl($"s1") / $"n")
      .withColumn("sigma", sqrt(dbl($"s2") / $"n" - (dbl($"s1") / $"n") * (dbl($"s1") / $"n")))
      .filter($"sigma" > 0)
      // Rounded to 9 decimals: the sum-of-squares decimal→double cast
      // double-rounds in DuckDB (int128 then scale) — ~1e-15 relative noise.
      .select(
        $"jour",
        dbl($"ca_dec").as("ca"),
        round((dbl($"ca_dec") - $"moyenne") / $"sigma", 9).as("zscore")
      )
      .orderBy(abs($"zscore").desc, $"jour")
      .limit(20)
  }
  private val q14Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS jour,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(15,2)) AS ca_dec
      |  FROM orders GROUP BY 1
      |), stats AS (
      |  SELECT SUM(ca_dec) AS s1, SUM(ca_dec * ca_dec) AS s2, COUNT(*) AS n FROM daily
      |)
      |SELECT jour, CAST(ca_dec AS DOUBLE) AS ca,
      |  ROUND((CAST(ca_dec AS DOUBLE) - CAST(s1 AS DOUBLE)/n)
      |    / sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n) * (CAST(s1 AS DOUBLE)/n)), 9) AS zscore
      |FROM daily CROSS JOIN stats
      |WHERE sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n) * (CAST(s1 AS DOUBLE)/n)) > 0
      |ORDER BY abs(zscore) DESC, jour
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q15 — deterministic STRING_AGG (SURVEY §2.4 A9/A10, §7.5 item 5): the
  // reference's concat order is unspecified, so both sides sort. The inner
  // level (customers per nation) then outer level (nations per region)
  // reproduces the two-level nested aggregation of v_*_actor views.
  // ---------------------------------------------------------------------
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val rg = Tables.region(spark, dir)
    val c = Tables.customer(spark, dir)
    val perNation = n
      .join(c, n("n_nationkey") === c("c_nationkey"), "left")
      .groupBy($"n_regionkey", $"n_name")
      .agg(count($"c_custkey").as("n_cust"))
      .withColumn("libelle", concat($"n_name", lit("("), $"n_cust", lit(")")))
    perNation
      .join(broadcast(rg), $"n_regionkey" === rg("r_regionkey"))
      .groupBy($"r_name")
      .agg(
        array_join(array_sort(collect_list($"libelle")), ", ").as("nations"),
        count(lit(1)).as("n_nations")
      )
      .orderBy($"r_name")
  }
  private val q15Sql =
    """WITH per_nation AS (
      |  SELECT n_regionkey, n_name, COUNT(c_custkey) AS n_cust
      |  FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |  GROUP BY n_regionkey, n_name
      |)
      |SELECT r_name,
      |  string_agg(n_name || '(' || CAST(n_cust AS VARCHAR) || ')', ', ' ORDER BY n_name || '(' || CAST(n_cust AS VARCHAR) || ')') AS nations,
      |  COUNT(*) AS n_nations
      |FROM per_nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  // ---------------------------------------------------------------------
  // q16 — LAG 1 and LAG 12 over the month series: MoM/YoY growth (SURVEY
  // §2.5 W2, §2.2 P4 NULLIF-guarded division). Row-based LAG(…,12), not a
  // dense month join — reproduces the reference's semantics exactly.
  // Single-partition window over |months| rows only (post-aggregation), so
  // the global window is not a scale hazard.
  // ---------------------------------------------------------------------
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables
      .orders(spark, dir)
      .groupBy(date_trunc("month", $"o_orderdate").cast(DateType).as("mois"))
      .agg(sum(m($"o_totalprice")).as("ca_dec"))
    val w = Window.orderBy($"mois")
    monthly
      .withColumn("ca_prec", lag($"ca_dec", 1).over(w))
      .withColumn("ca_an_prec", lag($"ca_dec", 12).over(w))
      .select(
        $"mois",
        dbl($"ca_dec").as("ca"),
        dbl($"ca_prec").as("ca_prec"),
        ((dbl($"ca_dec") - dbl($"ca_prec")) / nullif(dbl($"ca_prec"), lit(0.0))).as("croissance_mom"),
        ((dbl($"ca_dec") - dbl($"ca_an_prec")) / nullif(dbl($"ca_an_prec"), lit(0.0))).as("croissance_yoy")
      )
      .orderBy($"mois")
  }
  private val q16Sql =
    """WITH monthly AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS ca_dec
      |  FROM orders GROUP BY 1
      |), lagged AS (
      |  SELECT mois, ca_dec,
      |         LAG(ca_dec, 1) OVER (ORDER BY mois) AS ca_prec,
      |         LAG(ca_dec, 12) OVER (ORDER BY mois) AS ca_an_prec
      |  FROM monthly
      |)
      |SELECT mois, CAST(ca_dec AS DOUBLE) AS ca, CAST(ca_prec AS DOUBLE) AS ca_prec,
      |  (CAST(ca_dec AS DOUBLE) - CAST(ca_prec AS DOUBLE)) / NULLIF(CAST(ca_prec AS DOUBLE), 0.0) AS croissance_mom,
      |  (CAST(ca_dec AS DOUBLE) - CAST(ca_an_prec AS DOUBLE)) / NULLIF(CAST(ca_an_prec AS DOUBLE), 0.0) AS croissance_yoy
      |FROM lagged
      |ORDER BY mois""".stripMargin

  // ---------------------------------------------------------------------
  // q17 — rolling 7-row sum per partition (SURVEY §2.5 W3: the 30-day
  // rolling CA, ROWS frame). Partitioned by nation — shuffles once on the
  // partition key then sorts within partitions; the frame sums DECIMAL so
  // the sliding-frame arithmetic is exact in both engines.
  // ---------------------------------------------------------------------
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val daily = o
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name", to_date($"o_orderdate").as("jour"))
      .agg(sum(m($"o_totalprice")).as("ca_dec"))
    val w = Window.partitionBy($"n_name").orderBy($"jour").rowsBetween(-6, 0)
    daily
      .withColumn("ca_7j_dec", sum($"ca_dec").over(w))
      .select($"n_name", $"jour", dbl($"ca_dec").as("ca"), dbl($"ca_7j_dec").as("ca_7j"))
      .orderBy($"n_name", $"jour")
  }
  private val q17Sql =
    """WITH daily AS (
      |  SELECT n_name, CAST(o_orderdate AS DATE) AS jour,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS ca_dec
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, CAST(o_orderdate AS DATE)
      |)
      |SELECT n_name, jour, CAST(ca_dec AS DOUBLE) AS ca,
      |  CAST(SUM(ca_dec) OVER (PARTITION BY n_name ORDER BY jour ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ca_7j
      |FROM daily
      |ORDER BY n_name, jour""".stripMargin

  // ---------------------------------------------------------------------
  // q18 — RFM scoring with NTILE(5) (SURVEY §2.5 W1). Orderings are made
  // total (metric + custkey) so tile assignment is deterministic. The
  // global NTILE window runs over |customers| pre-aggregated rows — at
  // 100 TB the pre-aggregation shrinks the window input first; a true
  // billion-customer NTILE would switch to percent_rank bucketing.
  // ---------------------------------------------------------------------
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    val rfm = Tables
      .orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        to_date(max($"o_orderdate")).as("derniere"),
        count(lit(1)).as("freq"),
        sum(m($"o_totalprice")).as("monetary_dec")
      )
    rfm
      .withColumn("score_r", ntile(5).over(Window.orderBy($"derniere".desc, $"o_custkey")))
      .withColumn("score_f", ntile(5).over(Window.orderBy($"freq".asc, $"o_custkey")))
      .withColumn("score_m", ntile(5).over(Window.orderBy($"monetary_dec".asc, $"o_custkey")))
      .select(
        $"o_custkey",
        $"derniere",
        $"freq",
        dbl($"monetary_dec").as("monetary"),
        $"score_r",
        $"score_f",
        $"score_m"
      )
      .orderBy($"o_custkey")
  }
  private val q18Sql =
    """WITH rfm AS (
      |  SELECT o_custkey, CAST(MAX(o_orderdate) AS DATE) AS derniere, COUNT(*) AS freq,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary_dec
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o_custkey, derniere, freq, CAST(monetary_dec AS DOUBLE) AS monetary,
      |  NTILE(5) OVER (ORDER BY derniere DESC, o_custkey) AS score_r,
      |  NTILE(5) OVER (ORDER BY freq ASC, o_custkey) AS score_f,
      |  NTILE(5) OVER (ORDER BY monetary_dec ASC, o_custkey) AS score_m
      |FROM rfm
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q19 — Pareto running share (SURVEY §2.5 W4: CA cumul catégories).
  // Cumulative and total sums stay DECIMAL (exact); share is a final
  // double/double. Window input is |part types| rows post-aggregation.
  // ---------------------------------------------------------------------
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    val byType = li
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy($"p_type")
      .agg(sum(m($"l_extendedprice") * (lit(1) - r($"l_discount"))).as("ca_dec"))
    val wCum = Window
      .orderBy($"ca_dec".desc, $"p_type")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy()
    byType
      .withColumn("cum_dec", sum($"ca_dec").over(wCum))
      .withColumn("tot_dec", sum($"ca_dec").over(wTot))
      .select(
        $"p_type",
        dbl($"ca_dec").as("ca"),
        dbl($"cum_dec").as("ca_cumul"),
        (dbl($"cum_dec") / dbl($"tot_dec")).as("part_cumul")
      )
      .orderBy($"ca".desc, $"p_type")
  }
  private val q19Sql =
    """WITH by_type AS (
      |  SELECT p_type,
      |         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS ca_dec
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_type
      |)
      |SELECT p_type, CAST(ca_dec AS DOUBLE) AS ca,
      |  CAST(SUM(ca_dec) OVER (ORDER BY ca_dec DESC, p_type ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ca_cumul,
      |  CAST(SUM(ca_dec) OVER (ORDER BY ca_dec DESC, p_type ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(SUM(ca_dec) OVER () AS DOUBLE) AS part_cumul
      |FROM by_type
      |ORDER BY ca DESC, p_type""".stripMargin

  // ---------------------------------------------------------------------
  // q20 — top-1 "NAME $X" KPI labels (SURVEY §2.5 W5, §2.10 cards: KPI
  // Film top / Client top / Mois record). DECIMAL→string keeps the scale
  // digits identically in both engines.
  // ---------------------------------------------------------------------
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val topClient = o
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"c_name")
      .agg(sum(m($"o_totalprice")).as("ca_dec"))
      .orderBy($"ca_dec".desc, $"c_name")
      .limit(1)
      .select(lit("client_top").as("kpi"), concat($"c_name", lit(" $"), $"ca_dec".cast(StringType)).as("libelle"))
    val topMonth = o
      .groupBy(date_trunc("month", $"o_orderdate").cast(DateType).as("mois"))
      .agg(sum(m($"o_totalprice")).as("ca_dec"))
      .orderBy($"ca_dec".desc, $"mois")
      .limit(1)
      .select(lit("mois_record").as("kpi"), concat($"mois".cast(StringType), lit(" $"), $"ca_dec".cast(StringType)).as("libelle"))
    topClient.unionByName(topMonth).orderBy($"kpi")
  }
  private val q20Sql =
    """WITH top_client AS (
      |  SELECT 'client_top' AS kpi, c_name || ' $' || CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS libelle
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_name
      |  ORDER BY SUM(CAST(o_totalprice AS DECIMAL(12,2))) DESC, c_name
      |  LIMIT 1
      |), top_month AS (
      |  SELECT 'mois_record' AS kpi,
      |         CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) || ' $' || CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS libelle
      |  FROM orders
      |  GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
      |  ORDER BY SUM(CAST(o_totalprice AS DECIMAL(12,2))) DESC, CAST(date_trunc('month', o_orderdate) AS DATE)
      |  LIMIT 1
      |)
      |SELECT * FROM top_client UNION ALL SELECT * FROM top_month ORDER BY kpi""".stripMargin

  // ---------------------------------------------------------------------
  // q21 — ROLLUP grand total (SURVEY §2.4 A13: the BI pivot's Total row).
  // ---------------------------------------------------------------------
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup($"n_name")
      .agg(dbl(sum(m($"o_totalprice"))).as("ca"), count(lit(1)).as("n_orders"))
      .select(coalesce($"n_name", lit("TOTAL")).as("nation"), $"ca", $"n_orders")
      .orderBy($"nation")
  }
  private val q21Sql =
    """SELECT COALESCE(n_name, 'TOTAL') AS nation,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name)
      |ORDER BY nation""".stripMargin

  // ---------------------------------------------------------------------
  // q22 — selective filtered scan (SURVEY §2.1 S2/S3, §2.2 P6/P7): the
  // predicates and the 3-column projection must reach the parquet scan
  // (PushedFilters / ReadSchema) — asserted in PlanSpec.
  // ---------------------------------------------------------------------
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .orders(spark, dir)
      .filter($"o_orderstatus" === "F" && $"o_orderpriority".isNotNull)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dbl(sum(m($"o_totalprice"))).as("ca"))
      .orderBy($"o_orderpriority")
  }
  private val q22Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ca
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_orderpriority IS NOT NULL
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q28 — sketch-based approximate KPIs (the 100 TB alternates to exact
  // COUNT DISTINCT / percentile: HyperLogLog++ and KLL-style quantiles,
  // single pass, mergeable, O(1) memory per group). The sketch values
  // themselves are not bit-reproducible in another engine, so the query
  // emits the exact companions plus a deterministic in-plan bound check
  // (`approx_ok`): the oracle recomputes the exact columns and asserts
  // TRUE — the whole result row hash-gates, and a sketch drifting past
  // its advertised error budget fails the gate, not just a spec.
  // ---------------------------------------------------------------------
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // Two clean hash-aggregate scans joined on the tiny group key. Mixing
    // a DISTINCT (Expand) with typed-imperative percentile buffers in ONE
    // aggregate plans a sort-based aggregate over the expanded relation —
    // measured 18x slower here (BENCH_r05 q28 1.49s -> 26.77s) and worse
    // with more groups. Do NOT re-merge these; PlanSpec pins the shape.
    val exact = o
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("clients_exact"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("mediane_exacte"),
        count(lit(1)).as("n_orders")
      )
    val approx = o
      .groupBy($"o_orderstatus")
      .agg(
        approx_count_distinct($"o_custkey", 0.01).as("clients_approx"),
        expr("approx_percentile(o_totalprice, 0.5, 5000)").as("mediane_approx")
      )
    exact
      .join(approx, "o_orderstatus")
      .select(
        $"o_orderstatus",
        $"clients_exact",
        $"mediane_exacte",
        $"n_orders",
        (abs($"clients_approx" - $"clients_exact") / $"clients_exact" <= 0.02 &&
          abs($"mediane_approx" - $"mediane_exacte") / $"mediane_exacte" <= 0.02)
          .as("approx_ok")
      )
      .orderBy($"o_orderstatus")
  }
  private val q28Sql =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS clients_exact,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS mediane_exacte,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  TRUE AS approx_ok
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q28_approx_kpis", "HLL++ distinct + approx percentile (scale alternates)", q28, Some(q28Sql)),
    Q("q01_pricing_summary", "grouped multi-measure agg (A1/A2/A11)", q01, Some(q01Sql)),
    Q("q02_revenue_by_nation", "5-way inner join chain (J1/J4)", q02, Some(q02Sql)),
    Q("q03_top_customers", "top-k with tiebreak (O1/O2/O3)", q03, Some(q03Sql)),
    Q("q04_left_join_having", "left join + HAVING SUM IS NOT NULL (J2/P9)", q04, Some(q04Sql)),
    Q("q05_never_ordered", "anti join (J3)", q05, Some(q05Sql)),
    Q("q06_bounds_between", "1-row bounds CTE BETWEEN join (J6/P8/A5)", q06, Some(q06Sql)),
    Q("q07_revenue_share", "cross join scalar total (J7)", q07, Some(q07Sql)),
    Q("q08_smart_date_key", "yyyymmdd smart key (J8)", q08, Some(q08Sql)),
    Q("q09_date_spine", "sequence/explode calendar spine (S5/P3)", q09, Some(q09Sql)),
    Q("q10_distinct_clients", "exact COUNT DISTINCT per group (A3)", q10, Some(q10Sql)),
    Q("q11_global_kpis", "scalar KPI row (A5/A11, measures)", q11, Some(q11Sql)),
    Q("q12_case_segments", "CASE WHEN segmentation (P5/A4)", q12, Some(q12Sql)),
    Q("q13_median_quantity", "exact percentiles (A8)", q13, Some(q13Sql)),
    Q("q14_zscore_daily", "agg-of-agg z-score outliers (A7/A12/P10/O4)", q14, Some(q14Sql)),
    Q("q15_string_agg", "sorted two-level STRING_AGG (A9/A10)", q15, Some(q15Sql)),
    Q("q16_monthly_growth", "LAG 1/12 MoM-YoY (W2/P4)", q16, Some(q16Sql)),
    Q("q17_rolling_7d", "rolling ROWS frame per partition (W3)", q17, Some(q17Sql)),
    Q("q18_rfm_ntile", "NTILE(5) RFM scoring (W1)", q18, Some(q18Sql)),
    Q("q19_pareto", "running cumulative share (W4)", q19, Some(q19Sql)),
    Q("q20_top1_labels", "top-1 KPI labels (W5, measures)", q20, Some(q20Sql)),
    Q("q21_rollup_total", "ROLLUP grand total (A13)", q21, Some(q21Sql)),
    Q("q22_filtered_scan", "pushdown filtered scan (S2/P6/P7)", q22, Some(q22Sql))
  )

  // Column helper so the $-interpolator works without a session import.
  import org.apache.spark.sql.ColumnName
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
