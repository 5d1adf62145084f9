package graft.filmdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.sources.PgCopy
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Loader for the reference's OWN embedded dataset: extracts each
  * `COPY ... FROM stdin` block from the pg_dump
  * (`sql/source_filmdb/filmdb.sql`, ~47k data lines) and ingests it
  * through the distributed PgCopy parser. The 7 monthly `payment`
  * partitions re-unify into one DataFrame (the partitioned table's
  * UNION ALL semantics, SURVEY §2.1 S3).
  *
  * This is the parity fixture: FilmDbGoldenSpec reproduces the
  * dashboard's published numbers (BASELINE.md) from these tables.
  */
object FilmDb {

  val defaultDump = "/root/reference/sql/source_filmdb/filmdb.sql"

  import org.apache.spark.sql.types.{StructType => ST, StructField => SF}
  private def ts = TimestampType

  val schemas: Map[String, StructType] = Map(
    "actor" -> ST(Seq(SF("actor_id", IntegerType), SF("first_name", StringType),
      SF("last_name", StringType), SF("last_update", ts))),
    "address" -> ST(Seq(SF("address_id", IntegerType), SF("address", StringType),
      SF("address2", StringType), SF("district", StringType), SF("city_id", IntegerType),
      SF("postal_code", StringType), SF("phone", StringType), SF("last_update", ts))),
    "category" -> ST(Seq(SF("category_id", IntegerType), SF("name", StringType), SF("last_update", ts))),
    "city" -> ST(Seq(SF("city_id", IntegerType), SF("city", StringType),
      SF("country_id", IntegerType), SF("last_update", ts))),
    "country" -> ST(Seq(SF("country_id", IntegerType), SF("country", StringType), SF("last_update", ts))),
    "customer" -> ST(Seq(SF("customer_id", IntegerType), SF("store_id", IntegerType),
      SF("first_name", StringType), SF("last_name", StringType), SF("email", StringType),
      SF("address_id", IntegerType), SF("activebool", BooleanType), SF("create_date", DateType),
      SF("last_update", ts), SF("active", IntegerType))),
    "film" -> ST(Seq(SF("film_id", IntegerType), SF("title", StringType),
      SF("description", StringType), SF("release_year", IntegerType), SF("language_id", IntegerType),
      SF("original_language_id", IntegerType), SF("rental_duration", ShortType),
      SF("rental_rate", DecimalType(4, 2)), SF("length", ShortType),
      SF("replacement_cost", DecimalType(5, 2)), SF("rating", StringType), SF("last_update", ts),
      SF("special_features", ArrayType(StringType)), SF("fulltext", StringType))),
    "film_actor" -> ST(Seq(SF("actor_id", IntegerType), SF("film_id", IntegerType), SF("last_update", ts))),
    "film_category" -> ST(Seq(SF("film_id", IntegerType), SF("category_id", IntegerType), SF("last_update", ts))),
    "inventory" -> ST(Seq(SF("inventory_id", IntegerType), SF("film_id", IntegerType),
      SF("store_id", IntegerType), SF("last_update", ts))),
    "language" -> ST(Seq(SF("language_id", IntegerType), SF("name", StringType), SF("last_update", ts))),
    "payment" -> ST(Seq(SF("payment_id", IntegerType), SF("customer_id", IntegerType),
      SF("staff_id", IntegerType), SF("rental_id", IntegerType), SF("amount", DecimalType(5, 2)),
      SF("payment_date", ts))),
    "rental" -> ST(Seq(SF("rental_id", IntegerType), SF("rental_date", ts),
      SF("inventory_id", IntegerType), SF("customer_id", IntegerType), SF("return_date", ts),
      SF("staff_id", IntegerType), SF("last_update", ts))),
    "staff" -> ST(Seq(SF("staff_id", IntegerType), SF("first_name", StringType),
      SF("last_name", StringType), SF("address_id", IntegerType), SF("email", StringType),
      SF("store_id", IntegerType), SF("active", BooleanType), SF("username", StringType),
      SF("password", StringType), SF("last_update", ts), SF("picture", BinaryType))),
    "store" -> ST(Seq(SF("store_id", IntegerType), SF("manager_staff_id", IntegerType),
      SF("address_id", IntegerType), SF("last_update", ts)))
  )

  /** The 7 monthly payment partitions (SURVEY §1.3). */
  private val paymentPartitions =
    (1 to 7).map(m => f"payment_p2022_$m%02d")

  /** Extract each table's COPY block(s) from the dump to tmp text files
    * once per JVM; Spark then reads them distributed.
    */
  private lazy val extracted: Map[String, String] = {
    val outDir = Files.createDirectories(
      Paths.get(System.getProperty("java.io.tmpdir"), "graft_filmdb_copy"))
    val lines = Files.readAllLines(Paths.get(defaultDump)).asScala
    val blocks = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[String]]
    var current: Option[String] = None
    val copyRe = """^COPY public\.(\w+) \(.*\) FROM stdin;$""".r
    lines.foreach {
      case copyRe(table) => current = Some(table); blocks(table) = scala.collection.mutable.ArrayBuffer.empty
      case "\\." => current = None
      case line => current.foreach(t => blocks(t) += line)
    }
    // unify payment partitions under "payment"
    val payment = paymentPartitions.flatMap(p => blocks.getOrElse(p, Nil))
    blocks("payment") = scala.collection.mutable.ArrayBuffer(payment: _*)
    paymentPartitions.foreach(blocks.remove)
    blocks.map { case (t, ls) =>
      val f = outDir.resolve(s"$t.txt")
      Files.write(f, ls.asJava)
      t -> f.toString
    }.toMap
  }

  def table(spark: SparkSession, name: String): DataFrame = {
    val schema = schemas.getOrElse(name, sys.error(s"unknown filmdb table: $name"))
    PgCopy.read(spark, extracted(name), schema)
  }
}
