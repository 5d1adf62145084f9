package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.PgCopy
import java.nio.file.{Files, Paths}

/** PG COPY text-format parser (SURVEY §2.1 S1, §7.5 item 9): escapes,
  * \N nulls, array literals with quoting, offset timestamps, round trip.
  */
class PgCopySpec extends SparkSpec {
  import spark.implicits._

  private def writeTmp(name: String, lines: Seq[String]): String = {
    val dir = Files.createDirectories(Paths.get(System.getProperty("java.io.tmpdir"), "graft_pgcopy_spec"))
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("unescape/escape: PG backslash escapes round-trip") {
    val nasty = "tab\there\nnew\\line \"quoted\""
    assert(PgCopy.unescape(PgCopy.escape(nasty)) == nasty)
    assert(PgCopy.unescape("a\\tb") == "a\tb")
    assert(PgCopy.unescape("a\\\\tb") == "a\\tb", "escaped backslash must not re-trigger")
  }

  test("array literal parsing: quoting, embedded commas/quotes, NULL") {
    assert(PgCopy.parseArray("{}") == Seq.empty)
    assert(PgCopy.parseArray("{Trailers,Commentaries}") == Seq("Trailers", "Commentaries"))
    assert(PgCopy.parseArray("""{Trailers,"Behind the Scenes"}""") == Seq("Trailers", "Behind the Scenes"))
    assert(PgCopy.parseArray("""{"a,b","he said \"hi\"",NULL}""") == Seq("a,b", "he said \"hi\"", null))
  }

  test("typed read: nulls, escapes, decimals, dates, offset timestamps, arrays") {
    val path = writeTmp("typed.txt", Seq(
      "1\talpha\t4.99\t2022-01-23\t2022-01-23 01:15:30.5+01\t{Trailers,\"Deleted Scenes\"}\tt",
      "2\twith\\ttab\t\\N\t\\N\t2022-05-26 14:59:36.996577+02\t{}\tf",
      "3\t\\N\t0.99\t2022-07-27\t2022-07-27 00:00:00\t\\N\t\\N",
      "\\."
    ))
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("rate", DecimalType(4, 2)),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("features", ArrayType(StringType)),
      StructField("active", BooleanType)
    ))
    val rows = PgCopy.read(spark, path, schema).orderBy("id").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getInt(0) == 1 && r1.getString(1) == "alpha")
    assert(r1.getDecimal(2).toString == "4.99")
    assert(r1.getDate(3).toString == "2022-01-23")
    // 01:15:30.5+01:00 == 00:15:30.5 UTC (session TZ is UTC)
    assert(r1.getTimestamp(4).toInstant.toString == "2022-01-23T00:15:30.500Z")
    assert(r1.getSeq[String](5) == Seq("Trailers", "Deleted Scenes"))
    assert(r1.getBoolean(6))
    val r2 = rows(1)
    assert(r2.getString(1) == "with\ttab", "escaped tab inside a value")
    assert(r2.isNullAt(2) && r2.isNullAt(3))
    assert(r2.getSeq[String](5) == Seq.empty)
    assert(!r2.getBoolean(6))
    val r3 = rows(2)
    assert(r3.isNullAt(1) && r3.isNullAt(5) && r3.isNullAt(6))
  }

  test("write/read round trip preserves values including arrays and control chars") {
    val df = Seq(
      (1L, "plain", Seq("a", "b c", "d,e")),
      (2L, "has\ttab and\nnewline and \\slash", Seq.empty[String]),
      (3L, null.asInstanceOf[String], Seq("NULL-ish", "x\"y"))
    ).toDF("id", "text", "tags")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_pgcopy_roundtrip"
    PgCopy.write(df, out)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("text", StringType),
      StructField("tags", ArrayType(StringType))
    ))
    val back = PgCopy.read(spark, out, schema).orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getLong(0) == o.getLong(0))
      assert(Option(b.getString(1)) == Option(o.getString(1)))
      assert(b.getSeq[String](2) == o.getSeq[String](2))
    }
  }

  test("parses the reference's film COPY block format (array + tsvector columns)") {
    // a representative line in the exact shape of filmdb.sql's film table
    // (sql/source_filmdb/filmdb.sql:3083 COPY header; data lines follow)
    val line = "1\tACADEMY DINOSAUR\tA Epic Drama of a Feminist And a Mad Scientist\t2006\t1\t\\N\t6\t0.99\t86\t20.99\tPG\t2022-09-10 18:22:45.671648+02\t{\"Deleted Scenes\",\"Behind the Scenes\"}\t'academi':1 'battl':15"
    val path = writeTmp("film.txt", Seq(line))
    val schema = StructType(Seq(
      StructField("film_id", IntegerType),
      StructField("title", StringType),
      StructField("description", StringType),
      StructField("release_year", IntegerType),
      StructField("language_id", IntegerType),
      StructField("original_language_id", IntegerType),
      StructField("rental_duration", ShortType),
      StructField("rental_rate", DecimalType(4, 2)),
      StructField("length", ShortType),
      StructField("replacement_cost", DecimalType(5, 2)),
      StructField("rating", StringType),
      StructField("last_update", TimestampType),
      StructField("special_features", ArrayType(StringType)),
      StructField("fulltext", StringType)
    ))
    val r = PgCopy.read(spark, path, schema).collect().head
    assert(r.getInt(0) == 1 && r.getString(1) == "ACADEMY DINOSAUR")
    assert(r.isNullAt(5), "\\N original_language_id")
    assert(r.getShort(6) == 6 && r.getDecimal(7).toString == "0.99")
    assert(r.getSeq[String](12) == Seq("Deleted Scenes", "Behind the Scenes"))
    assert(r.getString(13).startsWith("'academi'"))
  }
}
