package graft

import graft.etl.Validate
import graft.filmdb.FilmDb
import org.apache.spark.sql.functions._

/** ETL constraint validation (SURVEY §1.2) applied to the reference's
  * OWN dataset with the reference's OWN declared constraints: the loaded
  * dump must satisfy every DDL rule it was dumped under, and violations
  * must be detected when planted.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("the reference dump satisfies its own DDL constraints") {
    val film = FilmDb.table(spark, "film")
    val payment = FilmDb.table(spark, "payment")
    val filmCategory = FilmDb.table(spark, "film_category")
    val got = report(Validate.summary(
      Validate.rowReport(
        film,
        // mpaa_rating enum (filmdb.sql:140), year domain (:133 — PG's
        // `year` domain allows 1901..2155), NOT NULL title (:131-ish)
        Validate.inSet("rating", Seq("G", "PG", "PG-13", "R", "NC-17")) +:
          Validate.inRange("release_year", 1901, 2155) +:
          Validate.notNull("title")
      ),
      // payment.amount numeric CHECK-equivalent (creationdatwareh.sql:109)
      Validate.rowReport(payment, Seq(Validate.RowRule("amount_check", col("amount") >= 0))),
      Validate.primaryKeyReport(film, "pk_film", Seq("film_id")),
      Validate.foreignKeyReport(filmCategory, Seq("film_id"), film, Seq("film_id"),
        "fk_film_category_film")
    ))
    assert(got.values.forall(_ == 0L), s"reference data must be clean: $got")
    assert(got.size == 6)
  }

  test("planted violations are detected and counted exactly") {
    val child = Seq((1, 10), (2, 10), (2, 11), (3, 99)).toDF("id", "parent_id")
    val parent = Seq(10, 11).toDF("pid")
    val got = report(Validate.summary(
      Validate.rowReport(child, Seq(Validate.inRange("parent_id", 0, 50))),
      Validate.primaryKeyReport(child, "pk_child", Seq("id")),
      Validate.foreignKeyReport(child, Seq("parent_id"), parent, Seq("pid"), "fk_child_parent")
    ))
    assert(got("parent_id_range") == 1L) // 99 out of range
    assert(got("pk_child") == 1L) // key 2 duplicated
    assert(got("fk_child_parent") == 1L) // 99 has no parent
  }

  test("null rule input counts as a violation (stricter than PG CHECK)") {
    val df = Seq(Some(5), None, Some(-1)).toDF("v")
    val got = report(Validate.rowReport(df, Seq(Validate.RowRule("v_check", col("v") >= 0))))
    assert(got("v_check") == 2L) // NULL and -1
  }
}
