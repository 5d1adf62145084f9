package graft

import java.sql.DriverManager

import graft.sources.Tables

/** SURVEY §2.1 S4 — the remote-scan seam the reference runs over dblink
  * (`sql/datawarehouse/insertion_dataware.sql:7-10`: extract from the
  * source DB into the warehouse). No PostgreSQL ships in this sandbox, so
  * the gate runs the same `Tables.jdbc` code path against in-memory Derby
  * (bundled with Spark): a partitionColumn-parallel read must actually
  * split into range-predicate partitions, and the round trip must
  * preserve values.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE clients")
      catch { case _: java.sql.SQLException => () } // first run: nothing to drop
      st.execute("CREATE TABLE clients (id INT PRIMARY KEY, nom VARCHAR(40), solde DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO clients VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"client_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  test("jdbc scan: partitionColumn-parallel read splits and preserves all rows") {
    seed()
    val df = Tables.jdbc(spark, url, "clients", partitionColumn = Some(("id", 1L, 101L, 4)))
    assert(df.rdd.getNumPartitions == 4, "partitioned JDBC read must plan one partition per range")
    assert(df.count() == 100)
    val r = df.filter($"id" === 42).collect().head
    assert(r.getAs[String]("NOM") == "client_42")
    assert(r.getAs[Double]("SOLDE") == 63.0)
  }

  test("jdbc scan: pushed-down query subselect (the dblink extract shape)") {
    seed()
    val q = "(SELECT id, solde FROM clients WHERE id <= 10) extract_q"
    val df = Tables.jdbc(spark, url, q)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "solde"))
    assert(df.count() == 10)
  }

  test("jdbc round trip: Spark write then partitioned read back") {
    val out = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    out.write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", "roundtrip")
      .save()
    val back = Tables.jdbc(spark, url, "roundtrip", partitionColumn = Some(("k", 1L, 4L, 2)))
    assert(back.rdd.getNumPartitions == 2)
    assert(back.collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      Map(1 -> "a", 2 -> "b", 3 -> "c"))
  }
}
