package graft.tools

import java.nio.file.{Files, Paths}

/** Dump a single catalog query + its oracle SQL in the Verify layout, so
  * `tools/check_oracle.py <sfDir> <outDir>` gates just that query — the
  * per-query correctness iteration loop (Verify dumps the whole catalog).
  *
  * Usage: runMain graft.tools.VerifyOne <queryName> [sfDir] [outDir]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_verify_one"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // MERGE into an existing oracle_sql.json, so several VerifyOne
    // dumps into one outDir gate together under one check_oracle run
    // (a re-dump of the same name appends a duplicate key; last wins
    // in every JSON parser, and the bodies are identical by construction)
    val path = Paths.get(s"$outDir/oracle_sql.json")
    val prior =
      if (!Files.exists(path)) "" else {
        val inner = Files.readString(path).trim.stripPrefix("{").stripSuffix("}").trim
        if (inner.isEmpty) "" else inner + ", "
      }
    val json = graft.SparkEntry.oracleSql.get(name)
      .map(sql => s"{$prior${q(name)}: ${q(sql)}}")
      .getOrElse(if (prior.isEmpty) "{}" else s"{${prior.stripSuffix(", ")}}")
    Files.writeString(path, json)
    spark.stop()
  }
}
