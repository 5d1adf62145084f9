package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round artifacts must agree with the code: the gated-query counts in
  * README.md and the per-query rows in COVERAGE.md drifted from
  * `SparkEntry.queries` twice (r10 verdict nit #2) — this pins them.
  * No SparkSession needed: the catalog is a pure value.
  */
class CatalogDocsSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val f = new java.io.File(name)
    assert(f.exists(), s"$name not found from test cwd ${new java.io.File(".").getAbsolutePath}")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  test("every gated catalog query is named in COVERAGE.md") {
    val cov = read("COVERAGE.md")
    val missing = SparkEntry.queries.keySet.filterNot(cov.contains)
    assert(missing.isEmpty, s"COVERAGE.md does not mention: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("COVERAGE.md names no query the catalog lacks") {
    val cov = read("COVERAGE.md")
    val named = "[a-z]{1,3}[0-9]{2}_[a-z0-9_]+".r.findAllIn(cov).toSet
    val ghosts = named -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"COVERAGE.md mentions non-catalog queries: ${ghosts.toSeq.sorted.mkString(", ")}")
  }

  test("every ScaleStress query name resolves in the catalog") {
    // a renamed catalog query must not silently break the growth
    // harness mid-run (queryFn would throw only when its cell starts)
    val ghosts = ScaleStress.names.toSet -- SparkEntry.queries.keySet - "z99_planted_superlinear"
    assert(ghosts.isEmpty, s"ScaleStress names not in the catalog: ${ghosts.toSeq.sorted.mkString(", ")}")
  }

  test("README.md carries the current catalog count") {
    val readme = read("README.md")
    val n = SparkEntry.queries.size
    assert(readme.contains(s"$n queries"),
      s"README.md should say '$n queries' (the catalog size); update the count")
  }

  test("every query has an oracle (full hash gate, not rows-only)") {
    // ZERO rows-only cells since round 16: even s13 — whose recall in
    // the production configuration depends on a trained k-means model
    // SQL cannot re-derive — gates in its EXHAUSTIVE configuration,
    // where served ≡ brute makes every drift row SQL-derivable (the
    // production alarm semantics stay pinned by StreamingSpec's
    // independent recall recomputation). Any query without an oracle
    // is drift.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
