package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.sources.PgCopy

/** Property tests for the pure kernels (SURVEY §5: property tests for
  * smart-key bijectivity and parse/escape invariants). Raw ScalaCheck
  * (no scalatest bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private val dateGen: Gen[java.time.LocalDate] =
    Gen.choose(0L, 365L * 200).map(java.time.LocalDate.of(1970, 1, 1).plusDays(_))

  test("smart yyyymmdd key is bijective over dates") {
    check("smart-key", Prop.forAll(dateGen) { d =>
      val key = d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
      val back = java.time.LocalDate.of(key / 10000, key / 100 % 100, key % 100)
      back == d && key > 19700000 && key < 21700000
    })
  }

  test("PG COPY escape/unescape round-trips arbitrary strings") {
    check("escape-roundtrip", Prop.forAll { (s: String) =>
      PgCopy.unescape(PgCopy.escape(s)) == s
    })
  }

  test("escaped values never contain raw delimiters") {
    check("no-raw-delims", Prop.forAll { (s: String) =>
      val e = PgCopy.escape(s)
      !e.contains('\t') && !e.contains('\n') && !e.contains('\r')
    })
  }

  test("PG array literal quote/parse round-trips arbitrary element lists") {
    val elems = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const("has space"), Gen.const("a,b"), Gen.const("q\"uote"),
      Gen.const("back\\slash"), Gen.const("NULL"), Gen.const("")
    ))
    check("array-roundtrip", Prop.forAll(elems) { xs =>
      val literal = xs.map(PgCopy.quoteArrayElem).mkString("{", ",", "}")
      PgCopy.parseArray(literal) == xs
    })
  }
}
