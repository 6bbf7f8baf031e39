package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Properties}

class SanitizeSpec extends AnyFunSuite {

  test("examples: messy headers become warehouse-safe identifiers") {
    assert(Sanitize.sanitizeName("  Cust Key!! ") == "cust_key")
    assert(Sanitize.sanitizeName("Market-Segment") == "market_segment")
    assert(Sanitize.sanitizeName("acct bal ($)") == "acct_bal")
    assert(Sanitize.sanitizeName("2024 segment") == "c_2024_segment")
    assert(Sanitize.sanitizeName("___") == "col")
    assert(Sanitize.sanitizeName("") == "col")
    assert(Sanitize.sanitizeName("already_clean") == "already_clean")
  }

  test("collisions dedupe in column order") {
    assert(Sanitize.sanitizeNames(Seq("A B", "a-b", "a_b")) == Seq("a_b", "a_b_2", "a_b_3"))
  }

  test("collision suffixes avoid names later columns legitimately own") {
    // naive _N suffixing would emit a_2 twice here
    val out = Sanitize.sanitizeNames(Seq("a", "a", "a_2"))
    assert(out.distinct.size == 3, s"duplicate names in $out")
    assert(out.head == "a" && out.last == "a_2")
    val out2 = Sanitize.sanitizeNames(Seq("a_2", "a", "a"))
    assert(out2.distinct.size == 3, s"duplicate names in $out2")
  }
}

/** scalacheck property suite (sbt runs Properties natively). */
object SanitizeProps extends Properties("Sanitize") {

  property("output is a warehouse-safe identifier") = Prop.forAll { (raw: String) =>
    val out = Sanitize.sanitizeName(raw)
    out.matches("^[a-z][a-z0-9_]*$") || out.matches("^c_[0-9][a-z0-9_]*$")
  }

  property("idempotent") = Prop.forAll { (raw: String) =>
    Sanitize.sanitizeName(Sanitize.sanitizeName(raw)) == Sanitize.sanitizeName(raw)
  }

  property("no duplicate names after dedup") = Prop.forAll { (raws: List[String]) =>
    val outs = Sanitize.sanitizeNames(raws)
    outs.distinct.size == outs.size
  }
}
