package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PiiScrubImpl
import graft.text.Curation

/** Pins pii_scrub_stats ≡ the six-regex declarative chain. The
  * reference here IS java.util.regex (what Spark's regexp_replace /
  * regexp_extract_all evaluate), run with the exact progressive
  * semantics of Curation.scrubPii/piiCount — so a divergence in the
  * kernel's hand-rolled backtracking order fails loud on the JVM with
  * no Spark session. Inputs are seeded-random compositions of the
  * adversarial shapes: '@' clusters, dotted/dashed domains, local
  * parts with %+._-, SSN/phone lookalikes glued to word chars, digits
  * abutting replaced spans (a replacement can CREATE a \b), unicode
  * neighbors, and empty/boundary cases. */
class PiiKernelSpec extends AnyFunSuite {

  private def refScrub(t: String): (String, Long, Long, Long) = {
    val e = java.util.regex.Pattern.compile(Curation.EmailRe)
    val s = java.util.regex.Pattern.compile(Curation.SsnRe)
    val p = java.util.regex.Pattern.compile(Curation.PhoneRe)
    def count(pat: java.util.regex.Pattern, x: String): Long = {
      val m = pat.matcher(x); var c = 0L; while (m.find()) c += 1; c
    }
    val afterEmail = e.matcher(t).replaceAll("<EMAIL>")
    val afterSsn = s.matcher(afterEmail).replaceAll("<SSN>")
    val afterPhone = p.matcher(afterSsn).replaceAll("<PHONE>")
    (afterPhone, count(e, t), count(s, afterEmail), count(p, afterSsn))
  }

  private def kernel(t: String): (String, Long, Long, Long) = {
    val r = PiiScrubImpl.compute(UTF8String.fromString(t))
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def check(t: String): Unit =
    assert(kernel(t) == refScrub(t), s"input=<$t>")

  test("fixed adversarial cases") {
    Seq(
      "", "@", "a@", "@b.cc", "x@.bb", "a@b.cc", "a@b.c", "a@b.cc.",
      "a@b.cc@d.ee", "a@@b.cc", "a@b@c.dd", "x@y.com123-45-6789",
      "12@a.bc3-45-6789", "x.y%z+w-v_u@sub.domain-x.co.uk tail",
      "pre 123-45-6789 post", "a123-45-6789", "123-45-6789b",
      "123-45-67890", "0123-45-6789", "123-45-678", "123.45.6789",
      "555-867-5309", "555.867.5309", "555.867-5309", "555-867.5309",
      "5555.867.5309", "x 555.8675.309", "é123-45-6789é",
      "naïve@exämple.com", "a@b.cc 123-45-6789 555.867.5309",
      "<EMAIL>123-45-6789", "user7@example.com na 555.867.5309",
      "one@two.three.four.co five@..cc", "%@-.-.aa", "+@+.bb",
      "a@b.cc123-45-6789x", "9@x.com 678 9@x.com",
      "a@a.bc.d", "x@a.bc-x.yy", "x@y.com.", "x@y.c-m",
      "中文@测试.com ascii@ok.com", "Kelvin@case.fold"
    ).foreach(check)
  }

  test("seeded random compositions agree with java.util.regex") {
    val rng = new scala.util.Random(4242)
    val atoms = Array(
      "a@b.cc", "user9@example.com", "x.y+z@sub-d.org", "@", "@@", ".",
      "-", "_", "%", "+", "123-45-6789", "555.867.5309", "555-867-5309",
      "12-34-5678", "123-456-7890", "1234", "na", "word", "é", "中",
      "x@y", "y.com", "123", "45", "6789", "<EMAIL>", "<SSN>", " ", "",
      "a@b.cc123-45-6789", "m123-45-6789", "0", "_1")
    val seps = Array("", " ", "", "  ", "\t", "\n", "x", "9", "_")
    (1 to 3000).foreach { _ =>
      val n = 1 + rng.nextInt(8)
      val t = (1 to n).map(_ =>
        atoms(rng.nextInt(atoms.length)) + seps(rng.nextInt(seps.length)))
        .mkString
      check(t)
    }
  }
}
