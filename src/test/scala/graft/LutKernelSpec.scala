package graft

import org.apache.spark.sql.functions._
import graft.ops.Luts

/** Pins the lut_std KERNEL (fourth renderer: cleaning twins +
  * rulesEval in one expression node) ≡ the declarative Column chain
  * (`*StdDecl`) per LUT, over the full rule vocabulary, mutations that
  * miss the exact map but graze matchers, reference-quirk forms
  * (abbrev-code expansion, non-Latino strip, count labels), case/
  * whitespace variants, nulls, and seeded random fuzz — for both
  * noId = keep and noId = null. The kernel exists for PLAN cost (one
  * node instead of thousands); this spec is the proof it changes
  * nothing row-wise. */
class LutKernelSpec extends SparkSpec {
  import spark.implicits._

  private val lutPairs: Seq[(String,
      (org.apache.spark.sql.Column, String) => org.apache.spark.sql.Column,
      (org.apache.spark.sql.Column, String) => org.apache.spark.sql.Column)] = Seq(
    ("race", Luts.raceStd(_, _), Luts.raceStdDecl(_, _)),
    ("eth", Luts.ethStd(_, _), Luts.ethStdDecl(_, _)),
    ("gender", Luts.genderStd(_, _), Luts.genderStdDecl(_, _)),
    ("injury", Luts.injuryStd(_, _), Luts.injuryStdDecl(_, _)),
    ("fatal", Luts.fatalStd(_, _), Luts.fatalStdDecl(_, _)),
    ("firearm", Luts.firearmStd(_, _), Luts.firearmStdDecl(_, _)),
    ("role", Luts.roleStd(_, _), Luts.roleStdDecl(_, _)))

  private def probesFor(lut: String): Seq[String] = {
    import graft.ops.Luts.{ContainsAny, InSet, MatchesRegex, StartsWithAny}
    val rules = Luts.kernelLuts(lut)._2
    val vocab = rules.flatMap(r => r.anyOf ++ r.allOf ++ r.butNot).flatMap {
      case InSet(vs, _) => vs
      case ContainsAny(ss, _) => ss.map(s => s"PRE $s POST") ++ ss
      case StartsWithAny(ps) => ps.map(_ + "TAIL")
      case MatchesRegex(_) => Nil
    }
    val quirks = Seq(
      "W - WHITE", "B=BLACK", "A - ", " - ASIAN", "WHITE, NON-HISPANIC",
      "BLACK NON-LATINO ", "NON-HISPANIC", "2 - Black", "3 -Laceration",
      "2 INJURED", "officer injured", "SUBJECT DECEASED", "W_H_I_T_E",
      "bl.a-ck*", "  padded  ", "_", "*", "-", ".", "O'BRIEN",
      "white", "White", "wHiTe", "Ê", "naïve", "KK")  // Kelvin sign case-fold probe
    val mut = vocab.flatMap(v => Seq(v + " X", "Z" + v, v.toLowerCase,
      " " + v + " ", v.replace(" ", "_")))
    val rnd = new scala.util.Random(42)
    val alphabet = "ABCXYZ -_*./'0123456789abkhw"
    val fuzz = Seq.fill(300)(
      Seq.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    (vocab ++ mut ++ quirks ++ fuzz ++ Seq("", " ", "  ")).distinct
  }

  test("lut_std kernel ≡ declarative chain per LUT (keep + null modes, incl. null input)") {
    for ((lut, kernel, decl) <- lutPairs; noId <- Seq("keep", "null")) {
      val probes: Seq[Option[String]] = probesFor(lut).map(Option(_)) :+ None
      val df = probes.toDF("raw")
      val got = df.select(kernel(col("raw"), noId).as("k"),
        decl(col("raw"), noId).as("d")).collect()
      probes.zip(got).foreach { case (p, row) =>
        assert(row.getString(0) == row.getString(1),
          s"$lut/$noId diverges on ${p.map("'" + _ + "'").getOrElse("NULL")}: " +
            s"kernel=${row.getString(0)} decl=${row.getString(1)}")
      }
    }
  }

  test("lut_std noId=error: identified value passes, unknown value throws") {
    val ok = Seq("WHITE").toDF("raw")
      .select(Luts.raceStd(col("raw"), "error")).as[String].head()
    assert(ok == "WHITE")
    val ex = intercept[Exception] {
      Seq("QQQZZZ GIBBERISH").toDF("raw")
        .select(Luts.raceStd(col("raw"), "error")).as[String].head()
    }
    assert(ex.getMessage != null)
  }
}
