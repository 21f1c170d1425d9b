package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's categorical standardization vocabularies, expressed as
  * *data* (ordered match rules) with two renderers: a Spark `Column`
  * (codegen-friendly `when` chain — the engine) and a DuckDB `CASE` SQL
  * string (the independent oracle). Both render from the same rule list,
  * so engine and oracle share one source of truth for the vocabulary
  * while exercising two different execution paths.
  *
  * Vocabulary provenance (re-expressed, not copied):
  *   race     — openpolicedata/_converters.py:293 `_create_race_lut`
  *              (generic string vocabulary at :480-545 incl. the BLACK
  *              regex, non-Latino suffix strip, and abbrev-code
  *              expansion; per-source letter/numeric codes in
  *              sourceRaceCodes). Explicit scope cuts vs the reference:
  *              delimited multi-race values recurse to a LIST there —
  *              a single-valued Column cannot; use Standardize.stdMulti
  *              to standardize each person of a delimited cell. The
  *              agg_cat census-aggregation flag and custom race_cats
  *              dictionaries are likewise not parameterized.
  *   gender   — openpolicedata/_converters.py:620 `_create_gender_lut`
  *   injury   — openpolicedata/_converters.py:773 `_create_injury_lut`
  *   fatal    — openpolicedata/_converters.py:853 `_create_fatal_lut`
  *   firearm  — openpolicedata/_converters.py:884 `_create_firearm_lut`
  *   age      — openpolicedata/_converters.py:146 `_create_age_range_lut`
  *   category values — openpolicedata/defs.py:499 `_race_cats_basic` +
  *              :513 `_more_race_cats` (expanded set), :543 `_genders`
  *
  * Scale: rendered rules are pure per-row string predicates inside
  * WholeStageCodegen — no UDF, no shuffle, no broadcast state.
  */
object Luts {

  /** One predicate over the cleaned value (`x`) or its space-stripped
    * variant (`xns`). */
  sealed trait Matcher
  final case class InSet(vals: Seq[String], noSpace: Boolean = false) extends Matcher
  final case class ContainsAny(subs: Seq[String], noSpace: Boolean = false) extends Matcher
  final case class StartsWithAny(prefixes: Seq[String]) extends Matcher
  /** Unanchored regex search; pattern must be RE2-safe (no lookaround)
    * so the same literal renders on both Spark and DuckDB. */
  final case class MatchesRegex(re: String) extends Matcher

  /** Fires when any of `anyOf` matches, every `allOf` matches, and none
    * of `butNot` does. */
  final case class Rule(anyOf: Seq[Matcher], out: String,
                        allOf: Seq[Matcher] = Nil, butNot: Seq[Matcher] = Nil)

  // ---- Column renderer -------------------------------------------------

  private def matchCol(m: Matcher, x: Column, xns: Column): Column = m match {
    case InSet(vals, ns)       => (if (ns) xns else x).isin(vals: _*)
    case ContainsAny(subs, ns) =>
      subs.map(s => (if (ns) xns else x).contains(s)).reduce(_ || _)
    case StartsWithAny(ps)     => ps.map(p => x.startsWith(p)).reduce(_ || _)
    case MatchesRegex(re)      => x.rlike(re)
  }

  /** Render rules as a when-chain over pre-cleaned `x`; falls back to
    * `orig` (the reference's no_id="keep" behavior). */
  def rulesToColumn(rules: Seq[Rule], x: Column, orig: Column): Column = {
    val xns = regexp_replace(x, " ", "")
    rules.foldRight(orig) { case (r, acc) =>
      var cond = r.anyOf.map(matchCol(_, x, xns)).reduce(_ || _)
      r.allOf.foreach(m => cond = cond && matchCol(m, x, xns))
      r.butNot.foreach(m => cond = cond && !matchCol(m, x, xns))
      when(cond, lit(r.out)).otherwise(acc)
    }
  }

  /** Render rules with the exact-vocabulary fast path: every plain
    * (non-noSpace) InSet value is resolved ONCE at plan-build time by
    * [[rulesEval]] — so cross-rule precedence (an earlier contains/regex
    * rule shadowing a later set member, or a veto emptying a value's
    * answer) is baked into each entry — and the whole vocabulary
    * becomes ONE foldable map literal probed with try_element_at; only
    * the contains/startswith/regex/noSpace residue stays as a
    * when-chain. Equivalent to [[rulesToColumn]] by construction
    * (property-pinned in OpsSpec): a map hit IS the rulesEval answer;
    * a miss means no plain InSet matcher can fire, so stripping them
    * from anyOf is semantics-preserving, and a rule whose anyOf
    * empties can only ever fire on map keys and drops out. noSpace
    * InSets stay in the chain because their key space (any string
    * whose space-stripped form is in the set) is not enumerable.
    *
    * The motivation is PLAN size, not only row cost: the cleaned `x`
    * callers pass is itself a sizeable regex-chain tree that the
    * when-chain re-inlines once per matcher reference; this form
    * references it twice. Measured on q_standardize_e2e's driver-side
    * plan time in SCALING.md round 10. */
  def rulesToColumnLut(rules: Seq[Rule], x: Column, orig: Column): Column = {
    val exact: Seq[(String, String)] = for {
      r <- rules
      m <- r.anyOf
      vals <- (m match {
        case InSet(vs, false) => Some(vs)
        case _ => None
      }).toSeq
      v <- vals
      out <- rulesEval(rules, v).toSeq
    } yield v -> out
    val residual = rules.flatMap { r =>
      val rest = r.anyOf.filterNot {
        case InSet(_, false) => true
        case _ => false
      }
      if (rest.isEmpty) None else Some(r.copy(anyOf = rest))
    }
    val chain = rulesToColumn(residual, x, orig)
    if (exact.isEmpty) chain
    else coalesce(try_element_at(typedLit(exact.toMap), x), chain)
  }

  /** One-expression rendering of a per-source code table: map hit →
    * phrase, miss → the raw column (the when-chain per code paid one
    * tree node set per code). */
  private[ops] def codesToColumn(codes: Seq[(String, String)], raw: Column): Column = {
    // toMap keeps the LAST duplicate where the old when-chain kept the
    // FIRST — no current table has duplicates; fail loud if one grows
    require(codes.map(_._1).distinct.size == codes.size,
      s"codesToColumn: duplicate codes in ${codes.map(_._1).diff(codes.map(_._1).distinct).distinct}")
    coalesce(try_element_at(typedLit(codes.toMap), trim(upper(raw))), raw)
  }

  // ---- Scala evaluator (third renderer) --------------------------------

  // compiled-pattern cache: rulesEval runs once per accumulated token
  // per distinct value on executors — recompiling per evaluation would
  // put Pattern.compile in a per-row loop
  private val evalPatterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def matchEval(m: Matcher, x: String, xns: String): Boolean = m match {
    case InSet(vals, ns)       => vals.contains(if (ns) xns else x)
    case ContainsAny(subs, ns) => subs.exists(s => (if (ns) xns else x).contains(s))
    case StartsWithAny(ps)     => ps.exists(x.startsWith)
    case MatchesRegex(re)      =>
      evalPatterns.computeIfAbsent(re, java.util.regex.Pattern.compile(_))
        .matcher(x).find()
  }

  /** Evaluate the same rules over a plain string (pre-cleaned by the
    * caller) — Some(out) when a rule fires, None otherwise (the strict
    * no_id="error" trial the converter-guided std_with_counts parse
    * needs). Driver/executor-side twin of [[rulesToColumn]]; any rule
    * change automatically affects all three renderers. */
  def rulesEval(rules: Seq[Rule], cleaned: String): Option[String] = {
    val xns = cleaned.replace(" ", "")
    rules.find { r =>
      r.anyOf.exists(matchEval(_, cleaned, xns)) &&
        r.allOf.forall(matchEval(_, cleaned, xns)) &&
        !r.butNot.exists(matchEval(_, cleaned, xns))
    }.map(_.out)
  }

  // Precompiled patterns for the per-row cleaning twins (r10 ADVICE):
  // String.replaceAll compiles its pattern on EVERY call, and these
  // twins run once per row inside the lut_std kernel. Matcher
  // .replaceAll is the exact engine + replacement semantics that
  // String.replaceAll delegates to, so the chains are bit-identical.
  private lazy val pLeadNumDash = java.util.regex.Pattern.compile("^\\d+\\s*-\\s*")
  private lazy val pDash = java.util.regex.Pattern.compile("-")
  private lazy val pStar = java.util.regex.Pattern.compile("\\*")
  private lazy val pOfficer = java.util.regex.Pattern.compile("OF[FI]{2}CERS?|SUBJECT")
  private lazy val pLeadCount = java.util.regex.Pattern.compile("^\\s*\\d\\s+")
  private lazy val pMultiSpace = java.util.regex.Pattern.compile("\\s{2,}")
  private lazy val pRacePunct = java.util.regex.Pattern.compile("[*.-]")
  private lazy val pGenderSep = java.util.regex.Pattern.compile("[-_ ']")
  private lazy val nonLatinoPattern =
    java.util.regex.Pattern.compile(NonLatinoRe)

  /** The shared injury regex chain (between upper-casing and the
    * variant-specific trim) — one definition for both injury twins. */
  private def injuryChain(up: String): String = {
    val a = pLeadNumDash.matcher(up).replaceAll("")
    val b = pDash.matcher(a).replaceAll(" ")
    val c = pStar.matcher(b).replaceAll("")
    val d = pOfficer.matcher(c).replaceAll("")
    val e = pLeadCount.matcher(d).replaceAll("") // leading count (_converters.py:793)
    pMultiSpace.matcher(e).replaceAll(" ")
  }

  /** Plain-string twin of [[cleanInjury]] (same regex chain).
    * Locale.ROOT: a tr-TR executor JVM would uppercase "injured" to
    * dotted-capital-I and silently diverge from Spark's upper(). */
  def cleanInjuryStr(s: String): String =
    injuryChain(s.toUpperCase(java.util.Locale.ROOT)).trim

  /** Strict injury standardization of a plain string: Some(category)
    * only when a vocabulary rule fires. */
  def injuryStdStrict(raw: String): Option[String] =
    rulesEval(injuryRules, cleanInjuryStr(raw))

  // ---- SQL renderer (DuckDB dialect) -----------------------------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def matchSql(m: Matcher, x: String, xns: String): String = m match {
    case InSet(vals, ns) =>
      s"${if (ns) xns else x} IN (${vals.map(sqlLit).mkString(", ")})"
    case ContainsAny(subs, ns) =>
      subs.map(s => s"contains(${if (ns) xns else x}, ${sqlLit(s)})").mkString("(", " OR ", ")")
    case StartsWithAny(ps) =>
      ps.map(p => s"starts_with($x, ${sqlLit(p)})").mkString("(", " OR ", ")")
    case MatchesRegex(re) => s"regexp_matches($x, ${sqlLit(re)})"
  }

  /** Render rules as a SQL CASE over the cleaned expression `x`
    * (DuckDB dialect), with `orig` as the fallback. */
  def rulesToSql(rules: Seq[Rule], x: String, orig: String): String = {
    val xns = s"replace($x, ' ', '')"
    val whens = rules.map { r =>
      val parts = Seq(r.anyOf.map(matchSql(_, x, xns)).mkString("(", " OR ", ")")) ++
        r.allOf.map(m => matchSql(m, x, xns)) ++
        r.butNot.map(m => "NOT " + matchSql(m, x, xns))
      s"WHEN ${parts.mkString(" AND ")} THEN ${sqlLit(r.out)}"
    }
    s"CASE ${whens.mkString(" ")} ELSE $orig END"
  }

  // ---- Cleaning (normalize-before-match, _converters.py:478) -----------

  // Plain-string twins of the Column cleaning chains below — the
  // fourth renderer (the lut_std KERNEL, see kernelEval) runs these on
  // executors. Parity notes: upper() goes through UTF8String
  // .toUpperCase (bit-identical to Spark's Upper expression, unlike
  // String.toUpperCase under a non-ROOT default locale); trimSpaces
  // strips ONLY ' ' like SQL trim (Java String.trim also strips
  // control chars); replaceAll is the same java.util.regex engine
  // Spark's regexp_replace runs. LutKernelSpec pins kernel ≡ chain
  // per LUT over the full test vocabulary plus random strings.
  private def upperStr(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).toUpperCase.toString

  private[ops] def trimSpaces(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  def trimUpperStr(s: String): String = trimSpaces(upperStr(s))

  def cleanRaceStr(s: String): String =
    trimSpaces(pRacePunct.matcher(upperStr(s).replace('_', ' ')).replaceAll(""))

  def cleanGenderStr(s: String): String =
    pGenderSep.matcher(upperStr(s)).replaceAll("")

  /** Exact string twin of the Column [[cleanInjury]] chain (distinct
    * from [[cleanInjuryStr]], the Java-trim variant the converter-
    * guided injury parse has always used). */
  def cleanInjuryColStr(s: String): String =
    trimSpaces(injuryChain(upperStr(s)))

  private lazy val abbrevFullPattern =
    java.util.regex.Pattern.compile(AbbrevFullRe)

  def cleanRaceFullStr(s: String): String = {
    val up = upperStr(s)
    val stripped = nonLatinoPattern.matcher(up).replaceAll("")
    val strippedTrim = trimSpaces(stripped)
    val base = if (strippedTrim.nonEmpty) strippedTrim else trimSpaces(up)
    val m = abbrevFullPattern.matcher(base)
    // regexp_extract semantics: first find(), group text ('' when the
    // pattern never matches — the rlike guard makes that case moot)
    val expanded = if (m.find()) {
      val g1 = trimSpaces(Option(m.group(1)).getOrElse(""))
      val g2 = trimSpaces(Option(m.group(2)).getOrElse(""))
      if (g1.length == 1 && g2.length > 1) g2
      else if (g2.length == 1 && g1.length > 1) g1
      else base
    } else base
    cleanRaceStr(expanded)
  }

  /** Race-style cleaning: upper, '_'→' ', drop '*' '-' '.', trim. */
  def cleanRace(c: Column): Column =
    trim(regexp_replace(regexp_replace(upper(c), "_", " "), "[*.-]", ""))
  val cleanRaceSql: String =
    "trim(regexp_replace(replace(upper(raw), '_', ' '), '[*.-]', '', 'g'))"

  /** The reference's non-Latino suffix pattern (_converters.py:27
    * `_p_nonlatino`) — RE2-safe, identical literal on both renderers. */
  private val NonLatinoRe = "[\\s,]*NON\\-?(HISPANIC|LATINO)(\\s|$)+"
  /** "{abbrev} {- or =} {full name}" code form (_converters.py:425). */
  private val AbbrevFullRe = "^([\\w\\s/\\.]+)\\s?[-=]\\s?([\\w\\s/\\.]+)$"

  /** Full race-column cleaning — [[cleanRace]] plus two reference
    * behaviors that must NOT apply to the ethnicity column:
    *   1. strip a NON-HISPANIC / NON-LATINO qualifier when a non-empty
    *      remainder survives ("WHITE, NON-HISPANIC" → "WHITE";
    *      _converters.py:420);
    *   2. expand "{abbrev} - {full name}" codes to the full name
    *      ("W - WHITE" → "WHITE"; _converters.py:425). */
  def cleanRaceFull(c: Column): Column = {
    val up = upper(c)
    val stripped = regexp_replace(up, NonLatinoRe, "")
    val base = when(length(trim(stripped)) > 0, trim(stripped)).otherwise(trim(up))
    val g1 = trim(regexp_extract(base, AbbrevFullRe, 1))
    val g2 = trim(regexp_extract(base, AbbrevFullRe, 2))
    val expanded = when(base.rlike(AbbrevFullRe) && length(g1) === 1 && length(g2) > 1, g2)
      .when(base.rlike(AbbrevFullRe) && length(g2) === 1 && length(g1) > 1, g1)
      .otherwise(base)
    cleanRace(expanded)
  }
  val cleanRaceFullSql: String = {
    val nl = "'[\\s,]*NON\\-?(HISPANIC|LATINO)(\\s|$)+'"
    val af = "'^([\\w\\s/\\.]+)\\s?[-=]\\s?([\\w\\s/\\.]+)$'"
    val stripped = s"regexp_replace(upper(raw), $nl, '', 'g')"
    val base = s"(CASE WHEN length(trim($stripped)) > 0 THEN trim($stripped) ELSE trim(upper(raw)) END)"
    val g1 = s"trim(regexp_extract($base, $af, 1))"
    val g2 = s"trim(regexp_extract($base, $af, 2))"
    val expanded = s"(CASE WHEN regexp_matches($base, $af) AND length($g1) = 1 AND length($g2) > 1 THEN $g2 " +
      s"WHEN regexp_matches($base, $af) AND length($g2) = 1 AND length($g1) > 1 THEN $g1 ELSE $base END)"
    s"trim(regexp_replace(replace($expanded, '_', ' '), '[*.-]', '', 'g'))"
  }

  /** Gender-style cleaning: upper, drop '-' '_' ' ' '''. */
  def cleanGender(c: Column): Column =
    regexp_replace(upper(c), "[-_ ']", "")
  val cleanGenderSql: String =
    "regexp_replace(upper(raw), '[-_ '']', '', 'g')"

  /** Injury-style cleaning: upper, strip a leading "<n> - " label,
    * '-'→' ', drop '*', drop OFFICER/SUBJECT words, collapse spaces. */
  def cleanInjury(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(upper(c), "^\\d+\\s*-\\s*", ""),
              "-", " "),
            "\\*", ""),
          "OF[FI]{2}CERS?|SUBJECT", ""),
        "^\\s*\\d\\s+", ""), // leading count (_converters.py:793)
      "\\s{2,}", " "))
  val cleanInjurySql: String =
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      "regexp_replace(upper(raw), '^\\d+\\s*-\\s*', ''), '-', ' ', 'g'), " +
      "'\\*', '', 'g'), 'OF[FI]{2}CERS?|SUBJECT', '', 'g'), " +
      "'^\\s*\\d\\s+', ''), '\\s{2,}', ' ', 'g'))"

  // ---- Race vocabulary -------------------------------------------------

  val UNSPECIFIED = "UNSPECIFIED"

  val raceRules: Seq[Rule] = Seq(
    Rule(Seq(InSet(Seq("MISSING", "NOT SPECIFIED", "", "NOT RECORDED", "N/A",
                       "NOT REPORTED", "NONE", "BLANK", "NOT SPECIF")),
             ContainsAny(Seq("NO DATA", "NO RACE", "NULL"))), UNSPECIFIED),
    Rule(Seq(InSet(Seq("W", "CAUCASIAN", "WN", "WHITE", "WHTE", "WHT",
                       "WHITE,OTHER"), noSpace = true)),
         "WHITE"),
    Rule(Seq(InSet(Seq("B", "AFRICAN AMERICAN", "BLCK", "BLK", "BLACE",
                       "AFR AMERICAN", "AFR AM", "BLK/AFR AM")),
             InSet(Seq("AFRICANAMERICAN"), noSpace = true),
             // the reference's BLACK?($|[^A-Za-z]) search (e.g.
             // "BLACK/AFRICAN AMERICAN", "BLAC "); the is_latino guard
             // below keeps "BLACK HISPANIC" flowing to the Latino rule
             MatchesRegex("BLACK?($|[^A-Za-z])")),
         "BLACK",
         butNot = Seq(ContainsAny(Seq("HISPANIC", "LATINO")))),
    Rule(Seq(InSet(Seq("SOUTH ASIAN", "EAST INDIAN", "ASIAN INDIAN"))),
         "SOUTH ASIAN"),
    // Combined ME/SA category before plain Middle Eastern
    // (_converters.py:517 MIDDLE_EASTERN_SOUTH_ASIAN).
    Rule(Seq(ContainsAny(Seq("MIDDLE EAST"))), "MIDDLE EASTERN/SOUTH ASIAN",
         allOf = Seq(ContainsAny(Seq("SOUTH ASIAN")))),
    Rule(Seq(InSet(Seq("ME", "ARABIC")), ContainsAny(Seq("MIDDLE EAST"))),
         "MIDDLE EASTERN",
         butNot = Seq(ContainsAny(Seq("AFRICA")))),
    // Asian + Pacific combo → AAPI; pure Asian next; pure Pacific after.
    Rule(Seq(ContainsAny(Seq("ASIAN"))), "ASIAN/PACIFIC ISLANDER",
         allOf = Seq(ContainsAny(Seq("PAC", "HAWAI")))),
    Rule(Seq(InSet(Seq("A", "ORIENTAL", "AA", "ASN")), ContainsAny(Seq("ASIAN"))),
         "ASIAN",
         butNot = Seq(ContainsAny(Seq("CAUCASIAN", "INDIAN")),
                      InSet(Seq("SOUTHWEST ASIAN")))),
    Rule(Seq(ContainsAny(Seq("HAWAI")),
             ContainsAny(Seq("PACIF", "PACISL"), noSpace = true),
             InSet(Seq("PI", "NHPI"))),
         "HAWAIIAN/PACIFIC ISLANDER"),
    Rule(Seq(InSet(Seq("H", "WH", "HISPANIC", "LATINO", "HISPANIC OR LATINO",
                       "LATINO OR HISPANIC", "HISPANIC/LATINO", "LATINO/HISPANIC",
                       "HISPANIC/LATIN/MEXICAN", "HISP", "HIS"))),
         "HISPANIC/LATINO"),
    Rule(Seq(InSet(Seq("I", "INDIAN", "ALASKAN NATIVE", "AN", "AI", "AL NATIVE",
                       "A/INDIAN", "NAT AM")),
             ContainsAny(Seq("AMERICAN IND", "NATIVE AM", "ALASK", "NAT AMER")),
             ContainsAny(Seq("AMERIND", "AMIND"), noSpace = true)),
         "INDIGENOUS"),
    Rule(Seq(ContainsAny(Seq("OR MORE", "MULTI")),
             InSet(Seq("2ORMORE", "MIXED", "BIRACIAL", "MIXEDRACE"), noSpace = true)),
         "MULTIPLE"),
    Rule(Seq(ContainsAny(Seq("UNK"))), "OTHER OR UNKNOWN",
         allOf = Seq(ContainsAny(Seq("OTH")))),
    Rule(Seq(ContainsAny(Seq("UNK")), InSet(Seq("U", "UK"))), "UNKNOWN"),
    Rule(Seq(InSet(Seq("O", "OTHER", "OTH")),
             ContainsAny(Seq("OTHER RACE", "OTHER UNCLASS"))), "OTHER"),
    // Census-style aggregation fallbacks (_converters.py:556 agg_cat
    // branch) — checked after every primary category, like the reference.
    Rule(Seq(InSet(Seq("CAMBODIAN", "VIETNAMESE", "LAOTIAN", "JAPANESE",
                       "KOREAN", "CHINESE", "HMONG", "MIEN", "FILIPINO"))), "ASIAN"),
    Rule(Seq(InSet(Seq("POLYNESIAN", "SAMOAN", "GUAMANIAN"))),
         "HAWAIIAN/PACIFIC ISLANDER"),
    Rule(Seq(InSet(Seq("MEXICAN")), ContainsAny(Seq("HISP", "LATIN"))),
         "HISPANIC/LATINO",
         butNot = Seq(ContainsAny(Seq("NONHISP", "NONLATINO"), noSpace = true))),
    Rule(Seq(InSet(Seq("EAST AFRICAN"))), "BLACK"),
    Rule(Seq(InSet(Seq("BOSNIAN"))), "WHITE")
  )

  /** Per-source race code tables (letter/numeric codes documented in
    * _converters.py:330-420) — applied BEFORE the generic vocabulary:
    * the code expands to its documented phrase, which then standardizes
    * through the rules above. */
  val sourceRaceCodes: Map[String, Seq[(String, String)]] = Map(
    "Chicago" -> Seq("BLK" -> "BLACK", "WHI" -> "WHITE",
      "API" -> "ASIAN/PACIFIC ISLANDER", "WBH" -> "BLACK HISPANIC",
      "WWH" -> "WHITE HISPANIC", "I" -> "AMER IND/ALASKAN NATIVE",
      "U" -> "UNKNOWN", "P" -> "NATIVE HAWAIIAN OR OTHER PACIFIC ISLANDER",
      "WHT" -> "WHITE"),
    "Los Angeles" -> Seq("A" -> "OTHER ASIAN", "B" -> "BLACK", "C" -> "CHINESE",
      "D" -> "CAMBODIAN", "F" -> "FILIPINO", "G" -> "GUAMANIAN",
      "H" -> "HISPANIC/LATIN/MEXICAN", "I" -> "AMERICAN INDIAN/ALASKAN NATIVE",
      "J" -> "JAPANESE", "K" -> "KOREAN", "L" -> "LAOTIAN", "O" -> "OTHER",
      "P" -> "PACIFIC ISLANDER", "S" -> "SAMOAN", "U" -> "HAWAIIAN",
      "V" -> "VIETNAMESE", "W" -> "WHITE", "X" -> "UNKNOWN", "Z" -> "ASIAN INDIAN"),
    "Austin" -> Seq("M" -> "MIDDLE EASTERN",
      "P" -> "PACIFIC ISLANDER/NATIVE HAWAIIAN", "N" -> "NATIVE AMERICAN/ALASKAN",
      "O" -> "OTHER"),
    "New York City" -> Seq("P" -> "BLACK HISPANIC", "Q" -> "WHITE HISPANIC",
      "X" -> "UNKNOWN", "Z" -> "OTHER"),
    "Dallas" -> Seq("L" -> "CAUCASIAN HISPANIC"),
    "Charleston" -> Seq("A" -> "ASIAN OR PACIFIC ISLANDER",
      "AI" -> "ALASKAN OR AMERICAN INDIAN", "AP" -> "ASIAN OR PACIFIC ISLANDER",
      "BK" -> "BLACK", "MR" -> "MULTI-RACIAL", "AO" -> "OTHER"),
    // Numeric code dictionaries (California RIPA, Lincoln LPD)
    "California" -> Seq("1" -> "ASIAN", "2" -> "BLACK", "3" -> "HISPANIC/LATINO",
      "4" -> "MIDDLE EASTERN/SOUTH ASIAN", "5" -> "AMERICAN INDIAN",
      "6" -> "PACIFIC ISLANDER", "7" -> "WHITE", "8" -> "TWO OR MORE"),
    "Lincoln" -> Seq("1" -> "WHITE", "2" -> "BLACK", "3" -> "HISPANIC/LATINO",
      "4" -> "ASIAN", "5" -> "AMERICAN INDIAN", "6" -> "OTHER"))

  /** Source-aware race standardization: documented per-source codes
    * expand first, then the generic vocabulary applies. Unknown sources
    * behave exactly like [[raceStd]]. */
  def raceStdForSource(raw: Column, source: String, noId: String = "keep"): Column = {
    val expanded = sourceRaceCodes.get(source) match {
      case Some(codes) => codesToColumn(codes, raw)
      case None => raw
    }
    raceStd(expanded, noId)
  }

  // ---- Gender vocabulary -----------------------------------------------

  val genderRules: Seq[Rule] = Seq(
    Rule(Seq(InSet(Seq("MISSING", "UNSPECIFIED", "", ",", "NOTSPECIFIED",
                       "NOTRECORDED", "NONE", "BLANK", "N/A", "NONSPECIFIED")),
             ContainsAny(Seq("NODATA", "NOSEX", "NULL"))), UNSPECIFIED),
    Rule(Seq(InSet(Seq("F", "FEMALE", "FEMAALE", "FFEMALE", "FEMAL",
                       "FEMALE/WOMAN", "WOMAN", "WOMAN/GIRL"))), "FEMALE"),
    Rule(Seq(InSet(Seq("M", "MALE", "MMALE", "MALE/MAN", "MAN", "MLE",
                       "MAN/BOY"))), "MALE"),
    Rule(Seq(InSet(Seq("TRANSGENDERMALE")), ContainsAny(Seq("TRANSGENDERMAN"))),
         "TRANSGENDER MALE"),
    Rule(Seq(InSet(Seq("TRANSGENDERFEMALE")), ContainsAny(Seq("TRANSGENDERWOMAN"))),
         "TRANSGENDER FEMALE"),
    Rule(Seq(InSet(Seq("TRANSGENDER", "TRANSGENDERED"))), "TRANSGENDER"),
    Rule(Seq(InSet(Seq("NONBINARY"))), "GENDER NON-BINARY"),
    Rule(Seq(InSet(Seq("GENDERNONCONFORMING", "NONCONFORMING", "GENDERDIVERSE")),
             ContainsAny(Seq("TGNC"))), "TRANSGENDER OR GENDER NON-CONFORMING"),
    Rule(Seq(InSet(Seq("OTHER", "O"))), "OTHER"),
    Rule(Seq(InSet(Seq("U", "UNK", "UNKNOWN", "UK"))), "UNKNOWN")
  )

  /** Per-source gender code tables (_converters.py:637-668: California
    * RIPA and Lincoln numeric codes; NYC/LA/Chicago letter codes). */
  val sourceGenderCodes: Map[String, Seq[(String, String)]] = Map(
    "California" -> Seq("1" -> "MALE", "2" -> "FEMALE", "3" -> "TRANSGENDER MALE",
      "4" -> "TRANSGENDER FEMALE", "5" -> "GENDER NONCONFORMING"),
    "Lincoln" -> Seq("1" -> "MALE", "2" -> "FEMALE"),
    "New York City" -> Seq("Z" -> "UNKNOWN"),
    "Los Angeles" -> Seq("X" -> "UNKNOWN"),
    "Chicago" -> Seq("X" -> "UNKNOWN"))

  /** Source-aware gender standardization (codes expand first). */
  def genderStdForSource(raw: Column, source: String, noId: String = "keep"): Column = {
    val expanded = sourceGenderCodes.get(source) match {
      case Some(codes) => codesToColumn(codes, raw)
      case None => raw
    }
    genderStd(expanded, noId)
  }

  // ---- Role vocabulary (_converters.py:129 convert_off_or_civ) ---------

  val roleRules: Seq[Rule] = Seq(
    Rule(Seq(InSet(Seq("", "MISSING"))), UNSPECIFIED),
    Rule(Seq(InSet(Seq("OFFICER"))), "OFFICER"),
    Rule(Seq(InSet(Seq("SUBJECT", "CIVILIAN", "CITIZEN"))), "SUBJECT")
  )

  /** raw → OFFICER / SUBJECT / UNSPECIFIED (data.py person-type roles). */
  def roleStd(raw: Column, noId: String = "keep"): Column =
    kernelCol("role", raw, noId)

  def roleStdDecl(raw: Column, noId: String = "keep"): Column =
    when(raw.isNull, lit(UNSPECIFIED))
      .otherwise(rulesToColumnLut(roleRules, trim(upper(raw)), noIdFallback(raw, noId)))

  // ---- Injury vocabulary -----------------------------------------------

  // the FULL keyword list of _converters.py:815-822 (spelling variants
  // included; 'MARK' subsumes 'MARKS', 'FRACTURE' subsumes 'FRACTURED',
  // 'MINOR' subsumes 'MINOR INJUR') — a silent subset here would keep
  // raw values the reference maps to INJURED
  private val injuredKeywords = Seq(
    "WOUND", "PAIN", "BLEEDING", "SWELLING", "SCRAPE", "PUNCTURE",
    "LACERATION", "BRUIS", "BROKEN", "UNCONSCIOUS", "FIRST AID",
    "INJURED INCIDENTALLY", "DISLOCATED", "FRACTURE", "ABBRASION",
    "ABRASION", "ABRAISON", "ABRASSION", "BUSTED", "PULLED OUT",
    "REDNESS", "LOSS", "RASH", "SCRATCH", "NUMBNESS", "BREATHING",
    "CUT", "STUN", "MARK", "EYE", "PEELING", "HURT", "ELBOW", "KNEE",
    "SOFT TISSUE", "BLOOD", "HEAD", "SORE", "SHOULDER", "FINGER",
    "IMPACT", "FACE", "ARM", "MOUTH", "BACK", "RIB", "THUMB", "SHIN",
    " EAR", "ACHILLES", "STRUCK", "LEG", "SERIOUS", "CONCUSSION",
    "CANINE BITE", "BURN", "MINOR", "DISABL", "PHYSICAL INJURY",
    "TREATED", "TAKEN TO HOSPITAL", "SHOT", "VISIBLE INJURY",
    "BODILY INJURY", "MAJOR INJURY")

  val injuryRules: Seq[Rule] = Seq(
    Rule(Seq(InSet(Seq("", "UNSPECIFIED", "NOT AVAILABLE", "NOT SPECIFIED",
                       "(MISSING)", "NA"))), UNSPECIFIED),
    // any non-negative integer: > 0 is INJURED, all-zero is NO INJURY
    // (the reference's isdigit branch, _converters.py:776 — not just
    // the literals 1-5)
    Rule(Seq(MatchesRegex("^0+$")), "NO INJURY"),
    Rule(Seq(MatchesRegex("^[0-9]+$")), "INJURED"),
    Rule(Seq(ContainsAny(Seq("SUICIDE")),
             InSet(Seq("SELF INFLICTED FATAL", "DECEASED (SELF INFLICTED)",
                       "KILLED (SELF INFLICTED)"))), "SELF-INFLICTED FATAL"),
    // is_fatal (_converters.py:805-811): "YES ..." plus a fatal word
    // and no nonfatal word is a FATALITY, not the INJURED the bare
    // YES-prefix rule below would report
    Rule(Seq(StartsWithAny(Seq("YES ", "YES,"))), "FATAL",
         allOf = Seq(ContainsAny(Seq("FATAL", "KILLED", "DECEASED", "DEATH"))),
         butNot = Seq(ContainsAny(Seq("INJURED", "NON FATAL", "INJURY")))),
    Rule(Seq(InSet(Seq("FATAL", "KILLED", "DECEASED", "DEATH", "FATAL INJURY"))),
         "FATAL"),
    Rule(Seq(ContainsAny(Seq("SELF INFLICTED GUNSHOT WOUND"))),
         "SELF-INFLICTED INJURY"),
    Rule(Seq(StartsWithAny(Seq("NO INJUR", "NONE", "NO COMPLAINT")),
             InSet(Seq("NOT INJURED", "NEITHER", "NO", "N", "MISS",
                       "SHOOT AND MISS", "FALSE", "NO VISIBLE INJURY",
                       "UNINJURED", "SHOW OF FORCE"))), "NO INJURY"),
    Rule(Seq(InSet(Seq("Y", "YES", "TRUE", "INJURY", "INJURED", "NON FATAL",
                       "NON FATAL INJURY")),
             StartsWithAny(Seq("YES,", "YES ", "COMPLAINED OF", "COMPLAINT OF")),
             ContainsAny(injuredKeywords)), "INJURED"),
    Rule(Seq(InSet(Seq("UNKNOWN", "UNKNWON"))), "UNKNOWN"),
    Rule(Seq(InSet(Seq("OTHER"))), "OTHER")
  )

  // ---- Fatal / firearm (yes-no style) ----------------------------------

  val fatalRules: Seq[Rule] = Seq(
    Rule(Seq(InSet(Seq(""))), UNSPECIFIED),
    Rule(Seq(InSet(Seq("FATAL", "YES", "Y", "DECEASED", "1"))), "YES"),
    Rule(Seq(InSet(Seq("NON-FATAL", "NON FATAL", "NO", "N", "NO CONTACT", "0"))), "NO"),
    Rule(Seq(InSet(Seq("SELF-INFLICTED"))), "SELF-INFLICTED FATAL")
  )

  val firearmRules: Seq[Rule] = Seq(
    Rule(Seq(InSet(Seq(""))), UNSPECIFIED),
    // any positive integer is YES, all-zero NO (the reference's
    // isdigit branch, _converters.py:887 — not just the literal "1")
    Rule(Seq(MatchesRegex("^0+$")), "NO"),
    Rule(Seq(MatchesRegex("^[0-9]+$")), "YES"),
    Rule(Seq(InSet(Seq("YES", "Y", "TRUE", "FIREARM"))), "YES"),
    Rule(Seq(InSet(Seq("NO", "N", "FALSE", "PHYSICAL FORCE", "ELECTRICAL WEAPON",
                       "OC SPRAY", "IMPACT WEAPON", "NO FORCE")),
             ContainsAny(Seq("CANINE", "BLANKET", "DISPLAYED", "CUTTING"))), "NO")
  )

  // ---- Ethnicity vocabulary (_converters.py:233, defs.py:491) ----------

  val ethRules: Seq[Rule] = Seq(
    // NONE is NOT unspecified here: the reference's non-Latino check
    // (_converters.py:269, x in ["N","NH","NHIS","NONE"]) claims it —
    // and runs before the unspecified set, which does not list NONE
    Rule(Seq(ContainsAny(Seq("NONHISPANIC", "NONLATINO", "NOTHISPANIC"), noSpace = true),
             InSet(Seq("N", "NH", "NHIS", "NONE", "NON HISPANIC", "NON-HISPANIC"))),
         "NON-HISPANIC/NON-LATINO"),
    Rule(Seq(InSet(Seq("MISSING", "NOT SPECIFIED", "", "NOT RECORDED", "N/A",
                       "BLANK")),
             ContainsAny(Seq("NO DATA", "NULL"))), UNSPECIFIED),
    Rule(Seq(InSet(Seq("H", "L", "HISP", "HIS")),
             ContainsAny(Seq("HISPANIC", "LATINO"))), "HISPANIC/LATINO"),
    Rule(Seq(InSet(Seq("ME", "ARABIC")), ContainsAny(Seq("MIDDLE EAST"))),
         "MIDDLE EASTERN"),
    Rule(Seq(ContainsAny(Seq("UNK")), InSet(Seq("U", "UK"))), "UNKNOWN")
  )

  /** raw → standardized ethnicity category (null → UNSPECIFIED).
    * `noId` honors the reference's unknown-value modes like every
    * other LUT (_create_ethnicity_lut raises under no_id="error"). */
  def ethStd(raw: Column, noId: String = "keep"): Column =
    kernelCol("eth", raw, noId)

  def ethStdDecl(raw: Column, noId: String = "keep"): Column =
    when(raw.isNull, lit(UNSPECIFIED))
      .otherwise(rulesToColumnLut(ethRules, cleanRace(raw), noIdFallback(raw, noId)))

  // ---- End-to-end column builders + matching oracle SQL ----------------

  /** The reference's `no_id` unidentified-value modes
    * (_converters.py:293 signature): "keep" passes the original value
    * through, "null" maps it to empty string, "error" fails the job
    * with the offending value (raise_error — the Spark analogue of the
    * reference's ValueError). */
  def noIdFallback(raw: Column, noId: String): Column = noId match {
    case "keep"  => trim(upper(raw))
    case "null"  => lit("")
    case "error" => raise_error(concat(lit("Unknown value in column: "), raw)).cast("string")
    case other   => throw new IllegalArgumentException(s"noId must be keep|null|error, got $other")
  }

  // ---- Kernel renderer (the fourth renderer, r10) -----------------------
  // Motivation is ANALYZER/OPTIMIZER time, not row cost: the
  // declarative LUT trees (map literal + regex-chain residue over a
  // regex cleaning subtree) are thousands of expression nodes, and
  // Catalyst re-optimizes them on EVERY execution — measured as ~3.5 s
  // of driver time per run on q_expand_counts' 10-row input. The
  // lut_std kernel is ONE expression node evaluating the same rules
  // through [[rulesEval]] (already the spec-pinned third renderer) and
  // the string cleaning twins above. The declarative builders remain
  // below as `*StdDecl` — LutKernelSpec pins kernel ≡ declarative per
  // LUT over the full vocabulary plus random fuzz.

  /** (cleaning twin, rules) per kernel LUT name. */
  val kernelLuts: Map[String, (String => String, Seq[Rule])] = Map(
    "race" -> ((cleanRaceFullStr _, raceRules)),
    "eth" -> ((cleanRaceStr _, ethRules)),
    "gender" -> ((cleanGenderStr _, genderRules)),
    "injury" -> ((cleanInjuryColStr _, injuryRules)),
    "fatal" -> ((trimUpperStr _, fatalRules)),
    "firearm" -> ((trimUpperStr _, firearmRules)),
    "role" -> ((trimUpperStr _, roleRules)))

  /** Executor-side evaluation of one LUT over one raw value — called
    * from the lut_std expression's eval/codegen. Null → UNSPECIFIED
    * (matching the `when(raw.isNull, …)` head of every declarative
    * builder); a rules miss applies the no_id mode exactly like
    * [[noIdFallback]]. */
  def kernelEval(lut: String,
                 raw: org.apache.spark.unsafe.types.UTF8String,
                 noId: String): org.apache.spark.unsafe.types.UTF8String = {
    import org.apache.spark.unsafe.types.UTF8String
    if (raw == null) return UTF8String.fromString(UNSPECIFIED)
    val (clean, rules) = kernelLuts(lut)
    val s = raw.toString
    rulesEval(rules, clean(s)) match {
      case Some(out) => UTF8String.fromString(out)
      case None => noId match {
        case "keep" => UTF8String.fromString(trimUpperStr(s))
        case "null" => UTF8String.EMPTY_UTF8
        case "error" => throw new RuntimeException("Unknown value in column: " + s)
        case other => throw new IllegalArgumentException(
          s"noId must be keep|null|error, got $other")
      }
    }
  }

  private def kernelCol(lut: String, raw: Column, noId: String): Column = {
    // validate the mode EAGERLY, like noIdFallback always did — the
    // expression's own require would otherwise only fire at analysis
    require(Seq("keep", "null", "error").contains(noId),
      s"noId must be keep|null|error, got $noId")
    graft.functions.GraftFunctions.lutStd(raw, lut, noId)
  }

  /** raw → standardized race category (null → UNSPECIFIED). */
  def raceStd(raw: Column, noId: String = "keep"): Column =
    kernelCol("race", raw, noId)

  /** Declarative spec twin of [[raceStd]] (LutKernelSpec pins ≡). */
  def raceStdDecl(raw: Column, noId: String = "keep"): Column =
    when(raw.isNull, lit(UNSPECIFIED))
      .otherwise(rulesToColumnLut(raceRules, cleanRaceFull(raw), noIdFallback(raw, noId)))

  /** raw → standardized gender category (null → UNSPECIFIED). */
  def genderStd(raw: Column, noId: String = "keep"): Column =
    kernelCol("gender", raw, noId)

  def genderStdDecl(raw: Column, noId: String = "keep"): Column =
    when(raw.isNull, lit(UNSPECIFIED))
      .otherwise(rulesToColumnLut(genderRules, cleanGender(raw), noIdFallback(raw, noId)))

  /** raw → standardized injury category (null → UNSPECIFIED). */
  def injuryStd(raw: Column, noId: String = "keep"): Column =
    kernelCol("injury", raw, noId)

  def injuryStdDecl(raw: Column, noId: String = "keep"): Column =
    when(raw.isNull, lit(UNSPECIFIED))
      .otherwise(rulesToColumnLut(injuryRules, cleanInjury(raw), noIdFallback(raw, noId)))

  /** raw → FATAL yes/no category (_converters.py:853). */
  def fatalStd(raw: Column, noId: String = "keep"): Column =
    kernelCol("fatal", raw, noId)

  def fatalStdDecl(raw: Column, noId: String = "keep"): Column =
    when(raw.isNull, lit(UNSPECIFIED))
      .otherwise(rulesToColumnLut(fatalRules, trim(upper(raw)), noIdFallback(raw, noId)))

  /** raw → firearm yes/no category (_converters.py:884). */
  def firearmStd(raw: Column, noId: String = "keep"): Column =
    kernelCol("firearm", raw, noId)

  def firearmStdDecl(raw: Column, noId: String = "keep"): Column =
    when(raw.isNull, lit(UNSPECIFIED))
      .otherwise(rulesToColumnLut(firearmRules, trim(upper(raw)), noIdFallback(raw, noId)))

  /** Matching oracle SQL expressions over a column literally named `raw`. */
  def raceStdSql: String =
    s"CASE WHEN raw IS NULL THEN '$UNSPECIFIED' ELSE " +
      rulesToSql(raceRules, cleanRaceFullSql, "trim(upper(raw))") + " END"
  def genderStdSql: String =
    s"CASE WHEN raw IS NULL THEN '$UNSPECIFIED' ELSE " +
      rulesToSql(genderRules, cleanGenderSql, "trim(upper(raw))") + " END"
  def injuryStdSql: String =
    s"CASE WHEN raw IS NULL THEN '$UNSPECIFIED' ELSE " +
      rulesToSql(injuryRules, cleanInjurySql, "trim(upper(raw))") + " END"
  def ethStdSql: String =
    s"CASE WHEN raw IS NULL THEN '$UNSPECIFIED' ELSE " +
      rulesToSql(ethRules, cleanRaceSql, "trim(upper(raw))") + " END"
  def fatalStdSql: String =
    s"CASE WHEN raw IS NULL THEN '$UNSPECIFIED' ELSE " +
      rulesToSql(fatalRules, "trim(upper(raw))", "trim(upper(raw))") + " END"
  def firearmStdSql: String =
    s"CASE WHEN raw IS NULL THEN '$UNSPECIFIED' ELSE " +
      rulesToSql(firearmRules, "trim(upper(raw))", "trim(upper(raw))") + " END"

  // ---- custom output vocabularies --------------------------------------

  /** The standard output categories a rule set can emit (the keys a
    * caller may remap via race_cats/eth_cats/gender_cats). */
  def catValues(rules: Seq[Rule]): Set[String] = rules.map(_.out).toSet + UNSPECIFIED

  /** The reference's custom-category support (`standardize(race_cats=…)`,
    * defs.get_race_cats / tests/test_preproc.py:152): substitute
    * caller-supplied labels for standard category values AFTER the LUT.
    * Unknown keys are rejected up front, mirroring the reference's
    * ValueError (test_race_cats_bad_input). */
  def remapCats(std: Column, overrides: Map[String, String],
                valid: Set[String], what: String): Column = {
    val bad = overrides.keySet -- valid
    require(bad.isEmpty,
      s"Invalid $what categories: ${bad.toSeq.sorted.mkString(", ")}")
    if (overrides.isEmpty) std
    else coalesce(element_at(typedLit(overrides), std), std)
  }
}
