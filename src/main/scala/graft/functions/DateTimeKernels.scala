package graft.functions

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/** JVM ports of graft.ops.Dates.parseDateFlexible / parseTime — the
  * kernel renderers behind the `parse_date_flexible` / `parse_time_std`
  * expressions.
  *
  * Why a third renderer exists (see SCALING.md round 10): the Column
  * chains are ~150-node expression trees that the Standardizer's
  * column-identification stage instantiates once per CANDIDATE column —
  * Catalyst analysis, AQE per-stage re-planning, and Janino all walk
  * (and compile) every copy, and that driver-side work dominated
  * q_standardize_e2e's per-call cost. A kernel collapses each copy to
  * one expression node whose generated code is a single static call.
  *
  * Fidelity contract: the logic below mirrors the Column chains
  * branch-for-branch (same regexes, same guards, same fallthrough
  * order); date FORMAT parsing delegates to Spark's OWN
  * TimestampFormatter — the object try_to_timestamp resolves to — so
  * format semantics are identical by construction, not by imitation.
  * DatesKernelSpec pins kernel ≡ chain over the adversarial corpus;
  * any edit here must keep the chain renderer (the DuckDB oracle
  * replays ITS semantics) in lockstep.
  */
object DateParseImpl {

  // Spark's TimestampFormatter companion is private[sql] to scalac but
  // public at the JVM level; one reflective lookup at class-init buys
  // the exact parser try_to_timestamp uses. The Method handles are
  // cached — per-row cost is one Method.invoke on a JIT-inlined target.
  private val tfModule: AnyRef = {
    val c = Class.forName("org.apache.spark.sql.catalyst.util.TimestampFormatter$")
    c.getField("MODULE$").get(null)
  }
  private val legacySimple: AnyRef = {
    val c = Class.forName("org.apache.spark.sql.catalyst.util.LegacyDateFormats$")
    val m = c.getField("MODULE$").get(null)
    c.getMethod("SIMPLE_DATE_FORMAT").invoke(m)
  }
  private val applyM = tfModule.getClass.getMethods.find(m =>
    m.getName == "apply" && m.getParameterCount == 4 &&
      m.getParameterTypes()(0) == classOf[String] &&
      m.getParameterTypes()(1) == classOf[java.time.ZoneId] &&
      // distinguishes from apply(String, ZoneId, boolean, boolean)
      m.getParameterTypes()(2).getName == "scala.Enumeration$Value" &&
      m.getParameterTypes()(3) == java.lang.Boolean.TYPE).getOrElse(
    throw new IllegalStateException(
      "TimestampFormatter.apply(String, ZoneId, LegacyDateFormat, Boolean) not found"))

  /** One TimestampFormatter (as `parse(String): Long` micros). */
  final class Fmt(pattern: String, zone: java.time.ZoneId) {
    private val formatter: AnyRef =
      applyM.invoke(tfModule, pattern, zone, legacySimple,
        java.lang.Boolean.TRUE).asInstanceOf[AnyRef]
    private val parseM = formatter.getClass.getMethod("parse", classOf[String])
    /** Micros since epoch, or null when the pattern doesn't parse `s` —
      * exactly try_to_timestamp's contract. */
    def tryParse(s: String): java.lang.Long =
      try parseM.invoke(formatter, s).asInstanceOf[java.lang.Long]
      catch { case _: Throwable => null }
  }

  private val ReDot0 = Pattern.compile("\\.0$")
  private val ReHours = Pattern.compile("(?i)\\s*hours$")
  private val ReSpaces = Pattern.compile("\\s{2,}")
  private val ReD13 = Pattern.compile("^\\d{13}$")
  private val ReD10 = Pattern.compile("^\\d{10}$")
  private val ReD14 = Pattern.compile("^\\d{14}$")
  private val ReD8 = Pattern.compile("^\\d{8}$")
  private val ReQuarter = Pattern.compile("^(\\d{4})\\s*-?\\s*Q([1-4])$")
  private val ReMdy2 = Pattern.compile("^(\\d{1,2})/(\\d{1,2})/(\\d{2})$")

  private def localToMicros(ldt: java.time.LocalDateTime,
                            zone: java.time.ZoneId): Long = {
    val instant = ldt.atZone(zone).toInstant
    Math.addExact(Math.multiplyExact(instant.getEpochSecond, 1000000L),
      instant.getNano / 1000L)
  }
}

/** Per-(formats, zone) parser state; one instance per expression, shipped
  * to executors as a codegen reference object. */
final class DateParseImpl(formats: Seq[String], zone: java.time.ZoneId)
    extends Serializable {
  import DateParseImpl._

  @transient private lazy val fmt14 = new Fmt("yyyyMMddHHmmss", zone)
  @transient private lazy val fmt8 = new Fmt("yyyyMMdd", zone)
  @transient private lazy val fallbacks = formats.map(new Fmt(_, zone)).toArray

  /** Micros since epoch or null — the parseDateFlexible chain. */
  def parse(raw: UTF8String): java.lang.Long = {
    if (raw == null) return null
    var s = raw.trim().toString
    s = ReDot0.matcher(s).replaceAll("")
    s = ReHours.matcher(s).replaceAll("")
    s = ReSpaces.matcher(s).replaceAll(" ")
    if (ReD13.matcher(s).find()) return s.toLong * 1000L
    if (ReD10.matcher(s).find()) return s.toLong * 1000000L
    if (ReD14.matcher(s).find()) return fmt14.tryParse(s)
    if (ReD8.matcher(s).find()) return fmt8.tryParse(s)
    val q = ReQuarter.matcher(s)
    if (q.find()) {
      val y = q.group(1).toInt
      val month = (q.group(2).toInt - 1) * 3 + 1
      return localToMicros(java.time.LocalDateTime.of(y, month, 1, 0, 0, 0), zone)
    }
    val m = ReMdy2.matcher(s)
    if (m.find()) {
      val mo = m.group(1).toInt
      val d = m.group(2).toInt
      val y2 = m.group(3).toInt
      val y4 = if (y2 >= 69) y2 + 1900 else y2 + 2000
      // try_make_timestamp: calendar-invalid components → null
      return try localToMicros(java.time.LocalDateTime.of(y4, mo, d, 0, 0, 0), zone)
      catch { case _: java.time.DateTimeException => null }
    }
    var i = 0
    while (i < fallbacks.length) {
      val r = fallbacks(i).tryParse(s)
      if (r != null) return r
      i += 1
    }
    null
  }
}

/** Port of graft.ops.Dates.parseTime — "HH:mm:ss" or null. Pure string
  * logic (no formatter); same branch order as the Column chain. */
object TimeParseImpl {

  private val RePm = Pattern.compile("P\\s+M")
  private val ReAm = Pattern.compile("A\\s+M")
  private val ReWs = Pattern.compile("\\s+")
  private val ReSemi = Pattern.compile("^\\d{2};\\d{2}$")
  private val ReDotted = Pattern.compile("^\\d{1,2}\\.\\d{1,2}\\.\\d{1,2}$")
  private val ReIsoT = Pattern.compile("T\\d{1,2}:\\d{2}")
  private val ReIsoTail = Pattern.compile("T(\\d.*)$")
  private val ReHourMark = Pattern.compile("^(\\d{1,2})(AM|PM)$")
  private val ReMilMark = Pattern.compile("^(\\d{1,2})(\\d{2}(?:AM|PM))$")
  private val ReMilMark0 = Pattern.compile("^\\d{3,4}(AM|PM)$")
  private val ReColon =
    Pattern.compile("^(\\d{1,2}):(\\d{1,2})(:(\\d{1,2})(\\.\\d+)?)?(AM|PM)?$")
  private val ReDateShaped = Pattern.compile("^\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}")
  private val ReMil = Pattern.compile("^\\d{1,4}$")
  private val Junk = Set("", "-", "9999", "999", "99", "TIME", "NULL",
    "#NAME?", "#VALUE!")

  private def two(v: Int): String = f"$v%02d"

  /** Canonical "HH:mm:ss" or null — the parseTime chain. */
  def parse(raw: UTF8String): UTF8String = {
    if (raw == null) return null
    val t0 = raw.trim().toString.toUpperCase(java.util.Locale.ROOT)
    val t1 = ReAm.matcher(RePm.matcher(t0).replaceAll("PM")).replaceAll("AM")
    val tt = ReWs.matcher(t1).replaceAll("")
    val t =
      if (ReSemi.matcher(tt).find()) tt.replace(';', ':')
      else if (ReDotted.matcher(tt).find()) tt.replace('.', ':')
      else if (ReIsoT.matcher(tt).find()) {
        val m = ReIsoTail.matcher(tt)
        if (m.find()) m.group(1) else ""
      } else if (ReHourMark.matcher(tt).find()) {
        val m = ReHourMark.matcher(tt); m.find()
        m.group(1) + ":00" + m.group(2)
      } else if (ReMilMark0.matcher(tt).find()) {
        val m = ReMilMark.matcher(tt)
        if (m.find()) m.group(1) + ":" + m.group(2) else tt
      } else tt
    if (t == "2400" || t == "24:00" || t == "24:00:00")
      return UTF8String.fromString("00:00:00")
    if (Junk.contains(t)) return null
    if (ReDateShaped.matcher(t).find()) return null
    val c = ReColon.matcher(t)
    if (c.find()) {
      val h = c.group(1).toInt
      val m = c.group(2).toInt
      val sRaw = Option(c.group(4)).getOrElse("")
      val frac = Option(c.group(5)).getOrElse("")
      val mark = Option(c.group(6)).getOrElse("")
      val hAdj =
        if (mark == "AM") { if (h == 12) 0 else h }
        else if (mark == "PM") { if (h == 12) 12 else if (h > 12) h else h + 12 }
        else h
      val sec =
        if (sRaw.isEmpty || frac.nonEmpty || sRaw.toInt > 59) "00"
        else two(sRaw.toInt)
      return if (hAdj < 24 && m <= 59)
        UTF8String.fromString(two(hAdj) + ":" + two(m) + ":" + sec)
      else null
    }
    if (ReMil.matcher(t).find()) {
      val mil = t.toInt
      return if (mil / 100 < 24 && mil % 100 < 60)
        UTF8String.fromString(two(mil / 100) + ":" + two(mil % 100) + ":00")
      else null
    }
    null
  }
}
