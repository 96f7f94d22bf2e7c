package graft.dsl

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** Crontab-expression support (ST1): rearview schedules each monitor
  * with a crontab string (`jobs.cron_expr`, reference db/schema.rb:56;
  * "crontab compatible time specification", reference README.md:6).
  *
  * Standard 5 fields `min hour dom month dow`; each field is a star,
  * `a`, `a-b`, `a-b/s`, or star-slash-step, or a comma list; dow 0 and
  * 7 are both Sunday. As in vixie cron, when *both* dom and dow are
  * restricted the match is the OR of the two.
  */
final case class Cron(
    minutes: Set[Int], hours: Set[Int], dom: Set[Int], month: Set[Int],
    dow: Set[Int], domRestricted: Boolean, dowRestricted: Boolean) {

  def matches(t: ZonedDateTime): Boolean = {
    val dayOk =
      if (domRestricted && dowRestricted)
        dom(t.getDayOfMonth) || dow(t.getDayOfWeek.getValue % 7)
      else dom(t.getDayOfMonth) && dow(t.getDayOfWeek.getValue % 7)
    minutes(t.getMinute) && hours(t.getHour) && month(t.getMonthValue) && dayOk
  }

  /** Next fire time strictly after `after` (UTC), or None if none within
    * ~4 years (impossible spec like Feb 30). Minute-stepping is plenty:
    * worst real gap is ~1 year and this runs driver-side per job. */
  def nextAfter(after: Instant): Option[Instant] = {
    var t = ZonedDateTime.ofInstant(after, ZoneOffset.UTC)
      .withSecond(0).withNano(0).plusMinutes(1)
    val limit = t.plusYears(4)
    while (t.isBefore(limit)) {
      if (matches(t)) return Some(t.toInstant)
      // skip to next matching coarse unit quickly
      t = if (!month(t.getMonthValue))
        t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
      else if (!dayMatches(t))
        t.plusDays(1).withHour(0).withMinute(0)
      else if (!hours(t.getHour)) t.plusHours(1).withMinute(0)
      else t.plusMinutes(1)
    }
    None
  }

  private def dayMatches(t: ZonedDateTime): Boolean =
    if (domRestricted && dowRestricted)
      dom(t.getDayOfMonth) || dow(t.getDayOfWeek.getValue % 7)
    else dom(t.getDayOfMonth) && dow(t.getDayOfWeek.getValue % 7)
}

object Cron {
  def parse(expr: String): Cron = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron needs 5 fields, got '$expr'")
    def field(s: String, lo: Int, hi: Int, sundayAlias: Boolean = false): (Set[Int], Boolean) = {
      if (s == "*") ((lo to hi).toSet, false)
      else {
        val vals = s.split(",").flatMap { part =>
          val (rangePart, step) = part.split("/") match {
            case Array(r) => (r, 1)
            case Array(r, st) => (r, st.toInt)
            case _ => throw new IllegalArgumentException(s"bad cron field '$part'")
          }
          val (a, b) = rangePart match {
            case "*" => (lo, hi)
            case r if r.contains("-") =>
              val Array(x, y) = r.split("-"); (x.toInt, y.toInt)
            // vixie cron: a bare value WITH a step means value-max/step
            // ("5/15" in the minute field = 5,20,35,50), not just {value}
            case v if step > 1 => (v.toInt, hi)
            case v => val x = v.toInt; (x, x)
          }
          (a to b by step).map(v => if (sundayAlias && v == 7) 0 else v)
        }.toSet
        vals.foreach(v => require(v >= lo && v <= hi || (sundayAlias && v == 0),
          s"cron value $v out of [$lo,$hi] in '$expr'"))
        (vals, !s.startsWith("*"))
      }
    }
    val (mi, _) = field(fields(0), 0, 59)
    val (h, _) = field(fields(1), 0, 23)
    val (dm, dmR) = field(fields(2), 1, 31)
    val (mo, _) = field(fields(3), 1, 12)
    val (dw, dwR) = field(fields(4), 0, 7, sundayAlias = true)
    Cron(mi, h, dm, mo, dw, dmR, dwR)
  }
}
