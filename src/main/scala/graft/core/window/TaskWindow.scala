package graft.core.window

import java.time.{DayOfWeek, Duration, LocalDateTime, ZoneId, ZonedDateTime}
import java.time.temporal.TemporalAdjusters

/** Batch scheduling-window calculus (NOT a streaming window): the
  * (start, end, size, offset, truncate) semantics of the reference's
  * `window.py:36-128`, pinned by `tests/test_window.py:14-84`.
  */
sealed trait TaskWindow {
  def start: LocalDateTime
  def end: LocalDateTime
  def size: Duration
  def offset: Duration
  def truncateUpto: String
}

/** Window from externally supplied (dstart, dend) — `window.py:75-86`. */
final case class CustomWindow(start: LocalDateTime, end: LocalDateTime) extends TaskWindow {
  val offset: Duration = Duration.ZERO
  val size: Duration = Duration.between(start, end)
  val truncateUpto: String = ""
}

/** Window derived from user config — `window.py:88-128`:
  * end = truncate(scheduleEnd) + offset; start = end − size.
  * Truncation: "h" zeroes min/sec, "d" zeroes time, "w" snaps to the
  * Sunday ending the Mon–Sun week containing the date (python
  * `calendar.Calendar().monthdatescalendar(...)[week][6]`), ""/"0" no-op,
  * anything else raises.
  */
final case class XWindow(scheduleEnd: LocalDateTime, sizeSpec: String,
    offsetSpec: String, truncateUpto: String) extends TaskWindow {

  private val floatingEnd: LocalDateTime = truncateUpto.toLowerCase match {
    case "h" => scheduleEnd.withMinute(0).withSecond(0).withNano(0)
    case "d" => scheduleEnd.toLocalDate.atStartOfDay
    case "w" =>
      scheduleEnd.toLocalDate.`with`(TemporalAdjusters.nextOrSame(DayOfWeek.SUNDAY)).atStartOfDay
    case "" | "0" => scheduleEnd
    case other => throw new IllegalArgumentException(s"unsupported truncate method: $other")
  }

  val offset: Duration = Durations.parse(offsetSpec)
  val size: Duration = Durations.parse(sizeSpec)
  val end: LocalDateTime = floatingEnd.plus(offset)
  val start: LocalDateTime = end.minus(size)
}

object WindowFactory {
  /** `WindowFactory.create_window` — `window.py:66-68`. */
  def createWindow(endTime: LocalDateTime, size: String, offset: String,
      truncateUpto: String): TaskWindow =
    XWindow(endTime, size.toLowerCase, offset.toLowerCase, truncateUpto.toLowerCase)

  /** `WindowFactory.create_window_with_time` — `window.py:70-72`. */
  def createWindowWithTime(start: LocalDateTime, end: LocalDateTime): TaskWindow =
    CustomWindow(start, end)
}

/** Timezone localization — `datehelper.py:15-25`: naive datetimes get
  * the task zone attached; aware ones are converted into it.
  */
object DateHelper {
  def localise(naive: LocalDateTime, tzName: String): ZonedDateTime =
    naive.atZone(ZoneId.of(tzName))

  def localise(aware: ZonedDateTime, tzName: String): ZonedDateTime =
    aware.withZoneSameInstant(ZoneId.of(tzName))
}
