package graft.core

import java.time.{Duration, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite
import graft.core.window.{Durations, WindowFactory}

/** Golden cases ported from the reference's
  * `executor/tests/test_window.py:14-84` (case-for-case).
  */
class WindowSpec extends AnyFunSuite {
  private val scheduledNextAt = LocalDateTime.of(2020, 7, 9, 4, 0)

  test("date one and date zero with window size (24h no truncate)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "24h", "", "")
    assert(w.end == scheduledNextAt)
    assert(w.start == scheduledNextAt.minusDays(1))
  }

  test("valid offset in window (2d size, 1d offset)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "2d", "1d", "")
    assert(w.end == scheduledNextAt.plusDays(1))
    assert(w.start == scheduledNextAt.plusDays(1).minusDays(2))
  }

  test("valid negative offset in window (-24h)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "2d", "-24h", "")
    assert(w.end == scheduledNextAt.minusDays(1))
    assert(w.start == scheduledNextAt.minusDays(1).minusDays(2))
  }

  test("valid hour size in window (2h, truncate h)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "2h", "0", "h")
    assert(w.end == LocalDateTime.of(2020, 7, 9, 4, 0))
    assert(w.start == LocalDateTime.of(2020, 7, 9, 2, 0))
  }

  test("valid truncation in window (truncate d)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "2d", "1d", "d")
    val dayOne = LocalDateTime.of(2020, 7, 9, 0, 0).plusDays(1)
    assert(w.end == dayOne)
    assert(w.start == dayOne.minusDays(2))
  }

  test("valid week and hour notation (1w size, 24h offset, truncate d)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "1w", "24h", "d")
    val dayOne = LocalDateTime.of(2020, 7, 9, 0, 0).plusDays(1)
    assert(w.end == dayOne)
    assert(w.start == dayOne.minusDays(7))
  }

  test("valid week truncation (Sunday-ending week)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "1w", "0", "w")
    assert(w.start == LocalDateTime.of(2020, 7, 5, 0, 0))
    assert(w.end == LocalDateTime.of(2020, 7, 12, 0, 0))
  }

  test("valid week from tuesday to tuesday (2d offset)") {
    val w = WindowFactory.createWindow(scheduledNextAt, "1w", "2d", "w")
    assert(w.start == LocalDateTime.of(2020, 7, 7, 0, 0))
    assert(w.end == LocalDateTime.of(2020, 7, 14, 0, 0))
  }

  test("week truncation on a Sunday keeps that Sunday") {
    // python monthdatescalendar week containing Sunday Jul 5 ends on Jul 5
    val w = WindowFactory.createWindow(LocalDateTime.of(2020, 7, 5, 10, 30), "1w", "0", "w")
    assert(w.end == LocalDateTime.of(2020, 7, 5, 0, 0))
    assert(w.start == LocalDateTime.of(2020, 6, 28, 0, 0))
  }

  test("unsupported truncate method raises") {
    assertThrows[IllegalArgumentException] {
      WindowFactory.createWindow(scheduledNextAt, "720h", "0", "m").end
    }
  }

  test("duration parsing matches pytimeparse forms") {
    assert(Durations.parse("1d") == Duration.ofDays(1))
    assert(Durations.parse("2h") == Duration.ofHours(2))
    assert(Durations.parse("1w") == Duration.ofDays(7))
    assert(Durations.parse("-24h") == Duration.ofHours(-24))
    assert(Durations.parse("168h") == Duration.ofHours(168))
    assert(Durations.parse("720h") == Duration.ofHours(720))
    assert(Durations.parse("0") == Duration.ZERO)
    assert(Durations.parse("") == Duration.ZERO)
    assert(Durations.parse("1d2h") == Duration.ofHours(26))
    assert(Durations.parse("90") == Duration.ofSeconds(90))
    assertThrows[IllegalArgumentException](Durations.parse("abc"))
  }
}
