package graft.core.macros

import java.time.{Duration, LocalDateTime}
import java.time.format.DateTimeFormatter
import java.util.regex.{Matcher, Pattern}

import graft.core.window.TaskWindow

/** SQL-text macro substitution — the reference's `query.py:70-118`.
  * Formats are byte-compatible with the python `strftime` patterns
  * (goldens in `tests/test_query.py:13-64`).
  */
object QueryMacros {

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val dateTimeFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val execFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** `WindowParameter` — `query.py:70-87`: date format unless the window
    * is sub-day or truncate=="h", then datetime format.
    */
  def windowParameter(w: TaskWindow): Map[String, String] = {
    val hourly = w.size.compareTo(Duration.ofHours(24)) < 0 || w.truncateUpto == "h"
    val fmt = if (hourly) dateTimeFmt else dateFmt
    Map(
      "__dstart__" -> w.start.format(fmt),
      "__dend__" -> w.end.format(fmt))
  }

  /** `ExecutionParameter` — `query.py:96-99` (`%Y-%m-%dT%H:%M:%S.%f`). */
  def executionParameter(execTime: LocalDateTime): Map[String, String] =
    Map("(__execution_time__)" -> execTime.format(execFmt))

  /** `DestinationParameter` — `query.py:90-93`. */
  def destinationParameter(fullTableName: String): Map[String, String] =
    Map("(__destination_table__)" -> fullTableName)

  /** `Query.replace_param` — `query.py:103-114`: each key is a regex
    * applied in MULTILINE mode over the whole text.
    */
  def replaceParams(sql: String, params: Map[String, String]): String =
    params.foldLeft(sql) { case (acc, (key, value)) =>
      Pattern.compile(key, Pattern.MULTILINE).matcher(acc)
        .replaceAll(Matcher.quoteReplacement(value))
    }

  /** Full render: window + execution + destination, as
    * `transformation.py:273-300` applies them.
    */
  def render(sql: String, window: TaskWindow, executionTime: LocalDateTime,
      destinationTable: String): String =
    replaceParams(
      replaceParams(
        replaceParams(sql, windowParameter(window)),
        executionParameter(executionTime)),
      destinationParameter(destinationTable))
}
