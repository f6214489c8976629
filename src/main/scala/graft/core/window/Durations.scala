package graft.core.window

import java.time.Duration

/** Duration-string parsing with the semantics the reference gets from
  * `pytimeparse` (`datehelper.py:6-13`): `1d`, `2h`, `1w`, `-24h`,
  * `30m`, `45s`, composites like `1d2h`, and the empty/zero forms
  * `""`/`"0"` → zero.
  */
object Durations {
  private val token = raw"(\d+)\s*(w|d|h|m|s)".r

  def parse(s: String): Duration = {
    val str = s.trim.toLowerCase
    if (str.isEmpty || str == "0") return Duration.ZERO
    val (sign, body) =
      if (str.startsWith("-")) (-1L, str.drop(1))
      else if (str.startsWith("+")) (1L, str.drop(1))
      else (1L, str)
    if (body.matches(raw"\d+")) return Duration.ofSeconds(sign * body.toLong)
    require(body.matches(raw"(\s*\d+\s*[wdhms])+\s*"), s"unparseable duration: '$s'")
    val matches = token.findAllMatchIn(body).toSeq
    val seconds = matches.map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "w" => n * 7 * 24 * 3600
        case "d" => n * 24 * 3600
        case "h" => n * 3600
        case "m" => n * 60
        case "s" => n
      }
    }.sum
    Duration.ofSeconds(sign * seconds)
  }
}
