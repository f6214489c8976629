package graft.core.config

import java.nio.file.{Files, Path, Paths}
import java.time.{LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** App-level env contract — `config.py:203-260` (A29): DSTART / DEND /
  * EXECUTION_TIME (ISO-8601), DRY_RUN, JOB_LABELS (`k1=v1,k2=v2`),
  * JOB_DIR (expects `in/query.sql` [+ `in/spillover_date.sql`,
  * `in/properties.cfg`]), XCOM_PATH.
  */
final case class AppConfig(
    dstart: LocalDateTime,
    dend: LocalDateTime,
    executionTime: LocalDateTime,
    dryRun: Boolean,
    jobLabels: Map[String, String],
    xcomPath: String,
    sqlFile: Option[Path],
    spilloverSqlFile: Option[Path],
    propertiesFile: Option[Path])

object AppConfig {
  val DefaultXcomPath = "/airflow/xcom/return.json"
  val DefaultJobDir = "/data"

  /** ISO-8601 with or without offset/zone, date-only allowed —
    * matching python `iso8601.parse_date`.
    */
  def parseDate(s: String): LocalDateTime = {
    val str = s.trim
    try OffsetDateTime.parse(str).withOffsetSameInstant(ZoneOffset.UTC).toLocalDateTime
    catch {
      case _: Exception =>
        if (str.length == 10) java.time.LocalDate.parse(str).atStartOfDay
        else LocalDateTime.parse(str.replace(" ", "T"),
          DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    }
  }

  def parseJobLabels(s: String): Map[String, String] = {
    require(s != null && s.nonEmpty, "JOB_LABELS must be provided in k1=v1,k2=v2 format")
    s.split(",").map { pair =>
      val kv = pair.split("=", 2)
      require(kv(0).nonEmpty, "label name cannot be empty in JOB_LABELS")
      require(kv.length == 2 && kv(1).nonEmpty, "label value cannot be empty in JOB_LABELS")
      kv(0) -> kv(1)
    }.toMap
  }

  def fromEnv(env: Map[String, String] = sys.env): AppConfig = {
    def get(k: String, default: String) = env.getOrElse(k, default)
    def required(k: String) = env.getOrElse(k,
      throw new IllegalArgumentException(s"missing required env: $k"))

    val jobDir = Paths.get(get("JOB_DIR", DefaultJobDir), "in")
    def find(name: String): Option[Path] = {
      if (!Files.isDirectory(jobDir)) return None
      val it = Files.walk(jobDir).filter(p => p.getFileName.toString == name).findFirst()
      if (it.isPresent) Some(it.get) else None
    }

    AppConfig(
      dstart = parseDate(required("DSTART")),
      dend = parseDate(required("DEND")),
      executionTime = env.get("EXECUTION_TIME").map(parseDate)
        .getOrElse(LocalDateTime.now(ZoneOffset.UTC)),
      dryRun = Seq("true", "1", "yes", "y").contains(get("DRY_RUN", "false").toLowerCase),
      jobLabels = parseJobLabels(get("JOB_LABELS", "owner=optimus")),
      xcomPath = get("XCOM_PATH", DefaultXcomPath),
      sqlFile = find("query.sql"),
      spilloverSqlFile = find("spillover_date.sql"),
      propertiesFile = find("properties.cfg"))
  }
}
