package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{CalendarIntervalType, DataType, DayTimeIntervalType, StringType, YearMonthIntervalType}
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** BigQuery INTERVAL support Spark lacks: JUSTIFY_DAYS / JUSTIFY_HOURS /
  * JUSTIFY_INTERVAL (Postgres-lineage normalization — BigQuery documents
  * the same 30-day-month / 24-hour-day rules) and the canonical
  * `[-]Y-M [-]D [-]H:M:S[.F]` text rendering BigQuery's STRING cast
  * produces. All three interval classes coerce in (Spark's ANSI
  * year-month and day-time intervals, and the full-range
  * CalendarInterval that `make_interval` returns — the only Spark type
  * that, like BigQuery's INTERVAL, holds months, days and micros
  * independently). Interpreted eval: constructors and renderers, not
  * hot-path kernels.
  */
object IntervalKernels {
  final val MICROS_PER_DAY = 86400000000L
  final val MICROS_PER_HOUR = 3600000000L
  final val MICROS_PER_MINUTE = 60000000L
  final val MICROS_PER_SECOND = 1000000L

  def toCalendar(v: Any, t: DataType): CalendarInterval = t match {
    case CalendarIntervalType => v.asInstanceOf[CalendarInterval]
    case dt: DayTimeIntervalType =>
      // a literal that HAD a day component (startField = DAY) keeps it
      // as BigQuery's independent day part; hour-and-finer values stay
      // in the time part until JUSTIFY_HOURS converts them
      val us = v.asInstanceOf[Long]
      if (dt.startField == DayTimeIntervalType.DAY)
        new CalendarInterval(0, (us / MICROS_PER_DAY).toInt, us % MICROS_PER_DAY)
      else new CalendarInterval(0, 0, us)
    case _: YearMonthIntervalType => new CalendarInterval(v.asInstanceOf[Int], 0, 0L)
    case other => throw new IllegalArgumentException(
      s"expected an INTERVAL argument, got $other")
  }

  /** hours → days (24-hour days), truncating toward zero. */
  def justifyHours(i: CalendarInterval): CalendarInterval = {
    val extraDays = (i.microseconds / MICROS_PER_DAY).toInt
    new CalendarInterval(i.months, i.days + extraDays,
      i.microseconds % MICROS_PER_DAY)
  }

  /** days → months (30-day months), truncating toward zero. */
  def justifyDays(i: CalendarInterval): CalendarInterval = {
    val extraMonths = i.days / 30
    new CalendarInterval(i.months + extraMonths, i.days % 30, i.microseconds)
  }

  /** both conversions plus cross-unit sign borrowing (Postgres
    * interval_justify_interval): '1 month -1 hour' → '29 days 23:00:00'.
    */
  def justifyInterval(i0: CalendarInterval): CalendarInterval = {
    var days = i0.days + (i0.microseconds / MICROS_PER_DAY).toInt
    var micros = i0.microseconds % MICROS_PER_DAY
    var months = i0.months + days / 30
    days = days % 30
    if (months > 0 && (days < 0 || (days == 0 && micros < 0))) {
      days += 30; months -= 1
    } else if (months < 0 && (days > 0 || (days == 0 && micros > 0))) {
      days -= 30; months += 1
    }
    if (days > 0 && micros < 0) { micros += MICROS_PER_DAY; days -= 1 }
    else if (days < 0 && micros > 0) { micros -= MICROS_PER_DAY; days += 1 }
    new CalendarInterval(months, days, micros)
  }

  /** BigQuery's canonical INTERVAL text: `[-]Y-M [-]D [-]H:M:S[.F]`,
    * fractional seconds to micros with trailing zeros trimmed.
    */
  def render(i: CalendarInterval): UTF8String = {
    val ySign = if (i.months < 0) "-" else ""
    val m = math.abs(i.months)
    val tSign = if (i.microseconds < 0) "-" else ""
    val us = math.abs(i.microseconds)
    val h = us / MICROS_PER_HOUR
    val mi = (us % MICROS_PER_HOUR) / MICROS_PER_MINUTE
    val s = (us % MICROS_PER_MINUTE) / MICROS_PER_SECOND
    val frac = us % MICROS_PER_SECOND
    val fracStr =
      if (frac == 0) ""
      else "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
    UTF8String.fromString(
      s"$ySign${m / 12}-${m % 12} ${i.days} $tSign$h:$mi:$s$fracStr")
  }
}

/** `graft_justify(interval, mode)` with mode ∈ days|hours|interval. */
case class BqJustify(child: Expression, mode: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = CalendarIntervalType
  override protected def nullSafeEval(v: Any): Any = {
    val i = IntervalKernels.toCalendar(v, child.dataType)
    mode match {
      case "days" => IntervalKernels.justifyDays(i)
      case "hours" => IntervalKernels.justifyHours(i)
      case _ => IntervalKernels.justifyInterval(i)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): BqJustify =
    copy(child = newChild)
}

/** `graft_interval_str(interval)` — BigQuery's canonical rendering. */
case class BqIntervalString(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    IntervalKernels.render(IntervalKernels.toCalendar(v, child.dataType))
  override protected def withNewChildInternal(newChild: Expression): BqIntervalString =
    copy(child = newChild)
}

object IntervalExpressions {
  /** Register graft_justify_* / graft_interval_str (idempotent). */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_interval_str"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_justify_days", exprs => BqJustify(exprs(0), "days"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_justify_hours", exprs => BqJustify(exprs(0), "hours"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_justify_interval", exprs => BqJustify(exprs(0), "interval"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_interval_str", exprs => BqIntervalString(exprs(0)), "scala_udf")
  }
}
