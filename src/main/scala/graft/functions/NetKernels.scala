package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery NET.* IP functions the engine can honor exactly (the
  * reference surface's network vocabulary): IP_FROM_STRING /
  * SAFE_IP_FROM_STRING (IPv4 → 4 bytes, IPv6 → 16 bytes),
  * IP_TO_STRING, IPV4_TO_INT64 / IPV4_FROM_INT64. Parsing is strict
  * and PURELY LOCAL: a hostname never reaches a resolver (a charset
  * gate rejects anything that is not an address literal before
  * InetAddress sees it). NET.HOST / REG_DOMAIN / PUBLIC_SUFFIX live in
  * PublicSuffix.scala (bundled ICANN public-suffix list).
  */
object NetKernels {
  private val ipv4Re = raw"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$$".r
  // colon required (rules out hostnames); hex digits, ':', '.' only
  // (embedded-IPv4 tails like ::ffff:1.2.3.4 allowed)
  private val ipv6Chars = raw"^[0-9a-fA-F:.]+$$".r

  /** Strict textual IP parse → network byte order; null when invalid. */
  def ipFromStringOrNull(s: String): Array[Byte] = s match {
    case ipv4Re(a, b, c, d) =>
      val parts = Seq(a, b, c, d).map(_.toInt)
      if (parts.exists(_ > 255)) null
      else parts.map(_.toByte).toArray
    case v if v.contains(':') && ipv6Chars.matches(v) =>
      try java.net.InetAddress.getByName(v).getAddress
      catch { case _: Exception => null }
    case _ => null
  }

  def ipFromString(s: String): Array[Byte] = {
    val r = ipFromStringOrNull(s)
    if (r == null) throw new IllegalArgumentException(
      s"NET.IP_FROM_STRING: not an IP address literal: $s")
    r
  }

  def ipToString(b: Array[Byte]): String = {
    if (b.length != 4 && b.length != 16) throw new IllegalArgumentException(
      s"NET.IP_TO_STRING: expected 4 or 16 bytes, got ${b.length}")
    java.net.InetAddress.getByAddress(b).getHostAddress
  }

  def ipv4ToInt64(b: Array[Byte]): Long = {
    if (b.length != 4) throw new IllegalArgumentException(
      s"NET.IPV4_TO_INT64: expected 4 bytes, got ${b.length}")
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  def ipv4FromInt64(v: Long): Array[Byte] = {
    if (v < 0 || v > 0xffffffffL) throw new IllegalArgumentException(
      s"NET.IPV4_FROM_INT64: out of unsigned-32 range: $v")
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  }

  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_net_ip_from_string"))) return
    def reg(name: String, make: Seq[Expression] => Expression): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, make, "scala_udf")
    reg("graft_net_ip_from_string", e => NetIpExpr("from_string", e.head))
    reg("graft_net_safe_ip_from_string", e => NetIpExpr("safe_from_string", e.head))
    reg("graft_net_ip_to_string", e => NetIpExpr("to_string", e.head))
    reg("graft_net_ipv4_to_int64", e => NetIpExpr("v4_to_int64", e.head))
    reg("graft_net_ipv4_from_int64", e => NetIpExpr("v4_from_int64", e.head))
  }
}

/** One interpreted expression covers the five NET IP kernels (string
  * parsing, not a hot analytic path).
  */
case class NetIpExpr(fn: String, child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = fn match {
    case "from_string" | "safe_from_string" | "v4_from_int64" => BinaryType
    case "to_string" => StringType
    case _ => LongType
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = fn match {
    case "from_string" =>
      NetKernels.ipFromString(v.asInstanceOf[UTF8String].toString)
    case "safe_from_string" =>
      NetKernels.ipFromStringOrNull(v.asInstanceOf[UTF8String].toString)
    case "to_string" =>
      UTF8String.fromString(NetKernels.ipToString(v.asInstanceOf[Array[Byte]]))
    case "v4_to_int64" => NetKernels.ipv4ToInt64(v.asInstanceOf[Array[Byte]])
    case "v4_from_int64" => NetKernels.ipv4FromInt64(v.asInstanceOf[Long])
    case other => throw new IllegalStateException(s"unknown NET kernel $other")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    super[CodegenFallback].doGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): NetIpExpr =
    copy(child = newChild)
}
