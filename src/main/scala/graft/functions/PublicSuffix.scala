package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery NET.HOST / NET.PUBLIC_SUFFIX / NET.REG_DOMAIN (reference
  * surface: the BigQuery NET vocabulary; closes the round-9 documented
  * skip). Public-suffix data is the Mozilla public suffix list
  * (publicsuffix.org, MPL 2.0), snapshot bundled as a resource from the
  * OS copy at /usr/share/publicsuffix/public_suffix_list.dat; like
  * BigQuery, ONLY the ICANN section is used (private registry domains
  * such as blogspot.com are NOT treated as public suffixes).
  *
  * Matching follows the publicsuffix.org algorithm and BigQuery's
  * documented deltas:
  *   - no implicit `*` default rule — an unlisted TLD yields NULL;
  *   - the host is normalized for matching only (lowercase ASCII,
  *     non-ASCII labels Punycode-encoded); the RESULT is the matching
  *     tail of the ORIGINAL host, case and script preserved;
  *   - leading/trailing dots are stripped before matching; adjacent
  *     dots in the middle disqualify the host (NULL);
  *   - exception rules (`!www.ck`) prevail over wildcards (`*.ck`) and
  *     shorten the suffix by one label.
  *
  * The trie is built once per JVM (executors included) from the
  * bundled resource — ~9.6k ICANN rules, no per-row allocation beyond
  * the label split.
  */
object PublicSuffix {

  private final class Node {
    val children = new java.util.HashMap[String, Node]()
    var isRule = false
    var isException = false
  }

  /** Reversed-label trie over the ICANN section, labels Punycode/
    * lowercase normalized exactly like query-time hosts.
    */
  private lazy val root: Node = {
    val r = new Node
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      var icann = false
      for (line0 <- src.getLines()) {
        val line = line0.trim
        if (line.contains("===BEGIN ICANN DOMAINS===")) icann = true
        else if (line.contains("===END ICANN DOMAINS===")) icann = false
        else if (icann && line.nonEmpty && !line.startsWith("//")) {
          val exception = line.startsWith("!")
          val rule = if (exception) line.substring(1) else line
          val labels = rule.split('.').map(normLabel)
          var node = r
          var i = labels.length - 1
          while (i >= 0) {
            var child = node.children.get(labels(i))
            if (child == null) { child = new Node; node.children.put(labels(i), child) }
            node = child
            i -= 1
          }
          if (exception) node.isException = true else node.isRule = true
        }
      }
    } finally src.close()
    r
  }

  /** Lowercase + Punycode normalization of one label (match key only). */
  private def normLabel(l: String): String = {
    val lower = l.toLowerCase(java.util.Locale.ROOT)
    if (lower.forall(_ < 128)) lower
    else try java.net.IDN.toASCII(lower) catch { case _: Exception => lower }
  }

  /** Best-effort host extraction (BigQuery NET.HOST): trims whitespace,
    * strips a scheme (only when unambiguous — followed by `//`, or a
    * dot-free scheme name like `mailto:`), userinfo, port, and the
    * path/query/fragment; IPv6 hosts keep their brackets.
    */
  def host(url0: String): String = {
    if (url0 == null) return null
    var s = url0.trim
    if (s.isEmpty) return null
    val m = raw"^([A-Za-z][A-Za-z0-9+.-]*):(.*)$$".r.findFirstMatchIn(s)
    m.foreach { mm =>
      if (mm.group(2).startsWith("//") || !mm.group(1).contains("."))
        s = mm.group(2)
    }
    if (s.startsWith("//")) s = s.substring(2)
    val cut = s.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (cut >= 0) s = s.substring(0, cut)
    val at = s.lastIndexOf('@')
    if (at >= 0) s = s.substring(at + 1)
    if (s.startsWith("[")) {
      val close = s.indexOf(']')
      if (close >= 0) s = s.substring(0, close + 1)
    } else {
      val colon = s.indexOf(':')
      if (colon >= 0) s = s.substring(0, colon)
    }
    if (s.isEmpty) null else s
  }

  /** Number of labels in the host's public suffix, or -1. `labels` are
    * the normalized host labels in ORIGINAL order.
    */
  private def suffixLabelCount(labels: Array[String]): Int = {
    var bestNormal = -1
    var bestException = -1
    def walk(node: Node, depth: Int): Unit = {
      if (depth > bestNormal && node.isRule) bestNormal = depth
      if (node.isException && depth - 1 > bestException) bestException = depth - 1
      if (depth < labels.length) {
        val l = labels(labels.length - 1 - depth)
        val exact = node.children.get(l)
        if (exact != null) walk(exact, depth + 1)
        val wild = node.children.get("*")
        if (wild != null) walk(wild, depth + 1)
      }
    }
    walk(root, 0)
    if (bestException >= 0) bestException else bestNormal
  }

  /** Public suffix of `url`'s host (original case/script), or null. */
  def publicSuffix(url: String): String = tailLabels(url, 0)

  /** Registered domain: public suffix + one label, or null (including
    * when the host IS a public suffix).
    */
  def regDomain(url: String): String = tailLabels(url, 1)

  private def tailLabels(url: String, extra: Int): String = {
    val h0 = host(url)
    if (h0 == null) return null
    // leading/trailing dots are stripped; middle adjacent dots → NULL
    val core = h0.dropWhile(_ == '.').reverse.dropWhile(_ == '.').reverse
    if (core.isEmpty || core.contains("..")) return null
    val orig = core.split('.')
    val n = suffixLabelCount(orig.map(normLabel))
    if (n <= 0 || n + extra > orig.length) return null
    orig.takeRight(n + extra).mkString(".")
  }

  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_net_host"))) return
    def reg(name: String, make: Seq[Expression] => Expression): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, make, "scala_udf")
    reg("graft_net_host", e => NetDomainExpr("host", e.head))
    reg("graft_net_public_suffix", e => NetDomainExpr("public_suffix", e.head))
    reg("graft_net_reg_domain", e => NetDomainExpr("reg_domain", e.head))
  }
}

/** NET.HOST / PUBLIC_SUFFIX / REG_DOMAIN kernel (string parsing — the
  * PSL trie is a JVM-static; not a codegen hot path).
  */
case class NetDomainExpr(fn: String, child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = fn match {
      case "host" => PublicSuffix.host(s)
      case "public_suffix" => PublicSuffix.publicSuffix(s)
      case "reg_domain" => PublicSuffix.regDomain(s)
      case other => throw new IllegalStateException(s"unknown NET kernel $other")
    }
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    super[CodegenFallback].doGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): NetDomainExpr =
    copy(child = newChild)
}
