package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass URL splitting for [[graft.ext.UrlOps]]: the regex form ran
  * the six-group pattern once PER EXTRACTED GROUP per call site (a
  * `RegExpExtract` re-matches for every group), ~18 regex executions
  * per row across normalize + domain + blocklist — this kernel walks
  * the string once and hands back the whole struct. Parse contract:
  * absolute URLs only (`scheme://`, ASCII scheme and digits), userinfo
  * parsed past and DISCARDED (blocklist-bypass hazard), null struct
  * for anything malformed. Two deliberate divergences from the regex
  * it replaced, both stricter-or-safer: `host:nondigits` is malformed
  * (the regex demoted ":abc..." into the path), and a multi-`@`
  * authority strips through the LAST `@` (the regex rejected it —
  * nothing before an `@` may ever be mistaken for the host).
  */
object UrlExpressions {

  val PartsSchema: StructType = StructType(Seq(
    StructField("scheme", StringType), StructField("host", StringType),
    StructField("port", StringType), StructField("path", StringType),
    StructField("query", StringType), StructField("fragment", StringType)))

  final case class UrlPartsExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = PartsSchema
    override def nullable: Boolean = true
    override def prettyName: String = "graft_url_parts"

    override def nullSafeEval(input: Any): Any =
      UrlExpressions.parse(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = nullSafeCodeGen(ctx, ev, u => {
        val ref = ctx.addReferenceObj("urlparts", this, classOf[UrlPartsExpr].getName)
        s"""
           |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
           |  graft.functions.UrlExpressions.parse($u.toString());
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      })
      c
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def u8(s: String): UTF8String = UTF8String.fromString(s)

  /** Null for malformed; fields null when absent (empty query/fragment
    * count as absent, mirroring the regex form's `nullif`). */
  def parse(s: String): GenericInternalRow = {
    val n = s.length
    // scheme: ASCII [A-Za-z][A-Za-z0-9+.-]* then "://" (NOT the
    // Unicode Character.isLetter classes - a non-ASCII "scheme" must
    // stay malformed, matching RFC 3986 and the oracle's semantics)
    def asciiLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def asciiDigit(c: Char) = c >= '0' && c <= '9'
    if (n == 0 || !asciiLetter(s.charAt(0))) return null
    var i = 1
    while (i < n && (asciiLetter(s.charAt(i)) || asciiDigit(s.charAt(i)) ||
      s.charAt(i) == '+' || s.charAt(i) == '.' || s.charAt(i) == '-')) i += 1
    if (i + 2 >= n || s.charAt(i) != ':' || s.charAt(i + 1) != '/' || s.charAt(i + 2) != '/')
      return null
    val scheme = s.substring(0, i).toLowerCase
    var a = i + 3
    val authStart = a
    while (a < n && s.charAt(a) != '/' && s.charAt(a) != '?' && s.charAt(a) != '#') a += 1
    var auth = s.substring(authStart, a)
    // userinfo: through the LAST '@' (conservative: nothing before an
    // '@' may ever be mistaken for the host)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // host[:port]; port must be all digits, host non-empty
    val colon = auth.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && colon == auth.indexOf(':')) {
        val p = auth.substring(colon + 1)
        if (p.nonEmpty && p.forall(asciiDigit)) (auth.substring(0, colon), p)
        else return null // 'host:abc' — not a port, malformed
      } else if (colon >= 0) return null // multiple ':' (no IPv6 support)
      else (auth, null)
    if (host.isEmpty) return null
    // path / query / fragment
    var q = a
    while (q < n && s.charAt(q) != '?' && s.charAt(q) != '#') q += 1
    val path = s.substring(a, q)
    var f = q
    while (f < n && s.charAt(f) != '#') f += 1
    val query = if (q < n && s.charAt(q) == '?') s.substring(q + 1, f) else ""
    val fragment = if (f < n) s.substring(f + 1) else ""
    new GenericInternalRow(Array[Any](
      u8(scheme), u8(host.toLowerCase),
      if (port == null) null else u8(port),
      u8(path),
      if (query.isEmpty) null else u8(query),
      if (fragment.isEmpty) null else u8(fragment)))
  }

  /** struct<scheme,host,port,path,query,fragment> (null = malformed). */
  def urlParts(url: Column): Column =
    ColumnBridge.column(UrlPartsExpr(ColumnBridge.expr(url)))
}
