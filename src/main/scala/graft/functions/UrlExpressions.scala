package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
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

  // -- one-kernel URL normalization ----------------------------------------

  /** The tracking params [[normalize]] strips (lowercase; plus every
    * `utm_*` key) — mirrors `graft.ext.UrlOps.TrackingParams`. */
  private val TrackingParamKeys = Set("fbclid", "gclid", "msclkid", "ref")

  /** One-pass normalization with semantics IDENTICAL to the column
    * algebra it replaced (`UrlOps.normalizeUrl` delegates here):
    * lowercase scheme/host (the parse does it), default ports dropped
    * (http:80 / https:443, string-exact), empty path → "/", fragment
    * dropped, query tokens byte-wise sorted (UTF8String binary order —
    * what `array_sort` uses) with empty tokens, `utm_*` keys, and the
    * tracking shortlist removed (key = token before the first '=',
    * compared lowercase); null for a URL the parser rejects.
    *
    * Why a kernel and not algebra: the algebra form composed ~10
    * [[parse]]-subtree references, and every FILTER placed over it
    * re-expands the whole tree (Catalyst collapses projections into
    * predicates, and codegen's subexpression elimination does not
    * reach across operators) — measured on the x65 gate chain,
    * scheme+blocklist filters over algebra-normalized URLs cost ~0.2 s
    * per 200 rows of pure re-evaluation. As one kernel, every
    * downstream reference re-runs ONE parse, not seventy. */
  def normalize(s: String): UTF8String = {
    val row = parse(s)
    if (row == null) return null
    val scheme = row.getUTF8String(0).toString
    val host = row.getUTF8String(1).toString
    val port = if (row.isNullAt(2)) null else row.getUTF8String(2).toString
    val path0 = row.getUTF8String(3).toString
    val query0 = if (row.isNullAt(4)) null else row.getUTF8String(4).toString
    val keepPort = port != null &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(if (path0.isEmpty) "/" else path0)
    if (query0 != null) {
      // java's split(_, -1) keeps trailing empties, like Spark's split;
      // empties then die in the filter, exactly as the algebra did
      val kept = query0.split("&", -1).filter { p =>
        if (p.isEmpty) false
        else {
          val eq = p.indexOf('=')
          val k = UTF8String.fromString(
            if (eq >= 0) p.substring(0, eq) else p).toLowerCase.toString
          !(k.startsWith("utm_") || TrackingParamKeys.contains(k))
        }
      }.map(UTF8String.fromString)
      java.util.Arrays.sort(kept,
        (a: UTF8String, b: UTF8String) => a.compareTo(b))
      if (kept.nonEmpty) {
        sb.append('?')
        var i = 0
        while (i < kept.length) {
          if (i > 0) sb.append('&')
          sb.append(kept(i).toString)
          i += 1
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  final case class NormalizeUrlExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_normalize_url"

    override def nullSafeEval(input: Any): Any =
      UrlExpressions.normalize(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u => {
        s"""
           |${ev.value} = graft.functions.UrlExpressions.normalize($u.toString());
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Canonical URL string (null = malformed) — one kernel pass. */
  def normalizeUrl(url: Column): Column =
    ColumnBridge.column(NormalizeUrlExpr(ColumnBridge.expr(url)))

  // -- RFC 3986 §5 reference resolution -----------------------------------

  /** `graft_url_resolve(base, ref)` — resolve an `href` against its
    * page URL (RFC 3986 §5.2: merge + remove_dot_segments), the step
    * between link extraction and URL normalization in a crawl frontier.
    * Ref pre-cleaning follows the WHATWG URL parser: strip leading and
    * trailing C0-control/space, delete interior tab/CR/LF (real hrefs
    * wrap across source lines). Output reuses [[parse]]'s contract, so
    * the resolved string is already partially normalized (lowercase
    * scheme/host, userinfo discarded) and null when the BASE itself is
    * not an absolute `scheme://host` URL. A ref that carries its own
    * scheme wins outright (§5.2.2 first branch) and is returned
    * cleaned-but-unparsed: `mailto:`/`javascript:` refs are not this
    * parser's to reject — the downstream scheme filter owns that gate.
    */
  final case class UrlResolveExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_url_resolve"

    override def nullSafeEval(base: Any, ref: Any): Any =
      UrlExpressions.resolve(
        base.asInstanceOf[UTF8String].toString,
        ref.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, r) =>
        s"""
           |${ev.value} = graft.functions.UrlExpressions.resolve(
           |  $b.toString(), $r.toString());
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    var in = path
    def popSegment(): Unit = {
      val slash = out.lastIndexOf("/")
      out.setLength(if (slash < 0) 0 else slash)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); popSegment() }
      else if (in == "/..") { in = "/"; popSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (including its leading '/', if any)
        val from = if (in.charAt(0) == '/') 1 else 0
        val slash = in.indexOf('/', from)
        val end = if (slash < 0) in.length else slash
        out.append(in, 0, end)
        in = in.substring(end)
      }
    }
    out.toString
  }

  private def asciiAlpha(c: Char) =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** True when `s` begins with `scheme:` (RFC 3986 §3.1). */
  private def hasScheme(s: String): Boolean = {
    if (s.isEmpty || !asciiAlpha(s.charAt(0))) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return true
      if (!(asciiAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'))
        return false
      i += 1
    }
    false
  }

  /** [[removeDotSegments]] over the path of a `…//authority[/path]…`
    * form, query/fragment tail preserved; `authStart` indexes the
    * first authority char (just past the `//`). Returns the input
    * unchanged when there is no path. */
  private def dotCleanAfterAuthority(s: String, authStart: Int): String = {
    var i = authStart
    while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?' && s.charAt(i) != '#')
      i += 1
    if (i >= s.length || s.charAt(i) != '/') return s
    var j = i
    while (j < s.length && s.charAt(j) != '?' && s.charAt(j) != '#') j += 1
    val path = s.substring(i, j)
    val cleaned = removeDotSegments(path)
    if (cleaned == path) s else s.substring(0, i) + cleaned + s.substring(j)
  }

  /** Null when base is malformed (see [[UrlResolveExpr]] contract). */
  def resolve(baseRaw: String, refRaw: String): UTF8String = {
    // WHATWG pre-clean: trim C0/space at both ends, strip \t \r \n inside
    var lo = 0
    var hi = refRaw.length
    while (lo < hi && refRaw.charAt(lo) <= ' ') lo += 1
    while (hi > lo && refRaw.charAt(hi - 1) <= ' ') hi -= 1
    val sb = new java.lang.StringBuilder(hi - lo)
    var k = lo
    while (k < hi) {
      val c = refRaw.charAt(k)
      if (c != '\t' && c != '\r' && c != '\n') sb.append(c)
      k += 1
    }
    val ref = sb.toString

    // §5.2.2: ref's scheme wins — but remove_dot_segments still applies
    // to its path (the transformation runs it on EVERY branch; skipping
    // it here, or on the network-path branch below, let `https://h/a/./b`
    // and `//h/a/../b` enter the frontier un-canonicalized and survive
    // URL dedup as distinct spellings of one resource)
    if (hasScheme(ref)) {
      val colon = ref.indexOf(':')
      return u8(
        if (ref.regionMatches(colon + 1, "//", 0, 2))
          dotCleanAfterAuthority(ref, colon + 3)
        else ref) // opaque (mailto:, javascript:) — no hierarchical path
    }
    val base = parse(baseRaw)
    if (base == null) return null
    val scheme = base.getUTF8String(0).toString
    if (ref.startsWith("//"))
      return u8(scheme + ":" + dotCleanAfterAuthority(ref, 2))

    val host = base.getUTF8String(1).toString
    val port = if (base.isNullAt(2)) null else base.getUTF8String(2).toString
    val basePath = base.getUTF8String(3).toString
    val baseQuery = if (base.isNullAt(4)) null else base.getUTF8String(4).toString
    val root = new java.lang.StringBuilder(64)
    root.append(scheme).append("://").append(host)
    if (port != null) root.append(':').append(port)

    def baseNoFragment(): String = {
      root.append(basePath)
      if (baseQuery != null) root.append('?').append(baseQuery)
      root.toString
    }

    if (ref.isEmpty) return u8(baseNoFragment())
    ref.charAt(0) match {
      case '#' => u8(baseNoFragment() + ref)
      case '?' => u8(root.append(basePath).append(ref).toString)
      case _ =>
        // path reference: split off ?query#fragment tail
        var cut = 0
        while (cut < ref.length && ref.charAt(cut) != '?' && ref.charAt(cut) != '#') cut += 1
        val refPath = ref.substring(0, cut)
        val tail = ref.substring(cut)
        val merged =
          if (refPath.startsWith("/")) refPath
          else if (basePath.isEmpty) "/" + refPath // §5.3 merge, authority present
          else basePath.substring(0, basePath.lastIndexOf('/') + 1) + refPath
        u8(root.append(removeDotSegments(merged)).append(tail).toString)
    }
  }

  /** Resolved absolute URL of `ref` against `base` (null = bad base). */
  def urlResolve(base: Column, ref: Column): Column =
    ColumnBridge.column(UrlResolveExpr(ColumnBridge.expr(base), ColumnBridge.expr(ref)))
}
