package graft.adapters

import graft.core.{Model, Span}
import scala.collection.mutable.ArrayBuffer

/** From-scratch HTML main-content extraction: tolerant tokenizer →
  * streaming block builder → text-density / link-density classification in
  * the style of jusText / Readability (public algorithms; see PAPERS.md).
  *
  * The reference never parses HTML itself — its analog is the VLM prompt
  * contract "Preserve the document structure and hierarchy … Maintain the
  * original text order and layout" (reference:
  * src/paddleocr_server/prompts.py:6-16, adapters/vllm_remote_engine.py:269-278).
  * Those requirements become hard rules here: blocks are emitted strictly
  * in document order; headings keep their level as markdown `#` prefixes;
  * `<img>` nodes become media_ref passthrough spans (north rule).
  *
  * Classification rules (deterministic, no model):
  *  - content under a boilerplate ancestor (`nav aside footer header
  *    script style head noscript`) is dropped — EXCEPT headings under
  *    `<header>` (page titles live there);
  *  - headings kept when text length ≥ 3 and zero link density;
  *  - other blocks kept when text length ≥ `MinTextLen` and link density
  *    (chars inside `<a>` / total chars) < 1/3 — the jusText-style rule
  *    that kills navigation and footer link farms.
  */
object HtmlExtractor extends SpanExtractor {
  override val name = "html"

  private val MinTextLen = 25
  private val MaxLinkDensity = 0.34

  private val BlockTags: Set[String] = Set(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "td", "th",
    "section", "article", "blockquote", "pre", "ul", "ol", "table", "tr",
    "nav", "aside", "footer", "header", "main", "figure", "figcaption",
    "body", "html", "form", "dl", "dt", "dd", "caption", "br", "hr")

  private val BoilerAncestors: Set[String] =
    Set("nav", "aside", "footer", "header", "script", "style", "head", "noscript")

  private val RawTextTags: Set[String] = Set("script", "style")

  private val VoidTags: Set[String] = Set(
    "img", "br", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr")

  // ---- tokenizer -----------------------------------------------------

  private sealed trait Tok
  private final case class StartTag(tag: String, attrs: Map[String, String], selfClosing: Boolean) extends Tok
  private final case class EndTag(tag: String) extends Tok
  private final case class Text(s: String) extends Tok

  /** Tolerant tokenizer: unclosed tags, bare/quoted attributes, comments,
    * doctype, and raw-text script/style bodies all handled; anything
    * unparseable degrades to text rather than failing (the reference's
    * per-job failure model only fires on truly corrupt payloads). */
  private def tokenize(html: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    val n = html.length
    var i = 0
    var rawUntil: String = null // inside <script>/<style>: skip to this close tag
    while (i < n) {
      if (rawUntil != null) {
        val close = html.toLowerCase.indexOf("</" + rawUntil, i)
        val end = if (close < 0) n else close
        // raw text content of script/style is never emitted
        i = end
        rawUntil = null
        if (i >= n) () // unterminated raw text: drop remainder
      } else if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val close = html.indexOf('>', i)
          i = if (close < 0) n else close + 1
        } else {
          val close = html.indexOf('>', i)
          if (close < 0) { out += Text(html.substring(i)); i = n }
          else {
            val inner = html.substring(i + 1, close).trim
            if (inner.startsWith("/")) {
              val tag = inner.drop(1).trim.toLowerCase
              if (tag.nonEmpty) out += EndTag(tag)
            } else if (inner.nonEmpty) {
              val selfClosing = inner.endsWith("/")
              val body = if (selfClosing) inner.dropRight(1).trim else inner
              val sp = body.indexWhere(Character.isWhitespace)
              val tag = (if (sp < 0) body else body.substring(0, sp)).toLowerCase
              val attrs = if (sp < 0) Map.empty[String, String]
                          else parseAttrs(body.substring(sp + 1))
              out += StartTag(tag, attrs, selfClosing)
              if (!selfClosing && RawTextTags(tag)) rawUntil = tag
            }
            i = close + 1
          }
        }
      } else {
        val lt = html.indexOf('<', i)
        val end = if (lt < 0) n else lt
        out += Text(html.substring(i, end))
        i = end
      }
    }
    out.toVector
  }

  private def parseAttrs(s: String): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val nameStart = i
        while (i < n && s.charAt(i) != '=' && !Character.isWhitespace(s.charAt(i))) i += 1
        val aname = s.substring(nameStart, i).toLowerCase
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val vStart = i
            while (i < n && s.charAt(i) != q) i += 1
            if (aname.nonEmpty) m += aname -> s.substring(vStart, math.min(i, n))
            if (i < n) i += 1
          } else {
            val vStart = i
            while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
            if (aname.nonEmpty) m += aname -> s.substring(vStart, i)
          }
        } else if (aname.nonEmpty) m += aname -> ""
      }
    }
    m.result()
  }

  /** Minimal entity decoder for the entities our corpus (and common web
    * text) uses; unknown entities pass through literally. */
  private[adapters] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try String.valueOf(Integer.parseInt(e.drop(2), 16).toChar) catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try String.valueOf(Integer.parseInt(e.drop(1)).toChar) catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---- block builder + classifier ------------------------------------

  private sealed trait Item
  private final case class TextItem(markdown: String) extends Item
  private final case class MediaItem(ref: String) extends Item

  override def extract(span: Span): Either[ExtractFailure, Vector[Span]] = {
    if (span.text == null || span.text.isEmpty)
      return Left(ExtractFailure("Failed to parse HTML: empty payload", "validation"))
    val toks = tokenize(span.text)
    val items = buildItems(toks)
    // offsets are renumbered doc-wide by Dispatch; use local order here
    Right(items.zipWithIndex.map {
      case (TextItem(md), idx) => Span(Model.Kind.Text, md, "", idx)
      case (MediaItem(ref), idx) => Span(Model.Kind.Image, "", ref, idx)
    })
  }

  private def buildItems(toks: Vector[Tok]): Vector[Item] = {
    val items = ArrayBuffer.empty[Item]
    val sb = new StringBuilder
    var linkChars = 0
    var totalChars = 0
    var linkDepth = 0
    var headingLevel = 0        // >0 while inside h1..h6
    var boilerDepth = 0         // open nav/aside/footer/header/script/style/head
    var headerOnlyDepth = 0     // open <header> specifically
    var skipDepth = 0           // open script/style/head (text fully dropped)

    def flush(): Unit = {
      val text = normalizeWs(decodeEntities(sb.toString))
      val lc = linkChars; val tc = totalChars
      sb.clear(); linkChars = 0; totalChars = 0
      if (text.isEmpty) return
      val linkDensity = if (tc == 0) 0.0 else lc.toDouble / tc.toDouble
      if (headingLevel > 0) {
        val keep = text.length >= 3 && lc == 0 &&
          (boilerDepth == 0 || boilerDepth == headerOnlyDepth) // headings allowed under <header> only
        if (keep) items += TextItem(("#" * headingLevel) + " " + text)
      } else {
        val keep = boilerDepth == 0 && text.length >= MinTextLen && linkDensity < MaxLinkDensity
        if (keep) items += TextItem(text)
      }
    }

    toks.foreach {
      case Text(s) =>
        if (skipDepth == 0) {
          sb.append(s)
          val visible = s.count(!Character.isWhitespace(_))
          totalChars += visible
          if (linkDepth > 0) linkChars += visible
        }
      case StartTag(tag, attrs, selfClosing) =>
        if (tag == "img") {
          val ref = attrs.getOrElse("src", "")
          if (ref.nonEmpty && boilerDepth == 0) items += MediaItem(decodeEntities(ref))
        } else if (BlockTags(tag)) {
          flush()
          if (!selfClosing && tag != "br" && tag != "hr") {
            if (tag.length == 2 && tag.charAt(0) == 'h' && tag.charAt(1) >= '1' && tag.charAt(1) <= '6')
              headingLevel = tag.charAt(1) - '0'
            if (BoilerAncestors(tag)) boilerDepth += 1
            if (tag == "header") headerOnlyDepth += 1
          }
        } else if (tag == "a" && !selfClosing) linkDepth += 1
        else if (RawTextTags(tag) || tag == "head") { if (!selfClosing) { skipDepth += 1; boilerDepth += 1 } }
        else () // inline tag: transparent
      case EndTag(tag) =>
        if (BlockTags(tag)) {
          flush()
          if (tag.length == 2 && tag.charAt(0) == 'h' && tag.charAt(1) >= '1' && tag.charAt(1) <= '6')
            headingLevel = 0
          if (BoilerAncestors(tag) && boilerDepth > 0 && !RawTextTags(tag) && tag != "head") boilerDepth -= 1
          if (tag == "header" && headerOnlyDepth > 0) headerOnlyDepth -= 1
        } else if (tag == "a") { if (linkDepth > 0) linkDepth -= 1 }
        else if (RawTextTags(tag) || tag == "head") {
          if (skipDepth > 0) { skipDepth -= 1; if (boilerDepth > 0) boilerDepth -= 1 }
        }
    }
    flush()
    items.toVector
  }

  private[adapters] def normalizeWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var lastWs = true
    s.foreach { c =>
      if (Character.isWhitespace(c)) { if (!lastWs) sb.append(' '); lastWs = true }
      else { sb.append(c); lastWs = false }
    }
    if (sb.nonEmpty && sb.last == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }
}
