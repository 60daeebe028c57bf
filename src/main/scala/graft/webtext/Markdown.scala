package graft.webtext

import HtmlDom.{HElem, HNode, HText}

/** Main-content-to-Markdown rendering — the emit format most LLM training
  * pipelines want for web pages: boilerplate stripped (the [[MainContent]]
  * block choice), block structure kept as Markdown headings/paragraphs, and
  * the inline markup the extractor must NOT flatten (emphasis, links)
  * preserved as Markdown spans. Reference scope analogue: PagePlus's export
  * surface emits structured text, not raw DOM (cli/export.py:52-63); this is
  * the web-page equivalent of that re-serialization step.
  *
  * Rendering is a single recursive walk over the chosen block — O(nodes),
  * document-grain, shuffle-free, embarrassingly parallel like every other
  * extractor in this package.
  *
  * Block rules: `h1`..`h6` render as `#`-runs; `p` renders as one paragraph;
  * any other element recurses transparently (a `#content` wrapper chosen as
  * the best block renders identically to the article it wraps); bare
  * whitespace between blocks is dropped. Blocks join with a blank line.
  * Inline rules: `b`/`strong` -> `**..**`, `i`/`em` -> `*..*`,
  * `code` -> `` `..` ``, `a` -> `[text](href)`; unknown inline tags are
  * transparent, text nodes pass through (entities were decoded at parse).
  */
object Markdown {

  private val Headings = Map("h1" -> 1, "h2" -> 2, "h3" -> 3,
    "h4" -> 4, "h5" -> 5, "h6" -> 6)

  def inline(node: HNode): String = node match {
    case HText(t) => t
    case e @ HElem(tag, _, kids) =>
      val body = kids.map(inline).mkString
      tag match {
        case "b" | "strong" => "**" + body + "**"
        case "i" | "em"     => "*" + body + "*"
        case "code"         => "`" + body + "`"
        case "a"            => "[" + body + "](" + e.attr("href").getOrElse("") + ")"
        case _              => body
      }
  }

  /** Document-order Markdown blocks under `root` (headings + paragraphs). */
  def blocksOf(root: HElem): Vector[String] = {
    val out = Vector.newBuilder[String]
    def walk(node: HNode): Unit = node match {
      case e @ HElem(tag, _, kids) =>
        Headings.get(tag) match {
          case Some(level) => out += ("#" * level + " " + kids.map(inline).mkString)
          case None =>
            if (tag == "p") out += kids.map(inline).mkString
            else kids.foreach(walk)
        }
      case _ => () // inter-block text (layout whitespace) carries no block
    }
    walk(root)
    out.result()
  }

  /** Page bytes -> Markdown of the main block, blocks joined by blank lines. */
  def render(html: String): String =
    MainContent.bestElem(HtmlDom.parse(html)).map(blocksOf(_).mkString("\n\n")).getOrElse("")
}
