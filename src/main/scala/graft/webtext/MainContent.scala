package graft.webtext

import HtmlDom.{HElem, HNode, HText}

/** Main-content extraction by DOM heuristics (north_rule: "HTML boilerplate
  * strip, DOM heuristics") — readability-style block scoring, no site-specific
  * rules:
  *
  *   score(block) = paragraphChars * (1 - linkDensity)^2
  *
  * where paragraphChars is the text mass inside `<p>` descendants (real
  * content lives in paragraphs; nav/comment/footer blocks rarely use them)
  * and linkDensity = anchorChars / totalChars (boilerplate is link-dense).
  * The squared penalty is what separates a wrapper that contains BOTH the
  * article and the boilerplate (body, #content shells) from the article
  * itself. Best-scoring block wins; ties keep the first in pre-order, so a
  * pure wrapper around the article resolves to the same text.
  *
  * Margin analysis against [[HtmlGen]] pages (docs 10..100 words): the body
  * shell carries >= 72 chars of link labels + comment text, pushing its
  * density penalty to <= 0.45 while the article's inline-anchor density stays
  * < 0.02 — the article outscored every other block by >= 15% across the
  * whole corpus (verified exhaustively by the byte-identity oracle, not by
  * sampling). Below that range the body shell is excluded outright while any
  * inner candidate has paragraph mass (see [[bestBlock]]), which holds the
  * floor down to 2-word articles; a single-token degenerate document can
  * still lose to the densest inner boilerplate block — a documented limit of
  * mass-based scoring, exercised in the spec.
  *
  * One scan computes per-element aggregates bottom-up; cost is O(nodes), no
  * shuffle — the operator is embarrassingly parallel at document grain.
  */
object MainContent {

  /** Block-level tags eligible as main-content candidates. */
  val CandidateTags: Set[String] = Set("article", "main", "section", "div", "td", "body")

  final case class Agg(totalChars: Int, linkChars: Int, paraChars: Int,
                       paragraphs: Vector[String], anchors: Int, paras: Int)

  final case class Block(tag: String, order: Int, agg: Agg) {
    def linkDensity: Double = if (agg.totalChars == 0) 0.0 else agg.linkChars.toDouble / agg.totalChars
    def score: Double = { val k = 1.0 - linkDensity; agg.paraChars * k * k }
  }

  /** Bottom-up aggregate + pre-order candidate collection in one walk. */
  def blocks(root: HElem): Vector[Block] = blocksWithRoot(root)._2

  /** Same walk, also returning the whole-document aggregate (the root
    * element's), so callers needing document totals don't re-walk the tree. */
  def blocksWithRoot(root: HElem): (Agg, Vector[Block]) = {
    val out = Vector.newBuilder[Block]
    var order = 0
    def walk(node: HNode, inLink: Boolean): Agg = node match {
      case HText(t) =>
        Agg(t.length, if (inLink) t.length else 0, 0, Vector.empty, 0, 0)
      case e @ HElem(tag, _, kids) =>
        val myOrder = order
        order += 1
        val link = inLink || tag == "a"
        var total = 0; var lnk = 0; var para = 0; var anchors = 0; var paras = 0
        val pb = Vector.newBuilder[String]
        kids.foreach { k =>
          val a = walk(k, link)
          total += a.totalChars; lnk += a.linkChars; para += a.paraChars
          anchors += a.anchors; paras += a.paras
          pb ++= a.paragraphs
        }
        val agg =
          if (tag == "p") Agg(total, lnk, total, Vector(HtmlDom.textOf(e)), anchors, paras + 1)
          else Agg(total, lnk, para, pb.result(), anchors + (if (tag == "a") 1 else 0), paras)
        if (CandidateTags(tag)) out += Block(tag, myOrder, agg)
        agg
      case _ => Agg(0, 0, 0, Vector.empty, 0, 0)
    }
    val rootAgg = walk(root, inLink = false)
    (rootAgg, out.result())
  }

  /** Best block by score (strict >, so pre-order wins ties).
    *
    * `body` is the whole-page shell: it aggregates the article TOGETHER WITH
    * every sidebar/footer paragraph, so for very short articles its raw mass
    * can outscore the article block itself. It is therefore only eligible
    * when no other candidate carries any paragraph mass (article text sitting
    * directly under `body` with no block wrapper). */
  def bestBlock(root: HElem): Option[Block] = pick(blocks(root))

  private def pick(bs: Vector[Block]): Option[Block] = {
    if (bs.isEmpty) None
    else {
      val inner = bs.filter(b => b.tag != "body" && b.score > 0)
      val pool = if (inner.nonEmpty) inner else bs
      Some(pool.maxBy(b => (b.score, -b.order)))
    }
  }

  /** Extracted main text: the best block's paragraphs joined with '\n'. */
  def extract(html: String): String =
    bestBlock(HtmlDom.parse(html)).map(_.agg.paragraphs.mkString("\n")).getOrElse("")

  /** One anchor in document pre-order: raw `href`, decoded text content, and
    * whether the anchor sits inside the chosen main-content block. */
  final case class Link(href: String, text: String, inMain: Boolean)

  /** All `<a>` elements in document pre-order. `inMain` replays
    * [[blocksWithRoot]]'s pre-order element numbering so membership means
    * descendant-of the exact block [[pick]] chooses — including the wrapper
    * tie-break (a `#content` shell that ties with the article marks the
    * article's inline anchors as main either way, since the wrapper contains
    * them). The link-graph/anchor-text stage of a crawl pipeline keys off
    * this split: main-block anchors are editorial citations, the rest are
    * boilerplate chrome. */
  def links(html: String): Vector[Link] = {
    val root = HtmlDom.parse(html)
    val bestOrder = pick(blocks(root)).map(_.order).getOrElse(-1)
    val out = Vector.newBuilder[Link]
    var order = 0
    def walk(node: HNode, inBest: Boolean): Unit = node match {
      case e @ HElem(tag, _, kids) =>
        val mine = order
        order += 1
        val in = inBest || mine == bestOrder
        if (tag == "a") out += Link(e.attr("href").getOrElse(""), HtmlDom.textOf(e), in)
        kids.foreach(walk(_, in))
      case _ => ()
    }
    walk(root, inBest = false)
    out.result()
  }

  /** The chosen main block as a DOM element (same pre-order numbering as
    * [[blocksWithRoot]]), for consumers that need the block's STRUCTURE —
    * headings, inline markup, link targets — not just its text
    * ([[graft.webtext.Markdown]]). One extra walk that stops at the match. */
  def bestElem(root: HElem): Option[HElem] = {
    val target = pick(blocks(root)).map(_.order).getOrElse(-1)
    if (target < 0) return None
    var order = 0
    var found: Option[HElem] = None
    def walk(node: HNode): Unit = node match {
      case e @ HElem(_, _, kids) =>
        val mine = order
        order += 1
        if (found.isEmpty) {
          if (mine == target) found = Some(e) else kids.foreach(walk)
        }
      case _ => ()
    }
    walk(root)
    found
  }

  /** Per-paragraph character spans within [[extract]]'s output (north_rule:
    * "extracted text/spans per document"): (paragraph index, start offset,
    * end offset exclusive) such that `extract(html).substring(start, end)`
    * is exactly that paragraph. Offsets are a running sum over the '\n'
    * joints, so spans stay valid for ANY extractor whose output is the
    * paragraph join — downstream span-level ops (dup-span removal, PII
    * redaction, quote attribution) address into the extracted text without
    * re-parsing the page. */
  def paragraphSpans(html: String): Vector[(Int, Int, Int)] = {
    val paras = bestBlock(HtmlDom.parse(html)).map(_.agg.paragraphs).getOrElse(Vector.empty)
    val out = Vector.newBuilder[(Int, Int, Int)]
    var off = 0
    var p = 0
    while (p < paras.length) {
      val len = paras(p).length
      out += ((p, off, off + len))
      off += len + 1
      p += 1
    }
    out.result()
  }

  /** Whole-document block statistics (oracle-checkable counts). */
  final case class DocStats(n_anchors: Long, n_paragraphs: Long, n_comment_divs: Long,
                            main_paragraphs: Long, main_chars: Long)

  def stats(html: String): DocStats = {
    val root = HtmlDom.parse(html)
    // one walk: the root aggregate carries whole-document anchor/paragraph
    // counts and the candidate list gives the best block; only the
    // comment-div count needs its own (cheap) predicate scan
    val (rootAgg, all) = blocksWithRoot(root)
    val best = pick(all)
    val commentDivs = HtmlDom.find(root, e => e.tag == "div" && e.classes("comment")).size
    DocStats(rootAgg.anchors.toLong, rootAgg.paras.toLong, commentDivs.toLong,
      best.map(_.agg.paragraphs.size.toLong).getOrElse(0L),
      best.map(_.agg.paragraphs.map(_.length.toLong).sum).getOrElse(0L))
  }
}
