package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.webtext.{HtmlDom, MainContent}

/** Tag-soup fuzz: the parser is the general parser for the pages.html column,
  * so it must TERMINATE and return a tree on arbitrary byte salad — the r1
  * trailing-'<' infinite loop is exactly the bug class this hunts. */
object HtmlDomFuzzProps extends Properties("HtmlDomFuzz") {

  // biased toward markup metacharacters so tag-ish fragments dominate
  private val soupGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      (8, Gen.oneOf('<', '>', '/', '!', '=', '"', '\'', '&', ';', '#', ' ')),
      (6, Gen.alphaChar),
      (2, Gen.numChar),
      (1, Gen.oneOf('-', '\n', '\t', 'ß', '⸗')))).map(_.mkString)

  private val taggyGen: Gen[String] = Gen.listOf(Gen.frequency(
    (3, soupGen),
    (2, Gen.oneOf("<div>", "</div>", "<p>", "</p>", "<script>", "</script>",
      "<style>", "</style>", "<br>", "<img src='x'>", "<!--", "-->", "<!DOCTYPE html>",
      "<a href=\"", "<", ">", "</", "<p", "&amp;", "&#65;", "&#xZZ;", "&bogus;")))
  ).map(_.mkString)

  property("parse terminates and yields a walkable tree") = Prop.forAll(taggyGen) { s =>
    val root = HtmlDom.parse(s)
    val t = HtmlDom.textOf(root)
    // text only ever comes from the input (entities can only shrink it)
    t.length <= s.length
  }

  property("extract terminates on tag soup and never throws") = Prop.forAll(taggyGen) { s =>
    MainContent.extract(s) != null && MainContent.stats(s) != null
  }

  property("parse is total on pathological suffixes") = Prop.forAll(soupGen) { s =>
    Seq(s + "<", s + "</", s + "<!", s + "<!--", s + "<a href='", "<" * 20 + s).forall { v =>
      HtmlDom.textOf(HtmlDom.parse(v)).length <= v.length + 20
    }
  }

  property("license walker terminates on tag soup; CC parse total on salad urls") =
    Prop.forAll(taggyGen) { s =>
      graft.webtext.License.licenseUrl(s) match {
        case null => true
        case u => graft.webtext.License.ccParse(u) != null
      }
    }
}
