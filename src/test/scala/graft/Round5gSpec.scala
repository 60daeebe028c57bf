package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: rel="license" CC-clearance mining and the
  * code-vs-prose routing gate. */
class LicenseCodeSpec extends AnyFunSuite {
  import SparkSuite._
  import graft.webtext.{HtmlGen, License}
  import graft.textops.Curate

  test("licenseUrl: multi-token rel, uppercase rel value, body anchor, absent") {
    // docId%6==0: rel="license nofollow" head link
    assert(License.licenseUrl(HtmlGen.pageWithLicense(6L, "a b")) ==
      "https://creativecommons.org/licenses/by/4.0/")
    // docId%6==4: rel="LICENSE" (values are NOT lowercased by the parser)
    assert(License.licenseUrl(HtmlGen.pageWithLicense(4L, "a b")) ==
      "https://example.com/terms-of-use")
    // docId%6==2: body <a rel="license">, not head-declared
    assert(License.licenseUrl(HtmlGen.pageWithLicense(2L, "a b")) ==
      "https://creativecommons.org/licenses/by-nd/4.0/")
    // docId%6==3: absent — the footer's plain anchors must not match
    assert(License.licenseUrl(HtmlGen.pageWithLicense(3L, "a b")) == null)
  }

  test("ccParse: licenses path, publicdomain zero path, non-CC, trailing slash optional") {
    assert(License.ccParse("https://creativecommons.org/licenses/by-nc-sa/3.0/") == ("by-nc-sa", "3.0"))
    assert(License.ccParse("https://creativecommons.org/publicdomain/zero/1.0/") == ("zero", "1.0"))
    assert(License.ccParse("https://creativecommons.org/licenses/by/4.0") == ("by", "4.0"))
    assert(License.ccParse("https://example.com/terms-of-use") == (null, null))
    assert(License.ccParse(null) == (null, null))
  }

  test("licenseGate verdicts match the six-branch CASE semantics") {
    import spark.implicits._
    val docs = (0L to 11L).map(i => (i, "w1 w2 w3")).toDF("doc_id", "text")
    val got = License.licenseGate(docs).collect().map(r => r.doc_id -> r).toMap
    // by 4.0: full clearance
    assert(got(6L).is_cc && got(6L).allows_commercial && got(6L).allows_derivatives && !got(6L).requires_sharealike)
    // by-nc-sa 3.0: no commercial, derivatives ok, sharealike required
    assert(got(1L).is_cc && !got(1L).allows_commercial && got(1L).allows_derivatives && got(1L).requires_sharealike)
    assert(!got(1L).keep_commercial)
    // by-nd 4.0: commercial ok, no derivatives
    assert(got(2L).is_cc && got(2L).allows_commercial && !got(2L).allows_derivatives)
    // absent + non-CC: no affirmative clearance
    for (id <- Seq(3L, 4L)) {
      val r = got(id)
      assert(!r.is_cc && !r.allows_commercial && !r.allows_derivatives && !r.keep_commercial)
      assert(r.cc_family == null && r.cc_version == null)
    }
    assert(got(4L).license_url == "https://example.com/terms-of-use")
    // CC0: public-domain-equivalent full clearance
    assert(got(5L).is_cc && got(5L).cc_family == "zero" && got(5L).keep_commercial)
  }

  test("codeDetect: planted code crosses both gates with margin, prose scores zero") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, (1 to 20).map("word" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curate.codeDetect(Curate.plantCode(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- 0L to 9L) {
      val r = got(id)
      val (nLines, nSemi, spk, isCode) =
        (r.getLong(1), r.getLong(2), r.getLong(6), r.getBoolean(7))
      if (id % 5 == 0) {
        assert(isCode, s"doc $id should be code")
        assert(nSemi == nLines)          // every planted line terminated
        assert(spk >= 20, s"density margin thin: $spk") // >= 2x the 10 gate
      } else {
        assert(!isCode && nSemi == 0L && spk == 0L && r.getLong(4) == 0L)
      }
    }
    // 20 words -> ceil(20/8)=3 planted lines, all indented
    assert(got(0L).getLong(1) == 3L && got(0L).getLong(3) == 3L)
  }

  test("both gates stay map-side: no Exchange in the final plan") {
    import spark.implicits._
    val docs = (0L to 29L).map(i => (i, "a b c")).toDF("doc_id", "text")
    for (df <- Seq(License.licenseGate(docs).toDF(),
                   Curate.codeDetect(Curate.plantCode(docs)))) {
      val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!fin.contains("Exchange"), fin)
    }
  }
}
