package graft.webtext

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.webtext.HtmlDom.HElem

/** License mining — the rights-clearance gate a commercially-trained corpus
  * runs alongside the robots opt-out gate ([[Metadata.optOutGate]]): pages
  * declaring a machine-readable license via `rel="license"` (RFC 5988 /
  * microformats rel-license, the convention Creative Commons tooling emits)
  * are classified into the CC family lattice, and the
  * `allows_commercial` / `allows_derivatives` verdicts drive corpus routing
  * (a by-nc page may train a research model but not a commercial one).
  *
  * Parsing rules: `rel` is a TOKEN LIST — split on whitespace, matched
  * case-insensitively (`rel="license nofollow"` and `rel="LICENSE"` both
  * declare) — and the first matching element with an `href` in document
  * order wins, whether it is a head `<link>` or a body `<a>`. CC urls are
  * recognized by host `creativecommons.org` with path
  * `licenses/<code>/<version>/` or `publicdomain/zero/<version>/`; the code's
  * dash-tokens map to the verdict flags (`nc` -> non-commercial,
  * `nd` -> no derivatives, `sa` -> share-alike).
  *
  * Scale shape: map-side per-row DOM walk inside `mapPartitions`, zero
  * shuffle — at 10^12 rows it shares the one parse the extraction pipeline
  * already pays (standalone here for the oracle surface).
  */
object License {

  final case class LicenseRow(doc_id: Long, license_url: String, is_cc: Boolean,
                              cc_family: String, cc_version: String,
                              allows_commercial: Boolean, allows_derivatives: Boolean,
                              requires_sharealike: Boolean, keep_commercial: Boolean)

  private def relIsLicense(e: HElem): Boolean =
    e.attr("rel").exists(_.split("\\s+").exists(_.equalsIgnoreCase("license")))

  /** First rel-license href in document order, or null. */
  def licenseUrl(html: String): String = {
    val root = HtmlDom.parse(html)
    HtmlDom.find(root, e => (e.tag == "link" || e.tag == "a") && relIsLicense(e))
      .iterator.flatMap(_.attr("href")).nextOption().orNull
  }

  // compiled once per JVM — ccParse runs once per document row inside
  // licenseGate's mapPartitions (ADVICE r5: a per-row Pattern.compile on a
  // path documented as running at 10^12 rows)
  private val CcUrlRe =
    "^https?://creativecommons\\.org/(licenses/([a-z-]+)|publicdomain/(zero))/([0-9.]+)/?$".r

  /** (family, version) for a CC url, null fields otherwise. */
  def ccParse(url: String): (String, String) = {
    if (url == null) return (null, null)
    url match {
      case CcUrlRe(_, code, zero, ver) => (if (code != null) code else zero, ver)
      case _ => (null, null)
    }
  }

  /** documents -> per-doc license verdicts over the deterministic
    * [[HtmlGen.pageWithLicense]] payload. Flags are non-null booleans:
    * `allows_*` are false unless the page is affirmatively CC-licensed
    * (absent or non-CC license = no clearance, not permission). */
  def licenseGate(docs: DataFrame): Dataset[LicenseRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val url = licenseUrl(HtmlGen.pageWithLicense(id, if (text == null) "" else text))
        val (family, version) = ccParse(url)
        val isCc = family != null
        val toks = if (isCc) family.split("-").toSet else Set.empty[String]
        val commercial = isCc && !toks.contains("nc")
        val derivatives = isCc && !toks.contains("nd")
        val sharealike = isCc && toks.contains("sa")
        LicenseRow(id, url, isCc, family, version,
          commercial, derivatives, sharealike, isCc && commercial)
      })
  }
}
