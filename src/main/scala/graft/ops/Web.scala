package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and host/domain extraction — the web-curation
  * preamble (CCNet / RefinedWeb style): before any host-level quality
  * gate, blocklist join, or per-domain quota, raw crawl URLs must
  * collapse to a canonical form so that `HTTPS://WWW.Site.com:443/a`
  * and `https://site.com/a` are the same key. Everything here is a
  * pure column expression (codegen'd `regexp_replace` chains, RE2-
  * compatible patterns — no lookarounds), so canonicalization runs
  * map-side at scan speed and the only shuffle in a host-level
  * aggregation is the final groupBy on the canonical domain.
  *
  * Canonical form (applied in order):
  *   1. strip the fragment (`#...`);
  *   2. lowercase the scheme and authority (path/query case is
  *      significant and preserved);
  *   3. strip default ports (`:443` for https, `:80` for http);
  *   4. strip a leading `www.`;
  *   5. drop tracking query params (`utm_*`, `gclid`, `fbclid`,
  *      `msclkid`, `ref`) — runs of them collapse in one RE2 pass;
  *   6. strip a dangling `?`/`&`.
  *
  * `registeredDomainOf` is a public-suffix-LITE rule: last two host
  * labels, or last three when the suffix is a two-part country
  * registry (`co.uk`-style: co|com|org|net|ac|gov + 2-letter ccTLD).
  * The full public-suffix list is a data file, not an algorithm —
  * at deployment, swap the CASE for a broadcast join against the PSL
  * snapshot; the operator shape (map-side derive, group on domain)
  * is unchanged.
  */
object Web {

  private val TRACKING =
    "([?&])((?:utm_[a-zA-Z0-9_]+|gclid|fbclid|msclkid|ref)=[^&#]*&?)+"

  /** Raw URL -> canonical URL (rules above). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val loweredAuth = concat(
      lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
      regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""))
    val noPort = regexp_replace(
      regexp_replace(loweredAuth, "^(https://[^/:?#]*):443([/?#].*)?$", "$1$2"),
      "^(http://[^/:?#]*):80([/?#].*)?$", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val noTracking = regexp_replace(noWww, TRACKING, "$1")
    regexp_replace(noTracking, "[?&]+$", "")
  }

  /** Canonical URL -> host ('' when the URL has no authority). */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Host -> registered domain (public-suffix-lite; see object doc). */
  def registeredDomainOf(host: Column): Column =
    coalesce(
      Seq(
        regexp_extract(host, "([^.]+\\.(?:co|com|org|net|ac|gov)\\.[a-z][a-z])$", 1),
        regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
        .map(c => when(c =!= "", c)) :+ host: _*)
}
