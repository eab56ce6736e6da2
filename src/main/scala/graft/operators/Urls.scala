package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus hygiene primitive: crawls see
  * the same resource under case-shuffled hosts, default ports, tracking
  * parameters, shuffled query order, fragments, and trailing slashes,
  * and URL-level dedup / frontier management needs one canonical form
  * per resource.
  *
  * Rules (each a pure column expression — narrow map, codegen'd, no
  * shuffle, so canonicalization runs at scan speed on any corpus):
  *   - fragment dropped
  *   - scheme and host lowercased
  *   - default port stripped (https:443, http:80); others kept
  *   - trailing slashes stripped from the path
  *   - `utm_*` tracking parameters dropped
  *   - surviving query parameters sorted (byte order)
  */
object Urls {

  /** Canonical form of a `scheme://Host[:port]/path[?query][#frag]`
    * URL column. Malformed inputs degrade per-rule (a URL with no `?`
    * simply has no parameters) rather than nulling the row.
    *
    * Round 12: evaluates through the one-walk codegen kernel
    * ([[graft.functions.CanonicalUrl]]) — the builtin chain below
    * ([[canonicalUrlColumns]]) runs its `filter`/`sort_array` HOFs
    * interpreted per query parameter and held url_normalize at
    * ~12 µs/row; UrlSpec pins kernel ≡ chain on the adversarial
    * cases.
    */
  def canonicalUrl(url: Column): Column =
    graft.functions.CanonicalUrl.canonical_url(url)

  /** The builtin-column formulation of [[canonicalUrl]] — kept as the
    * executable spec the kernel is property-tested against (and the
    * shape the DuckDB oracle mirrors).
    */
  def canonicalUrlColumns(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    val hostPort = substring_index(rest, "/", 1)
    // everything after the authority, starting at the first '/'
    val pathQ = rest.substr(length(hostPort) + 1, lit(1 << 30))
    val path = substring_index(pathQ, "?", 1)
    val rawQ = when(instr(pathQ, "?") > 0, substring_index(pathQ, "?", -1))
      .otherwise(lit(""))
    val host = lower(substring_index(hostPort, ":", 1))
    val port = when(instr(hostPort, ":") > 0, substring_index(hostPort, ":", -1))
      .otherwise(lit(""))
    val keepPort = port =!= "" &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    val cleanPath = regexp_replace(path, "/+$", "")
    val params = array_join(
      sort_array(filter(split(rawQ, "&"),
        p => p =!= "" && !p.startsWith("utm_"))), "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      cleanPath,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }
}
