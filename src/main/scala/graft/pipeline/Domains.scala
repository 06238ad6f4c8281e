package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Domain-level corpus curation (the C4 / RefinedWeb / Gopher host-side
  * steps — public methodology: Raffel et al. 2020 §2.2 blocklist
  * filtering, Penedo et al. 2023 §3.1 URL scoring and per-domain caps):
  * extract the registered domain of every document's source URL, compute
  * per-domain corpus statistics, cap the number of documents any one
  * domain may contribute, and drop documents from blocklisted domains.
  *
  * Everything here is a plain column expression or a keyed aggregation —
  * no driver-side materialization, one shuffle per grouped step — and the
  * registered-domain rule is deliberately engine-portable (string ops
  * only) so every operator carries a full DuckDB value oracle.
  */
object Domains {

  /** Hostname of a URL: lowercase, scheme and userinfo stripped, cut at
    * the first `/ : ? #`. Tolerates scheme-less input. */
  def hostOf(url: Column): Column = {
    val noScheme = F.regexp_replace(F.lower(url), "^[a-z][a-z0-9+.-]*://", "")
    val noUser = F.regexp_replace(noScheme, "^[^/@]*@", "")
    F.regexp_extract(noUser, "^([^/:?#]+)", 1)
  }

  /** Second-level labels that act as public suffixes under a ccTLD
    * (`co.uk`, `ac.jp`, `gov.au`, ...). A pragmatic subset of the public
    * suffix list — enough to group the common two-label registries
    * correctly; a full PSL-driven variant would swap this set out. */
  val CommonSlds: Seq[String] = Seq("ac", "co", "com", "edu", "gov", "net", "org")

  /** Registered (pay-level) domain of a hostname: the last two labels,
    * or three when the second-to-last is a common public-suffix label
    * (`example.co.uk` → `example.co.uk`, `www.example.com` →
    * `example.com`). Pure string expression — codegen'd, zero shuffle. */
  def registeredDomain(host: Column): Column = {
    val parts = F.split(host, "\\.")
    val n = F.size(parts)
    val sld = F.element_at(parts, n - 1)
    F.when(n >= 3 && sld.isin(CommonSlds: _*),
        F.array_join(F.slice(parts, n - 2, F.lit(3)), "."))
      .when(n >= 2, F.array_join(F.slice(parts, n - 1, F.lit(2)), "."))
      .otherwise(host)
  }

  /** Registered domain straight from a URL column. */
  def registeredDomainOfUrl(url: Column): Column = registeredDomain(hostOf(url))

  /** Per-registered-domain corpus statistics: document count, distinct
    * host count, and total text bytes — the inputs to a domain-quality /
    * over-representation review. One shuffle on the domain key with
    * map-side partial aggregation; output is #domains rows. */
  def domainStats(docs: DataFrame, urlCol: String, textCol: String): DataFrame =
    docs.select(registeredDomainOfUrl(F.col(urlCol)).as("domain"),
        hostOf(F.col(urlCol)).as("host"),
        F.length(F.col(textCol)).cast("long").as("n_chars"))
      .groupBy("domain")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.countDistinct(F.col("host")).as("n_hosts"),
        F.sum("n_chars").as("n_chars"))

  /** Keep at most `maxDocs` documents per registered domain,
    * deterministically (lowest `idCol` first) — the RefinedWeb-style cap
    * on any single domain's contribution. Keyed window row_number: one
    * shuffle on domain. A pathologically hot domain (hundreds of millions
    * of rows) sorts within one partition here; for that regime use
    * [[DataMix.sampleExactNPerGroup]] with the domain as the group — the
    * histogram path caps without a per-domain sort. Rows keep their
    * columns plus `domain` and the 1-based `rk` within the domain. */
  def capPerDomain(docs: DataFrame, urlCol: String, idCol: String,
      maxDocs: Int): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val w = Window.partitionBy("domain").orderBy(F.col(idCol).asc)
    docs.withColumn("domain", registeredDomainOfUrl(F.col(urlCol)))
      .withColumn("rk", F.row_number().over(w))
      .filter(F.col("rk") <= maxDocs)
  }

  /** Drop documents whose registered domain is blocklisted. The list
    * rides the plan as a literal IN (broadcast to every task, codegen'd)
    * — right for the usual blocklists of up to ~100k entries. For larger
    * lists use [[filterBlockedDomainsDf]]. */
  def filterBlockedDomains(docs: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing to filter")
    docs.withColumn("domain", registeredDomainOfUrl(F.col(urlCol)))
      .filter(!F.col("domain").isin(blocked.map(_.toLowerCase): _*))
  }

  /** Blocklist as a table: broadcast LEFT ANTI join on the registered
    * domain — the shape for blocklists too large for a literal IN but
    * still executor-memory-sized (tens of millions of entries). */
  def filterBlockedDomainsDf(docs: DataFrame, urlCol: String,
      blocked: DataFrame, blockedCol: String): DataFrame =
    docs.withColumn("domain", registeredDomainOfUrl(F.col(urlCol)))
      .join(F.broadcast(blocked.select(F.lower(F.col(blockedCol)).as("domain")).distinct()),
        Seq("domain"), "left_anti")
}
