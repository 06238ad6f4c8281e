package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Domains

/** Domain-level curation: registered-domain extraction edge cases, cap
  * determinism, and the broadcast shape of the table-blocklist filter. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("registeredDomain: PSL heuristic, subdomains, userinfo, ports, bare hosts") {
    val cases = Seq(
      "https://WWW.Example.COM/path?q=1"      -> "example.com",
      "http://a.b.news.example.co.uk:8080/x"  -> "example.co.uk",
      "https://u:pw@deep.sub.site.org/"       -> "site.org",
      "ftp://files.example.net"               -> "example.net",
      "example.com/no-scheme"                 -> "example.com",
      "https://localhost/x"                   -> "localhost",
      "https://api.gov.au/x"                  -> "api.gov.au",
      "https://example.ac.jp"                 -> "example.ac.jp")
    val got = cases.map(_._1).toDF("url")
      .select(Domains.registeredDomainOfUrl(F.col("url")).as("d"))
      .collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("capPerDomain keeps the lowest-id docs and numbers them 1..n") {
    val docs = Seq(
      (3L, "https://a.example.com/1"), (1L, "https://b.example.com/2"),
      (2L, "https://example.com/3"), (9L, "https://other.org/4"),
      (5L, "https://example.com/5"))
      .toDF("id", "url")
    val capped = Domains.capPerDomain(docs, "url", "id", maxDocs = 2)
      .select("domain", "rk", "id").as[(String, Int, Long)].collect().toSet
    assert(capped == Set(("example.com", 1, 1L), ("example.com", 2, 2L),
      ("other.org", 1, 9L)))
  }

  test("blocklist filters match subdomain variants of the registered domain") {
    val docs = Seq(
      (1L, "https://www.bad.com/x"), (2L, "https://deep.sub.bad.com/y"),
      (3L, "https://bad.com.good.org/z"), (4L, "https://good.org/w"))
      .toDF("id", "url")
    val kept = Domains.filterBlockedDomains(docs, "url", Seq("BAD.com"))
      .select("id").as[Long].collect().toSet
    // 3 survives: its registered domain is good.org (bad.com is a subdomain label)
    assert(kept == Set(3L, 4L))
    val keptDf = Domains.filterBlockedDomainsDf(docs, "url",
      Seq("bad.com").toDF("d"), "d").select("id").as[Long].collect().toSet
    assert(keptDf == Set(3L, 4L))
  }

  test("vocab cumulative sum equals a single-window computation") {
    import org.apache.spark.sql.expressions.Window
    val docs = Seq("a a a b b c", "a b d", "e e c a").toDF("text")
    val (got, total) = graft.pipeline.Vocab.withCumulative(
      graft.pipeline.Vocab.tokenCounts(docs, "text"))
    val naive = graft.pipeline.Vocab.tokenCounts(docs, "text")
      .withColumn("cum", F.sum("cnt").over(
        Window.orderBy(F.col("cnt").desc, F.col("token").asc)))
      .select("token", "cnt", "cum").as[(String, Long, Long)].collect().toSet
    assert(got.select("token", "cnt", "cum").as[(String, Long, Long)]
      .collect().toSet == naive)
    assert(total == 13L)
  }

  test("byCoverage returns the minimal head covering the mass") {
    // counts: a=5 b=3 e=2 c=2 d=1 (ties by token asc) — cum 5,8,10,12,13
    val docs = Seq("a a a b b c", "a b d", "e e c a").toDF("text")
    val kept = graft.pipeline.Vocab.byCoverage(docs, "text", coverage = 0.75)
      .select("token").as[String].collect().toSet
    // 0.75·13 = 9.75: a (0<9.75), b (5<9.75), c (8<9.75); e excluded (10≥9.75)
    assert(kept == Set("a", "b", "c"))
    val all = graft.pipeline.Vocab.byCoverage(docs, "text", coverage = 1.0)
      .count()
    assert(all == 5)
  }

  test("script detection: dominant script and fractions on known mixed text") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "hello world"),            // latin
      (2L, "Привет мир"),             // cyrillic
      (3L, "你好世界"),                 // cjk
      (4L, "مرحبا"),                  // arabic
      (5L, "αβγ"),                    // greek
      (6L, "12345"),                  // digit
      (7L, "!!! ???"))                // none → other
      .toDF("id", "t")
    val got = rows.select(F.col("id"),
        TextAnalysis.dominantScript(F.col("t")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "latin", 2L -> "cyrillic", 3L -> "cjk",
      4L -> "arabic", 5L -> "greek", 6L -> "digit", 7L -> "other"))
    val fr = rows.where(F.col("id") === 3L).select(
      TextAnalysis.scriptFractions(F.col("t"))
        .find(_._1 == "frac_cjk").get._2).head().getDouble(0)
    assert(fr == 1.0)
  }

  test("compression ratio orders repetitive below diverse text; bounds hold") {
    import graft.pipeline.QualityFilters
    val rep = "spam ham " * 500
    val div = (1 to 500).map(i => s"w${i * 7919}").mkString(" ")
    val out = Seq((1L, rep), (2L, div), (3L, ""), (4L, null: String))
      .toDF("id", "t")
    val r = QualityFilters.withCompressionRatio(out, "t", "id")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) < 0.05, s"repetitive ratio ${r(1L)}")
    assert(r(2L) > 0.3, s"diverse ratio ${r(2L)}")
    assert(r(3L) == 1.0 && r(4L) == 1.0)
    assert(r.values.forall(v => v > 0 && v <= 1.5))
  }

  test("table-blocklist filter plans as a broadcast anti-join") {
    val docs = Seq((1L, "https://a.com/x")).toDF("id", "url")
    val plan = Domains.filterBlockedDomainsDf(docs, "url",
      Seq("b.com").toDF("d"), "d").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti join, got:\n$plan")
  }
}
