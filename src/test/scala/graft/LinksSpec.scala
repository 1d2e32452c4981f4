package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Graph, Links}

class LinksSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val pageUrl = "https://www.Site.example.com:443/blog/post7?id=3#frag"

  test("linkExtract: resolution shapes, drops, nofollow, anchor text, internal flag") {
    val html =
      """<html><body>
        |<a href="https://other.example.net/x?utm_source=a&q=1">abs <b>bold</b> link</a>
        |<a href="/root/page">root rel</a>
        |<a href="sibling.html">doc rel</a>
        |<a href="//cdn.example.net/a">scheme rel</a>
        |<a HREF='HTTPS://WWW.other.example.net:443/y/'>caps quoted</a>
        |<a href="https://ads.example.net/t" rel="nofollow">sponsored</a>
        |<a href="#top">frag only</a>
        |<a href="mailto:x@y.z">mail</a>
        |<a href="javascript:void(0)">js</a>
        |</body></html>""".stripMargin
    val out = Links.linkExtract(
        Seq((1L, pageUrl, html)).toDF("doc_id", "url", "html"),
        "doc_id", "url", "html")
      .orderBy("link_no").collect()
    // fragment/mailto/javascript dropped: 6 survivors of 9 anchors
    assert(out.length == 6)
    val byHref = out.map(r => r.getAs[String]("href") -> r).toMap
    // absolute: kept as-is then normalized (utm stripped, params sorted)
    assert(byHref("https://other.example.net/x?utm_source=a&q=1")
      .getAs[String]("target_url") == "https://other.example.net/x?q=1")
    // root-relative: page scheme+host, then normalization strips www/:443
    assert(byHref("/root/page").getAs[String]("target_url") ==
      "https://site.example.com/root/page")
    // document-relative: resolved against the base path's directory
    assert(byHref("sibling.html").getAs[String]("target_url") ==
      "https://site.example.com/blog/sibling.html")
    // scheme-relative inherits the page scheme
    assert(byHref("//cdn.example.net/a").getAs[String]("target_url") ==
      "https://cdn.example.net/a")
    // uppercase single-quoted absolute normalizes case/www/port/slash
    assert(byHref("HTTPS://WWW.other.example.net:443/y/")
      .getAs[String]("target_url") == "https://other.example.net/y")
    // nofollow binds only where rel says so
    assert(byHref("https://ads.example.net/t").getAs[Boolean]("nofollow"))
    assert(!byHref("/root/page").getAs[Boolean]("nofollow"))
    // internal = canonical host equality (www/port hazards collapse)
    assert(byHref("/root/page").getAs[Boolean]("internal"))
    assert(byHref("sibling.html").getAs[Boolean]("internal"))
    assert(!byHref("https://ads.example.net/t").getAs[Boolean]("internal"))
    // anchor text: inner tags stripped, whitespace collapsed
    assert(byHref("https://other.example.net/x?utm_source=a&q=1")
      .getAs[String]("anchor_text") == "abs bold link")
    // page_host is the canonical page host
    assert(out.forall(_.getAs[String]("page_host") == "site.example.com"))
    // link_no is the anchor's position among ALL anchors (pre-drop)
    assert(byHref("/root/page").getAs[Int]("link_no") == 1)
  }

  test("linkExtract is one zero-shuffle map pass (no Exchange in the plan)") {
    val df = Links.linkExtract(
      Seq((1L, pageUrl, "<a href=\"/x\">x</a>")).toDF("doc_id", "url", "html"),
      "doc_id", "url", "html")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"link extraction shuffled:\n$plan")
  }

  test("linkGraph: host adjacency, nofollow excluded, distinct counts") {
    val links = Links.linkExtract(Seq(
        (1L, "https://a.com/p1", "<a href=\"https://b.com/x\">t</a>" +
          "<a href=\"https://b.com/y\">u</a><a href=\"/local\">v</a>" +
          "<a href=\"https://c.com/z\" rel=\"nofollow\">ad</a>"),
        (2L, "https://a.com/p2", "<a href=\"https://b.com/x\">t2</a>")
      ).toDF("doc_id", "url", "html"), "doc_id", "url", "html")
    val g = Links.linkGraph(links).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(g(("a.com", "b.com")) == ((3L, 2L, 2L))) // 3 links, 2 pages, 2 urls
    assert(g(("a.com", "a.com")) == ((1L, 1L, 1L))) // the internal link
    assert(!g.contains(("a.com", "c.com")), "nofollow edge must not count")
  }

  test("anchorCorpus: distinct sorted anchors per canonical target") {
    val links = Links.linkExtract(Seq(
        (1L, "https://a.com/p", "<a href=\"https://t.com/page\">Alpha</a>"),
        (2L, "https://b.com/p", "<a href=\"https://t.com/page/\">beta</a>" +
          "<a href=\"https://t.com/page#sec\">Alpha</a>")
      ).toDF("doc_id", "url", "html"), "doc_id", "url", "html")
    val out = Links.anchorCorpus(links).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // trailing slash + fragment normalize into ONE target
    assert(out == Map("https://t.com/page" -> ((3L, 2L, "Alpha|beta"))))
  }

  test("pagerankDirected: integer fixed-point matches the hand recurrence; " +
      "dangling vertices keep base mass") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val got = Graph.pagerankDirected(edges, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // r0 = 1000000 each; base = 150000
    // it1: m(b)=500000, m(c)=1500000 -> b=575000, c=1425000, a=150000
    // it2: m(b)=75000,  m(c)=650000  -> b=213750, c=702500,  a=150000
    assert(got == Map("a" -> 150000L, "b" -> 213750L, "c" -> 702500L))
  }

  test("pagerankDirected with dangling redistribution: hand recurrence, mass conserved") {
    // a -> b, b dangling; n = 2, scale 1e6, base 150000
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = Graph.pagerankDirected(edges, iters = 2, redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // it1: share = 1000000/2 = 500000; m(b) = 1000000
    //   a = 150000 + 85*(0 + 500000)/100       = 575000
    //   b = 150000 + 85*(1000000 + 500000)/100 = 1425000
    // it2: share = 1425000/2 = 712500; m(b) = 575000
    //   a = 150000 + 85*712500/100            = 755625
    //   b = 150000 + 85*(575000 + 712500)/100 = 1244375
    assert(got == Map("a" -> 755625L, "b" -> 1244375L))
    // the corrected form conserves total mass (up to the integer
    // truncations, which only ever LOSE sub-unit remainders)
    assert(got.values.sum == 2000000L)
    // without the correction the dangling vertex soaks mass out of
    // circulation: the same graph leaks to less than 1/4 of the total
    val cheap = Graph.pagerankDirected(edges, iters = 2).collect()
      .map(_.getLong(1)).sum
    assert(cheap < 500000L, s"expected mass leak without correction, got $cheap")
  }

  test("splitAssignByKey: every row of one key lands in ONE split; " +
      "proportions track keys, not rows") {
    val df = (0L until 600L).map(i => (i, s"host${i % 30}"))
      .toDF("doc_id", "host")
    val out = Curation.splitAssignByKey(df, "doc_id", col("host"))
    assert(out.count() == 600)
    val perKey = out.groupBy("split_key")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perKey.forall(_.getLong(1) == 1L),
      "a key straddled the split boundary")
    // deterministic: same key -> same split on a re-run
    val again = Curation.splitAssignByKey(df, "doc_id", col("host"))
    assert(out.exceptAll(again).isEmpty)
  }

  test("canonicalHint: first hint wins, relative resolution, self detection, no hint") {
    val pages = Seq(
      // self-declared (spelling variant of own url -> same canonical)
      (1L, "https://www.a.com/x/?utm_source=f", "<head><link rel=\"canonical\" " +
        "href=\"https://a.com/x\"></head>"),
      // relative declaration pointing elsewhere on the same host
      (2L, "https://a.com/dir/page", "<link rel='canonical' href='/other'>"),
      // two hints: the FIRST wins
      (3L, "https://a.com/p", "<link rel=\"canonical\" href=\"https://a.com/first\">" +
        "<link rel=\"canonical\" href=\"https://a.com/second\">"),
      // stylesheet link is not a canonical hint
      (4L, "https://a.com/q", "<link rel=\"stylesheet\" href=\"/s.css\">")
    ).toDF("doc_id", "url", "html")
    val got = operators.Links.canonicalHint(pages, "doc_id", "url", "html")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      1L -> (("https://a.com/x", true, true)),
      2L -> (("https://a.com/other", true, false)),
      3L -> (("https://a.com/first", true, false)),
      4L -> (("", false, false))))
  }

  test("redirectResolve: chains, loop exceeds, dangling external, hop budget") {
    val fetches = Seq(
      ("u/a", 301, "u/b"),   // a -> b -> c: 2 hops
      ("u/b", 302, "u/c"),
      ("u/c", 200, ""),      // terminal
      ("u/d", 200, ""),      // direct
      ("u/e", 307, "u/e"),   // self loop: exceeded
      ("u/f", 308, "u/x"),   // dangling external target
      ("u/g", 301, ""),      // 3xx WITHOUT location: treated terminal
      ("u/h", 301, "u/a")    // h -> a -> b -> c: 3 hops
    ).toDF("uri", "status", "loc")
    val got = operators.Links
      .redirectResolve(fetches, "uri", "status", "loc", maxHops = 4)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      "u/a" -> (("u/c", 2, "resolved", true)),
      "u/b" -> (("u/c", 1, "resolved", true)),
      "u/c" -> (("u/c", 0, "direct", true)),
      "u/d" -> (("u/d", 0, "direct", true)),
      "u/e" -> (("u/e", 4, "exceeded", true)),
      "u/f" -> (("u/x", 1, "resolved", false)),
      "u/g" -> (("u/g", 0, "direct", true)),
      "u/h" -> (("u/c", 3, "resolved", true))))
  }

  test("frontier_budget query: per-host entry count capped, top entries kept") {
    val out = SparkEntry.queries("frontier_budget")(spark, sf)
    val perHost = out.groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perHost.nonEmpty)
    assert(perHost.values.forall(_ <= 25), "budget exceeded")
    // the kept set per host must be the TOP of the (priority, lastmod,
    // loc) order: max dropped <= min kept under the same ordering
    val docs = graft.sources.Tables.documents(spark, sf)
    val entries = graft.operators.Html.sitemapParse(
      docs.select(concat(col("source"), lit(".example.com")).as("host"),
        col("doc_id"),
        graft.operators.Html.wrapSitemap(col("doc_id"), col("source")).as("xml")),
      "doc_id", "xml")
      .select(col("host"), col("loc"), col("lastmod"), col("priority"))
    import org.apache.spark.sql.expressions.Window
    val ranked = entries.withColumn("rn",
      row_number().over(Window.partitionBy("host")
        .orderBy(col("priority").desc, col("lastmod").desc, col("loc").desc)))
    val wantTop = ranked.filter(col("rn") <= 25).drop("rn")
    assert(out.exceptAll(wantTop).isEmpty && wantTop.exceptAll(out).isEmpty,
      "TopKPerKey kept a non-top entry")
  }
}
