package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The LINK layer of a crawl corpus — anchors, the host graph, and the
  * signals derived from them. Between container ingestion (WARC,
  * [[graft.sources.Formats]]) and text curation sits the web's link
  * structure: every production crawl extracts `<a href>` edges to
  * (a) seed the frontier, (b) rank hosts for crawl priority and
  * quality weighting (PageRank over hosts — Page et al. 1999, the
  * public formulation), and (c) build the anchor-text corpus (anchor
  * text describing a target page is classic retrieval/labeling signal
  * — Craswell et al. 2001).
  *
  * Scale shape: link extraction is ONE zero-shuffle map pass (regex +
  * posexplode — a generate, not an exchange) over pages; the host
  * graph aggregates (src_host, dst_host) — a shuffle whose key space
  * is hosts, orders of magnitude smaller than pages; host PageRank
  * iterates on that host graph, never on pages. Nothing in this file
  * shuffles page payloads.
  *
  * Reference scope note: the reference engine ships no crawl layer
  * (`/root/reference/src` is a MapReduce runtime on pre-cleaned text);
  * this extends the library toward the 100 TB crawl-pipeline brief,
  * composing with [[Html.urlNormalize]] (link targets dedupe on
  * canonical URLs) and [[Graph]] (the same integer fixed-point
  * PageRank engine as the dup graph).
  */
object Links {

  // pattern constants — RE2-safe, shared Spark/DuckDB byte-for-byte
  private[graft] val AnchorTagPat = "(?is)<a[ \\t\\r\\n][^>]*>.*?</a>"
  private[graft] val AnchorInnerPat = "(?is)<a[^>]*>(.*?)</a>"
  private[graft] val HrefAttrPat = "(?i)href[ \\t]*=[ \\t]*[\"']([^\"'>]*)[\"']"
  private[graft] val RelNofollowPat = "(?i)rel[ \\t]*=[ \\t]*[\"'][^\"']*nofollow"
  private[graft] val AbsUrlPat = "^[A-Za-z][A-Za-z0-9+.-]*://"
  private[graft] val SkipHrefPat = "^(#|mailto:|javascript:)"
  private[graft] val NormHostPat = "^[a-z][a-z0-9+.-]*://([^/?#]*)"
  private[graft] val LinkTagPat = "(?is)<link[ \\t\\r\\n][^>]*>"
  private[graft] val RelCanonicalPat = "(?i)rel[ \\t]*=[ \\t]*[\"']canonical[\"']"

  private def qp(p: String) = "'" + p.replace("'", "''") + "'"

  /** Extract every `<a href>` anchor from an HTML column and resolve
    * it against the page's own URL (RFC 3986 merge, the three shapes
    * that dominate real markup: absolute, root-relative `/p`,
    * document-relative `p` resolved against the base path's
    * directory; scheme-relative `//h/p` inherits the page scheme).
    * Fragment-only, `mailto:` and `javascript:` pseudo-links are
    * dropped — they are not fetchable frontier candidates. One output
    * row per surviving anchor:
    * (id, link_no — the anchor's 0-based position in the page,
    * href — as written, anchor_text — inner HTML tag-stripped and
    * whitespace-collapsed, target_url — resolved AND canonicalized
    * via [[Html.urlNormalize]], target_host, page_host — canonical
    * host of the page itself, nofollow — rel contains nofollow,
    * internal — target_host == page_host).
    *
    * Scale shape: regex extraction + posexplode + per-row CASE
    * resolution — a generate plus map, zero shuffle, no UDF; composes
    * with [[Html.htmlExtract]] in the same scan.
    */
  /** RFC 3986 merge of an href against a base-URL column: absolute
    * passes through, `//h` inherits the base scheme, `/p` the base
    * authority, a bare path resolves against the base path's directory.
    */
  private def resolveAgainst(href: Column, urlCol: String): Column = {
    val scheme = lower(regexp_extract(col(urlCol), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val pagePath = regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // base directory of the page path (everything up to the last '/')
    val dir = regexp_replace(pagePath, "/[^/]*$", "")
    when(href.rlike(AbsUrlPat), href)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(scheme, lit("://"), rawHost, href))
      .otherwise(concat(scheme, lit("://"), rawHost, dir, lit("/"), href))
  }

  def linkExtract(pages: DataFrame, idCol: String, urlCol: String,
                  htmlCol: String): DataFrame = {
    val pageHost = regexp_extract(Html.urlNormalize(col(urlCol)), NormHostPat, 1)
    val href = regexp_extract(col("__tag"), HrefAttrPat, 1)
    val resolved = resolveAgainst(href, urlCol)
    val anchor = trim(regexp_replace(regexp_replace(
      regexp_extract(col("__tag"), AnchorInnerPat, 1),
      Html.TagPat, " "), Html.WsPat, " "))
    pages
      .select(col(idCol), col(urlCol),
        posexplode(regexp_extract_all(col(htmlCol), lit(AnchorTagPat), lit(0)))
          .as(Seq("link_no", "__tag")))
      .withColumn("href", href)
      .filter(col("href") =!= "" && !col("href").rlike(SkipHrefPat))
      .select(col(idCol), col("link_no"), col("href"),
        anchor.as("anchor_text"),
        Html.urlNormalize(resolved).as("target_url"),
        col("__tag").rlike(RelNofollowPat).as("nofollow"),
        pageHost.as("page_host"))
      .withColumn("target_host", regexp_extract(col("target_url"), NormHostPat, 1))
      .withColumn("internal", col("target_host") === col("page_host"))
      .select(col(idCol), col("link_no"), col("href"), col("anchor_text"),
        col("target_url"), col("target_host"), col("page_host"),
        col("nofollow"), col("internal"))
  }

  /** Aggregate extracted links into the host→host graph: one row per
    * (src_host, dst_host) with edge weight (n_links), distinct linking
    * pages and distinct target URLs. `rel=nofollow` links are excluded
    * — they are the publisher's explicit "don't count this as an
    * endorsement" bit, the public convention every link-graph builder
    * honors. The shuffle key space is hosts² at worst, in practice the
    * sparse host adjacency — page payloads never move.
    *
    * `idCol` names the page-id column from [[linkExtract]] (its
    * idCol passthrough) — addressed BY NAME like every other column
    * here, so a projected/reordered links frame can't silently feed a
    * wrong distinct-page count.
    */
  def linkGraph(links: DataFrame, idCol: String = "doc_id"): DataFrame = {
    require(links.columns.contains(idCol),
      s"linkGraph: page-id column '$idCol' not in ${links.columns.mkString(",")}")
    links.filter(!col("nofollow"))
      .groupBy(col("page_host").as("src_host"), col("target_host").as("dst_host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col(idCol)).as("n_pages"),
        countDistinct(col("target_url")).as("n_urls"))
  }

  /** Anchor-text corpus: per canonical target URL, how many anchors
    * point at it, from how many distinct hosts, and the sorted set of
    * distinct anchor texts (pipe-joined — the portable no-list-column
    * output convention). Nofollow anchors COUNT here: anchor text
    * describes the target regardless of endorsement semantics.
    */
  def anchorCorpus(links: DataFrame): DataFrame =
    links
      .groupBy(col("target_url"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("page_host")).as("n_src_hosts"),
        array_join(array_sort(collect_set(col("anchor_text"))), "|").as("anchors"))

  /** `rel="canonical"` hints — the page's SELF-declared canonical
    * address (the public REP-ecosystem convention every crawler's URL
    * dedup honors alongside C83's syntactic normalization: a page that
    * declares a different canonical is a duplicate BY DECLARATION,
    * whatever its bytes say). Per page: the FIRST canonical `<link>`
    * tag's href, resolved against the page URL and normalized;
    * `has_hint`, and `is_self` (declared == own canonical — the
    * no-action case). Zero shuffle, composes with [[linkExtract]] and
    * [[Html.robotsGate]] in the same scan.
    */
  def canonicalHint(pages: DataFrame, idCol: String, urlCol: String,
                    htmlCol: String): DataFrame = {
    val tags = regexp_extract_all(col(htmlCol), lit(LinkTagPat), lit(0))
    val canon = filter(tags, t => t.rlike(RelCanonicalPat))
    // first hint wins (slice-join: '' when none — never an OOB access)
    val declaredRaw = array_join(
      slice(transform(canon, t => regexp_extract(t, HrefAttrPat, 1)), 1, 1), "")
    pages
      .select(col(idCol), col(urlCol),
        Html.urlNormalize(col(urlCol)).as("page_url"),
        declaredRaw.as("__d"))
      .select(col(idCol), col("page_url"),
        when(col("__d") === "", lit(""))
          .otherwise(Html.urlNormalize(resolveAgainst(col("__d"), urlCol)))
          .as("declared_canonical"))
      .withColumn("has_hint", col("declared_canonical") =!= "")
      .withColumn("is_self",
        col("has_hint") && col("declared_canonical") === col("page_url"))
  }

  /** Inbound-anchor enrichment of a document table: left-join each
    * page's canonical URL against the [[anchorCorpus]] of a link set —
    * what other pages SAY about this document (anchor text is classic
    * relevance/label signal; a page nobody links to gets 0/''). One
    * URL-keyed shuffle join; anchors were already reduced per target.
    */
  def docAnchors(pages: DataFrame, idCol: String, urlCol: String,
                 links: DataFrame): DataFrame = {
    val ac = anchorCorpus(links)
    pages.join(ac, pages(urlCol) === ac("target_url"), "left")
      .select(pages(idCol), pages(urlCol),
        coalesce(col("n_refs"), lit(0L)).as("n_refs"),
        coalesce(col("n_src_hosts"), lit(0L)).as("n_src_hosts"),
        coalesce(col("anchors"), lit("")).as("anchors"))
  }

  /** Resolve HTTP redirect chains in a fetch log — the canonicalization
    * every crawler runs before URL dedup (a page fetched at its old
    * address must count as its final address): follow
    * 301/302/303/307/308 `Location` targets up to `maxHops`, emitting
    * per start URI the final URI, hop count, and resolution class —
    * `direct` (no redirect), `resolved` (chain ended at a terminal
    * target within the budget — `final_in_corpus` distinguishes a
    * fetched terminal from an external/dangling Location), `exceeded`
    * (still redirecting after maxHops — covers loops, which never
    * terminate by construction).
    *
    * Scale shape: the per-hop join's BUILD side is only the redirect
    * SUBSET (3xx rows — a small fraction of any healthy fetch log),
    * re-rooted once; terminal rows carry through with a null key. A
    * fixed unrolled hop count (not a driver loop over convergence)
    * keeps the plan static and the oracle expressible; production
    * crawlers cap redirect chains the same way (the public convention
    * is 5-10 hops).
    */
  def redirectResolve(fetches: DataFrame, uriCol: String, statusCol: String,
                      locCol: String, maxHops: Int = 4): DataFrame = {
    import graft.Materialize.MaterializeOps
    require(maxHops >= 1)
    val isRedirect = col(statusCol).isin(301, 302, 303, 307, 308) &&
      col(locCol).isNotNull && col(locCol) =!= ""
    // (uri -> next-hop) is consumed by THREE plan branches (the
    // resolution seed, the redirect map, and the in-corpus URI set) —
    // materialize it once so the fetch-log scan (payload-sized) runs
    // ONCE, not per consumer; the cut rows are two URI strings per
    // fetch, url-table-sized at any corpus scale (soak-measured: the
    // unmaterialized form re-scanned 3.7 GB per branch).
    val m = fetches.select(col(uriCol).as("__u"),
      when(isRedirect, col(locCol)).as("__n"))
      .materialized
    // The redirect map joins once per unrolled hop; materialize it
    // PRE-PARTITIONED on its join key so the checkpoint's preserved
    // hash partitioning keeps every hop's map side exchange-free when
    // the hops plan as shuffle joins (the pagerank edge-checkpoint
    // pattern) — only the advancing resolution side shuffles per hop,
    // and it carries URI strings only, never payloads.
    val red = m.filter(col("__n").isNotNull)
      .select(col("__u").as("__ru"), col("__n").as("__rn"))
      .repartition(col("__ru"))
      .materialized
    var r = m.select(col("__u").as("start_uri"), col("__u").as("final_uri"),
      col("__n").as("__nxt"), lit(0).as("n_hops"))
    for (_ <- 1 to maxHops) {
      r = r.join(red, r("__nxt") === red("__ru"), "left")
        .select(col("start_uri"),
          coalesce(col("__nxt"), col("final_uri")).as("final_uri"),
          // advancing: matched -> the target's own next (null if the
          // target is terminal or outside the log); parked -> stays null
          when(col("__nxt").isNotNull, col("__rn"))
            .otherwise(lit(null)).as("__nxt"),
          (col("n_hops") +
            when(col("__nxt").isNotNull, 1).otherwise(0)).as("n_hops"))
    }
    val uris = m.select(col("__u").as("__cu")).distinct().materialized
    r.join(uris, r("final_uri") === uris("__cu"), "left")
      .select(col("start_uri"), col("final_uri"), col("n_hops"),
        when(col("n_hops") === 0, lit("direct"))
          .when(col("__nxt").isNotNull, lit("exceeded"))
          .otherwise(lit("resolved")).as("resolution"),
        col("__cu").isNotNull.as("final_in_corpus"))
  }

  // ---------------------------------------------------------------
  // fixture: a deterministic linked-page body around each document —
  // every resolution hazard on a doc_id schedule, reproduced
  // character-for-character by wrapLinksHtmlSql
  // ---------------------------------------------------------------

  /** Deterministic HTML page body with anchors: always a nav of
    * root-relative links, an absolute cross-source link and a
    * fragment-only link (must drop); on schedules — an uppercase
    * single-quoted absolute with www./:443/trailing-slash hazards and
    * nested-tag anchor text (%2), a document-relative sibling link
    * (%3), a nofollow ad link (%4), a mailto (%5, must drop), a
    * scheme-relative CDN link (%6).
    */
  def wrapLinksHtml(idCol: Column, srcCol: Column): Column = concat(
    lit("<html><head>"),
    // rel=canonical schedule: self-declaration on even ids (absolute,
    // matching the page's own canonical wrapUrl form), a NON-self
    // root-relative declaration on id%6==3, none otherwise
    when(idCol % 2 === 0, concat(
      lit("<link rel=\"canonical\" href=\"https://src"),
      (idCol % 20).cast("string"),
      lit(".example.com/articles/item"), (idCol % 40).cast("string"),
      lit("?id="), (idCol % 20).cast("string"), lit("\">")))
      .otherwise(lit("")),
    when(idCol % 6 === 3, concat(
      lit("<link rel=\"canonical\" href=\"/articles/item"),
      ((idCol + 1) % 40).cast("string"),
      lit("?id="), ((idCol + 1) % 20).cast("string"), lit("\">")))
      .otherwise(lit("")),
    lit("</head><body><nav><a href=\"/\">Home</a> <a href=\"/about\">About us</a></nav>"),
    lit("<p>Read <a href=\"https://src"), ((idCol + 1) % 20).cast("string"),
    lit(".example.com/page/"), (idCol % 7).cast("string"),
    lit("\">next source "), (idCol % 7).cast("string"), lit("</a> now.</p>"),
    // a citation of the NEXT document's canonical [[Html.wrapUrl]]
    // address — the inbound-anchor signal doc_anchors joins on
    lit("<p>See also <a href=\"https://src"), ((idCol + 1) % 20).cast("string"),
    lit(".example.com/articles/item"), ((idCol + 1) % 40).cast("string"),
    lit("?id="), ((idCol + 1) % 20).cast("string"),
    lit("\">cited doc "), ((idCol + 1) % 40).cast("string"), lit("</a>.</p>"),
    when(idCol % 2 === 0, concat(
      lit("<p><a HREF='HTTPS://WWW.src"), ((idCol * 3 + 2) % 20).cast("string"),
      lit(".example.com:443/page/"), (idCol % 11).cast("string"),
      lit("/'>alt <b>mirror</b></a></p>"))).otherwise(lit("")),
    when(idCol % 3 === 0, concat(
      lit("<p><a href=\"item"), (idCol % 5).cast("string"),
      lit(".html\">sibling doc "), (idCol % 5).cast("string"),
      lit("</a></p>"))).otherwise(lit("")),
    when(idCol % 4 === 0, concat(
      lit("<p><a href=\"https://ads.example.net/track?id="), idCol.cast("string"),
      lit("\" rel=\"nofollow\">sponsored</a></p>"))).otherwise(lit("")),
    when(idCol % 6 === 0, concat(
      lit("<p><a href=\"//cdn"), ((idCol + 7) % 20).cast("string"),
      lit(".example.net/asset/9\">cdn asset</a></p>"))).otherwise(lit("")),
    lit("<a href=\"#top\">top</a>"),
    when(idCol % 5 === 0,
      lit("<a href=\"mailto:ops@example.com\">mail</a>")).otherwise(lit("")),
    lit("</body></html>"))

  /** DuckDB twin of [[wrapLinksHtml]]. */
  def wrapLinksHtmlSql(idExpr: String, srcExpr: String): String =
    s"""'<html><head>' ||
       |CASE WHEN $idExpr % 2 = 0 THEN
       |  '<link rel="canonical" href="https://src' || cast($idExpr % 20 AS varchar) ||
       |  '.example.com/articles/item' || cast($idExpr % 40 AS varchar) ||
       |  '?id=' || cast($idExpr % 20 AS varchar) || '">' ELSE '' END ||
       |CASE WHEN $idExpr % 6 = 3 THEN
       |  '<link rel="canonical" href="/articles/item' || cast(($idExpr + 1) % 40 AS varchar) ||
       |  '?id=' || cast(($idExpr + 1) % 20 AS varchar) || '">' ELSE '' END ||
       |'</head><body><nav><a href="/">Home</a> <a href="/about">About us</a></nav>' ||
       |'<p>Read <a href="https://src' || cast(($idExpr + 1) % 20 AS varchar) ||
       |'.example.com/page/' || cast($idExpr % 7 AS varchar) ||
       |'">next source ' || cast($idExpr % 7 AS varchar) || '</a> now.</p>' ||
       |'<p>See also <a href="https://src' || cast(($idExpr + 1) % 20 AS varchar) ||
       |'.example.com/articles/item' || cast(($idExpr + 1) % 40 AS varchar) ||
       |'?id=' || cast(($idExpr + 1) % 20 AS varchar) ||
       |'">cited doc ' || cast(($idExpr + 1) % 40 AS varchar) || '</a>.</p>' ||
       |CASE WHEN $idExpr % 2 = 0 THEN
       |  '<p><a HREF=''HTTPS://WWW.src' || cast(($idExpr * 3 + 2) % 20 AS varchar) ||
       |  '.example.com:443/page/' || cast($idExpr % 11 AS varchar) ||
       |  '/''>alt <b>mirror</b></a></p>' ELSE '' END ||
       |CASE WHEN $idExpr % 3 = 0 THEN
       |  '<p><a href="item' || cast($idExpr % 5 AS varchar) ||
       |  '.html">sibling doc ' || cast($idExpr % 5 AS varchar) ||
       |  '</a></p>' ELSE '' END ||
       |CASE WHEN $idExpr % 4 = 0 THEN
       |  '<p><a href="https://ads.example.net/track?id=' || cast($idExpr AS varchar) ||
       |  '" rel="nofollow">sponsored</a></p>' ELSE '' END ||
       |CASE WHEN $idExpr % 6 = 0 THEN
       |  '<p><a href="//cdn' || cast(($idExpr + 7) % 20 AS varchar) ||
       |  '.example.net/asset/9">cdn asset</a></p>' ELSE '' END ||
       |'<a href="#top">top</a>' ||
       |CASE WHEN $idExpr % 5 = 0
       |  THEN '<a href="mailto:ops@example.com">mail</a>' ELSE '' END ||
       |'</body></html>'""".stripMargin

  // ---------------------------------------------------------------
  // DuckDB oracles — one shared extraction CTE, composed per query
  // ---------------------------------------------------------------

  /** CTE chain over `documents` ending in table
    * `links(doc_id, link_no, href, anchor_text, target_url,
    * target_host, page_host, nofollow, internal)` — the twin of
    * [[linkExtract]] fed by the [[Html.wrapUrl]]/[[wrapLinksHtml]]
    * fixtures. WITH-body fragment (no leading WITH).
    */
  /** SQL twin of [[resolveAgainst]] over an href expression, against
    * the scheme/rawhost/dir columns the caller's CTE provides.
    */
  private def resolveSql(h: String): String =
    s"""CASE WHEN regexp_matches($h, ${qp(AbsUrlPat)}) THEN $h
       |      WHEN starts_with($h, '//') THEN scheme || ':' || $h
       |      WHEN starts_with($h, '/') THEN scheme || '://' || rawhost || $h
       |      ELSE scheme || '://' || rawhost || dir || '/' || $h END""".stripMargin

  def linkCteSql: String = {
    val resolved = resolveSql("href")
    s"""pg AS (SELECT doc_id,
       |    ${Html.wrapUrlSql("doc_id", "source")} AS url,
       |    ${wrapLinksHtmlSql("doc_id", "source")} AS html
       |  FROM documents),
       |pg2 AS (SELECT doc_id, url, html,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS rawhost,
       |    regexp_replace(regexp_extract(url,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/[^/]*$$', '') AS dir,
       |    regexp_extract(${Html.urlNormalizeSql("url")},
       |      ${qp(NormHostPat)}, 1) AS page_host
       |  FROM pg),
       |tg AS (SELECT doc_id, scheme, rawhost, dir, page_host,
       |    unnest(list_transform(regexp_extract_all(html, ${qp(AnchorTagPat)}, 0),
       |      (x, i) -> struct_pack(i := i, t := x))) AS e
       |  FROM pg2),
       |lk0 AS (SELECT doc_id, scheme, rawhost, dir, page_host,
       |    cast(e.i - 1 AS INTEGER) AS link_no,
       |    regexp_extract(e.t, ${qp(HrefAttrPat)}, 1) AS href,
       |    trim(regexp_replace(regexp_replace(
       |      regexp_extract(e.t, ${qp(AnchorInnerPat)}, 1),
       |      ${qp(Html.TagPat)}, ' ', 'g'), ${qp(Html.WsPat)}, ' ', 'g')) AS anchor_text,
       |    regexp_matches(e.t, ${qp(RelNofollowPat)}) AS nofollow
       |  FROM tg),
       |lk1 AS (SELECT *, $resolved AS resolved FROM lk0
       |  WHERE href <> '' AND NOT regexp_matches(href, ${qp(SkipHrefPat)})),
       |lk2 AS (SELECT doc_id, link_no, href, anchor_text, nofollow, page_host,
       |    ${Html.urlNormalizeSql("resolved")} AS target_url
       |  FROM lk1),
       |links AS (SELECT doc_id, link_no, href, anchor_text, target_url,
       |    regexp_extract(target_url, ${qp(NormHostPat)}, 1) AS target_host,
       |    page_host, nofollow,
       |    regexp_extract(target_url, ${qp(NormHostPat)}, 1) = page_host AS internal
       |  FROM lk2)""".stripMargin
  }

  def linkExtractOracleSql: String =
    s"""WITH $linkCteSql
       |SELECT doc_id, link_no, href, anchor_text, target_url, target_host,
       |  page_host, nofollow, internal
       |FROM links""".stripMargin

  def linkGraphOracleSql: String =
    s"""WITH $linkCteSql
       |SELECT page_host AS src_host, target_host AS dst_host,
       |  count(*) AS n_links,
       |  count(DISTINCT doc_id) AS n_pages,
       |  count(DISTINCT target_url) AS n_urls
       |FROM links WHERE NOT nofollow
       |GROUP BY 1, 2""".stripMargin

  def anchorCorpusOracleSql: String =
    s"""WITH $linkCteSql
       |SELECT target_url, count(*) AS n_refs,
       |  count(DISTINCT page_host) AS n_src_hosts,
       |  array_to_string(list_sort(list_distinct(list(anchor_text))), '|') AS anchors
       |FROM links
       |GROUP BY 1""".stripMargin

  def canonicalHintOracleSql: String =
    s"""WITH pg AS (SELECT doc_id,
       |    ${Html.wrapUrlSql("doc_id", "source")} AS url,
       |    ${wrapLinksHtmlSql("doc_id", "source")} AS html
       |  FROM documents),
       |pg2 AS (SELECT doc_id, url, html,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS rawhost,
       |    regexp_replace(regexp_extract(url,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/[^/]*$$', '') AS dir,
       |    ${Html.urlNormalizeSql("url")} AS page_url
       |  FROM pg),
       |c AS (SELECT doc_id, page_url, scheme, rawhost, dir,
       |    coalesce(array_to_string(
       |      list_transform(
       |        list_filter(regexp_extract_all(html, ${qp(LinkTagPat)}, 0),
       |          t -> regexp_matches(t, ${qp(RelCanonicalPat)})),
       |        t -> regexp_extract(t, ${qp(HrefAttrPat)}, 1))[1:1], ''), '') AS d
       |  FROM pg2),
       |r AS (SELECT doc_id, page_url,
       |    CASE WHEN d = '' THEN ''
       |         ELSE ${Html.urlNormalizeSql(resolveSql("d"))} END AS declared_canonical
       |  FROM c)
       |SELECT doc_id, page_url, declared_canonical,
       |  declared_canonical <> '' AS has_hint,
       |  declared_canonical <> '' AND declared_canonical = page_url AS is_self
       |FROM r""".stripMargin

  def docAnchorsOracleSql: String =
    s"""WITH $linkCteSql,
       |ac AS (SELECT target_url, count(*) AS n_refs,
       |    count(DISTINCT page_host) AS n_src_hosts,
       |    array_to_string(list_sort(list_distinct(list(anchor_text))), '|') AS anchors
       |  FROM links GROUP BY 1),
       |pgu AS (SELECT doc_id,
       |    ${Html.urlNormalizeSql(Html.wrapUrlSql("doc_id", "source"))} AS page_url
       |  FROM documents)
       |SELECT pgu.doc_id, pgu.page_url,
       |  coalesce(ac.n_refs, 0) AS n_refs,
       |  coalesce(ac.n_src_hosts, 0) AS n_src_hosts,
       |  coalesce(ac.anchors, '') AS anchors
       |FROM pgu LEFT JOIN ac ON pgu.page_url = ac.target_url""".stripMargin

  /** WITH-body fragment for host PageRank over the link CTE: the
    * CROSS-host edge set (distinct followed src→dst, self-edges out)
    * then [[Graph.pagerankDirected]]'s integer recurrence unrolled one
    * CTE per iteration, ending in `r<iters>(host, rank)`.
    * `redistributeDangling` mirrors the Spark option: each round's
    * dangling mass (ranks of hosts never appearing as `src`) is
    * integer-split across all vertices inside the damped term.
    */
  def hostRankCtes(iters: Int = 4, scale: Long = 1000000L,
                   redistributeDangling: Boolean = false): String = {
    val base = 15L * scale / 100L
    val steps = (0 until iters).map { i =>
      val share =
        if (!redistributeDangling) "0"
        else s"""(SELECT coalesce(sum(r.rank), 0) // (SELECT count(*) FROM verts)
                 |      FROM r$i r LEFT JOIN deg d ON r.host = d.src
                 |      WHERE d.src IS NULL)""".stripMargin
      s"""r${i + 1} AS (SELECT v.host,
         |    cast($base + (85 * (coalesce(s.m, 0) + $share)) // 100 AS bigint) AS rank
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst AS host, sum(r.rank // d.outdeg) AS m
         |    FROM edges e JOIN r$i r ON e.src = r.host
         |      JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) s ON v.host = s.host)""".stripMargin
    }.mkString(",\n")
    s"""$linkCteSql,
       |edges AS (SELECT DISTINCT page_host AS src, target_host AS dst
       |  FROM links WHERE NOT nofollow AND NOT internal),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |verts AS (SELECT DISTINCT h AS host FROM (
       |  SELECT src AS h FROM edges UNION SELECT dst FROM edges)),
       |r0 AS (SELECT host, cast($scale AS bigint) AS rank FROM verts),
       |$steps""".stripMargin
  }

  /** Twin of host_rank. */
  def hostRankOracleSql(iters: Int = 4, scale: Long = 1000000L): String =
    s"""WITH ${hostRankCtes(iters, scale)}
       |SELECT host, rank AS rank_fp FROM r$iters""".stripMargin
}
