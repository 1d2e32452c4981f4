package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties over the operators whose contracts are
  * algebraic (bounds, nesting, parity with an independent model) —
  * generated with FIXED seeds so runs are reproducible.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((Option.empty[A], rng.Seed(seed))) { case (_, s) =>
      (g.apply(params, s), s.next)
    }.drop(1).map(_._1).take(n * 2).flatten.take(n).toSeq
  }

  /** Independent model of the CDC chunker: plain Scala + MessageDigest,
    * written directly from the SQL convention (md5 hex prefix → 60-bit
    * long; anchors start chunks; chunk md5 of space-joined tokens) —
    * shares NO code with graft.functions.GraftText.cdcChunks.
    */
  private def modelChunks(toks: Seq[String], anchorMod: Int): Seq[(String, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
    def isAnchor(t: String) = {
      val h = hex(md.digest(s"cdc|$t".getBytes("UTF-8"))).substring(0, 15)
      java.lang.Long.parseLong(h, 16) % anchorMod == 0
    }
    if (toks.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var current = scala.collection.mutable.ArrayBuffer[String]()
    toks.foreach { t =>
      if (isAnchor(t) && current.nonEmpty) {
        out += ((hex(md.digest(current.mkString(" ").getBytes("UTF-8"))), current.length))
        current = scala.collection.mutable.ArrayBuffer[String]()
      }
      current += t
    }
    out += ((hex(md.digest(current.mkString(" ").getBytes("UTF-8"))), current.length))
    out.toSeq
  }

  /** Independent model of RFC 9309 pattern matching: translate the
    * pattern to a java.util.regex form (escape everything, `*` → `.*`,
    * trailing `$` → full match, otherwise prefix via lookingAt) —
    * shares NO code with GraftText.robotsMatch's byte walk. Regular
    * language membership is implementation-independent, so any
    * disagreement is a bug in one of the two.
    */
  private def modelRobotsMatch(path: String, pat: String): Boolean = {
    val anchored = pat.endsWith("$")
    val core = if (anchored) pat.dropRight(1) else pat
    val esc = core.map {
      case '*' => "\u0001" // placeholder: never in generated input
      case c if "\\^$.|?+()[]{}".contains(c) => "\\" + c
      case c => c.toString
    }.mkString.replace("\u0001", ".*")
    val p = java.util.regex.Pattern.compile(esc, java.util.regex.Pattern.DOTALL)
    if (anchored) p.matcher(path).matches() else p.matcher(path).lookingAt()
  }

  test("property: robots pattern kernel matches an independent regex model") {
    // alphabet exercises every interesting shape: wildcards, anchors
    // (trailing AND mid-pattern '$'), path separators, repeated chars
    // (star backtracking), and multi-byte UTF-8 (the kernel walks
    // bytes; self-synchronizing UTF-8 makes that equivalent)
    val chars = Gen.frequency(
      (6, Gen.oneOf('a', 'b', '/')), (2, Gen.const('*')),
      (2, Gen.const('$')), (1, Gen.oneOf('é', '語')))
    val strs = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))
    val pairs = for (p <- strs; q <- strs) yield (p, q)
    var checked = 0
    samples(pairs, 4000, seed = 1409L).foreach { case (path, pat) =>
      if (pat.nonEmpty) { // empty rpaths are dropped by the parser
        val got = graft.functions.GraftText.robotsMatch(
          UTF8String.fromString(path), UTF8String.fromString(pat))
        val want = modelRobotsMatch(path, pat)
        assert(got == want, s"path='$path' pat='$pat': kernel=$got model=$want")
        checked += 1
      }
    }
    assert(checked > 3000)
  }

  test("property: CDC kernel matches an independent model on random token streams") {
    val word = Gen.chooseNum(0, 40).map(i => s"w$i") // small vocab → frequent repeats
    val doc = Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(doc, 300, seed = 42L)
    docs.zipWithIndex.foreach { case (toks, i) =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      for (anchorMod <- Seq(2, 7, 16)) {
        val got = graft.functions.GraftText.cdcChunks(arr, anchorMod)
        val gotSeq = (0 until got.numElements()).map { j =>
          val r = got.getStruct(j, 2)
          (r.getUTF8String(0).toString, r.getInt(1))
        }
        assert(gotSeq == modelChunks(toks, anchorMod),
          s"doc $i (${toks.length} toks, mod $anchorMod)")
      }
    }
  }

  /** Independent model of winnowing, written directly from the SQL
    * convention (md5 12-hex prefix → 48-bit long; per-w-window minimum
    * with rightmost tiebreak; dedup in selection order) — shares NO
    * code with graft.functions.GraftText.winnowFps.
    */
  private def modelWinnow(toks: Seq[String], n: Int, w: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
    val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    if (grams.length < w) return Seq.empty
    val hs = grams.map(g =>
      java.lang.Long.parseLong(hex(md.digest(g.getBytes("UTF-8"))).substring(0, 12), 16))
    val sel = (0 to hs.length - w).map { s =>
      var best = s
      for (j <- s + 1 until s + w) if (hs(j) <= hs(best)) best = j
      hs(best)
    }
    sel.distinct
  }

  test("property: winnow kernel matches an independent model on random token streams") {
    val word = Gen.chooseNum(0, 40).map(i => s"w$i") // small vocab → frequent repeats
    val doc = Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(doc, 300, seed = 43L)
    docs.zipWithIndex.foreach { case (toks, i) =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      for ((n, w) <- Seq((4, 5), (3, 3), (2, 8))) {
        val got = graft.functions.GraftText.winnowFps(arr, n, w)
        val gotSeq = (0 until got.numElements()).map(got.getLong)
        assert(gotSeq == modelWinnow(toks, n, w),
          s"doc $i (${toks.length} toks, n=$n w=$w)")
      }
    }
  }

  test("property: quantization bounds hold on random vectors") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-8.0f, 8.0f))
    val vecs = samples(vec, 150, seed = 7L)
      .zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.toSeq, 4), schema)
    val rows = graft.operators.Similarity
      .quantizeInt8(df, "vec_id", "embedding").collect()
    assert(rows.length == vecs.length)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val qs = r.getString(2).split(",").map(_.toLong)
      val mse = r.getDouble(3)
      assert(qs.forall(q => q >= -127 && q <= 127))
      // per-component error is at most scale/2 (round-half-up), so the
      // mean square can't exceed (scale/2)^2 (+ rounding slop)
      assert(mse <= scale * scale / 4.0 + 1e-9, s"mse $mse scale $scale")
    }
  }

  test("property: mixture sampling nests across random rate pairs") {
    val docs = sources.Tables.documents(spark, sf)
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val (a, b) = (rnd.nextDouble(), rnd.nextDouble())
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val idsLo = graft.operators.Curation
        .mixtureSample(docs, "doc_id", "lang", Map.empty, lo)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val idsHi = graft.operators.Curation
        .mixtureSample(docs, "doc_id", "lang", Map.empty, hi)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(idsLo.subsetOf(idsHi), s"rates $lo ⊄ $hi")
    }
  }

  test("property: pagerank mass bounds on random graphs") {
    val pairSchema = StructType(Seq(
      StructField("doc_a", LongType), StructField("doc_b", LongType)))
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { _ =>
      val n = 4 + rnd.nextInt(12)
      val pairs = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      if (pairs.nonEmpty) {
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(pairs.map(p => Row(p._1, p._2)), 2),
          pairSchema)
        val ranks = graft.operators.Graph.pagerank(df)
          .collect().map(_.getLong(1))
        val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length
        assert(ranks.length == verts)
        // integer floors only lose mass; every vertex keeps the base share
        assert(ranks.sum <= verts * 1000000L)
        assert(ranks.forall(_ >= 150000L))
      }
    }
  }

  test("property: KL non-negativity and temperature quota bounds on random corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    val nSrc = 4
    (1 to 3).foreach { round =>
      val texts = samples(doc, 40, seed = 7000 + round)
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, s"s${i % nSrc}", t.length.toLong)
      }.toDF("doc_id", "text", "source", "n_chars")
      // Gibbs' inequality: KL(P_s ‖ P_corpus) ≥ 0 — the round-6-decimal
      // term grid can dip a source at most n_types·5e-7 below zero
      val kls = graft.operators.Scoring.sourceDivergence(docs, "text", "source")
        .select("kl_nats", "n_types").as[(Double, Long)].collect()
      assert(kls.length == nSrc)
      kls.foreach { case (kl, nt) =>
        assert(kl >= -nt * 5e-7, s"KL $kl below the rounding floor for $nt types")
      }
      // temperature draw: per-source takes never exceed ⌊budget·q_s⌋,
      // total never exceeds the budget
      val budget = 20
      val drawn = graft.operators.Curation
        .temperatureSample(docs, "doc_id", "source", "n_chars", budget)
      assert(drawn.count() <= budget)
      val perSrc = drawn.groupBy("source").count().as[(String, Long)].collect()
      assert(perSrc.forall(_._2 <= budget), perSrc.toSeq.toString)
      // drawn ids are a subset of the corpus
      assert(drawn.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    }
  }

  test("property: line dedup matches an independent first-occurrence model") {
    import spark.implicits._
    // small line vocab → heavy cross-doc duplication; blanks + space
    // padding exercise the trim/filter path
    val line = Gen.oneOf(
      Gen.chooseNum(0, 15).map(i => s"line number $i"),
      Gen.oneOf("", "   ", " padded line "))
    val doc = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, line))
      .map(_.mkString("\n"))
    val texts = samples(doc, 120, seed = 9100L)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // independent model: space-trim, drop empties, keep first (id, no)
    val model = scala.collection.mutable.Map[String, (Long, Int)]()
    val docLines = docs.map { case (id, t) =>
      id -> t.split("\n", -1).toSeq
        .map(l => l.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse)
        .filter(_.nonEmpty)
    }
    docLines.foreach { case (id, ls) =>
      ls.zipWithIndex.foreach { case (l, no) =>
        if (!model.contains(l)) model(l) = (id, no)
      }
    }
    val want = docLines.map { case (id, ls) =>
      val kept = ls.zipWithIndex.collect {
        case (l, no) if model(l) == (id, no) => l
      }
      id -> (ls.length, kept.length, kept.mkString("\n"))
    }.toMap
    val got = graft.operators.Dedup
      .lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got == want)
  }

  test("property: doc chunks match an independent sliding-window model") {
    import spark.implicits._
    val word = Gen.chooseNum(0, 30).map(i => s"w$i")
    val doc = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val texts = samples(doc, 150, seed = 9200L)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for ((win, stride) <- Seq((8, 8), (8, 5), (3, 1))) {
      val want = docs.flatMap { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        val starts =
          if (toks.isEmpty) Seq.empty
          else 0 +: Iterator.iterate(stride)(_ + stride)
            .takeWhile(s => s < toks.length && s - stride + win < toks.length)
            .toSeq
        starts.zipWithIndex.map { case (s, i) =>
          (id, i, s, toks.slice(s, s + win))
        }
      }.map { case (id, i, s, c) => (id, i, s, c.length, c.mkString(" ")) }.toSet
      val got = graft.operators.Curation
        .docChunks(docs.toDF("doc_id", "text"), "doc_id", "text", win, stride)
        .as[(Long, Int, Int, Int, String)].collect().toSet
      assert(got == want, s"win=$win stride=$stride")
    }
  }

  test("property: training shards match an independent prefix-sum model") {
    import spark.implicits._
    val word = Gen.chooseNum(0, 30).map(i => s"w$i")
    val doc = Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    def phash(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 15), 16)
    for (round <- 1 to 2; budget <- Seq(7L, 50L)) {
      val texts = samples(doc, 100, seed = 9300L + round)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val ordered = docs.map { case (id, t) =>
        (id, t.split("\\s+").count(_.nonEmpty).toLong, phash(s"shuffle|$id"))
      }.sortBy { case (id, _, h) => (h, id) }
      val want = ordered.scanLeft((0L, 0L, 0L, 0L)) {
        case ((_, _, acc, _), (id, n, _)) => (id, n, acc + n, 0L)
      }.drop(1).map { case (id, n, end, _) =>
        (id, n, end - n, (end - n) / budget)
      }.toSet
      val got = graft.operators.Curation
        .trainingShards(docs.toDF("doc_id", "text"), "doc_id", "text", budget)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"round=$round budget=$budget")
    }
  }

  test("property: sitemap parse matches an independent structural model") {
    import spark.implicits._
    // structured entries rendered to XML with random whitespace noise;
    // the model evaluates the STRUCTURE — parser parity incl. the
    // loc-required drop, trimming, and the 0.5 priority default
    case class E(loc: Option[String], lastmod: Option[String],
                 cf: Option[String], pr: Option[String])
    val ws = Gen.oneOf("", " ", "\n", "  ")
    val genE = for {
      loc <- Gen.option(Gen.chooseNum(0, 99).map(i => s"https://x.com/p$i"))
      lm <- Gen.option(Gen.chooseNum(1, 9).map(m => s"2026-0$m-01"))
      cf <- Gen.option(Gen.oneOf("daily", "weekly", "never"))
      pr <- Gen.option(Gen.chooseNum(1, 9).map(p => s"0.$p"))
    } yield E(loc, lm, cf, pr)
    val genDoc = for {
      n <- Gen.chooseNum(0, 6)
      es <- Gen.listOfN(n, genE)
      pad <- Gen.listOfN(n * 8 + 8, ws)
    } yield (es, pad)
    val docs = samples(genDoc, 80, seed = 9500L)
    def render(es: Seq[E], pad: Seq[String]): String = {
      val p = pad.iterator
      def w = if (p.hasNext) p.next() else ""
      "<urlset>" + es.map { e =>
        "<url>" +
          e.loc.map(l => s"<loc>$w$l$w</loc>").getOrElse("") +
          e.lastmod.map(l => s"<lastmod>$w$l$w</lastmod>").getOrElse("") +
          e.cf.map(c => s"<changefreq>$w$c$w</changefreq>").getOrElse("") +
          e.pr.map(v => s"<priority>$w$v$w</priority>").getOrElse("") +
          "</url>" + w
      }.mkString + "</urlset>"
    }
    val rows = docs.zipWithIndex.map { case ((es, pad), i) =>
      (i.toLong, render(es, pad), es)
    }
    val want = rows.flatMap { case (id, _, es) =>
      es.zipWithIndex.collect { case (e, no) if e.loc.isDefined =>
        (id, no, e.loc.get, e.lastmod.getOrElse(""), e.cf.getOrElse(""),
          e.pr.map(_.toDouble).getOrElse(0.5))
      }
    }.toSet
    val got = graft.operators.Html.sitemapParse(
        rows.map { case (id, xml, _) => (id, xml) }.toDF("doc_id", "xml"),
        "doc_id", "xml")
      .as[(Long, Int, String, String, String, Double)].collect().toSet
    assert(got == want)
  }

  test("property: robots evaluation matches an independent structural model") {
    import spark.implicits._
    // generate STRUCTURED rule sets, render them to robots.txt text for
    // the engine, and evaluate the model from the structure — so the
    // parity covers the parser and the matcher together while sharing
    // no code with either
    case class R(t: String, p: String)
    case class G(uas: Seq[String], rules: Seq[R])
    val pathPool = Seq("/a", "/a/b", "/ab", "/b", "/b/c", "/c")
    val genRule = for {
      t <- Gen.oneOf("allow", "disallow")
      p <- Gen.oneOf(pathPool)
    } yield R(t, p)
    val genGroup = for {
      uas <- Gen.atLeastOne(Seq("graftbot", "*", "otherbot"))
      n <- Gen.chooseNum(1, 3)
      rules <- Gen.listOfN(n, genRule)
    } yield G(uas.toSeq, rules)
    val genContent = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genGroup))
    val hosts = Seq("h0.com", "h1.com", "h2.com", "h3.com")
    val robotsStruct = hosts.zip(samples(genContent, hosts.size, seed = 9400L))
    def cap(t: String) = if (t == "allow") "Allow" else "Disallow"
    val robotsDf = robotsStruct.map { case (h, gs) =>
      (h, gs.map(g => (g.uas.map("User-agent: " + _) ++
          g.rules.map(r => s"${cap(r.t)}: ${r.p}")).mkString("\n"))
        .mkString("\n\n"))
    }.toDF("host", "content")
    val genUrl = for {
      h <- Gen.oneOf(hosts :+ "h9.com") // one host with no robots.txt
      p <- Gen.oneOf(pathPool)
      s <- Gen.oneOf("", "/x", "y")
    } yield s"https://$h$p$s"
    val urls = samples(genUrl, 200, seed = 9401L).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }
    val byHost = robotsStruct.toMap
    def model(u: String): Boolean = {
      val rest = u.stripPrefix("https://")
      val host = rest.takeWhile(_ != '/')
      val path = rest.drop(host.length)
      val flat = byHost.getOrElse(host, Seq.empty)
        .flatMap(g => g.uas.flatMap(ua => g.rules.map(ua -> _)))
      val specific = flat.collect { case ("graftbot", r) => r }
      val mine = if (specific.nonEmpty) specific
                 else flat.collect { case ("*", r) => r }
      val matching = mine.filter(r => path.startsWith(r.p))
      matching.isEmpty || matching.maxBy(r =>
        (r.p.length, if (r.t == "allow") 1 else 0, r.p, r.t)).t == "allow"
    }
    val want = urls.map { case (id, u) => id -> model(u) }.toMap
    val rules = graft.operators.Html.robotsRules(robotsDf, "host", "content")
    val got = graft.operators.Html.robotsFilter(urls.toDF("url_id", "url"),
        "url_id", "url", rules, "graftbot")
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(got == want)
  }

  test("property: urlNormalize is idempotent and canonical on random urls") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val genUrl: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS", "ftp")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("a.com", "b.example.org", "X.Y.net")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.choose(0, 3)
      path <- Gen.listOfN(segs, Gen.oneOf("p", "Q", "r2")).map(s =>
        if (s.isEmpty) "" else s.mkString("/", "/", ""))
      slash <- Gen.oneOf("", "/")
      qs <- Gen.oneOf("", "?id=3", "?utm_source=x", "?b=2&a=1&utm_c=9", "?ref=r&z=")
      frag <- Gen.oneOf("", "#top")
    } yield s"$scheme://$www$host$path$slash$qs$frag"
    val urls = samples(genUrl, 300, seed = 77L).distinct
    val once = urls.toDF("u")
      .select(graft.operators.Html.urlNormalize(col("u")).as("n"))
      .as[String].collect().toSeq
    val twice = once.toDF("u")
      .select(graft.operators.Html.urlNormalize(col("u")).as("n"))
      .as[String].collect().toSeq
    assert(once == twice, "normalization must be idempotent")
    once.foreach { n =>
      assert(!n.contains("#"), s"fragment survived: $n")
      assert(!n.contains("utm_") && !n.contains("ref="), s"tracking param survived: $n")
      val host = n.replaceAll("^[a-z+.0-9-]+://", "").takeWhile(c => c != '/' && c != '?')
      assert(host == host.toLowerCase && !host.startsWith("www."), s"host not canonical: $n")
      assert(!(n.startsWith("http://") && host.endsWith(":80")), s"http default port survived: $n")
      assert(!(n.startsWith("https://") && host.endsWith(":443")), s"https default port survived: $n")
    }
  }

  test("mojibake kernel: round-trip + count + parity with chained replaces, 400 random strings") {
    // alphabet: ASCII + every char the 16-entry repair table can emit
    val mapped = graft.functions.GraftText.MojibakeRepairs.map(_._2.charAt(0))
    val genStr = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, Gen.frequency(
        4 -> Gen.choose(' ', '~'),
        1 -> Gen.oneOf(mapped)))
    } yield cs.mkString
    // the REAL corruption, independent of the repair table
    def mangle(s: String) = new String(s.getBytes("UTF-8"), "windows-1252")
    // independent model: plain chained String.replace over the table
    def modelRepair(s: String) =
      graft.functions.GraftText.MojibakeRepairs.foldLeft(s) {
        case (acc, (bad, good)) => acc.replace(bad, good)
      }
    samples(genStr, 400, seed = 91L).foreach { s =>
      val m = mangle(s)
      val row = graft.functions.GraftText.mojibakeFix(UTF8String.fromString(m))
      val repaired = row.getUTF8String(0).toString
      val nArtifacts = row.getLong(1)
      assert(repaired == s, s"round-trip failed for '$s' (mangled '$m')")
      assert(nArtifacts == s.count(_ > 127).toLong, s"count for '$s'")
      assert(repaired == modelRepair(m), s"kernel vs chained model for '$m'")
    }
  }

  test("mojibake kernel == chained model on DIRTY text with dangling artifact fragments") {
    // The mangle-based property above can never emit a dangling 'â€'
    // (truncated artifact) — but real crawl text does, and a dangling
    // prefix followed by a replacement char can re-form a repair key.
    // Generate strings dense in RAW artifact fragments (key chars and
    // replacement chars alike, un-mangled) and pin kernel == chained:
    // this is the exact contract the DuckDB oracle exercises, and the
    // one the pre-round-12 table order broke on 'â€'+'â€œ'.
    val frags = (graft.functions.GraftText.MojibakeRepairs.flatMap(_._1.toSeq) ++
      graft.functions.GraftText.MojibakeRepairs.map(_._2.charAt(0))).distinct
    val genStr = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, Gen.frequency(
        1 -> Gen.oneOf(Seq(' ', 'a', 'x')),
        4 -> Gen.oneOf(frags)))
    } yield cs.mkString
    def modelRepair(s: String) =
      graft.functions.GraftText.MojibakeRepairs.foldLeft(s) {
        case (acc, (bad, good)) => acc.replace(bad, good)
      }
    samples(genStr, 1000, seed = 92L).foreach { s =>
      val row = graft.functions.GraftText.mojibakeFix(UTF8String.fromString(s))
      assert(row.getUTF8String(0).toString == modelRepair(s),
        s"kernel vs chained diverged on dirty '$s'")
    }
  }
}
