package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scoring

/** Hand-computed fixtures + semantic invariants for the model-based
  * scoring family (bigram-LM perplexity, DSIR importance weights,
  * Naive-Bayes classifier). The bit-exact value check against DuckDB
  * is the driver's oracle; these specs pin the MATH on inputs small
  * enough to verify by hand, and the behavioral contracts (repetition
  * scores low, target-like docs weigh high, the classifier separates
  * its training classes) on planted corpora.
  */
class ScoringSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- bigram LM perplexity ----------------------------------------

  test("ngramLmPerplexity: hand-computed cross-entropy on a 2-doc corpus") {
    // d1 = "x x x": bigram (x x) twice.  d2 = "x y": bigram (x y) once.
    // model: c(x x)=2, c(x y)=1, prefix c(x·)=3.
    // CE(d1) = (2·ln(3/2))/2 = ln 1.5 ≈ 0.405465
    // CE(d2) = ln(3/1)       ≈ 1.098612
    val docs = Seq((1L, "x x x"), (2L, "x y")).toDF("doc_id", "text")
    val got = Scoring.ngramLmPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    val d1 = got(0); val d2 = got(1)
    assert(d1.getAs[Long]("n_bigrams") == 2)
    assert(d2.getAs[Long]("n_bigrams") == 1)
    assert(math.abs(d1.getAs[Double]("cross_entropy") - 0.405465) < 1e-6)
    assert(math.abs(d2.getAs[Double]("cross_entropy") - 1.098612) < 1e-6)
    // terciles over 2 docs: positions 1, 2 → head, middle
    assert(d1.getAs[String]("bucket") == "head")
    assert(d2.getAs[String]("bucket") == "middle")
  }

  test("ngramLmPerplexity: predictable docs score below novel docs") {
    // predictable docs reuse the corpus's dominant continuation of
    // "the"; novel docs each continue "the" with a unique word — the
    // LM assigns them 1/c("the"·) and their cross-entropy must sit
    // strictly above every predictable doc's
    val rep = (1L to 20L).map(i => (i, "the cat the cat the cat"))
    val novel = (21L to 40L).map(i => (i, s"the w$i the v$i"))
    val docs = (rep ++ novel).toDF("doc_id", "text")
    val out = Scoring.ngramLmPerplexity(docs, "doc_id", "text").collect()
    val ce = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert((1L to 20L).map(ce).max < (21L to 40L).map(ce).min)
    // tercile sizes over 40 scored docs: 14/13/13 (head gets the
    // boundary rows: (pos-1)*3 < 40 holds through pos 14)
    val buckets = out.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(buckets == Map("head" -> 14, "middle" -> 13, "tail" -> 13))
  }

  test("ngramLmPerplexity: hashGrams scale knob is bit-identical on a collision-free corpus") {
    val docs = sources.Tables.documents(spark, sf)
    val str = Scoring.ngramLmPerplexity(docs, "doc_id", "text")
    val hashed = Scoring.ngramLmPerplexity(docs, "doc_id", "text",
      hashGrams = true)
    assert(str.exceptAll(hashed).isEmpty && hashed.exceptAll(str).isEmpty)
  }

  test("ngramLmPerplexity: single-token and empty docs are excluded") {
    val docs = Seq((1L, "a b c"), (2L, "lonely"), (3L, "")).toDF("doc_id", "text")
    val ids = Scoring.ngramLmPerplexity(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  // ---- DSIR importance weights -------------------------------------

  test("dsirWeights: target-like docs outweigh off-target docs; m = target size") {
    val target = (1L to 10L).map(i => (i, "wiki science article text", true))
    val likeTgt = (11L to 15L).map(i => (i, "wiki science article text", false))
    val offTgt = (16L to 25L).map(i => (i, "casino pills viagra spam", false))
    val docs = (target ++ likeTgt ++ offTgt).toDF("doc_id", "text", "is_tgt")
    val out = Scoring.dsirWeights(docs, "doc_id", "text", col("is_tgt"))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    val w = out.map(r => r._1 -> r._2).toMap
    val keep = out.filter(_._3).map(_._1).toSet
    // target-vocabulary docs weigh strictly above off-target docs
    val minLike = (1L to 15L).map(w).min
    val maxOff = (16L to 25L).map(w).max
    assert(minLike > maxOff, s"minLike=$minLike maxOff=$maxOff")
    // keep-count = target-subset size, filled by the highest weights
    assert(keep.size == 10)
    assert(keep.forall(id => w(id) >= minLike || (1L to 15L).contains(id)))
  }

  // ---- Naive-Bayes classifier --------------------------------------

  test("nbQualityClassifier: separates its training classes; prior cancels at 50/50") {
    val pos = (1L to 10L).map(i => (i, "good clean prose writing here"))
    val neg = (11L to 20L).map(i => (i, "junk spam garbage noise filler"))
    val docs = (pos ++ neg).toDF("doc_id", "text")
    val out = Scoring.nbQualityClassifier(docs, "doc_id", "text",
        col("doc_id") <= 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    val byId = out.map(r => r._1 -> r._2).toMap
    assert((1L to 10L).forall(byId(_) > 0), "positive docs must score > 0")
    assert((11L to 20L).forall(byId(_) < 0), "negative docs must score < 0")
    assert(out.forall { case (id, odds, pred) => pred == (odds > 0) })
    // symmetric classes → symmetric scores (prior term is ln(1)=0)
    assert(math.abs(byId(1L) + byId(11L)) < 1e-9)
  }

  test("nbQualityClassifier: prior shifts scores when classes are imbalanced") {
    // shared vocabulary, 3:1 positive prior → neutral docs lean positive
    val pos = (1L to 9L).map(i => (i, "common words shared by all"))
    val neg = Seq((10L, "common words shared by all"))
    val docs = (pos ++ neg).toDF("doc_id", "text")
    val out = Scoring.nbQualityClassifier(docs, "doc_id", "text",
        col("doc_id") <= 9)
      .collect()
    // identical text ⇒ identical token terms; prior ln(9/1) > 0 decides
    assert(out.forall(_.getBoolean(3)), "prior must push neutral docs positive")
  }

  // ---- token entropy -----------------------------------------------

  test("tokenEntropy: hand-computed values; empty and single-token docs score zero") {
    val docs = Seq(
      (1L, "a a b b"),   // uniform over 2 → ln 2
      (2L, "a b c d"),   // uniform over 4 → ln 4
      (3L, "a a a"),     // single type → 0
      (4L, "")           // empty → zero row kept
    ).toDF("doc_id", "text")
    val out = Scoring.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size == 4, "every doc keeps a row, including the empty one")
    // through the decimal-term path: round(ln 2, 6) = 0.693147 exactly
    assert(out(1L) == ((4L, 0.693147)), out(1L).toString)
    assert(out(2L) == ((4L, 1.386294)), out(2L).toString)
    assert(out(3L) == ((3L, 0.0)))
    assert(out(4L) == ((0L, 0.0)))
    // ordering signal: repetitive text scores strictly below varied text
    assert(out(3L)._2 < out(1L)._2 && out(1L)._2 < out(2L)._2)
  }

  // ---- source divergence -------------------------------------------

  test("sourceDivergence: identical sources score zero, disjoint sources score ln 2") {
    // two sources with the SAME token distribution → each equals the
    // corpus blend → KL exactly 0 (every ln ratio is ln 1 = 0)
    val same = Seq((1L, "a a b", "s1"), (2L, "a a b", "s2"))
      .toDF("doc_id", "text", "source")
    val kl0 = Scoring.sourceDivergence(same, "text", "source")
      .select("source", "kl_nats").as[(String, Double)].collect().toMap
    assert(kl0 == Map("s1" -> 0.0, "s2" -> 0.0), kl0.toString)
    // fully disjoint equal-mass sources: p_s(t) = 1, p_c(t) = 1/2 →
    // KL = ln 2, through the decimal-term path: round(ln 2, 6) = 0.693147
    val disj = Seq((1L, "a a a a", "s1"), (2L, "b b b b", "s2"))
      .toDF("doc_id", "text", "source")
    val kl2 = Scoring.sourceDivergence(disj, "text", "source")
      .select("source", "kl_nats").as[(String, Double)].collect().toMap
    assert(kl2 == Map("s1" -> 0.693147, "s2" -> 0.693147), kl2.toString)
    // n_tokens / n_types bookkeeping
    val row = Scoring.sourceDivergence(disj, "text", "source")
      .filter(col("source") === "s1").collect()(0)
    assert(row.getAs[Long]("n_tokens") == 4L && row.getAs[Long]("n_types") == 1L)
  }

  // ---- persisted model + streaming admission -----------------------

  test("nbScoreIndexed against a persisted model equals the direct classifier") {
    val docs = sources.Tables.documents(spark, sf)
    val path = "target/test_nb_model"
    Scoring.buildNbModel(docs, "doc_id", "text", col("lang") === "en", path)
    val direct = Scoring.nbQualityClassifier(docs, "doc_id", "text",
      col("lang") === "en")
    val probed = Scoring.nbScoreIndexed(docs, "doc_id", "text", path)
    assert(direct.exceptAll(probed).isEmpty && probed.exceptAll(direct).isEmpty)
  }

  test("nbScoreIndexed: OOV tokens score neutral, all-OOV docs survive with prior-only odds") {
    // score-the-lake contract: the model never saw "zzz" — those
    // tokens contribute zero evidence but still count in n_tokens,
    // and a fully-OOV doc is KEPT (log_odds = prior), matching the
    // streaming gate instead of silently vanishing from the report
    val train = Seq((10L, "good good signal", true),
        (11L, "bad bad noise", false))
      .toDF("doc_id", "text", "is_pos")
    val path = "target/test_nb_model_oov"
    Scoring.buildNbModel(train, "doc_id", "text", col("is_pos"), path)
    val lake = Seq((1L, "good zzz"), (2L, "zzz zzz zzz"))
      .toDF("doc_id", "text")
    val out = Scoring.nbScoreIndexed(lake, "doc_id", "text", path)
      .select("doc_id", "n_tokens", "log_odds")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 2, "all-OOV doc must not be dropped")
    assert(out(1L)._1 == 2L, "n_tokens counts OOV tokens too")
    assert(out(2L)._1 == 3L)
    // balanced classes → prior = ln(1/1) = 0; all-OOV doc scores it
    assert(out(2L)._2 == 0.0, "all-OOV doc scores the prior alone")
    assert(out(1L)._2 > 0.0, "in-vocab positive evidence still counts")
  }

  test("nbAdmission: stream replay equals the batch gate; scores match the model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = sources.Tables.documents(spark, sf)
    val path = "target/test_nb_model"
    Scoring.buildNbModel(docs, "doc_id", "text", col("lang") === "en", path)
    val batch = streaming.DocStreams.nbAdmission(docs, "doc_id", "text", path)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    ms.addData(rows.toIndexedSeq)
    val q = streaming.DocStreams.nbAdmission(
        ms.toDF.toDF("doc_id", "text"), "doc_id", "text", path)
      .writeStream.format("memory").queryName("nbadm").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("nbadm")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // full-vocab fixed-point scores ≈ the indexed decimal scores
    val idx = Scoring.nbScoreIndexed(docs, "doc_id", "text", path)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    val adm = batch.select("doc_id", "log_odds").as[(Long, Double)].collect()
    assert(adm.nonEmpty)
    adm.foreach { case (id, odds) =>
      assert(math.abs(odds - idx(id)) < 1e-6, s"doc $id: $odds vs ${idx(id)}")
    }
    // the gate admits exactly the docs the classifier scores ≥ 0
    // (modulo the two formulations' sub-1e-6 rounding split at the
    // boundary — no sf0.001 doc sits that close to zero)
    val disagree = adm.map(_._1).toSet.diff(idx.filter(_._2 >= 0).keySet) ++
      idx.filter(_._2 >= 0).keySet.diff(adm.map(_._1).toSet)
    assert(disagree.forall(id => math.abs(idx(id)) < 1e-5), s"$disagree")
  }

  test("nbAdmission: vocabulary cap prunes weak terms, keeps the gate running") {
    val docs = Seq((1L, "strongpos filler"), (2L, "filler filler"))
      .toDF("doc_id", "text")
    val train = Seq((10L, "strongpos strongpos strongpos", true),
        (11L, "filler filler weakneg", false))
      .toDF("doc_id", "text", "is_pos")
    val path = "target/test_nb_model_capped"
    Scoring.buildNbModel(train, "doc_id", "text", col("is_pos"), path)
    // topK = 1 keeps only the strongest |term| — docs without it score
    // prior-only
    val out = streaming.DocStreams.nbAdmission(docs, "doc_id", "text", path,
        topK = 1, minOdds = -1e9)
      .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    assert(out.size == 2)
    assert(out(1L) != out(2L), "capped model must still separate")
    assert(out(2L) == 0.0, "doc of pruned-only tokens scores the 50/50 prior")
  }

  test("lmAdmission: stream replay equals batch; full-vocab CE matches the batch scorer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = sources.Tables.documents(spark, sf)
    val path = "target/test_lm_model"
    Scoring.buildLmModel(docs, "doc_id", "text", path)
    val batch = streaming.DocStreams.lmAdmission(docs, "doc_id", "text", path,
      maxCe = 1e9)
    val direct = Scoring.ngramLmPerplexity(docs, "doc_id", "text")
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    val scored = batch.select("doc_id", "cross_entropy")
      .as[(Long, Double)].collect()
    assert(scored.length == direct.size)
    scored.foreach { case (id, ce) =>
      assert(math.abs(ce - direct(id)) < 1e-6, s"doc $id: $ce vs ${direct(id)}")
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs.select("doc_id", "text").as[(Long, String)].collect().toIndexedSeq)
    val q = streaming.DocStreams.lmAdmission(
        ms.toDF.toDF("doc_id", "text"), "doc_id", "text", path, maxCe = 1e9)
      .writeStream.format("memory").queryName("lmadm").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("lmadm")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("lmAdmission: OOV bigrams score the 1/N-floor penalty; the cap prunes to OOV") {
    // train: "a b"×3, "b a"×2, "c d"×2, "d c"×1 → N = 8
    val train = Seq((1L, "a b a b a b"), (2L, "c d c d")).toDF("doc_id", "text")
    val path = "target/test_lm_model_oov"
    Scoring.buildLmModel(train, "doc_id", "text", path)
    val probe = Seq((10L, "x y"), (11L, "a b"), (12L, "c d"))
      .toDF("doc_id", "text")
    val full = streaming.DocStreams.lmAdmission(probe, "doc_id", "text", path,
        maxCe = 1e9)
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    // unseen bigram → penalty ln(8); "a b" is its prefix's only gram → 0
    assert(math.abs(full(10L) - 2.079442) < 1e-6)
    assert(full(11L) == 0.0)
    // topK = 1 keeps only "a b" (count 3): "c d" becomes OOV
    val capped = streaming.DocStreams.lmAdmission(probe, "doc_id", "text", path,
        topK = 1, maxCe = 1e9)
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(capped(11L) == 0.0)
    assert(math.abs(capped(12L) - 2.079442) < 1e-6)
    // the gate itself: maxCe = 1.0 admits only the predictable docs
    val gated = streaming.DocStreams.lmAdmission(probe, "doc_id", "text", path,
        maxCe = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == Set(11L, 12L))
  }

  // ---- Stupid Backoff trigram scoring ------------------------------

  test("ngramLmBackoff: hand-computed backoff chain on a tiny split") {
    // train (id 0): "a b c a b d" → uni a:2 b:2 c:1 d:1 (N=6),
    // bi "a b":2 "b c":1 "c a":1 "b d":1, tri each ×1
    val docs = Seq(
      (0L, "a b c a b d"), // train; all-trigram scoring
      (1L, "a b c x"),     // tri hit + OOV (x unseen everywhere)
      (2L, "x a b q"),     // bi hit ("a b" seen, "x a b" tri unseen) + OOV
      (3L, "x y c z")      // uni hit (c seen) + OOV
    ).toDF("doc_id", "text")
    val out = Scoring.ngramLmBackoff(docs, "doc_id", "text",
        col("doc_id") === 0)
      .collect().map(r => r.getLong(0) -> r).toMap

    // train doc: levels all tri; mean = (ln½ + 0 + 0 + ln½)/4
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_tri") == 4 && d0.getAs[Long]("n_oov") == 0)
    assert(math.abs(d0.getAs[Double]("mean_logscore") - (-0.346574)) < 1e-6)

    // "a b c" tri: ln(1/2); "b c x" OOV: ln(0.4·0.4·(1/6))
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tri") == 1 && d1.getAs[Long]("n_oov") == 1)
    assert(math.abs(d1.getAs[Double]("mean_logscore")
      - (-0.693147 - 3.624341) / 2) < 1e-6)

    // "x a b" bi: ln(0.4·(c2("a b")/c1(a))) = ln(0.4); "a b q" OOV
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_bi") == 1 && d2.getAs[Long]("n_oov") == 1)
    assert(math.abs(d2.getAs[Double]("mean_logscore")
      - (-0.916291 - 3.624341) / 2) < 1e-6)

    // "x y c" uni on c; "y c z" OOV
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_uni") == 1 && d3.getAs[Long]("n_oov") == 1)
  }

  test("ngramLmBackoff: training docs never back off; short docs excluded") {
    val docs = sources.Tables.documents(spark, sf)
    val out = Scoring.ngramLmBackoff(docs, "doc_id", "text",
      col("doc_id") % 2 === 0)
    // every trigram of an even (training) doc is in the model
    val trainRows = out.filter(col("doc_id") % 2 === 0)
      .agg(sum("n_bi"), sum("n_uni"), sum("n_oov")).collect()(0)
    assert(trainRows.getLong(0) == 0 && trainRows.getLong(1) == 0 &&
      trainRows.getLong(2) == 0)
    // held-out docs actually exercise the backoff somewhere
    val heldBackoff = out.filter(col("doc_id") % 2 === 1)
      .agg(sum(col("n_bi") + col("n_uni") + col("n_oov"))).collect()(0).getLong(0)
    assert(heldBackoff >= 0) // present and well-typed; value is corpus-dependent
  }

  // ---- token spectrum ----------------------------------------------

  test("tokenSpectrum: hand-computed frequency-of-frequencies") {
    // corpus: a×4, b×2, c×2, d×1, e×1, f×1
    val docs = Seq((1L, "a a b c d"), (2L, "a a b c e f")).toDF("doc_id", "text")
    val got = operators.TextAnalysis.tokenSpectrum(docs, "text")
      .orderBy(col("freq").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (4L, 1L, 4L, 1L, 4L),   // a
      (2L, 2L, 4L, 3L, 8L),   // b, c
      (1L, 3L, 3L, 6L, 11L))) // d, e, f
    // total mass = corpus token count, total types = vocabulary
    assert(got.last._4 == 6L && got.last._5 == 11L)
  }

  // ---- degenerate inputs -------------------------------------------

  test("scoring family degrades cleanly on empty and degenerate corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Scoring.ngramLmPerplexity(empty, "doc_id", "text").count() == 0)
    assert(Scoring.dsirWeights(empty, "doc_id", "text",
      col("doc_id") < 0).count() == 0)
    assert(Scoring.nbQualityClassifier(empty, "doc_id", "text",
      col("doc_id") < 0).count() == 0)
    assert(operators.TextAnalysis.tokenSpectrum(empty, "text").count() == 0)

    // DSIR with ZERO target docs: weights still defined (smoothing
    // keeps every ratio finite), keep-set empty (m = 0)
    val docs = Seq((1L, "some words here"), (2L, "other words there"))
      .toDF("doc_id", "text")
    val noTgt = Scoring.dsirWeights(docs, "doc_id", "text", col("doc_id") < 0)
      .collect()
    assert(noTgt.length == 2 && noTgt.forall(!_.getBoolean(3)))
    assert(noTgt.forall(r => !r.isNullAt(2)))

    // NB with a single class: the prior's ln(dp/0) is undefined → the
    // scores come back null rather than crashing (a one-class
    // classifier is meaningless; admit-unknown, don't invent)
    val oneClass = Scoring.nbQualityClassifier(docs, "doc_id", "text",
      lit(true)).collect()
    assert(oneClass.length == 2 && oneClass.forall(_.isNullAt(2)))
  }

  // ---- plan-shape audits -------------------------------------------

  test("bpe pairFreqs top-k plans as TakeOrdered, not a global sort shuffle") {
    val docs = sources.Tables.documents(spark, sf)
    val plan = operators.Bpe.pairFreqs(docs, "text", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for orderBy+limit:\n$plan")
  }

  test("scoring plans: no cartesian products beyond one-row scalar attaches") {
    val docs = sources.Tables.documents(spark, sf)
    for ((name, df) <- Seq(
      "lm" -> Scoring.ngramLmPerplexity(docs, "doc_id", "text"),
      "dsir" -> Scoring.dsirWeights(docs, "doc_id", "text", col("lang") === "en"),
      "nb" -> Scoring.nbQualityClassifier(docs, "doc_id", "text",
        col("lang") === "en"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name: data-sized cartesian in plan:\n$plan")
    }
  }
}
