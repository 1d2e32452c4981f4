package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.MapReduceOps
import graft.sources.Tables

/** Word-count throughput on a replicated corpus — the apples-to-apples
  * comparison with the reference's benchmark (cooler-MapReduce
  * `benchmark_results/plots/results_table.md`: ~1.4–2.2 MB/s word count
  * on 4 single-CPU workers at 9.6 MB input).
  *
  * Run: sbt "runMain graft.tools.ThroughputBench [multiplier]"
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(64)
    val spark = graft.GraftSession.getOrCreate()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val corpusPath = "target/throughput_corpus"
    docs.select(explode(sequence(lit(1), lit(mult))).as("copy"), col("text"))
      .select(col("text"))
      .repartition(32) // parallel file layout — otherwise a <128 MB corpus scans as ONE task
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val bytes = corpus.agg(sum(length(col("text")))).collect()(0).getLong(0)
    // warm-up (JIT + codegen), then timed run
    MapReduceOps.wordCount(corpus, "text").write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    MapReduceOps.wordCount(corpus, "text").write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = bytes / 1e6
    println(f"""{"metric":"wordcount_throughput","input_mb":$mb%.1f,"sec":$sec%.2f,"mb_per_sec":${mb / sec}%.1f}""")

    // minhash signature scan rate (the 100 TB dedup hot path):
    // tokenize → shingle → md5 → 16 min-aggregates over the corpus.
    // (The full LSH pair stage is excluded on purpose: a mult-times
    // replicated corpus has quadratic candidate pairs by construction.)
    val docsId = corpus.withColumn("doc_id", monotonically_increasing_id())
    graft.operators.Dedup.minhashSignatures(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val t1 = System.nanoTime()
    graft.operators.Dedup.minhashSignatures(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val sec2 = (System.nanoTime() - t1) / 1e9
    println(f"""{"metric":"minhash_sig_throughput","input_mb":$mb%.1f,"sec":$sec2%.2f,"mb_per_sec":${mb / sec2}%.1f}""")

    // End-to-end corpus dedup on the replicated corpus — the flood
    // case: every document has mult-1 exact copies, which would give a
    // bucketed LSH quadratic candidate pairs; corpusDedup's
    // exact-dedup-first composition collapses the copies in one
    // fingerprint shuffle, so the LSH stage only ever sees the unique
    // docs. Throughput here is the full pipeline rate a curation run
    // would see on duplicate-heavy crawl data.
    graft.operators.Dedup.corpusDedup(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val t15 = System.nanoTime()
    graft.operators.Dedup.corpusDedup(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val sec15 = (System.nanoTime() - t15) / 1e9
    println(f"""{"metric":"corpus_dedup_throughput","input_mb":$mb%.1f,"sec":$sec15%.2f,"mb_per_sec":${mb / sec15}%.1f}""")

    // CDC chunk-table build rate (the native kernel: tokenize → chunk →
    // per-chunk md5, all in the scan — the zero-token-shuffle path that
    // replaced the posexplode+window formulation).
    graft.operators.Dedup.cdcChunkTable(docsId, "doc_id", "text", 16)
      .write.format("noop").mode("overwrite").save()
    val t16 = System.nanoTime()
    graft.operators.Dedup.cdcChunkTable(docsId, "doc_id", "text", 16)
      .write.format("noop").mode("overwrite").save()
    val sec16 = (System.nanoTime() - t16) / 1e9
    println(f"""{"metric":"cdc_chunk_throughput","input_mb":$mb%.1f,"sec":$sec16%.2f,"mb_per_sec":${mb / sec16}%.1f}""")

    // A/B: the same signature pipeline built from the interpreted HOF
    // tokenize/shingle forms it replaced (graft_tokens/graft_shingles
    // vs filter(transform(split(...)))+transform/slice lambdas)
    import graft.functions.TextFunctions
    def hofSigs() = {
      val ex = docsId
        .select(col("doc_id"), TextFunctions.tokensHof(col("text")).as("toks"))
        .select(col("doc_id"), explode(TextFunctions.shinglesHof(col("toks"), 3)).as("s"))
      val hashed = ex.select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("s")), 17, 12), 16, 10).cast("long").as("h2"))
      val minCols = (0 until 16).map(i => min(col("h1") + col("h2") * i).as(s"m$i"))
      hashed.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    }
    hofSigs().write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    hofSigs().write.format("noop").mode("overwrite").save()
    val sec3 = (System.nanoTime() - t2) / 1e9
    println(f"""{"metric":"minhash_sig_hof_throughput","input_mb":$mb%.1f,"sec":$sec3%.2f,"mb_per_sec":${mb / sec3}%.1f}""")

    // Quality-score scan rate A/B — the other full-corpus text scan
    // (consumed by text_quality, corpus_dedup_best, curation_pipeline,
    // diverse_quality_sample): the fused native kernel
    // (QualityStatsExpr, one flat loop per row) vs the interpreted
    // aggregate/filter HOF pipeline it replaced.
    import graft.operators.TextAnalysis
    TextAnalysis.quality(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val tq = System.nanoTime()
    TextAnalysis.quality(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val secQ = (System.nanoTime() - tq) / 1e9
    println(f"""{"metric":"quality_score_throughput","input_mb":$mb%.1f,"sec":$secQ%.2f,"mb_per_sec":${mb / secQ}%.1f}""")
    TextAnalysis.qualityHof(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val tqh = System.nanoTime()
    TextAnalysis.qualityHof(docsId, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val secQh = (System.nanoTime() - tqh) / 1e9
    println(f"""{"metric":"quality_score_hof_throughput","input_mb":$mb%.1f,"sec":$secQh%.2f,"mb_per_sec":${mb / secQh}%.1f}""")

    // Winnowing fingerprint scan rate A/B — the native WinnowFpsExpr
    // kernel (hash + window-min + dedup in one pass) vs the
    // explode → doc-keyed sort → sliding-frame window formulation it
    // replaced (which pays a corpus-wide exchange for a per-doc-local
    // computation).
    import org.apache.spark.sql.expressions.Window
    def winnowKernel() = docsId.select(col("doc_id"),
      explode(TextFunctions.winnowFps(
        TextFunctions.tokens(col("text")), 4, 5)).as("h"))
    def winnowWindow() = {
      val grams = docsId
        .select(col("doc_id"),
          TextFunctions.shingles(TextFunctions.tokens(col("text")), 4).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("glen"),
          posexplode(col("sh")).as(Seq("p0", "s")))
        .select(col("doc_id"), col("glen"), (col("p0") + 1).as("pos"),
          conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("h"))
      val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, 4)
      grams.withColumn("m", min(struct(col("h"), (-col("pos")).as("np"))).over(frame))
        .filter(col("pos") <= col("glen") - 4)
        .select(col("doc_id"), col("m").getField("h").as("h"))
        .distinct()
    }
    winnowKernel().write.format("noop").mode("overwrite").save()
    val tw = System.nanoTime()
    winnowKernel().write.format("noop").mode("overwrite").save()
    val secW = (System.nanoTime() - tw) / 1e9
    println(f"""{"metric":"winnow_kernel_throughput","input_mb":$mb%.1f,"sec":$secW%.2f,"mb_per_sec":${mb / secW}%.1f}""")
    winnowWindow().write.format("noop").mode("overwrite").save()
    val twf = System.nanoTime()
    winnowWindow().write.format("noop").mode("overwrite").save()
    val secWf = (System.nanoTime() - twf) / 1e9
    println(f"""{"metric":"winnow_window_throughput","input_mb":$mb%.1f,"sec":$secWf%.2f,"mb_per_sec":${mb / secWf}%.1f}""")

    // Combiner on/off A/B — the reference's third benchmark axis
    // (cooler-MapReduce benchmark.py: word count with/without
    // combine_fn). "On" is the normal groupBy().agg() (partial
    // aggregation = the combiner, free); "off" is groupByKey.mapGroups,
    // which has no map-side combine: every token row rides the shuffle
    // to its key's reducer and is counted there.
    import spark.implicits._
    def tokensDs = corpus.select(
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .as[String]
    tokensDs.groupByKey(identity).mapGroups((w, it) => (w, it.size))
      .write.format("noop").mode("overwrite").save()
    val t3 = System.nanoTime()
    tokensDs.groupByKey(identity).mapGroups((w, it) => (w, it.size))
      .write.format("noop").mode("overwrite").save()
    val sec4 = (System.nanoTime() - t3) / 1e9
    println(f"""{"metric":"wordcount_no_combiner","input_mb":$mb%.1f,"sec":$sec4%.2f,"mb_per_sec":${mb / sec4}%.1f}""")

    // Reduce-scaling sweep — the reference's fourth benchmark axis
    // (cooler-MapReduce benchmark.py reduce_scaling_{1,2,4,8}): the same
    // word count with the reduce side pinned to R partitions, AQE's
    // partition coalescing disabled so R is what actually runs. Two
    // curves: with the combiner (partial agg) the reduce side carries
    // one row per distinct word and R is nearly irrelevant — the
    // declarative plan has already deleted the reduce-scaling problem.
    // Without the combiner every token crosses the wire and R behaves
    // like the reference's knob: R=1 serializes the count, R≈cores
    // saturates.
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      Seq(1, 2, 4, 8, 16, 32).foreach { r =>
        spark.conf.set("spark.sql.shuffle.partitions", r.toString)
        val t = System.nanoTime()
        MapReduceOps.wordCount(corpus, "text").write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t) / 1e9
        val tn = System.nanoTime()
        tokensDs.groupByKey(identity).mapGroups((w, it) => (w, it.size))
          .write.format("noop").mode("overwrite").save()
        val sn = (System.nanoTime() - tn) / 1e9
        println(f"""{"metric":"wordcount_reduce_scaling","reduce_partitions":$r,"input_mb":$mb%.1f,"combiner_sec":$s%.2f,"no_combiner_sec":$sn%.2f}""")
      }
    } finally {
      // a mid-sweep failure must not leave the session pinned at the
      // last swept R with AQE coalescing off
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
    spark.stop()
  }
}
