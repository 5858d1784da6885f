package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Provenance, TextFunctions => TF}

/** Text-analysis + deduplication queries over `documents` — the
  * training-data-pipeline extensions (BASELINE.json north star), each with
  * a DuckDB oracle. Tokenization is the shared whitespace split; hashes are
  * md5 so both engines compute identical signatures.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val STOPWORDS = Seq("the", "a", "of", "to", "and")

  /** marker-token sets for the language-ID heuristic (drawn from the corpus
    * vocabulary; the synthetic `lang` column is random noise, so the oracle
    * checks determinism of the heuristic, not label recovery)
    */
  val LANG_MARKERS: Map[String, Seq[String]] = Map(
    "de" -> Seq("customer", "hash", "row"),
    "en" -> Seq("the", "order", "group"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("join", "small", "column"))

  /** The deterministic sampling key/rates shared by txt_stratified_sample
    * and txt_training_mix (and their hand-matched DuckDB oracles) — one
    * definition so the cross-engine-sensitive hash can't drift between the
    * two queries.
    */
  private def sampleKey: org.apache.spark.sql.Column =
    TF.rollingHash(md5(col("doc_id").cast("string"))) % 1000
  private def sampleRate: org.apache.spark.sql.Column =
    when(col("source") === "src0", lit(500L))
      .when(col("source") === "src1", lit(250L))
      .otherwise(lit(100L))

  private[queries] val tokSql = """regexp_split_to_array(trim(text), '\s+')"""

  /** the shared blocklist for txt_blocklist (raw-substring semantics on
    * both engines; drawn from the synthetic corpus vocabulary so hits
    * actually occur)
    */
  val BLOCK_PHRASES: Seq[String] = Seq(
    "table scan", "slow query", "drop", "merge part", "filter chain")

  /** winnowing CTE chain (k=3 grams, w=4 windows) ending in f(doc_id, fps)
    * — the polynomial gram hash is txt_rollhash's fold, the window minima
    * mirror the Spark `least` fold, short docs keep their overall min
    */
  private val winnowCte =
    s"""t AS (SELECT doc_id, list_transform($tokSql,
       |    s -> CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
       |      list_transform(generate_series(1, len(s)), j -> CAST(ascii(substr(s, j, 1)) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT)) AS th FROM documents),
       |h AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(th)-2, 0)),
       |    i -> ((th[i] * 31 + th[i+1]) % 2147483647 * 31 + th[i+2]) % 2147483647) AS hs FROM t),
       |m AS (SELECT doc_id,
       |    CASE WHEN len(hs) > 0 AND len(hs) < 4 THEN [list_min(hs)]
       |         ELSE list_transform(generate_series(1, greatest(len(hs)-3, 0)),
       |                i -> least(hs[i], hs[i+1], hs[i+2], hs[i+3])) END AS mins
       |  FROM h),
       |f AS (SELECT doc_id, list_sort(list_distinct(mins)) AS fps FROM m)""".stripMargin
  private val shSql =
    s"""list_transform(generate_series(1, len($tokSql)-1),
       |      i -> $tokSql[i] || ' ' || $tokSql[i+1])""".stripMargin

  /** DSIR weight chain ending in w(doc_id, logw): hashed unigram+bigram
    * buckets (md5 leading 60 bits mod 256 — Dsir.bucketOf), add-one
    * smoothed target/raw distributions from one grouped pass, per-raw-doc
    * log-ratio sums rounded at 6 dp (libm noise ~1e-12 << grid)
    */
  private val dsirWeightsCte =
    s"""t0 AS (SELECT doc_id, (source = 'src0') AS tgt,
       |    list_concat($tokSql, $shSql) AS fs FROM documents),
       |fb AS (SELECT doc_id, tgt,
       |    ('0x' || substr(md5(unnest(fs)), 1, 15))::BIGINT % 256 AS bucket FROM t0),
       |bc AS (SELECT bucket,
       |    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc,
       |    SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS rc
       |  FROM fb GROUP BY bucket),
       |tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM bc),
       |lr AS (SELECT bucket,
       |    ln((tc + 1.0) / (tt + 256)) - ln((rc + 1.0) / (rt + 256)) AS lr
       |  FROM bc CROSS JOIN tot),
       |pd AS (SELECT doc_id, bucket, COUNT(*) AS c FROM fb
       |  WHERE NOT tgt GROUP BY doc_id, bucket),
       |w AS (SELECT doc_id, round(SUM(c * lr), 6) AS logw
       |  FROM pd JOIN lr USING (bucket) GROUP BY doc_id)""".stripMargin

  /** The deterministic multi-paragraph rendering shared by
    * `dedup_paragraphs` and `pipeline_clean_corpus_pd` (the corpus is
    * single-line, so paragraph structure is synthesized): 8-token
    * paragraphs, a hash-keyed corpus-wide boilerplate paragraph (ONE hot
    * hash — the web-footer case) and hash-keyed within-doc first-paragraph
    * repeats. One definition so the two queries' oracles can't drift.
    */
  private def renderedParas: org.apache.spark.sql.Column =
    TF.let(rawLines) { r =>
      concat_ws("\n", transform(r, (x, li) =>
        when((col("doc_id") * 17 + li) % 11 === 0,
          lit("the shared boilerplate paragraph"))
          .when((col("doc_id") * 13 + li) % 7 === 3, element_at(r, 1))
          .otherwise(x)))
    }

  /** Raw 8-token line view (no decorations) — THE one definition of the
    * synthesized line/paragraph unit. Base of [[renderedParas]] (CCNet
    * queries), the Gopher line rendering, and the C4 family
    * ([[renderedC4Lines]]; `dedup_c4_spans` hashes RAW lines — doc-keyed
    * decorations would make cross-doc span equality impossible by
    * construction). Every oracle replays this exact shape, so it must
    * only ever change everywhere at once.
    */
  private def rawLines: org.apache.spark.sql.Column =
    TF.let(TF.tokens(col("text"))) { tk =>
      // zero-token guard: Spark's sequence(0, -1) yields the DESCENDING
      // [0, -1] (two phantom lines) while DuckDB's generate_series(0, -1)
      // yields [] — an empty doc must render zero lines on both engines
      when(size(tk) > 0,
        transform(sequence(lit(0), ceil(size(tk) / lit(8.0)).cast("int") - 1),
          li => concat_ws(" ", slice(tk, li * 8 + 1, lit(8)))))
        .otherwise(array().cast("array<string>"))
    }

  /** The deterministic line rendering for the C4 cleaning rules (the
    * corpus is punctuation-free single-line text, so the content the
    * rules react to is synthesized hash-keyed, same device as the Gopher
    * line query): ~1/29 lines gain a "lorem ipsum " prefix, ~1/7 a
    * " javascript" suffix, ~1/23 a " {" suffix, and 2/3 a terminal "." —
    * every C4 rule fires on a value-diverse slice, never vacuously.
    */
  private def renderedC4Lines: org.apache.spark.sql.Column =
    TF.let(rawLines) { r =>
      transform(r, (x, li) => concat(
        when((col("doc_id") * 17 + li) % 29 === 7, lit("lorem ipsum "))
          .otherwise(lit("")),
        x,
        when((col("doc_id") * 11 + li) % 7 === 3, lit(" javascript"))
          .otherwise(lit("")),
        when((col("doc_id") * 13 + li) % 23 === 5, lit(" {"))
          .otherwise(lit("")),
        when((col("doc_id") * 7 + li) % 3 =!= 2, lit("."))
          .otherwise(lit(""))))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.charCount(col("text")).as("n_chars"),
        TF.nonSpaceCount(col("text")).as("n_nonspace"),
        TF.stopwordCount(col("text"), STOPWORDS).as("n_stop"),
        TF.punctCount(col("text")).as("n_punct"))
        .orderBy("doc_id")),

    "txt_langid" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TF.langId(col("text"), LANG_MARKERS).as("lang_guess"))
        .orderBy("doc_id")),

    "txt_bpe_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TF.bpeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")),

    // edit distance between consecutive documents' prefixes — standard
    // DP levenshtein in both engines, exact integer
    "txt_editdist" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), substring(col("text"), 1, 40).as("p"))
      d.join(d.select((col("doc_id") - 1).as("doc_id"), col("p").as("np")), Seq("doc_id"))
        .select(col("doc_id"), levenshtein(col("p"), col("np")).cast("long").as("ed"))
        .orderBy("doc_id")
    }),

    "txt_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Deterministic stratified sampling — the training-mix op: per-source
    // keep rates applied via a cross-engine hash (rolling hash of
    // md5(doc_id) mod 1000 < rate‰), so the sample is reproducible across
    // engines and runs, composable with any downstream filter, and scales
    // as a narrow codegen'd predicate (no shuffle, no RNG state). src0 is
    // upsampled at 500‰, src1 at 250‰, the long tail at 100‰.
    "txt_stratified_sample" -> ((s, dir) =>
      docs(s, dir)
        .filter(sampleKey < sampleRate)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),

    "txt_rollhash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TF.rollingHash(col("text")).as("rh"))
        .orderBy("doc_id")),

    // Aho-Corasick blocklist gate (the C4/RefinedWeb badwords step, done
    // scale-correctly): ONE automaton matches every phrase in one text
    // pass — O(text + hits) per doc regardless of list size, vs the
    // O(text x phrases) contains-loop that dies at 10k phrases. The
    // automaton broadcasts; matching is scan-local, zero exchange.
    "txt_blocklist" -> ((s, dir) =>
      graft.functions.Blocklist.annotate(docs(s, dir), "text", BLOCK_PHRASES)
        .select(col("doc_id"), col("n_hits"), col("hit_phrases"), col("blocked"))
        .orderBy("doc_id")),

    // deterministic shuffle-and-shard manifest (the step right before
    // tokenizer/training export): shard = md5-hash mod N — NO global
    // sort, just a hash exchange on shard — and the within-shard order
    // is the md5 key itself, digested per shard so the oracle pins the
    // exact emit order a writer would produce. 100 TB shape: one
    // hash-partitioned pass, per-shard local sort, manifest is the agg.
    "txt_shard_export" -> ((s, dir) => {
      val key = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":42"))), 1, 8), 16, 10).cast("long")
      docs(s, dir)
        .withColumn("k", key)
        .withColumn("shard", pmod(col("k"), lit(8)))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          md5(concat_ws(",", transform(
            array_sort(collect_list(struct(col("k"), col("doc_id")))),
            x => x.getField("doc_id")))).as("order_digest"))
        .orderBy("shard")
    }),

    // per-source unigram KL divergence against the corpus distribution —
    // the data-mixing diagnostic (how far each domain's vocabulary sits
    // from the blend it will be mixed into). Two map-side-combining
    // aggs + a broadcast-sized join of per-source rows onto corpus
    // token stats; shuffles carry (token, count) pairs, never text.
    "txt_domain_kl" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("source"), explode(TF.tokens(col("text"))).as("t"))
      val bySrc = toks.groupBy(col("source"), col("t")).agg(count(lit(1)).as("c_st"))
      val srcTot = bySrc.groupBy(col("source")).agg(sum(col("c_st")).as("tot_s"))
      val corpus = bySrc.groupBy(col("t")).agg(sum(col("c_st")).as("c_t"))
      val totAll = corpus.agg(sum(col("c_t")).as("tot")).select(col("tot"))
      bySrc.join(broadcast(srcTot), Seq("source"))
        .join(corpus, Seq("t"))
        .crossJoin(broadcast(totAll))
        .groupBy(col("source"))
        .agg(round(sum(
          (col("c_st") / col("tot_s")) *
            log((col("c_st") / col("tot_s")) / (col("c_t") / col("tot")))), 6)
          .as("kl"),
          max(col("tot_s")).as("n_tokens"))
        .select(col("source"), col("n_tokens"), col("kl"))
        .orderBy("source")
    }),

    // corpus bigram frequency table (the vocabulary/contamination analysis
    // staple): explode shingles -> one map-side-combining count -> frequent
    // set. Narrow explode + single agg — the 100 TB shape for n-gram stats.
    "txt_ngram_freq" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TF.shingles(col("text"), 2)).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 10)
        .orderBy(col("n").desc, col("ngram"))),

    // The flagship COMPOSITE: the full prepare-a-training-mix pipeline in
    // one declarative plan — quality gate -> exact-dedup keepers ->
    // deterministic per-source stratified sample -> per-source doc count +
    // BPE token budget. Every stage is one of the library ops above;
    // Catalyst fuses the narrow stages (gate + sample are one codegen'd
    // scan pass) and the only shuffles are the dedup aggregation, its
    // semi-join, and the final tiny rollup — the plan a 100 TB mix build
    // actually wants.
    "txt_training_mix" -> ((s, dir) => {
      val d    = docs(s, dir)
      val toks = TF.tokenCount(col("text"))
      val qualified = d.filter(toks >= 20 &&
        TF.stopwordCount(col("text"), STOPWORDS).cast("double") / toks >= 0.05)
      val kept = qualified.join(
        Dedup.dedupedIds(qualified, "doc_id", "text"), Seq("doc_id"), "left_semi")
      kept.filter(sampleKey < sampleRate)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.bpeTokenCount(col("text"))).as("n_tokens"))
        .orderBy("source")
    }),

    // DSIR (Xie et al. 2023): hashed-ngram importance weights for every
    // raw doc against the src0 target distribution — the model is 256
    // bucket rows whatever the corpus size
    "txt_dsir_weights" -> ((s, dir) =>
      graft.functions.Dsir.importanceWeights(docs(s, dir), "doc_id", "text",
        col("source") === "src0", b = 256)
        .orderBy("doc_id")),

    // Gumbel-top-50 resampling over the weights: deterministic md5
    // uniforms make "sample ∝ exp(logw) without replacement" a stateless
    // ORDER BY LIMIT — reproducible across engines, retries, and reruns
    "txt_dsir_sample" -> ((s, dir) =>
      graft.functions.Dsir.gumbelTopN(
        graft.functions.Dsir.importanceWeights(docs(s, dir), "doc_id", "text",
          col("source") === "src0", b = 256),
        "doc_id", n = 50)),

    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "doc_id", "text").orderBy("fp")),

    "dedup_keep" -> ((s, dir) =>
      Dedup.dedupedIds(docs(s, dir), "doc_id", "text").orderBy("doc_id")),

    // composite quality score from the text-stat components (exact ratios
    // of integer counts, rounded at 6 dp in both engines)
    "txt_quality" -> ((s, dir) => {
      val d    = docs(s, dir)
      val toks = TF.tokenCount(col("text"))
      d.select(
        col("doc_id"),
        round(TF.stopwordCount(col("text"), STOPWORDS).cast("double") / toks, 6).as("stop_ratio"),
        round(TF.punctCount(col("text")).cast("double") /
          greatest(TF.charCount(col("text")), lit(1L)), 6).as("punct_ratio"),
        round(TF.nonSpaceCount(col("text")).cast("double") / toks, 6).as("avg_token_len"))
        .orderBy("doc_id")
    }),

    "dedup_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), "doc_id", "text", 4)
        .orderBy("doc_id", "slot")),

    "dedup_lsh_pairs" -> ((s, dir) =>
      Dedup.lshCandidatePairs(docs(s, dir), "doc_id", "text", 8, 4)
        .orderBy("a", "b")),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir), "doc_id", "text").orderBy("doc_id")),

    // 4 bands x 16 bits: 65536 buckets/band keeps random-collision
    // candidates near zero at corpus scale (complete for hamming < 4)
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3, bitsPerBand = 16)
        .orderBy("a", "b")),

    "dedup_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text").orderBy("a", "b")),

    // overlap coefficient inter/min(|A|,|B|) over the same candidates —
    // the asymmetric subset-duplication signal Jaccard dilutes
    "dedup_containment" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(docs(s, dir), "doc_id", "text").orderBy("a", "b")),

    // exact substring (5-token window) duplication — the Lee et al. 2021
    // pretraining dedup unit; see Dedup.duplicatedWindowStats
    "dedup_substring" -> ((s, dir) =>
      Dedup.duplicatedWindowStats(docs(s, dir), "doc_id", "text", 5)
        .orderBy("doc_id")),

    // the transform half of Lee et al.: CUT every occurrence of every
    // cross-doc-duplicated 5-token window, emit the cleaned corpus
    "dedup_substring_removed" -> ((s, dir) =>
      Dedup.removeDuplicatedWindows(docs(s, dir), "doc_id", "text", 5)
        .orderBy("doc_id")),

    // the paper's other removal policy: keep exactly ONE occurrence (the
    // lexicographically smallest (doc, position)) of each duplicated
    // window, cut every other occurrence
    "dedup_substring_keep1" -> ((s, dir) =>
      Dedup.removeDuplicatedWindowsKeepOne(docs(s, dir), "doc_id", "text", 5)
        .orderBy("doc_id")),

    // CCNet paragraph dedup (Wenzek et al. 2020): drop every repeated
    // paragraph corpus-wide, keeping the first (doc, position) occurrence.
    // The corpus is single-line, so the query first renders a deterministic
    // multi-paragraph view (8-token paragraphs; a hash-keyed corpus-wide
    // boilerplate paragraph — ONE hot hash, the web-footer case — and
    // hash-keyed within-doc first-paragraph repeats) that both engines
    // replay; see Dedup.dedupParagraphs for the shuffle shape.
    "dedup_paragraphs" -> ((s, dir) => {
      Dedup.dedupParagraphs(
        docs(s, dir).select(col("doc_id"), renderedParas.as("text")),
        "doc_id", "text", "\n")
        .orderBy("doc_id")
    }),

    // Corpus snapshot diff (crawl versioning): snapshot A is missing the
    // not-yet-crawled doc_id % 11 == 3 slice; snapshot B drops
    // doc_id % 7 == 2 and rewrites doc_id % 5 == 0 — per doc, status in
    // added/removed/changed/unchanged by content md5 (text never
    // crosses the exchange; the diff joins 48-byte (id, md5) rows)
    "txt_snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val a = d.filter(col("doc_id") % 11 =!= 3).select(col("doc_id"), col("text"))
      val b = d.filter(col("doc_id") % 7 =!= 2).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      Provenance.snapshotDiff(a, b, "doc_id", "text").orderBy("doc_id")
    }),

    // per-source churn rollup of the same diff: the refresh report that
    // says how much of each slice is new/gone/rewritten
    "txt_snapshot_churn" -> ((s, dir) => {
      val d = docs(s, dir)
      val a = d.filter(col("doc_id") % 11 =!= 3).select(col("doc_id"), col("text"))
      val b = d.filter(col("doc_id") % 7 =!= 2).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      Provenance.snapshotChurn(a, b, "doc_id", "text",
        d.select(col("doc_id"), col("source").as("grp")))
        .select(col("grp").as("source"), col("status"), col("n"))
        .orderBy("source", "status")
    }),

    // site-template boilerplate removal over the same paragraph
    // rendering: drop EVERY occurrence of a line seen in >= 3 distinct
    // docs of one source (dedup keeps the first; this keeps none)
    "txt_boilerplate" -> ((s, dir) => {
      Dedup.boilerplateRemove(
        docs(s, dir).select(col("doc_id"), col("source"), renderedParas.as("text")),
        "doc_id", "source", "text", minDocs = 3)
        .orderBy("doc_id")
    }),

    // C4 cleaning rules (Raffel et al. 2020 §2.2) over the deterministic
    // line rendering: a line is KEPT iff it ends in terminal punctuation
    // (. ! ? "), has >= 3 words, and doesn't mention javascript; the page
    // fails outright on "{" (code), "lorem ipsum" (placeholder), a
    // blocklist word ("dup" stands in for the C4 badword list — 5% doc
    // frequency in this corpus), or < 3 surviving sentences. Shape: ONE
    // line explode + one map-side-combining agg + a narrow per-doc flag
    // scan joined on doc_id — no shuffle carries text except the line agg.
    "txt_c4_line_flags" -> ((s, dir) => {
      val lineAgg = docs(s, dir)
        .select(col("doc_id"), explode(renderedC4Lines).as("line"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(
            (col("line").endsWith(".") || col("line").endsWith("!") ||
              col("line").endsWith("?") || col("line").endsWith("\"")) &&
              size(split(col("line"), " ")) >= 3 &&
              !col("line").contains("javascript"), 1L).otherwise(0L)).as("n_kept"),
          max(when(col("line").contains("{"), 1L).otherwise(0L)).as("__brace"),
          max(when(col("line").contains("lorem ipsum"), 1L).otherwise(0L)).as("__lorem"))
      docs(s, dir)
        .select(col("doc_id"),
          array_contains(TF.tokens(col("text")), "dup").as("__bad"))
        .join(lineAgg, Seq("doc_id"))
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          (col("n_kept") >= 3).as("ok_sentences"),
          (col("__brace") === 0).as("ok_brace"),
          (col("__lorem") === 0).as("ok_lorem"),
          (!col("__bad")).as("ok_badword"))
        .withColumn("pass", col("ok_sentences") && col("ok_brace") &&
          col("ok_lorem") && col("ok_badword"))
        .orderBy("doc_id")
    }),

    // C4's corpus-level dedup (Raffel et al. 2020 §2.2): "we discarded all
    // but one of any three-sentence span occurring more than once" — spans
    // over the RAW line rendering (8-token sentence proxies), keep-first
    // by (doc, position), covered lines dropped, doc reassembled. See
    // Dedup.c4SpanDedup for the (md5, pos)-only shuffle shape.
    "dedup_c4_spans" -> ((s, dir) =>
      Dedup.c4SpanDedup(
        docs(s, dir).select(col("doc_id"), concat_ws("\n", rawLines).as("text")),
        "doc_id", "text", "\n", 3)
        .orderBy("doc_id")),

    // CCNet-style text normalization (Wenzek et al. 2020 §4.1: lowercase,
    // digit folding, whitespace collapse — what runs ahead of dedup
    // hashing so near-identical pages collide). The corpus is already
    // lowercase/digit-free single-space text, so a deterministic
    // mixed-case + digits + ragged-whitespace header is prepended
    // in-query on BOTH engines, then normalized away — the rules are
    // exercised on value-diverse content, never vacuously. Pure codegen
    // string expressions, zero shuffle.
    "txt_normalize" -> ((s, dir) => {
      val raw = concat(
        lit("  Doc"), col("doc_id").cast("string"), lit("  HEADER\t "),
        upper(substring(col("text"), 1, 10)), substring(col("text"), 11, 1000000))
      docs(s, dir)
        .select(col("doc_id"),
          TF.let(trim(regexp_replace(
            regexp_replace(lower(raw), "[0-9]", "0"), "\\s+", " "))) { n =>
            struct(md5(n).as("digest"), length(n).cast("long").as("n_chars"))
          }.as("x"))
        .select(col("doc_id"), col("x.digest").as("digest"),
          col("x.n_chars").as("n_chars"))
        .orderBy("doc_id")
    }),

    // HTML -> visible text (the WARC->WET conversion ahead of every text
    // filter). The shared corpus is plain text, so BOTH engines first
    // render each doc into an identical HTML page — title, style and
    // script subtrees (whose character data must NOT survive), a
    // comment, a literal-entity paragraph, and the &-escaped doc text
    // split across two <p> blocks — then strip it back. The Spark side
    // is TextFunctions.htmlToText (codegen regexp chain, zero shuffle);
    // the oracle replays the same RE2-compatible patterns. Title
    // recovery is checked against the oracle's direct construction, so
    // the extractor's output is compared to ground truth, not to itself.
    "txt_html_extract" -> ((s, dir) => {
      val esc = replace(col("text"), lit("&"), lit("&amp;"))
      val html = concat(
        lit("<html><head><title>"), col("source"), lit(" #"),
        col("doc_id").cast("string"),
        lit("</title><style>p{margin:0} .x>y{}</style>" +
          "<script>var q=\"<p>not text</p>\";</script></head><body><h1>Doc "),
        col("doc_id").cast("string"), lit("</h1><!-- crawl id="),
        col("doc_id").cast("string"),
        lit(" --><p>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&nbsp;end</p><div><p>"),
        substring(esc, 1, 60), lit("</p><p>"), substring(esc, 61, 1000000),
        lit("</p></div></body></html>"))
      docs(s, dir)
        .select(col("doc_id"),
          TF.let(html) { h =>
            struct(TF.htmlTitle(h).as("title"),
              TF.let(TF.htmlToText(h)) { t =>
                struct(md5(t).as("digest"),
                  length(t).cast("long").as("n_chars"))
              }.as("y"))
          }.as("x"))
        .select(col("doc_id"), col("x.title").as("title"),
          col("x.y.digest").as("digest"), col("x.y.n_chars").as("n_chars"))
        .orderBy("doc_id")
    }),

    // Per-doc keyword extraction: top-3 TF-IDF unigrams (TfIdf.topTerms —
    // the sorted-slice over each doc's own terms, bounded by doc length,
    // no window rank, no corpus-wide state beyond the df relation)
    "txt_keywords" -> ((s, dir) =>
      graft.functions.TfIdf.topTerms(docs(s, dir), "doc_id", "text",
        k = 3, ngram = 1)
        .orderBy("doc_id", "rank")),

    // LM-perplexity quality scoring (the CCNet filter): corpus-trained
    // bigram LM with add-one smoothing, per-doc cross-entropy (nats,
    // 6 dp), head/middle/tail TERCILE buckets — training keeps the
    // low-perplexity head. One bigram explode feeds counts and scoring;
    // tercile thresholds are a 1-row broadcast (LangModel's scaladoc has
    // the ulp-robustness argument for the cross-engine bucket compare).
    "txt_perplexity" -> ((s, dir) =>
      graft.functions.LangModel.perplexityBuckets(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Benchmark decontamination (the GPT-3 n-gram overlap rule): training
    // docs sharing any 4-gram with the held-out benchmark slice
    // (doc_id % 10 == 0) are flagged with the smallest witness id and the
    // (gram, benchmark-doc) hit count — the removal decision a training
    // pipeline applies before eval
    "txt_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.functions.Dedup.ngramContamination(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // same SEMANTICS as txt_decontaminate, different PLAN: the corpus
    // gram stream is bloom-gated inside the scan (codegen
    // bloom_might_contain over a plan-literal filter of the bench grams)
    // before any exchange — the 100 TB decontamination shape. The
    // IDENTICAL oracle proves bloom adds no false negatives end to end.
    "txt_decontaminate_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.functions.Dedup.ngramContaminationBloom(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // Corpus data card (the "datasheet" rollup a corpus release ships):
    // docs / token mass / stopword-quality mass / near-dup count per
    // (source, lang), per source, and corpus-wide — ONE grouping-sets
    // Expand pass over a per-doc relation that joins the LSH+CC near-dup
    // verdict (dup = doc is not its own cluster label). Sums are exact
    // (longs; DECIMAL for the rounded ratios) so every rollup level is
    // bit-stable; the CC piece reuses the library's pointer-jump
    // components, never a second pass over text.
    "txt_corpus_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val toks = TF.tokenCount(col("text"))
      val dup = Dedup.connectedComponents(
        d.select("doc_id"),
        Dedup.lshCandidatePairs(d, "doc_id", "text", 8, 4), "doc_id")
        .filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"), lit(1L).as("__dup"))
      d.select(col("doc_id"), col("source"), col("lang"), toks.as("nt"),
          round(TF.stopwordCount(col("text"), STOPWORDS).cast("double") / toks, 6)
            .as("sr"))
        .join(dup, Seq("doc_id"), "left")
        .withColumn("__dup", coalesce(col("__dup"), lit(0L)))
        .groupingSets(
          Seq(Seq(col("source"), col("lang")), Seq(col("source")), Seq()),
          col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"),
          sum(col("sr").cast("decimal(38,6)")).cast("double").as("stop_mass"),
          sum(col("__dup")).as("n_neardup"))
        .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
    }),

    // Quality-aware cluster keeper: production dedup keeps the BEST copy
    // of a near-dup cluster (highest quality score), not the first-seen —
    // keeper = argmax(stop-ratio quality, ties to the smaller doc_id) per
    // CC cluster, via the same partial-aggregated max(struct) argmax as
    // sim_assign (no window). Same CC economics as dedup_cluster_keep;
    // the quality relation joins as one narrow (doc_id, q) column.
    "dedup_cluster_keep_best" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 8, 4)
      val cc = Dedup.connectedComponents(d.select("doc_id"), pairs, "doc_id")
      val toks = TF.tokenCount(col("text"))
      val q = d.select(col("doc_id"),
        round(TF.stopwordCount(col("text"), STOPWORDS).cast("double") / toks, 6).as("q"))
      cc.select(col("id").as("doc_id"), col("cluster"))
        .join(q, Seq("doc_id"))
        .groupBy(col("cluster"))
        .agg(max(struct(col("q"), (-col("doc_id")).as("nd"), col("doc_id"))).as("b"))
        .select(col("b.doc_id").as("doc_id"), col("b.q").as("quality"))
        .orderBy("doc_id")
    }),

    // winnowing fingerprint set per doc (k=3-token grams, w=4 windows):
    // count + md5 digest of the sorted selected hashes
    "txt_winnow" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          TF.winnowFingerprints(col("text"), 3, 4).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          md5(concat_ws(",", transform(col("fps"), _.cast("string"))))
            .as("fp_digest"))
        .orderBy("doc_id")),

    // MOSS-style near-dup candidates: >= 3 shared winnowing fingerprints
    "dedup_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(docs(s, dir), "doc_id", "text", 3, 4, 3L)
        .orderBy("a", "b")),

    // PII scrub: the corpus text carries no natural PII, so a contact
    // line (email/phone/IP derived from doc_id) is appended in-query on
    // BOTH engines, then detected and redacted. Output pins the per-type
    // counts and the digest of the redacted text.
    "txt_pii_redact" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("raw", concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
          lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") * 3 % 256).cast("string")))
        .select(col("doc_id"),
          TF.piiCount(col("raw"), TF.EMAIL_RE).as("n_email"),
          TF.piiCount(col("raw"), TF.PHONE_RE).as("n_phone"),
          TF.piiCount(col("raw"), TF.IPV4_RE).as("n_ip"),
          md5(TF.redactPii(col("raw"))).as("redacted_digest"))
        .orderBy("doc_id")),

    // Perplexity-proxy quality score — the classic LM-based filter: a
    // bigram model with add-one smoothing is fit on the corpus itself and
    // every doc scored by its mean log-likelihood. Corpus model = two
    // map-side-combining aggregations; scoring = one shuffle join of doc
    // bigrams (multiset) against the model + a per-doc average. At 100 TB
    // the model relation is vocab-bounded, far smaller than the corpus —
    // the join shuffles the small side's key space, never corpus x corpus.
    // Rounded to 6 dp: double-sum association order differs across
    // engines at ~1e-14, far below the rounding grid.
    "txt_lm_score" -> ((s, dir) => {
      val d = docs(s, dir)
      // persist the model relations and the exploded doc-bigram stream:
      // bigs feeds bigN AND the scoring probe side, and |V| for smoothing
      // needs uniN's count — without the caches each reference re-tokenizes
      // the whole corpus (the cost ngramJaccardPairs' shared-relation
      // rewrite eliminated; same discipline here)
      val bigs = graft.CacheScope.cache(
        d.select(col("doc_id"), explode(TF.shingles(col("text"), 2)).as("bg")))
      val bigN = bigs.groupBy(col("bg")).agg(count(lit(1)).as("cbg"))
      val uniN = graft.CacheScope.cache(
        d.select(explode(TF.tokens(col("text"))).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("cuni")))
      val vocab = uniN.count() // one tiny driver scalar off the cached model
      bigs
        .join(bigN, Seq("bg"))
        .join(uniN, expr("t = split(bg, ' ')[0]"))
        .groupBy(col("doc_id"))
        .agg(round(avg(
          log((col("cbg") + 1).cast("double") / (col("cuni") + vocab).cast("double"))), 6)
          .as("lm_score"))
        .orderBy("doc_id")
    }),

    // per-doc character-distribution entropy — the cheap gibberish /
    // binary-noise detector (natural text sits in a narrow entropy band):
    // explode chars, two hash aggregations, -sum p ln p
    "txt_entropy" -> ((s, dir) => {
      val ch = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
        .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("n"))
      val tot = ch.groupBy(col("doc_id")).agg(sum(col("n")).as("len"))
      ch.join(tot, Seq("doc_id"))
        .groupBy(col("doc_id"))
        .agg(round(-sum((col("n") / col("len")) * log(col("n") / col("len"))), 6)
          .as("entropy"))
        .orderBy("doc_id")
    }),

    // BPE merge induction — tokenizer training (the iterative
    // most-frequent-pair loop). REAL DuckDB recomputation since round
    // 13: DuckDB's recursive CTEs (unlike Postgres's) permit an
    // aggregate subquery over the working table, so the per-round
    // pair-count argmax replays directly — see [[bpeMergesCte]].
    "txt_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      graft.functions.Bpe.induceMerges(docs(s, dir), "text", 8)
        .map(m => (m.rank.toLong, m.left, m.right, m.count))
        .toDF("rank", "left", "right", "cnt")
        .orderBy("rank")
    }),

    // tokenizer ENCODE: apply the induced merge table to the corpus
    // (Bpe.encodeExpr — merge literals folded into one scan-pass
    // expression chain). Recomputed per-source rollup since round 13
    // (doc count, total post-merge symbol count, digest-of-digests in
    // doc_id order): the oracle re-induces the merges recursively and
    // replays the bracketed-replace encode chain per document.
    "txt_bpe_encode" -> ((s, dir) => {
      val merges = graft.functions.Bpe.induceMerges(docs(s, dir), "text", 8)
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          graft.functions.Bpe.encodeExpr(col("text"), merges).as("e"))
        .select(col("doc_id"), col("source"),
          graft.functions.Bpe.symbolCount(col("e")).as("n_syms"),
          md5(col("e")).as("digest"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_syms")).as("total_syms"),
          md5(concat_ws(",",
            transform(array_sort(collect_list(struct(col("doc_id"), col("digest")))),
              p => p.getField("digest")))).as("src_digest"))
        .orderBy("source")
    }),

    // Gopher-style repetition signals: token repetition is the classic
    // low-quality marker (boilerplate, keyword stuffing). One explode +
    // two map-side-combining hash aggregations — the same 100 TB shape as
    // n-gram frequency; ratios rounded to 6 dp for cross-engine doubles.
    "txt_repetition" -> ((s, dir) => {
      val tw = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("t"))
        .agg(count(lit(1)).as("c"))
      tw.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tok"),
          round(count(lit(1)).cast("double") / sum(col("c")), 6).as("distinct_frac"),
          round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_tok_frac"))
        .orderBy("doc_id")
    }),

    // Gopher quality rules (Rae et al. 2021 §A1.1, adapted to the
    // whitespace-token corpus — the line/bullet rules don't apply):
    // token-count band, mean word length band, >= 2 distinct stopwords,
    // top-token repetition bound, symbol ratio bound, plus the AND. All
    // per-rule values are single IEEE divisions of exact integer counts,
    // so the booleans are bit-stable cross-engine without rounding. One
    // scan pass + the same repetition agg shape as txt_repetition.
    "txt_gopher_flags" -> ((s, dir) => {
      val rep = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg((max(col("c")).cast("double") / sum(col("c"))).as("ttf"))
      val toks = TF.tokenCount(col("text"))
      docs(s, dir)
        .select(col("doc_id"),
          toks.as("n_tok"),
          (TF.nonSpaceCount(col("text")).cast("double") / toks).as("mwl"),
          size(array_intersect(TF.tokens(col("text")),
            array(STOPWORDS.map(lit): _*))).as("nsk"),
          (TF.punctCount(col("text")).cast("double") / toks).as("symr"))
        .join(rep, Seq("doc_id"))
        .select(col("doc_id"), col("n_tok"),
          (col("n_tok") >= 50 && col("n_tok") <= 100000).as("ok_len"),
          (col("mwl") >= 3.0 && col("mwl") <= 10.0).as("ok_word_len"),
          (col("nsk") >= 2).as("ok_stopwords"),
          (col("ttf") <= 0.2).as("ok_repetition"),
          (col("symr") <= 0.1).as("ok_symbols"))
        .withColumn("pass", col("ok_len") && col("ok_word_len") &&
          col("ok_stopwords") && col("ok_repetition") && col("ok_symbols"))
        .orderBy("doc_id")
    }),

    // Gopher LINE-structure rules (Rae et al. 2021 A1.1/A1.2): bullet-
    // start ratio <= 0.9, ellipsis-end ratio <= 0.3, duplicate-line
    // fraction <= 0.3, duplicate-line CHARACTER fraction <= 0.2. The
    // corpus is single-line by construction, so the query first renders a
    // deterministic multi-line view (8-token lines; hash-keyed "- "
    // prefixes, "..." suffixes, and first-line repeats) that both engines
    // replay — the rules are exercised with value-diverse flags, not
    // vacuously true. Shape: the rendering is one let-bound scan pass,
    // then ONE line-level explode + two map-side-combining hash aggs
    // ((doc,line) then doc) — lines are materialized exactly once and
    // never re-evaluated per flag, and nothing is ever corpus x corpus.
    "txt_gopher_line_flags" -> ((s, dir) => {
      val rendered = TF.let(rawLines) { r =>
        transform(r, (x, li) => concat(
          when((col("doc_id") * 31 + li) % 4 === 0, lit("- "))
            .otherwise(lit("")),
          when((col("doc_id") * 13 + li) % 6 === 0, element_at(r, 1))
            .otherwise(x),
          when((col("doc_id") * 7 + li) % 5 === 1, lit("..."))
            .otherwise(lit(""))))
      }
      docs(s, dir)
        .select(col("doc_id"), explode(rendered).as("line"))
        .groupBy(col("doc_id"), col("line"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_lines"),
          count(lit(1)).as("dn"),
          sum(col("cnt") * length(col("line"))).as("ca"),
          sum(length(col("line"))).as("cd"),
          sum(when(col("line").startsWith("- "), col("cnt")).otherwise(0L)).as("bn"),
          sum(when(col("line").endsWith("..."), col("cnt")).otherwise(0L)).as("en"))
        .select(col("doc_id"), col("n_lines"),
          (col("bn").cast("double") / col("n_lines") <= 0.9).as("ok_bullet"),
          (col("en").cast("double") / col("n_lines") <= 0.3).as("ok_ellipsis"),
          ((col("n_lines") - col("dn")).cast("double") / col("n_lines") <= 0.3)
            .as("ok_dup_line"),
          ((col("ca") - col("cd")).cast("double") / col("ca") <= 0.2)
            .as("ok_dup_char"))
        .withColumn("pass", col("ok_bullet") && col("ok_ellipsis") &&
          col("ok_dup_line") && col("ok_dup_char"))
        .orderBy("doc_id")
    }),

    // Eval-set contamination: training docs sharing any distinct bigram
    // with the benchmark set (here: doc_id < 20). The eval n-gram set is
    // SMALL by construction, so it broadcasts and the check is one
    // broadcast semi-ish join over the exploded corpus — never a
    // corpus x corpus comparison.
    "txt_contamination" -> ((s, dir) => {
      val sh = docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(TF.shingles(col("text"), 2))).as("ng"))
      graft.functions.Packing.contamination(
        sh.filter(col("doc_id") >= 20), sh.filter(col("doc_id") < 20),
        "doc_id", "ng")
        .orderBy("doc_id")
    }),

    // Sequence packing: greedy first-fit of docs into fixed token-budget
    // training sequences, the last mile of a pretraining pipeline. Packing
    // is inherently an ordered scan, so it runs as a stateful pass per
    // (source, shard) group — the engine's bounded-state shape; shard =
    // doc_id % 8 keeps parallelism at #sources x 8 while staying
    // deterministic for the oracle (real pipelines shard exactly like
    // this: packing order within a shard is what matters, not globally).
    "txt_pack" -> ((s, dir) =>
      graft.functions.Packing.packSequences(
        docs(s, dir).select(col("doc_id"), col("source"),
          TF.tokenCount(col("text")).as("n_tok")),
        orderCol = "doc_id", weightCol = "n_tok", groupCol = "source",
        budget = 512L, shards = 8)
        .orderBy("doc_id")),

    // Curriculum construction: stage docs by LM difficulty (perplexity
    // terciles, easy -> hard) and pack WITHIN each stage — the ordered
    // training stream curriculum learning consumes (stage 0 packs first).
    // Composes the pinned perplexity chain with the pack scan; docs too
    // short for a perplexity (<2 tokens) have no difficulty signal and
    // stay out, exactly like the oracle's len>=2 gate
    "txt_curriculum" -> ((s, dir) => {
      val d = docs(s, dir)
      val buckets = graft.functions.LangModel
        .perplexityBuckets(d, "doc_id", "text")
        .select(col("doc_id"), col("bucket"))
      val weighted = d.select(col("doc_id"), TF.tokenCount(col("text")).as("n_tok"))
        .join(buckets, Seq("doc_id"))
      graft.functions.Packing.packSequences(weighted, "doc_id", "n_tok",
          "bucket", budget = 512L, shards = 8)
        .withColumn("stage",
          when(col("bucket") === "head", 0L)
            .when(col("bucket") === "middle", 1L).otherwise(2L))
        .orderBy("doc_id")
    }),

    // Trained domain classifier: multinomial NB fit on (source, token)
    // counts, every doc scored against every source, argmax emitted. The
    // model relation is vocab-bounded, so scoring joins on token (inverted
    // index), never corpus x corpus — see NaiveBayes's scaladoc.
    "txt_nb_classify" -> ((s, dir) =>
      graft.functions.NaiveBayes
        .trainScorePredict(docs(s, dir), "doc_id", "text", "source")
        .orderBy("doc_id")),

    // Count-min point-frequency: the sketch builds in d*w fixed cells
    // (one map-side-combining agg), probes broadcast against it — the
    // frequency query that never shuffles a vocab. Probes = the stopword
    // list + one absent token (est 0 unless a collision over-counts).
    "q_cms_freq" -> ((s, dir) => {
      import s.implicits._
      val sk = graft.functions.CountMin.sketch(
        docs(s, dir).select(explode(TF.tokens(col("text"))).as("token")),
        "token", d = 3, w = 128)
      graft.functions.CountMin.estimate(sk,
        (STOPWORDS :+ "zz_missing").toDF("token"), "token", d = 3, w = 128)
        .orderBy("token")
    }),

    // Incremental dedup: corpus (doc_id % 10 < 8) band-indexed ONCE as a
    // bucketed table, the arriving shard (% 10 >= 8) probes it — the
    // shard-by-shard growth path where historical signatures are data,
    // not recomputation. Build-if-absent mirrors sim_ivf_persisted so
    // bench reps measure the PROBE.
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val table = "graft_lsh_idx_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      if (!s.catalog.tableExists(table))
        Dedup.lshWriteBandIndex(d.filter(col("doc_id") % 10 < 8),
          "doc_id", "text", 8, 4, table)
      Dedup.lshProbeBandIndex(s.table(table),
          d.filter(col("doc_id") % 10 >= 8), "doc_id", "text", 8, 4)
        .select(col("id").as("doc_id"), col("dup_of"))
        .orderBy("doc_id", "dup_of")
    }),

    // The INCREMENTAL-UPDATE composition, end to end: snapshot diff finds
    // what the new crawl added or rewrote; only THOSE docs probe the
    // persisted band index (same bucketed table as dedup_incremental);
    // probe hits reject, the rest are accepted for append. The 100 TB
    // story this pins: a refresh costs O(delta), never O(corpus) —
    // diff joins (id, md5) rows, the probe exchanges only the delta's
    // band keys against the bucketed index. A changed doc matching its
    // own superseded index entry does NOT count as a dup (that entry is
    // being replaced).
    "pipeline_incremental_update" -> ((s, dir) => {
      val d = docs(s, dir)
      val table = "graft_lsh_idx_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      if (!s.catalog.tableExists(table))
        Dedup.lshWriteBandIndex(d.filter(col("doc_id") % 10 < 8),
          "doc_id", "text", 8, 4, table)
      val base = d.filter(col("doc_id") % 10 < 8)
        .select(col("doc_id"), col("text"))
      val arrived = d.select(col("doc_id"),
        when(col("doc_id") % 10 < 8 && col("doc_id") % 9 === 4,
          concat(col("text"), lit(" updated"))).otherwise(col("text")).as("text"))
      val delta = Provenance.snapshotDiff(base, arrived, "doc_id", "text")
        .filter(col("status").isin("added", "changed"))
      val newDocs = arrived.join(delta, Seq("doc_id"))
      // (lshProbeBandIndex already excludes id = dup_of — the changed
      // doc's superseded self-entry)
      val dups = Dedup.lshProbeBandIndex(s.table(table), newDocs,
          "doc_id", "text", 8, 4)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_dups"))
        .withColumnRenamed("id", "doc_id")
      newDocs.select(col("doc_id"), col("status"))
        .join(dups, Seq("doc_id"), "left")
        .withColumn("n_dups", coalesce(col("n_dups"), lit(0L)))
        .withColumn("accepted", col("n_dups") === 0)
        .orderBy("doc_id")
    }),

    // Sparse retrieval: TF-IDF bigram vectors, top-3 cosine neighbors per
    // doc through the inverted-index self-join (sum(df^2) bounded by the
    // maxDf stop-term prune — see TfIdf's scaladoc for the 100 TB dial).
    // The bigram TermIndex is the SESSION-SHARED one (memoTermIndex,
    // keyed by the table path): the tfidf/bm25/rrf rankers all probe the
    // same corpus, and an index is built once and queried many times —
    // per-call rebuilds measured ~27 s of one bench board's wall
    "sim_tfidf_topk" -> ((s, dir) =>
      graft.functions.TfIdf.topKNeighborsIndexed(
        graft.functions.TfIdf.memoTermIndex(docs(s, dir), "doc_id", "text",
          ngram = 2, corpusKey = s"$dir/documents"),
        "doc_id", k = 3, maxDf = graft.functions.DfBound.Frac(0.1))
        .orderBy("doc_id", "rank")),

    // Deterministic train/val/test split (90/5/5): membership from the
    // same per-million content-independent hash as the sampling ops, so
    // the split is reproducible across runs/engines, stable under corpus
    // growth (a doc's split never changes when others arrive), and a
    // pure codegen predicate — no shuffle, no RNG state
    "txt_split" -> ((s, dir) => {
      val hk = TF.rollingHash(md5(col("doc_id").cast("string"))) % 1000000
      docs(s, dir)
        .select(col("doc_id"),
          when(hk < 900000, lit("train"))
            .when(hk < 950000, lit("val"))
            .otherwise(lit("test")).as("split"))
        .orderBy("doc_id")
    }),

    // Training-window chunking: split every doc into width-32 token
    // windows at stride 24 (8-token overlap keeps context across the
    // boundary — the standard context-length prep before packing). Pure
    // narrow explode: n_chunks = 1 if n<=w else ceil((n-w)/s)+1 with the
    // last window clipped, so no chunk is ever fully contained in its
    // predecessor. Codegen'd sequence+slice, no shuffle, no UDF.
    "txt_chunk" -> ((s, dir) => {
      val w = 32
      val st = 24
      docs(s, dir)
        .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
        .withColumn("nc",
          when(size(col("tk")) <= w, lit(1L))
            .otherwise(ceil((size(col("tk")) - lit(w)) / lit(st.toDouble)) + 1L))
        .select(col("doc_id"), col("tk"),
          posexplode(sequence(lit(0L), col("nc") - 1L)))
        .select(col("doc_id"), col("col").as("chunk_id"),
          slice(col("tk"), (col("col") * st + 1L).cast("int"), lit(w)).as("ck"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("ck")).cast("long").as("n_tokens"),
          concat_ws(" ", col("ck")).as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    }),

    // Per-domain quality cap — "keep the N best docs per language", the
    // curation step that bounds any one domain's contribution: quality
    // scores ride the same bounded-heap top-k aggregate as the retrieval
    // ops (N rows per partition x lang cross the shuffle, no window rank)
    "txt_domain_cap" -> ((s, dir) => {
      val toks = TF.tokenCount(col("text"))
      val scored = docs(s, dir).select(
        col("lang").as("qid"), col("doc_id").as("id"),
        round(TF.stopwordCount(col("text"), STOPWORDS).cast("double") /
          greatest(toks, lit(1L)), 6).as("score"))
      graft.functions.Similarity.rankTopK(scored, 5)
        .select(col("qid").as("lang"), col("id").as("doc_id"),
          col("rank"), col("score"))
        .orderBy("lang", "rank")
    }),

    // BM25 retrieval: every 25th doc is a query, scored against the
    // corpus through the posting join (the lexical-ranking standard)
    "sim_bm25_topk" -> ((s, dir) => {
      val d = docs(s, dir)
      // same session-shared TermIndex as sim_tfidf_topk/sim_hybrid_rrf
      graft.functions.TfIdf.bm25TopKIndexed(
        graft.functions.TfIdf.memoTermIndex(d, "doc_id", "text",
          ngram = 2, corpusKey = s"$dir/documents"),
        d.filter(col("doc_id") % 25 === 0).select("doc_id"),
        "doc_id", k = 3, maxDf = graft.functions.DfBound.Frac(0.1))
        .orderBy("doc_id", "rank")
    }),

    // Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009):
    // the BM25 lexical ranking and the query-restricted TF-IDF cosine
    // ranking (the sparse stand-in for a dense-embedding leg) each
    // produce a top-5, fused by 1/(60+rank) sums into a final top-3.
    // ONE TermIndex serves both legs (single tokenize pass + single
    // indexed-doc-count action — the same shared ex/tf/dfr/nn CTE chain
    // the oracle uses); both legs are query-side posting joins (cost
    // linear in sum of query-term df); the fusion union is <= 2x5
    // id/rank rows per query.
    "sim_hybrid_rrf" -> ((s, dir) => {
      val d = docs(s, dir)
      val q = d.filter(col("doc_id") % 25 === 0).select("doc_id")
      val idx = graft.functions.TfIdf.memoTermIndex(d, "doc_id", "text",
        ngram = 2, corpusKey = s"$dir/documents")
      val lex = graft.functions.TfIdf.bm25TopKIndexed(idx, q, "doc_id",
        k = 5, maxDf = graft.functions.DfBound.Frac(0.1))
      val dense = graft.functions.TfIdf.tfidfQueryTopKIndexed(idx, q, "doc_id",
        k = 5, maxDf = graft.functions.DfBound.Frac(0.1))
      graft.functions.Similarity.rrfFuse(
        Seq(lex.withColumnRenamed("doc_id", "qid"),
          dense.withColumnRenamed("doc_id", "qid")), k = 3)
        .withColumnRenamed("qid", "doc_id")
        .orderBy("doc_id", "rank")
    }),

    // Temperature-resampled language mix (the multilingual pretraining
    // balance knob): per-language sampling weight c^alpha (alpha=0.5)
    // flattens the language distribution — rare languages are upsampled
    // relative to their corpus share, the head language downsampled — at
    // a total budget of half the corpus. Per-language quotas come from
    // one tiny count agg (weights rounded at 6 dp and summed as DECIMAL
    // so the total is exact in any partition order); membership is the
    // deterministic per-million hash split, so the sample is reproducible
    // and the whole op is one scan pass + a broadcast of |langs| rows.
    "txt_temperature_mix" -> ((s, dir) => {
      val d = docs(s, dir)
      val c = d.groupBy(col("lang")).agg(count(lit(1)).as("cl"))
      val st = c.agg(
        sum(round(sqrt(col("cl").cast("double")), 6).cast("decimal(20,6)"))
          .as("sw"),
        sum(col("cl")).as("tot"))
      val thr = c.crossJoin(broadcast(st))
        .withColumn("w", round(sqrt(col("cl").cast("double")), 6))
        .withColumn("quota", least(col("cl"),
          floor((col("tot") / 2).cast("long").cast("double") * col("w")
            / col("sw").cast("double")).cast("long")))
        .select(col("lang"),
          floor(col("quota") * lit(1000000.0) / col("cl")).cast("long").as("th"))
      d.join(broadcast(thr), Seq("lang"))
        .filter(TF.rollingHash(md5(col("doc_id").cast("string"))) % 1000000 < col("th"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // Source-overlap provenance matrix (corpus governance): near-dup
    // PAIR counts per unordered source pair — which sources copy from
    // each other (mirror detection, license-risk attribution). Rides the
    // same banded candidate join as the dedup family; the matrix is
    // |sources|² tiny however big the corpus
    "txt_source_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 8, 4)
      val src = d.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("a"), col("source").as("src_a")), Seq("a"))
        .join(src.select(col("doc_id").as("b"), col("source").as("src_b")), Seq("b"))
        // unordered pair -> (least, greatest): upper-triangular matrix
        // regardless of which source holds the smaller doc_id
        .select(least(col("src_a"), col("src_b")).as("source_x"),
          greatest(col("src_a"), col("src_b")).as("source_y"))
        .groupBy(col("source_x"), col("source_y"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_x", "source_y")
    }),

    // Leakage-safe split (the GroupShuffleSplit discipline): membership
    // keyed on the near-dup CLUSTER label, so a whole cluster lands in
    // ONE split — near-dups straddling train/test would leak eval
    // content into training, which the per-doc txt_split cannot prevent
    "txt_cluster_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 8, 4)
      val hk = TF.rollingHash(md5(col("cluster").cast("string"))) % 1000000
      Dedup.connectedComponents(d.select("doc_id"), pairs, "doc_id")
        .select(col("id").as("doc_id"), col("cluster"),
          when(hk < 900000, lit("train")).when(hk < 950000, lit("val"))
            .otherwise(lit("test")).as("split"))
        .orderBy("doc_id")
    }),

    // LSH pairs -> connected components -> per-doc cluster label (min
    // reachable doc_id) — the keep-one-per-cluster dedup decision
    "dedup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 8, 4)
      Dedup.connectedComponents(d.select("doc_id"), pairs, "doc_id")
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    }),

    // the duplication PROFILE of the corpus: cluster-size histogram
    // (how many clusters of each size — the first chart in any dedup
    // report; a heavy tail here is what motivates keeper policies).
    // Two tiny aggs on top of the CC labels; output is bounded by the
    // number of distinct sizes however large the corpus
    "dedup_cluster_sizes" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 8, 4)
      Dedup.connectedComponents(d.select("doc_id"), pairs, "doc_id")
        .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
        .orderBy("sz")
    }),

    // ...and the DECISION applied: the near-dup cleaned corpus keeps the
    // min-id representative of every cluster (id == its own label) — the
    // LSH-cluster analogue of dedup_keep's exact-hash keeper
    "dedup_cluster_keep" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text", 8, 4)
      Dedup.connectedComponents(d.select("doc_id"), pairs, "doc_id")
        .filter(col("id") === col("cluster"))
        .select(col("id").as("doc_id"))
        .orderBy("doc_id")
    }),

    // The end-to-end CORPUS-CLEANING pipeline — the daily driver of a
    // pretraining data build, composed entirely from the library ops
    // above: exact dedup (keep min-id per fingerprint) -> near-dup
    // cluster keep (minhash LSH -> connected components -> one rep per
    // cluster) -> cross-doc substring-span removal (Lee et al. 2021) ->
    // quality gate on the CLEANED text (enough tokens, plausible stopword
    // density — the C4-style "is this natural language" test) -> PII
    // scrub. Each stage only ever shuffles ids/hashes, never full text
    // (text rides only the two survivor semi-joins), so the composition
    // keeps each member's 100 TB shape; survivors shrink monotonically so
    // later (more expensive per-token) stages see the least data.
    "pipeline_clean_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      // 1. exact dedup: keep the min-id representative of each byte-
      //    identical group. Survivor relations are CacheScope-cached:
      //    each feeds 3+ downstream stages, and without the cache every
      //    stage re-runs the whole upstream (measured 18 s -> the sum of
      //    the stages at sf0.1). At corpus scale this is the standard
      //    materialize-between-stages point (cache, or write a table).
      val d1 = graft.CacheScope.cache(
        d.select("doc_id", "text") // prune BEFORE caching: only these flow on
          .join(Dedup.dedupedIds(d, "doc_id", "text"), Seq("doc_id"), "left_semi"))
      // 2. near-dup dedup: LSH candidates over survivors, CC labels,
      //    keep each cluster's min-id representative
      val pairs = Dedup.lshCandidatePairs(d1, "doc_id", "text", 8, 4)
      val reps = Dedup.connectedComponents(d1.select("doc_id"), pairs, "doc_id")
        .filter(col("id") === col("cluster"))
        .select(col("id").as("doc_id"))
      val d2 = graft.CacheScope.cache(d1.join(reps, Seq("doc_id"), "left_semi"))
      // 3. cut every cross-doc-duplicated 5-token window
      val cleaned = Dedup.removeDuplicatedWindows(d2, "doc_id", "text", 5)
        .withColumn("n_tokens_out", (col("n_tokens") - col("n_cut")).cast("long"))
      // 4. quality gate on the cleaned text: enough tokens left, stopword
      //    density in the natural-language band
      val scored = cleaned.withColumn("stop_ratio",
        round(TF.stopwordCount(col("clean_text"), STOPWORDS).cast("double") /
          greatest(col("n_tokens_out"), lit(1L)), 6))
      scored
        .filter(col("n_tokens_out") >= 20 &&
          col("stop_ratio") >= 0.02 && col("stop_ratio") <= 0.2)
        // 5. PII scrub the survivors; pin the digest of the final text
        .select(col("doc_id"),
          md5(TF.redactPii(col("clean_text"))).as("clean_digest"),
          col("n_tokens_out"), col("n_cut"), col("stop_ratio"))
        .orderBy("doc_id")
    }),

    // the pipeline with CCNet paragraph dedup composed in front (Wenzek et
    // al. 2020 run paragraph dedup BEFORE doc-level dedup/LID): stage 0
    // drops corpus-wide repeated paragraphs from the deterministic
    // multi-paragraph rendering, stages 1-5 are pipeline_clean_corpus
    // unchanged over the paragraph-cleaned text. n_paras_cut carries
    // stage 0's per-doc fate into the output next to stage 3's n_cut.
    "pipeline_clean_corpus_pd" -> ((s, dir) => {
      val d = docs(s, dir)
      val pd = graft.CacheScope.cache(
        Dedup.dedupParagraphs(
          d.select(col("doc_id"), renderedParas.as("text")),
          "doc_id", "text", "\n")
          .select(col("doc_id"), col("clean_text").as("text"),
            col("n_dropped").as("n_paras_cut")))
      val d1 = graft.CacheScope.cache(
        pd.select("doc_id", "text")
          .join(Dedup.dedupedIds(pd, "doc_id", "text"), Seq("doc_id"), "left_semi"))
      val pairs = Dedup.lshCandidatePairs(d1, "doc_id", "text", 8, 4)
      val reps = Dedup.connectedComponents(d1.select("doc_id"), pairs, "doc_id")
        .filter(col("id") === col("cluster"))
        .select(col("id").as("doc_id"))
      val d2 = graft.CacheScope.cache(d1.join(reps, Seq("doc_id"), "left_semi"))
      val cleaned = Dedup.removeDuplicatedWindows(d2, "doc_id", "text", 5)
        .withColumn("n_tokens_out", (col("n_tokens") - col("n_cut")).cast("long"))
      val scored = cleaned.withColumn("stop_ratio",
        round(TF.stopwordCount(col("clean_text"), STOPWORDS).cast("double") /
          greatest(col("n_tokens_out"), lit(1L)), 6))
      scored
        .filter(col("n_tokens_out") >= 20 &&
          col("stop_ratio") >= 0.02 && col("stop_ratio") <= 0.2)
        .join(pd.select(col("doc_id"), col("n_paras_cut")), Seq("doc_id"))
        .select(col("doc_id"),
          md5(TF.redactPii(col("clean_text"))).as("clean_digest"),
          col("n_tokens_out"), col("n_cut"), col("n_paras_cut"), col("stop_ratio"))
        .orderBy("doc_id")
    })
  )

  // The universal-hash minhash model (see Dedup.minhashSlot's scaladoc),
  // rendered as SQL from the SAME constants the Spark plan uses: one md5
  // per shingle, k (a*xm + b) mod P slot hashes joined in via a VALUES
  // relation. `P` and the A/B family are Dedup's.
  private def slotConstsSql(k: Int): String =
    (0 until k).map(i => s"(${i}, ${Dedup.slotA(i)}, ${Dedup.slotB(i)})").mkString(", ")

  private def minhashSigCte(k: Int, rel: String = "documents") =
    s"""sh AS (
       |  SELECT doc_id, unnest($shSql) AS s
       |  FROM $rel WHERE len($tokSql) >= 2),
       |hx AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % ${Dedup.minhashP} AS xm
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id, k, MIN((a * xm + b) % ${Dedup.minhashP}) AS mh
       |  FROM hx CROSS JOIN (VALUES ${slotConstsSql(k)}) AS c(k, a, b)
       |  GROUP BY doc_id, k)""".stripMargin

  // shared minhash-LSH band-key CTEs (k=8 slots, 2 bands of 4 — matching
  // the Spark queries' lshCandidatePairs(_, _, 8, 4)) used by the
  /** Recursive replay of the whole BPE merge induction ([[graft.functions.Bpe]]):
    * word frequencies once (the corpus-scale pass), then 8 rounds where
    * each iteration (a) computes the weighted adjacent-pair argmax over
    * the CURRENT word states via an aggregate subquery on the recursive
    * table — legal in DuckDB, the feature Postgres-style engines lack —
    * with the same count-desc / binary-collation tie-break as
    * `Bpe.utf8Lt`, and (b) applies the merge to every word via one
    * `replace` on the sentinel-bracketed symbol string (\x01 sym \x02 —
    * SQL replace's left-to-right non-overlapping pass IS greedy BPE
    * application, the `Bpe.encodeExpr` argument). Ends at `mg`:
    * (rnk, a, b, cnt) per round.
    */
  private def bpeMergesCte(k: Int = 8): String =
    s"""words0 AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS n,
       |    list_aggregate(list_transform(string_split_regex(w, ''),
       |      c -> chr(1) || c || chr(2)), 'string_agg', '') AS s
       |  FROM (SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |        FROM documents)
       |  WHERE len(w) > 0
       |  GROUP BY w),
       |rec(round, s, n, a, b, cnt) AS (
       |  SELECT 0, s, n, NULL::VARCHAR, NULL::VARCHAR, NULL::BIGINT FROM words0
       |  UNION ALL
       |  SELECT round + 1,
       |    replace(s, chr(1) || best.a || chr(2) || chr(1) || best.b || chr(2),
       |      chr(1) || best.a || best.b || chr(2)),
       |    n, best.a, best.b, CAST(best.c AS BIGINT)
       |  FROM rec, (
       |    SELECT pr[1] AS a, pr[2] AS b, SUM(n) AS c FROM (
       |      SELECT UNNEST(list_zip(sym[:len(sym) - 1], sym[2:])) AS pr, n
       |      FROM (SELECT string_split(rtrim(ltrim(s, chr(1)), chr(2)),
       |              chr(2) || chr(1)) AS sym, n FROM rec) t) p
       |    GROUP BY 1, 2 ORDER BY c DESC, a, b LIMIT 1) best
       |  WHERE round < $k),
       |mg AS MATERIALIZED (SELECT round AS rnk, ANY_VALUE(a) AS a,
       |  ANY_VALUE(b) AS b, ANY_VALUE(cnt) AS cnt
       |  FROM rec WHERE round >= 1 GROUP BY round)""".stripMargin

  // dedup_lsh_pairs / dedup_jaccard / dedup_clusters oracles
  private[queries] def lshBandsCte(rel: String = "documents") =
    s"""${minhashSigCte(8, rel)},
       |p AS (
       |  SELECT doc_id,
       |    concat_ws('|', MAX(CASE WHEN k=0 THEN mh END), MAX(CASE WHEN k=1 THEN mh END),
       |                   MAX(CASE WHEN k=2 THEN mh END), MAX(CASE WHEN k=3 THEN mh END)) AS bk0,
       |    concat_ws('|', MAX(CASE WHEN k=4 THEN mh END), MAX(CASE WHEN k=5 THEN mh END),
       |                   MAX(CASE WHEN k=6 THEN mh END), MAX(CASE WHEN k=7 THEN mh END)) AS bk1
       |  FROM sig GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, bk0 AS bk FROM p
       |  UNION ALL SELECT doc_id, 1, bk1 FROM p)""".stripMargin

  // 64-bit simhash building blocks shared by the dedup_simhash* oracles
  private val simhashNibbles = (0 until 16).map(q =>
    s"strpos('0123456789abcdef', substr(m, ${q + 1}, 1)) - 1 AS n$q").mkString(",\n    ")

  private val simhashSums = (0 until 64).map { j =>
    val q = j / 4
    val d = 1 << (3 - j % 4)
    s"SUM(((n$q // $d) % 2)*2 - 1) AS s$j"
  }.mkString(",\n    ")

  private def simhashBands(bitsPerBand: Int) = (0 until 64 / bitsPerBand).map { b =>
    (0 until bitsPerBand).map(i =>
      s"(CASE WHEN s${bitsPerBand * b + i} >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ") + s" AS b$b"
  }.mkString(",\n    ")

  private val simhashHex = (7 to 0 by -1).flatMap(b => Seq(
    s"substr('0123456789abcdef', 1 + (b$b // 16), 1)",
    s"substr('0123456789abcdef', 1 + (b$b % 16), 1)")).mkString(" || ")

  private def simhashBandsCte(bitsPerBand: Int) =
    s"""tk AS (
       |  SELECT doc_id, md5(unnest($tokSql)) AS m FROM documents),
       |n AS (SELECT doc_id,
       |    $simhashNibbles
       |  FROM tk),
       |g AS (SELECT doc_id,
       |    $simhashSums
       |  FROM n GROUP BY doc_id),
       |bds AS (SELECT doc_id,
       |    ${simhashBands(bitsPerBand)}
       |  FROM g)""".stripMargin

  /** one SQL for two operators: the bloom variant must be bit-identical
    * to the exact decontamination (bloom adds no false negatives; false
    * positives die in the exact join), so both query keys share this
    * string and the gate itself is the equivalence proof
    */
  private val decontaminateSql =
    s"""WITH tg AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len($tokSql) - 3),
       |    i -> $tokSql[i] || ' ' || $tokSql[i+1] || ' ' ||
       |         $tokSql[i+2] || ' ' || $tokSql[i+3])) AS g
       |  FROM documents),
       |tr AS (SELECT DISTINCT doc_id, g FROM tg WHERE doc_id % 10 <> 0),
       |be AS (SELECT DISTINCT doc_id, g FROM tg WHERE doc_id % 10 = 0)
       |SELECT tr.doc_id, MIN(be.doc_id) AS contaminated_by,
       |       COUNT(*) AS n_hits
       |FROM tr JOIN be USING (g)
       |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "txt_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($tokSql) AS BIGINT) AS n_tokens,
         |  CAST(len(text) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_nonspace,
         |  CAST(len(list_filter($tokSql,
         |       t -> t IN ('the','a','of','to','and'))) AS BIGINT) AS n_stop,
         |  CAST(len(text) - len(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS BIGINT) AS n_punct
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_langid" ->
      s"""WITH s AS (SELECT doc_id,
         |    len(list_filter($tokSql, t -> t IN ('customer','hash','row'))) AS s_de,
         |    len(list_filter($tokSql, t -> t IN ('the','order','group'))) AS s_en,
         |    len(list_filter($tokSql, t -> t IN ('slow','agg','merge'))) AS s_es,
         |    len(list_filter($tokSql, t -> t IN ('scan','data','query'))) AS s_fr,
         |    len(list_filter($tokSql, t -> t IN ('join','small','column'))) AS s_zh
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN s_de = m THEN 'de' WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es'
         |       WHEN s_fr = m THEN 'fr' ELSE 'zh' END AS lang_guess
         |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m FROM s)
         |ORDER BY doc_id""".stripMargin,

    "txt_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    // full recursive replay of the merge-induction loop (was a VALUES
    // pin through round 12 — see [[bpeMergesCte]])
    "txt_bpe_merges" ->
      s"""WITH RECURSIVE ${bpeMergesCte()}
         |SELECT CAST(rnk AS BIGINT) AS "rank", a AS "left", b AS "right",
         |  CAST(cnt AS BIGINT) AS cnt
         |FROM mg ORDER BY 1""".stripMargin,

    // re-induce the merges, then replay Bpe.encodeExpr per document:
    // the 8 rank-ordered merges each become one replace() over the
    // sentinel-bracketed text (m1..m8 are single-row relations from the
    // recursion), digests and symbol counts aggregate per source
    "txt_bpe_encode" ->
      s"""WITH RECURSIVE ${bpeMergesCte()},
         |${(1 to 8).map(r => s"m$r AS (SELECT a, b FROM mg WHERE rnk = $r)").mkString(",\n")},
         |e0t AS (
         |  SELECT doc_id, source,
         |    list_aggregate(list_transform(regexp_split_to_array(trim(text), '\\s+'),
         |      w -> CASE WHEN len(w) = 0 THEN '' ELSE
         |        list_aggregate(list_transform(string_split_regex(w, ''),
         |          c -> chr(1) || c || chr(2)), 'string_agg', '') END),
         |      'string_agg', ' ') AS e0
         |  FROM documents),
         |enc AS (
         |  SELECT doc_id, source, ${
           (1 to 8).foldLeft("e0") { (acc, r) =>
             s"replace($acc, chr(1)||m$r.a||chr(2)||chr(1)||m$r.b||chr(2), chr(1)||m$r.a||m$r.b||chr(2))"
           }} AS e
         |  FROM e0t, ${(1 to 8).map("m" + _).mkString(", ")})
         |SELECT source,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(len(e) - len(replace(e, chr(2), ''))) AS BIGINT) AS total_syms,
         |  md5(string_agg(md5(e), ',' ORDER BY doc_id)) AS src_digest
         |FROM enc GROUP BY source ORDER BY source""".stripMargin,

    "txt_editdist" ->
      """SELECT a.doc_id, CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT) AS ed
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,

    "txt_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_rollhash" ->
      """SELECT doc_id,
        |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
        |    list_transform(generate_series(1, len(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_blocklist" -> {
      val vals = BLOCK_PHRASES.map(p => s"('$p')").mkString(", ")
      s"""WITH p(phrase) AS (VALUES $vals),
         |hits AS (
         |  SELECT d.doc_id, p.phrase
         |  FROM documents d JOIN p ON contains(d.text, p.phrase)),
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS n,
         |         string_agg(phrase, ',' ORDER BY phrase) AS ph
         |  FROM hits GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(agg.n, 0) AS INT) AS n_hits,
         |  COALESCE(agg.ph, '') AS hit_phrases,
         |  COALESCE(agg.n, 0) > 0 AS blocked
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "txt_shard_export" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(doc_id || ':42'), 1, 8))::BIGINT AS k
        |  FROM documents)
        |SELECT k % 8 AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY k, doc_id)) AS order_digest
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_domain_kl" ->
      s"""WITH toks AS (
         |  SELECT source, unnest($tokSql) AS t FROM documents),
         |by_src AS (SELECT source, t, COUNT(*) AS c_st FROM toks GROUP BY 1, 2),
         |src_tot AS (SELECT source, SUM(c_st) AS tot_s FROM by_src GROUP BY 1),
         |corpus AS (SELECT t, SUM(c_st) AS c_t FROM by_src GROUP BY 1),
         |tot AS (SELECT SUM(c_t) AS tot FROM corpus)
         |SELECT b.source,
         |  CAST(MAX(s.tot_s) AS BIGINT) AS n_tokens,
         |  ROUND(SUM((c_st / CAST(tot_s AS DOUBLE)) *
         |    ln((c_st / CAST(tot_s AS DOUBLE)) / (c_t / CAST(tot.tot AS DOUBLE)))), 6) AS kl
         |FROM by_src b
         |JOIN src_tot s USING (source)
         |JOIN corpus USING (t)
         |CROSS JOIN tot
         |GROUP BY b.source ORDER BY b.source""".stripMargin,

    "txt_ngram_freq" ->
      s"""SELECT ngram, COUNT(*) AS n
         |FROM (SELECT unnest($shSql) AS ngram FROM documents
         |      WHERE len($tokSql) >= 2)
         |GROUP BY ngram HAVING COUNT(*) >= 10
         |ORDER BY n DESC, ngram""".stripMargin,

    "txt_lm_score" ->
      s"""WITH bigs AS (
         |  SELECT doc_id, unnest($shSql) AS bg
         |  FROM documents WHERE len($tokSql) >= 2),
         |bigN AS (SELECT bg, COUNT(*) AS cbg FROM bigs GROUP BY bg),
         |toks AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |uniN AS (SELECT t, COUNT(*) AS cuni FROM toks GROUP BY t),
         |v AS (SELECT COUNT(*) AS vocab FROM uniN)
         |SELECT doc_id,
         |  ROUND(AVG(ln((cbg + 1) / CAST(cuni + vocab AS DOUBLE))), 6) AS lm_score
         |FROM bigs
         |JOIN bigN USING (bg)
         |JOIN uniN ON uniN.t = string_split(bg, ' ')[1]
         |CROSS JOIN v
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // CMS replay: same row-salted md5-residue universal hashes, same
    // cells, same collisions — the estimate is deterministic in both
    // engines.
    "q_cms_freq" ->
      s"""WITH tk AS (SELECT unnest($tokSql) AS tkn FROM documents),
         |hx AS (SELECT tkn, r, a, b,
         |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '#' || tkn), 1, 15))::BIGINT % ${Dedup.minhashP} AS xm
         |  FROM tk CROSS JOIN (VALUES ${slotConstsSql(3)}) AS s(r, a, b)),
         |cells AS (SELECT r, (a * xm + b) % ${Dedup.minhashP} % 128 AS c,
         |    COUNT(*) AS cnt
         |  FROM hx
         |  GROUP BY r, (a * xm + b) % ${Dedup.minhashP} % 128),
         |pr AS (SELECT unnest([${(STOPWORDS :+ "zz_missing").map(t => s"'$t'").mkString(", ")}]) AS token),
         |ph AS (SELECT token, r, a, b,
         |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '#' || token), 1, 15))::BIGINT % ${Dedup.minhashP} AS xm
         |  FROM pr CROSS JOIN (VALUES ${slotConstsSql(3)}) AS s(r, a, b)),
         |pe AS (SELECT token, r, (a * xm + b) % ${Dedup.minhashP} % 128 AS c
         |  FROM ph)
         |SELECT token, MIN(COALESCE(cells.cnt, 0)) AS est
         |FROM pe LEFT JOIN cells ON cells.r = pe.r AND cells.c = pe.c
         |GROUP BY token ORDER BY token""".stripMargin,

    // Incremental replay: signatures are split-independent, so the oracle
    // bands ALL docs once and applies the corpus/shard split in the join
    // predicate — same collision set as probe-against-index.
    "dedup_incremental" ->
      s"""WITH ${lshBandsCte()}
         |SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS dup_of
         |FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk
         |WHERE x.doc_id % 10 >= 8 AND y.doc_id % 10 < 8
         |ORDER BY doc_id, dup_of""".stripMargin,

    // incremental-update replay: the snapshot delta + band probe in one
    // chain. The band CTEs instantiate once, so the two sides share one
    // relation with probe ids offset by 10^8 (sides stay disjoint at any
    // tier the gate runs); the probe join excludes the changed doc's own
    // superseded index entry.
    "pipeline_incremental_update" ->
      s"""WITH bmod AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 10 < 8 AND doc_id % 9 = 4 THEN text || ' updated'
         |         ELSE text END AS text
         |  FROM documents),
         |delta AS (
         |  SELECT b.doc_id,
         |    CASE WHEN a.doc_id IS NULL THEN 'added'
         |         WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
         |         ELSE 'changed' END AS status
         |  FROM bmod b
         |  LEFT JOIN (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8) a
         |    ON a.doc_id = b.doc_id),
         |udocs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8
         |  UNION ALL
         |  SELECT b.doc_id + 100000000 AS doc_id, b.text
         |  FROM bmod b JOIN delta USING (doc_id)
         |  WHERE delta.status IN ('added', 'changed')),
         |${lshBandsCte("udocs")},
         |dups AS (
         |  SELECT x.doc_id - 100000000 AS doc_id, COUNT(DISTINCT y.doc_id) AS n_dups
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk
         |  WHERE x.doc_id >= 100000000 AND y.doc_id < 100000000
         |    AND y.doc_id <> x.doc_id - 100000000
         |  GROUP BY x.doc_id)
         |SELECT d.doc_id, d.status,
         |  COALESCE(n_dups, 0) AS n_dups,
         |  COALESCE(n_dups, 0) = 0 AS accepted
         |FROM delta d LEFT JOIN dups USING (doc_id)
         |WHERE d.status IN ('added', 'changed')
         |ORDER BY d.doc_id""".stripMargin,

    // TF-IDF replay: same bigram terms, fractional df prune (df <= floor(0.1*N)),
    // ranks computed over the ROUNDED score grid in both engines.
    "sim_tfidf_topk" ->
      s"""WITH ex AS (
         |  SELECT doc_id, unnest($shSql) AS t
         |  FROM documents WHERE len($tokSql) >= 2),
         |tf AS (SELECT doc_id, t, COUNT(*) AS n FROM ex GROUP BY doc_id, t),
         |nn AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ex),
         |dfr AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t
         |        HAVING COUNT(*) <= (SELECT greatest(1, CAST(floor(0.1::DOUBLE * n_docs) AS BIGINT)) FROM nn)),
         |w AS (SELECT doc_id, t,
         |        CAST(n AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS w
         |      FROM tf JOIN dfr USING (t) CROSS JOIN nn),
         |nrm AS (SELECT doc_id, sqrt(SUM(w*w)) AS nrm FROM w GROUP BY doc_id
         |        HAVING sqrt(SUM(w*w)) > 0),
         |dt AS (SELECT a.doc_id AS ai, b.doc_id AS bi, SUM(a.w*b.w) AS dot
         |       FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
         |       GROUP BY a.doc_id, b.doc_id),
         |sim AS (SELECT ai, bi, ROUND(dot / (na.nrm * nb.nrm), 6) AS score
         |        FROM dt
         |        JOIN nrm na ON na.doc_id = ai
         |        JOIN nrm nb ON nb.doc_id = bi),
         |m AS (SELECT ai AS doc_id, bi AS id, score FROM sim
         |      UNION ALL SELECT bi, ai, score FROM sim)
         |SELECT doc_id, id, rank, score FROM (
         |  SELECT doc_id, id, score,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY score DESC, id) AS rank
         |  FROM m)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // split replay: same rolling-hash membership bands
    "txt_split" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
        |    list_transform(generate_series(1, 32),
        |      i -> CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) % 1000000 AS hk
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN hk < 900000 THEN 'train'
        |       WHEN hk < 950000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,

    // chunking replay: same n_chunks formula, 1-based list slices
    "txt_chunk" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |n AS (SELECT doc_id, tk,
         |    CASE WHEN len(tk) <= 32 THEN 1
         |         ELSE CAST(ceil((len(tk) - 32) / 24.0) AS BIGINT) + 1 END AS nc
         |  FROM t),
         |e AS (SELECT doc_id, tk, unnest(generate_series(0, nc - 1)) AS chunk_id FROM n),
         |c AS (SELECT doc_id, chunk_id,
         |    tk[chunk_id * 24 + 1 : least(chunk_id * 24 + 32, len(tk))] AS ck
         |  FROM e)
         |SELECT doc_id, chunk_id, CAST(len(ck) AS BIGINT) AS n_tokens,
         |  array_to_string(ck, ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // domain-cap replay: per-language quality ranking, ties to smaller id
    "txt_domain_cap" ->
      s"""WITH sc AS (SELECT lang, doc_id,
         |    round(CAST(len(list_filter($tokSql,
         |        t -> t IN ('the','a','of','to','and'))) AS DOUBLE)
         |      / greatest(len($tokSql), 1), 6) AS score
         |  FROM documents)
         |SELECT lang, doc_id, rank, score FROM (
         |  SELECT lang, doc_id, score,
         |         row_number() OVER (PARTITION BY lang
         |                            ORDER BY score DESC, doc_id) AS rank
         |  FROM sc)
         |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    // BM25 replay: same tokenization/df-prune as TF-IDF, the standard
    // saturation formula term by term (association order matched to the
    // Spark expression so the 6-dp rounded grid agrees)
    "sim_bm25_topk" ->
      s"""WITH ex AS (
         |  SELECT doc_id, unnest($shSql) AS t
         |  FROM documents WHERE len($tokSql) >= 2),
         |tf AS (SELECT doc_id, t, COUNT(*) AS n FROM ex GROUP BY doc_id, t),
         |lens AS (SELECT doc_id, SUM(n) AS len FROM tf GROUP BY doc_id),
         |stats AS (SELECT CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avglen FROM lens),
         |nn AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ex),
         |dfr AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t
         |        HAVING COUNT(*) <= (SELECT greatest(1, CAST(floor(0.1::DOUBLE * n_docs) AS BIGINT)) FROM nn)),
         |qt AS (SELECT DISTINCT doc_id AS qid, t FROM ex WHERE doc_id % 25 = 0),
         |sc AS (
         |  SELECT qid, tf.doc_id AS id,
         |    SUM(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
         |        * (n * 2.2)
         |        / (n + 1.2 * (0.25 + 0.75 * len / avglen))) AS s
         |  FROM qt JOIN dfr USING (t) JOIN tf USING (t)
         |  JOIN lens ON lens.doc_id = tf.doc_id
         |  CROSS JOIN stats CROSS JOIN nn
         |  WHERE tf.doc_id <> qid
         |  GROUP BY qid, tf.doc_id),
         |r AS (SELECT qid AS doc_id, id, ROUND(s, 6) AS score FROM sc)
         |SELECT doc_id, id, rank, score FROM (
         |  SELECT doc_id, id, score,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY score DESC, id) AS rank
         |  FROM r)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // hybrid-RRF replay: the two legs re-derive from the SAME shared
    // CTEs (one tokenization, one df-prune), each ranked top-5 on its
    // 6-dp-rounded score (ties to smaller id), fused by 1/(60+rank)
    // sums rounded at 6 dp, re-ranked top-3 with the same tie-break
    "sim_hybrid_rrf" ->
      s"""WITH ex AS (
         |  SELECT doc_id, unnest($shSql) AS t
         |  FROM documents WHERE len($tokSql) >= 2),
         |tf AS (SELECT doc_id, t, COUNT(*) AS n FROM ex GROUP BY doc_id, t),
         |nn AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ex),
         |dfr AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t
         |        HAVING COUNT(*) <= (SELECT greatest(1, CAST(floor(0.1::DOUBLE * n_docs) AS BIGINT)) FROM nn)),
         |w AS (SELECT doc_id, t,
         |        CAST(n AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS w
         |      FROM tf JOIN dfr USING (t) CROSS JOIN nn),
         |nrm AS (SELECT doc_id, sqrt(SUM(w*w)) AS nrm FROM w GROUP BY doc_id
         |        HAVING sqrt(SUM(w*w)) > 0),
         |dq AS (SELECT a.doc_id AS qid, b.doc_id AS id, SUM(a.w * b.w) AS dot
         |       FROM w a JOIN w b ON a.t = b.t AND b.doc_id <> a.doc_id
         |       WHERE a.doc_id % 25 = 0
         |       GROUP BY a.doc_id, b.doc_id),
         |ds AS (SELECT qid, id, ROUND(dot / (nq.nrm * nd.nrm), 6) AS score
         |       FROM dq JOIN nrm nq ON nq.doc_id = qid
         |       JOIN nrm nd ON nd.doc_id = id),
         |dr AS (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
         |       FROM ds),
         |lens AS (SELECT doc_id, SUM(n) AS len FROM tf GROUP BY doc_id),
         |stats AS (SELECT CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avglen FROM lens),
         |qt AS (SELECT DISTINCT doc_id AS qid, t FROM ex WHERE doc_id % 25 = 0),
         |sc AS (
         |  SELECT qid, tf.doc_id AS id,
         |    SUM(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
         |        * (n * 2.2)
         |        / (n + 1.2 * (0.25 + 0.75 * len / avglen))) AS s
         |  FROM qt JOIN dfr USING (t) JOIN tf USING (t)
         |  JOIN lens ON lens.doc_id = tf.doc_id
         |  CROSS JOIN stats CROSS JOIN nn
         |  WHERE tf.doc_id <> qid
         |  GROUP BY qid, tf.doc_id),
         |lr AS (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY ROUND(s, 6) DESC, id) AS rank
         |       FROM sc),
         |u AS (SELECT qid, id, 1.0 / (60 + rank) AS rr FROM dr WHERE rank <= 5
         |      UNION ALL
         |      SELECT qid, id, 1.0 / (60 + rank) AS rr FROM lr WHERE rank <= 5),
         |f AS (SELECT qid, id, ROUND(SUM(rr), 6) AS score FROM u GROUP BY qid, id)
         |SELECT doc_id, id, rank, score FROM (
         |  SELECT qid AS doc_id, id, score,
         |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
         |  FROM f)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // NB replay: training is pure counting, so the oracle re-derives the
    // model from the same tokenization and replays ln-prior + token-mass
    // scoring; argmax tie-break = score DESC, class ASC in both engines.
    "txt_nb_classify" ->
      s"""WITH ex AS (
         |  SELECT doc_id, source AS c, unnest($tokSql) AS t FROM documents),
         |dt AS (SELECT doc_id, t, COUNT(*) AS n FROM ex GROUP BY doc_id, t),
         |tc AS (SELECT c, t, COUNT(*) AS cnt FROM ex GROUP BY c, t),
         |v AS (SELECT COUNT(DISTINCT t) AS vocab FROM tc),
         |ct AS (SELECT c, SUM(cnt) AS totc FROM tc GROUP BY c),
         |cd AS (SELECT source AS c, COUNT(*) AS ndocs FROM documents GROUP BY source),
         |cs AS (SELECT c, CAST(ndocs AS DOUBLE) /
         |         CAST((SELECT SUM(ndocs) FROM cd) AS DOUBLE) AS prior, totc
         |       FROM cd JOIN ct USING (c)),
         |dn AS (SELECT doc_id, SUM(n) AS nd FROM dt GROUP BY doc_id),
         |ms AS (SELECT dt.doc_id, tc.c,
         |         SUM(CAST(dt.n AS DOUBLE) * ln(CAST(tc.cnt AS DOUBLE) + 1)) AS m
         |       FROM dt JOIN tc USING (t) GROUP BY dt.doc_id, tc.c),
         |sc AS (SELECT dn.doc_id, cs.c,
         |         ln(cs.prior)
         |           - CAST(dn.nd AS DOUBLE) * ln(CAST(cs.totc + v.vocab AS DOUBLE))
         |           + COALESCE(ms.m, 0) AS score
         |       FROM dn CROSS JOIN cs CROSS JOIN v
         |       LEFT JOIN ms ON ms.doc_id = dn.doc_id AND ms.c = cs.c)
         |SELECT doc_id, c AS pred, ROUND(score, 6) AS score
         |FROM (SELECT doc_id, c, score,
         |        row_number() OVER (PARTITION BY doc_id
         |                           ORDER BY score DESC, c) AS rn
         |      FROM sc)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "txt_entropy" ->
      s"""WITH ch AS (
         |  SELECT doc_id, c, COUNT(*) AS n
         |  FROM (SELECT doc_id, substr(text, i, 1) AS c
         |        FROM (SELECT doc_id, text,
         |                unnest(generate_series(1, len(text))) AS i
         |              FROM documents))
         |  GROUP BY doc_id, c),
         |tot AS (SELECT doc_id, SUM(n) AS len FROM ch GROUP BY doc_id)
         |SELECT doc_id,
         |  ROUND(-SUM((n / CAST(len AS DOUBLE)) * ln(n / CAST(len AS DOUBLE))), 6)
         |    AS entropy
         |FROM ch JOIN tot USING (doc_id)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "txt_repetition" ->
      s"""WITH tw AS (
         |  SELECT doc_id, t, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest($tokSql) AS t FROM documents)
         |  GROUP BY doc_id, t)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         |  ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS distinct_frac,
         |  ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_tok_frac
         |FROM tw GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Gopher-rules replay: identical integer counts, identical single
    // divisions, same thresholds
    "txt_gopher_flags" ->
      s"""WITH tw AS (
         |  SELECT doc_id, t, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest($tokSql) AS t FROM documents)
         |  GROUP BY doc_id, t),
         |rep AS (SELECT doc_id, MAX(c) / CAST(SUM(c) AS DOUBLE) AS ttf
         |  FROM tw GROUP BY doc_id),
         |m AS (SELECT doc_id,
         |    CAST(len($tokSql) AS BIGINT) AS n_tok,
         |    CAST(len(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / len($tokSql) AS mwl,
         |    len(list_intersect($tokSql, ['the','a','of','to','and'])) AS nsk,
         |    CAST(len(text) - len(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE)
         |      / len($tokSql) AS symr
         |  FROM documents)
         |SELECT m.doc_id, n_tok,
         |  n_tok >= 50 AND n_tok <= 100000 AS ok_len,
         |  mwl >= 3.0 AND mwl <= 10.0 AS ok_word_len,
         |  nsk >= 2 AS ok_stopwords,
         |  ttf <= 0.2 AS ok_repetition,
         |  symr <= 0.1 AS ok_symbols,
         |  (n_tok >= 50 AND n_tok <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
         |    AND nsk >= 2 AND ttf <= 0.2 AND symr <= 0.1 AS pass
         |FROM m JOIN rep ON m.doc_id = rep.doc_id
         |ORDER BY m.doc_id""".stripMargin,

    // line-rules replay: identical deterministic multi-line rendering
    // (8-token lines, the same hash-keyed decorations), identical
    // integer counts and single divisions, same Gopher thresholds
    "txt_gopher_line_flags" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |r AS (SELECT doc_id,
         |    list_transform(generate_series(0,
         |        CAST(ceil(len(tk) / 8.0) AS BIGINT) - 1),
         |      li -> array_to_string(
         |        tk[li * 8 + 1 : least(li * 8 + 8, len(tk))], ' ')) AS raw
         |  FROM t),
         |l AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(0, len(raw) - 1), li ->
         |      (CASE WHEN (doc_id * 31 + li) % 4 = 0 THEN '- ' ELSE '' END)
         |      || (CASE WHEN (doc_id * 13 + li) % 6 = 0 THEN raw[1]
         |              ELSE raw[li + 1] END)
         |      || (CASE WHEN (doc_id * 7 + li) % 5 = 1 THEN '...' ELSE '' END)
         |    )) AS line
         |  FROM r),
         |g AS (SELECT doc_id, line, COUNT(*) AS cnt
         |  FROM l GROUP BY doc_id, line),
         |f AS (SELECT doc_id,
         |    CAST(SUM(cnt) AS BIGINT) AS n_lines,
         |    CAST(COUNT(*) AS BIGINT) AS dn,
         |    CAST(SUM(cnt * len(line)) AS BIGINT) AS ca,
         |    CAST(SUM(len(line)) AS BIGINT) AS cd,
         |    CAST(SUM(CASE WHEN starts_with(line, '- ') THEN cnt ELSE 0 END)
         |      AS BIGINT) AS bn,
         |    CAST(SUM(CASE WHEN ends_with(line, '...') THEN cnt ELSE 0 END)
         |      AS BIGINT) AS en
         |  FROM g GROUP BY doc_id)
         |SELECT doc_id, n_lines,
         |  CAST(bn AS DOUBLE) / n_lines <= 0.9 AS ok_bullet,
         |  CAST(en AS DOUBLE) / n_lines <= 0.3 AS ok_ellipsis,
         |  CAST(n_lines - dn AS DOUBLE) / n_lines <= 0.3 AS ok_dup_line,
         |  CAST(ca - cd AS DOUBLE) / ca <= 0.2 AS ok_dup_char,
         |  CAST(bn AS DOUBLE) / n_lines <= 0.9
         |    AND CAST(en AS DOUBLE) / n_lines <= 0.3
         |    AND CAST(n_lines - dn AS DOUBLE) / n_lines <= 0.3
         |    AND CAST(ca - cd AS DOUBLE) / ca <= 0.2 AS pass
         |FROM f ORDER BY doc_id""".stripMargin,

    "txt_contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct($shSql)) AS ng FROM documents),
         |ev AS (SELECT DISTINCT ng FROM sh WHERE doc_id < 20)
         |SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
         |FROM sh JOIN ev USING (ng)
         |WHERE doc_id >= 20
         |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin,

    "txt_dsir_weights" ->
      s"""WITH $dsirWeightsCte
         |SELECT doc_id, logw FROM w ORDER BY doc_id""".stripMargin,

    "txt_dsir_sample" ->
      s"""WITH $dsirWeightsCte
         |SELECT doc_id, logw,
         |  round(logw - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |    % 1000000 + 0.5) / 1000000)), 6) AS key
         |FROM w ORDER BY key DESC, doc_id LIMIT 50""".stripMargin,

    "txt_pack" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, source, doc_id % 8 AS shard,
         |         CAST(len($tokSql) AS BIGINT) AS n_tok,
         |         ROW_NUMBER() OVER (PARTITION BY source, doc_id % 8
         |                            ORDER BY doc_id) AS rn
         |  FROM documents),
         |p(doc_id, source, shard, n_tok, rn, pack_id, fill) AS (
         |  SELECT doc_id, source, shard, n_tok, rn, CAST(0 AS BIGINT), n_tok
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.doc_id, d.source, d.shard, d.n_tok, d.rn,
         |         CASE WHEN p.fill + d.n_tok > 512 THEN p.pack_id + 1
         |              ELSE p.pack_id END,
         |         CASE WHEN p.fill + d.n_tok > 512 THEN d.n_tok
         |              ELSE p.fill + d.n_tok END
         |  FROM p JOIN d ON d.source = p.source AND d.shard = p.shard
         |              AND d.rn = p.rn + 1)
         |SELECT doc_id, source, shard, n_tok, pack_id
         |FROM p ORDER BY doc_id""".stripMargin,

    "txt_training_mix" ->
      s"""WITH q AS (SELECT * FROM documents
         |  WHERE len($tokSql) >= 20
         |    AND CAST(len(list_filter($tokSql,
         |      t -> t IN ('the','a','of','to','and'))) AS DOUBLE) / len($tokSql) >= 0.05),
         |k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         |kd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
         |h AS (SELECT *,
         |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
         |    list_transform(generate_series(1, 32),
         |      i -> CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) AS BIGINT))),
         |    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) % 1000 AS hk
         |  FROM kd),
         |s AS (SELECT * FROM h
         |  WHERE hk < CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 250 ELSE 100 END)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))) AS BIGINT)
         |    AS n_tokens
         |FROM s GROUP BY source ORDER BY source""".stripMargin,

    "txt_stratified_sample" ->
      """WITH h AS (SELECT doc_id, source,
        |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
        |    list_transform(generate_series(1, 32),
        |      i -> CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) % 1000 AS k
        |  FROM documents)
        |SELECT doc_id, source FROM h
        |WHERE k < CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 250 ELSE 100 END
        |ORDER BY doc_id""".stripMargin,

    // temperature-mix replay: per-language quota from c^0.5 weights
    // (rounded at 6 dp, summed as DECIMAL so the total is exact in both
    // engines), then the same per-million rolling-hash membership split
    "txt_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS cl FROM documents GROUP BY lang),
        |s AS (SELECT SUM(CAST(round(sqrt(CAST(cl AS DOUBLE)), 6) AS DECIMAL(20,6))) AS sw,
        |         SUM(cl) AS tot FROM c),
        |thr AS (SELECT lang,
        |    CAST(floor(least(cl,
        |      CAST(floor(CAST(tot // 2 AS DOUBLE) * round(sqrt(CAST(cl AS DOUBLE)), 6)
        |        / CAST(sw AS DOUBLE)) AS BIGINT)) * 1000000.0 / cl) AS BIGINT) AS th
        |  FROM c CROSS JOIN s),
        |h AS (SELECT doc_id, lang,
        |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
        |    list_transform(generate_series(1, 32),
        |      i -> CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) % 1000000 AS hk
        |  FROM documents)
        |SELECT doc_id, lang FROM h JOIN thr USING (lang)
        |WHERE hk < th ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, COUNT(*) AS n, MIN(doc_id) AS keep
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "dedup_keep" ->
      """SELECT MIN(doc_id) AS doc_id FROM documents
        |GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      s"""SELECT doc_id,
         |  round(CAST(len(list_filter($tokSql,
         |      t -> t IN ('the','a','of','to','and'))) AS DOUBLE) / len($tokSql), 6) AS stop_ratio,
         |  round(CAST(len(text) - len(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE)
         |      / greatest(len(text), 1), 6) AS punct_ratio,
         |  round(CAST(len(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / len($tokSql), 6) AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_minhash_sig" ->
      s"""WITH ${minhashSigCte(4)}
         |SELECT doc_id, CAST(k AS BIGINT) AS slot, mh
         |FROM sig ORDER BY doc_id, slot""".stripMargin,

    "dedup_lsh_pairs" ->
      s"""WITH ${lshBandsCte()}
         |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id
         |ORDER BY a, b""".stripMargin,

    // source-overlap replay: banded candidates + two provenance joins,
    // unordered-pair normalization via least/greatest
    "txt_source_overlap" ->
      s"""WITH ${lshBandsCte()},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |sp AS (SELECT least(da.source, db.source) AS source_x,
         |              greatest(da.source, db.source) AS source_y
         |       FROM prs
         |       JOIN documents da ON da.doc_id = prs.a
         |       JOIN documents db ON db.doc_id = prs.b)
         |SELECT source_x, source_y, COUNT(*) AS n_pairs
         |FROM sp GROUP BY source_x, source_y
         |ORDER BY source_x, source_y""".stripMargin,

    // cluster-split replay: the dedup_clusters CC chain + the txt_split
    // rolling-hash bands keyed on the CLUSTER label
    "txt_cluster_split" ->
      s"""WITH RECURSIVE ${lshBandsCte()},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |lab AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
         |h AS (SELECT doc_id, cluster,
         |  CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
         |    list_transform(generate_series(1, 32),
         |      i -> CAST(ascii(substr(md5(CAST(cluster AS VARCHAR)), i, 1)) AS BIGINT))),
         |    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) % 1000000 AS hk
         |  FROM lab)
         |SELECT doc_id, cluster,
         |  CASE WHEN hk < 900000 THEN 'train'
         |       WHEN hk < 950000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE ${lshBandsCte()},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id)
         |SELECT id AS doc_id, MIN(r) AS cluster FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    // cluster-size histogram replay: the dedup_clusters CC chain + two
    // rollups
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE ${lshBandsCte()},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |lab AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
         |cs AS (SELECT cluster, COUNT(*) AS sz FROM lab GROUP BY cluster)
         |SELECT sz, COUNT(*) AS n_clusters FROM cs
         |GROUP BY sz ORDER BY sz""".stripMargin,

    // normalization replay: identical decoration, identical rule chain
    "txt_normalize" ->
      """WITH r AS (SELECT doc_id,
        |    '  Doc' || doc_id || '  HEADER' || chr(9) || ' '
        |      || upper(substr(text, 1, 10)) || substr(text, 11) AS raw
        |  FROM documents),
        |n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(raw), '[0-9]', '0', 'g'),
        |      '\s+', ' ', 'g')) AS nt
        |  FROM r)
        |SELECT doc_id, md5(nt) AS digest, CAST(len(nt) AS BIGINT) AS n_chars
        |FROM n ORDER BY doc_id""".stripMargin,

    // WET replay: identical page construction, the same RE2 strip chain
    // (DuckDB needs the explicit 'g' flag — it replaces first-match-only
    // by default), and the title from DIRECT construction so the Spark
    // extractor is checked against ground truth
    "txt_html_extract" ->
      """WITH h AS (SELECT doc_id, source || ' #' || doc_id AS title,
        |    '<html><head><title>' || source || ' #' || doc_id ||
        |    '</title><style>p{margin:0} .x>y{}</style>' ||
        |    '<script>var q="<p>not text</p>";</script></head><body><h1>Doc ' ||
        |    doc_id || '</h1><!-- crawl id=' || doc_id ||
        |    ' --><p>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&nbsp;end</p><div><p>' ||
        |    substr(replace(text, '&', '&amp;'), 1, 60) || '</p><p>' ||
        |    substr(replace(text, '&', '&amp;'), 61) ||
        |    '</p></div></body></html>' AS html
        |  FROM documents),
        |e AS (SELECT doc_id, title,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |          html,
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |        '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS txt
        |  FROM h)
        |SELECT doc_id, title, md5(txt) AS digest,
        |  CAST(len(txt) AS BIGINT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin,

    // keyword replay: same unigram weights, ranked on the 6-dp grid with
    // term tie-break
    "txt_keywords" ->
      s"""WITH ex AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |tf AS (SELECT doc_id, t, COUNT(*) AS n FROM ex GROUP BY doc_id, t),
         |nn AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ex),
         |dfr AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t
         |        HAVING COUNT(*) <= (SELECT greatest(1, CAST(floor(0.75::DOUBLE * n_docs) AS BIGINT)) FROM nn)),
         |w AS (SELECT doc_id, t,
         |        round(CAST(n AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS w
         |      FROM tf JOIN dfr USING (t) CROSS JOIN nn),
         |r AS (SELECT doc_id, t, w,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, t) AS rank
         |      FROM w)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, t AS term, w
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // perplexity replay: same bigram counts, add-one smoothing, mean
    // nll rounded at 6 dp, tercile thresholds via type-7 quantiles (the
    // same (n-1)p linear interpolation Spark's exact percentile uses)
    "txt_perplexity" ->
      s"""WITH ex AS (
         |  SELECT doc_id, unnest($shSql) AS t
         |  FROM documents WHERE len($tokSql) >= 2),
         |c2 AS (SELECT t, COUNT(*) AS n2 FROM ex GROUP BY t),
         |c1 AS (SELECT split_part(t, ' ', 1) AS p, COUNT(*) AS n1
         |       FROM ex GROUP BY 1),
         |vv AS (SELECT COUNT(*) AS v FROM c1),
         |sc AS (SELECT doc_id, -ln((n2 + 1.0) / (n1 + v)) AS nll
         |       FROM ex JOIN c2 USING (t)
         |       JOIN c1 ON c1.p = split_part(ex.t, ' ', 1)
         |       CROSS JOIN vv),
         |e AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |        ROUND(SUM(nll) / COUNT(*), 6) AS entropy
         |      FROM sc GROUP BY doc_id),
         |thr AS (SELECT quantile_cont(entropy, 1.0/3) AS t1,
         |               quantile_cont(entropy, 2.0/3) AS t2 FROM e)
         |SELECT doc_id, n_bigrams, entropy,
         |  CASE WHEN entropy <= t1 THEN 'head'
         |       WHEN entropy <= t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM e CROSS JOIN thr ORDER BY doc_id""".stripMargin,

    // the perplexity chain (bucket per doc) feeding the recursive pack
    // replay keyed on the bucket instead of the source
    "txt_curriculum" ->
      s"""WITH RECURSIVE ex AS (
         |  SELECT doc_id, unnest($shSql) AS t
         |  FROM documents WHERE len($tokSql) >= 2),
         |c2 AS (SELECT t, COUNT(*) AS n2 FROM ex GROUP BY t),
         |c1 AS (SELECT split_part(t, ' ', 1) AS p, COUNT(*) AS n1
         |       FROM ex GROUP BY 1),
         |vv AS (SELECT COUNT(*) AS v FROM c1),
         |sc AS (SELECT doc_id, -ln((n2 + 1.0) / (n1 + v)) AS nll
         |       FROM ex JOIN c2 USING (t)
         |       JOIN c1 ON c1.p = split_part(ex.t, ' ', 1)
         |       CROSS JOIN vv),
         |e AS (SELECT doc_id, ROUND(SUM(nll) / COUNT(*), 6) AS entropy
         |      FROM sc GROUP BY doc_id),
         |thr AS (SELECT quantile_cont(entropy, 1.0/3) AS t1,
         |               quantile_cont(entropy, 2.0/3) AS t2 FROM e),
         |b AS (SELECT doc_id,
         |  CASE WHEN entropy <= t1 THEN 'head'
         |       WHEN entropy <= t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |  FROM e CROSS JOIN thr),
         |d AS (
         |  SELECT b.doc_id, bucket, b.doc_id % 8 AS shard,
         |         CAST(len($tokSql) AS BIGINT) AS n_tok,
         |         ROW_NUMBER() OVER (PARTITION BY bucket, b.doc_id % 8
         |                            ORDER BY b.doc_id) AS rn
         |  FROM b JOIN documents USING (doc_id)),
         |p(doc_id, bucket, shard, n_tok, rn, pack_id, fill) AS (
         |  SELECT doc_id, bucket, shard, n_tok, rn, CAST(0 AS BIGINT), n_tok
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.doc_id, d.bucket, d.shard, d.n_tok, d.rn,
         |         CASE WHEN p.fill + d.n_tok > 512 THEN p.pack_id + 1
         |              ELSE p.pack_id END,
         |         CASE WHEN p.fill + d.n_tok > 512 THEN d.n_tok
         |              ELSE p.fill + d.n_tok END
         |  FROM p JOIN d ON d.bucket = p.bucket AND d.shard = p.shard
         |              AND d.rn = p.rn + 1)
         |SELECT doc_id, bucket, shard, n_tok, pack_id,
         |  CASE bucket WHEN 'head' THEN CAST(0 AS BIGINT)
         |       WHEN 'middle' THEN 1 ELSE 2 END AS stage
         |FROM p ORDER BY doc_id""".stripMargin,

    // decontamination replay: distinct 4-gram sets per side, one gram
    // equi-join, per-training-doc witness min + hit count
    "txt_decontaminate" -> decontaminateSql,

    // the bloom variant must produce BIT-IDENTICAL output (bloom is a
    // no-false-negative pre-filter; false positives die in the exact
    // join), so it shares the one oracle string
    "txt_decontaminate_bloom" -> decontaminateSql,



    // data-card replay: the same recursive-CTE CC verdict feeding a
    // GROUPING SETS rollup with exact integer/decimal sums
    "txt_corpus_report" ->
      s"""WITH RECURSIVE ${lshBandsCte()},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |lab AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
         |base AS (
         |  SELECT d.doc_id, source, lang,
         |    CAST(len($tokSql) AS BIGINT) AS nt,
         |    round(CAST(len(list_filter($tokSql,
         |        t -> t IN ('the','a','of','to','and'))) AS DOUBLE)
         |      / len($tokSql), 6) AS sr,
         |    CASE WHEN lab.cluster <> d.doc_id THEN 1 ELSE 0 END AS dup
         |  FROM documents d JOIN lab ON lab.doc_id = d.doc_id)
         |SELECT source, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CAST(sr AS DECIMAL(38,6))) AS DOUBLE) AS stop_mass,
         |  CAST(SUM(dup) AS BIGINT) AS n_neardup
         |FROM base
         |GROUP BY GROUPING SETS ((source, lang), (source), ())
         |ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin,

    // best-quality keeper replay: same recursive-CTE CC labels, keeper
    // per cluster by quality DESC then doc_id ASC
    "dedup_cluster_keep_best" ->
      s"""WITH RECURSIVE ${lshBandsCte()},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |lab AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
         |q AS (SELECT doc_id,
         |    round(CAST(len(list_filter($tokSql,
         |        t -> t IN ('the','a','of','to','and'))) AS DOUBLE)
         |      / len($tokSql), 6) AS q
         |  FROM documents)
         |SELECT doc_id, q AS quality FROM (
         |  SELECT lab.doc_id, q.q,
         |    row_number() OVER (PARTITION BY cluster ORDER BY q.q DESC, lab.doc_id) AS rk
         |  FROM lab JOIN q ON lab.doc_id = q.doc_id)
         |WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "dedup_cluster_keep" ->
      s"""WITH RECURSIVE ${lshBandsCte()},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id)
         |SELECT id AS doc_id FROM reach
         |GROUP BY id HAVING id = MIN(r) ORDER BY doc_id""".stripMargin,

    // full pipeline replay: exact dedup -> LSH bands over survivors ->
    // recursive-CTE connected components -> cluster reps -> substring-span
    // cut -> quality gate -> PII-redacted digest
    "pipeline_clean_corpus" ->
      s"""WITH RECURSIVE
         |ex AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |d1 AS (SELECT dd.doc_id, dd.text FROM documents dd JOIN ex USING (doc_id)),
         |${lshBandsCte("d1")},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM d1
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |reps AS (SELECT id FROM reach GROUP BY id HAVING id = MIN(r)),
         |d2 AS (SELECT d1.doc_id, d1.text FROM d1 JOIN reps ON d1.doc_id = reps.id),
         |t AS (SELECT doc_id, $tokSql AS tk FROM d2),
         |w0 AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS p
         |  FROM t),
         |w AS (
         |  SELECT doc_id, p,
         |    md5(tk[p] || ' ' || tk[p+1] || ' ' || tk[p+2] || ' ' || tk[p+3] || ' ' || tk[p+4]) AS wh
         |  FROM w0),
         |dw AS (SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM w) GROUP BY wh HAVING COUNT(*) > 1),
         |ps AS (SELECT doc_id, list(p) AS ps FROM w JOIN dw USING (wh) GROUP BY doc_id),
         |c AS (
         |  SELECT t.doc_id, t.tk, COALESCE(ps.ps, CAST([] AS BIGINT[])) AS ps
         |  FROM t LEFT JOIN ps ON t.doc_id = ps.doc_id),
         |k AS (
         |  SELECT doc_id,
         |    list_filter(tk, (x, i) -> len(list_filter(ps, q -> q <= i AND i < q + 5)) = 0) AS kept,
         |    CAST(len(tk) AS BIGINT) AS n_tokens
         |  FROM c),
         |q AS (
         |  SELECT doc_id,
         |    COALESCE(array_to_string(kept, ' '), '') AS clean_text,
         |    CAST(len(kept) AS BIGINT) AS n_tokens_out,
         |    n_tokens - CAST(len(kept) AS BIGINT) AS n_cut,
         |    round(CAST(len(list_filter(kept, s -> s IN ('the','a','of','to','and'))) AS DOUBLE)
         |        / greatest(len(kept), 1), 6) AS stop_ratio
         |  FROM k)
         |SELECT doc_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(clean_text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         |    '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) AS clean_digest,
         |  n_tokens_out, n_cut, stop_ratio
         |FROM q
         |WHERE n_tokens_out >= 20 AND stop_ratio >= 0.02 AND stop_ratio <= 0.2
         |ORDER BY doc_id""".stripMargin,

    // pipeline_clean_corpus with the CCNet paragraph-dedup pre-stage:
    // the dedup_paragraphs CTE chain (p-prefixed) produces the cleaned
    // relation `pd`, which replaces `documents` as the pipeline's base;
    // everything downstream is the pipeline_clean_corpus oracle verbatim
    "pipeline_clean_corpus_pd" ->
      s"""WITH RECURSIVE
         |pt AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |praw AS (
         |  SELECT doc_id,
         |    list_transform(
         |      generate_series(0, CAST(ceil(len(tk) / 8.0) AS INT) - 1),
         |      li -> array_to_string(tk[li*8+1 : li*8+8], ' ')) AS r
         |  FROM pt),
         |prendered AS (
         |  SELECT doc_id,
         |    list_transform(r, (x, li) -> CASE
         |      WHEN (doc_id * 17 + (li - 1)) % 11 = 0
         |        THEN 'the shared boilerplate paragraph'
         |      WHEN (doc_id * 13 + (li - 1)) % 7 = 3 THEN r[1]
         |      ELSE x END) AS paras
         |  FROM praw),
         |pocc0 AS (
         |  SELECT doc_id, paras,
         |    unnest(generate_series(1, len(paras))) AS li
         |  FROM prendered),
         |pocc AS (SELECT doc_id, li - 1 AS pos, md5(paras[li]) AS ph FROM pocc0),
         |pdups AS (SELECT ph FROM pocc GROUP BY ph HAVING COUNT(*) > 1),
         |pranked AS (
         |  SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY ph ORDER BY doc_id, pos) AS rk
         |  FROM pocc JOIN pdups USING (ph)),
         |pdrops AS (SELECT doc_id, list(pos) AS dp FROM pranked WHERE rk > 1 GROUP BY doc_id),
         |pd AS (
         |  SELECT r.doc_id,
         |    COALESCE(array_to_string(list_filter(r.paras, (x, i) ->
         |      NOT list_contains(COALESCE(dr.dp, CAST([] AS BIGINT[])), i - 1)),
         |      chr(10)), '') AS text,
         |    CAST(len(r.paras) - len(list_filter(r.paras, (x, i) ->
         |      NOT list_contains(COALESCE(dr.dp, CAST([] AS BIGINT[])), i - 1))) AS BIGINT)
         |      AS n_paras_cut
         |  FROM prendered r LEFT JOIN pdrops dr ON r.doc_id = dr.doc_id),
         |ex AS (SELECT MIN(doc_id) AS doc_id FROM pd GROUP BY md5(text)),
         |d1 AS (SELECT dd.doc_id, dd.text FROM pd dd JOIN ex USING (doc_id)),
         |${lshBandsCte("d1")},
         |prs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |edges AS (SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM d1
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |reps AS (SELECT id FROM reach GROUP BY id HAVING id = MIN(r)),
         |d2 AS (SELECT d1.doc_id, d1.text FROM d1 JOIN reps ON d1.doc_id = reps.id),
         |t AS (SELECT doc_id, $tokSql AS tk FROM d2),
         |w0 AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS p
         |  FROM t),
         |w AS (
         |  SELECT doc_id, p,
         |    md5(tk[p] || ' ' || tk[p+1] || ' ' || tk[p+2] || ' ' || tk[p+3] || ' ' || tk[p+4]) AS wh
         |  FROM w0),
         |dw AS (SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM w) GROUP BY wh HAVING COUNT(*) > 1),
         |ps AS (SELECT doc_id, list(p) AS ps FROM w JOIN dw USING (wh) GROUP BY doc_id),
         |c AS (
         |  SELECT t.doc_id, t.tk, COALESCE(ps.ps, CAST([] AS BIGINT[])) AS ps
         |  FROM t LEFT JOIN ps ON t.doc_id = ps.doc_id),
         |k AS (
         |  SELECT doc_id,
         |    list_filter(tk, (x, i) -> len(list_filter(ps, q -> q <= i AND i < q + 5)) = 0) AS kept,
         |    CAST(len(tk) AS BIGINT) AS n_tokens
         |  FROM c),
         |q AS (
         |  SELECT doc_id,
         |    COALESCE(array_to_string(kept, ' '), '') AS clean_text,
         |    CAST(len(kept) AS BIGINT) AS n_tokens_out,
         |    n_tokens - CAST(len(kept) AS BIGINT) AS n_cut,
         |    round(CAST(len(list_filter(kept, s -> s IN ('the','a','of','to','and'))) AS DOUBLE)
         |        / greatest(len(kept), 1), 6) AS stop_ratio
         |  FROM k)
         |SELECT q.doc_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(clean_text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         |    '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) AS clean_digest,
         |  n_tokens_out, n_cut, pd.n_paras_cut, stop_ratio
         |FROM q JOIN pd ON q.doc_id = pd.doc_id
         |WHERE n_tokens_out >= 20 AND stop_ratio >= 0.02 AND stop_ratio <= 0.2
         |ORDER BY q.doc_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH ${simhashBandsCte(8)}
         |SELECT doc_id, $simhashHex AS simhash
         |FROM bds ORDER BY doc_id""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH ${simhashBandsCte(16)},
         |bands AS (
         |  SELECT doc_id, unnest([0,1,2,3]) AS band,
         |         unnest([b0,b1,b2,b3]) AS bv FROM bds),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv
         |       AND x.doc_id < y.doc_id)
         |SELECT a, b,
         |  CAST(${(0 until 4).map(b => s"bit_count(xor(x.b$b, y.b$b))").mkString(" + ")} AS BIGINT) AS hamming
         |FROM cand JOIN bds x ON x.doc_id = a JOIN bds y ON y.doc_id = b
         |WHERE ${(0 until 4).map(b => s"bit_count(xor(x.b$b, y.b$b))").mkString(" + ")} <= 3
         |ORDER BY a, b""".stripMargin,

    "dedup_substring" ->
      s"""WITH t AS (
         |  SELECT doc_id, $tokSql AS tk FROM documents WHERE len($tokSql) >= 5),
         |w AS (
         |  SELECT DISTINCT doc_id, md5(unnest(list_transform(generate_series(1, len(tk)-4),
         |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]))) AS wh
         |  FROM t),
         |d AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) > 1),
         |pd AS (SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY doc_id),
         |dd AS (SELECT w.doc_id, COUNT(*) AS n_dup FROM w JOIN d USING (wh) GROUP BY w.doc_id)
         |SELECT pd.doc_id, pd.n_windows, COALESCE(dd.n_dup, 0) AS n_dup,
         |  round(CAST(COALESCE(dd.n_dup, 0) AS DOUBLE) / pd.n_windows, 6) AS dup_ratio
         |FROM pd LEFT JOIN dd ON pd.doc_id = dd.doc_id ORDER BY pd.doc_id""".stripMargin,

    "dedup_substring_removed" ->
      s"""WITH t AS (
         |  SELECT doc_id, $tokSql AS tk FROM documents),
         |w0 AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS p
         |  FROM t),
         |w AS (
         |  SELECT doc_id, p,
         |    md5(tk[p] || ' ' || tk[p+1] || ' ' || tk[p+2] || ' ' || tk[p+3] || ' ' || tk[p+4]) AS wh
         |  FROM w0),
         |d AS (SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM w) GROUP BY wh HAVING COUNT(*) > 1),
         |ps AS (SELECT doc_id, list(p) AS ps FROM w JOIN d USING (wh) GROUP BY doc_id),
         |c AS (
         |  SELECT t.doc_id, t.tk, COALESCE(ps.ps, CAST([] AS BIGINT[])) AS ps
         |  FROM t LEFT JOIN ps ON t.doc_id = ps.doc_id),
         |k AS (
         |  SELECT doc_id, tk,
         |    list_filter(tk, (x, i) -> len(list_filter(ps, q -> q <= i AND i < q + 5)) = 0) AS kept
         |  FROM c)
         |SELECT doc_id, COALESCE(array_to_string(kept, ' '), '') AS clean_text,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(tk) - len(kept) AS BIGINT) AS n_cut
         |FROM k ORDER BY doc_id""".stripMargin,

    "dedup_substring_keep1" ->
      s"""WITH t AS (
         |  SELECT doc_id, $tokSql AS tk FROM documents),
         |w0 AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS p
         |  FROM t),
         |w AS (
         |  SELECT doc_id, p,
         |    md5(tk[p] || ' ' || tk[p+1] || ' ' || tk[p+2] || ' ' || tk[p+3] || ' ' || tk[p+4]) AS wh
         |  FROM w0),
         |d AS (SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM w) GROUP BY wh HAVING COUNT(*) > 1),
         |occ AS (
         |  SELECT doc_id, p, wh,
         |    row_number() OVER (PARTITION BY wh ORDER BY doc_id, p) AS rk
         |  FROM w JOIN d USING (wh)),
         |ps AS (SELECT doc_id, list(p) AS ps FROM occ WHERE rk > 1 GROUP BY doc_id),
         |c AS (
         |  SELECT t.doc_id, t.tk, COALESCE(ps.ps, CAST([] AS BIGINT[])) AS ps
         |  FROM t LEFT JOIN ps ON t.doc_id = ps.doc_id),
         |k AS (
         |  SELECT doc_id, tk,
         |    list_filter(tk, (x, i) -> len(list_filter(ps, q -> q <= i AND i < q + 5)) = 0) AS kept
         |  FROM c)
         |SELECT doc_id, COALESCE(array_to_string(kept, ' '), '') AS clean_text,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(tk) - len(kept) AS BIGINT) AS n_cut
         |FROM k ORDER BY doc_id""".stripMargin,

    // replays the query's deterministic multi-paragraph rendering (8-token
    // paragraphs; boilerplate / first-para repeats keyed on (doc_id, index)
    // hashes), then CCNet paragraph dedup: keep the smallest (doc_id, pos)
    // occurrence of every repeated paragraph, drop the rest, reassemble in
    // document order. DuckDB lambda indices are 1-based (Spark's are
    // 0-based) — hence the `li - 1` in every keyed condition.
    "dedup_paragraphs" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |raw AS (
         |  SELECT doc_id,
         |    list_transform(
         |      generate_series(0, CAST(ceil(len(tk) / 8.0) AS INT) - 1),
         |      li -> array_to_string(tk[li*8+1 : li*8+8], ' ')) AS r
         |  FROM t),
         |rendered AS (
         |  SELECT doc_id,
         |    list_transform(r, (x, li) -> CASE
         |      WHEN (doc_id * 17 + (li - 1)) % 11 = 0
         |        THEN 'the shared boilerplate paragraph'
         |      WHEN (doc_id * 13 + (li - 1)) % 7 = 3 THEN r[1]
         |      ELSE x END) AS paras
         |  FROM raw),
         |occ0 AS (
         |  SELECT doc_id, paras,
         |    unnest(generate_series(1, len(paras))) AS li
         |  FROM rendered),
         |occ AS (SELECT doc_id, li - 1 AS pos, md5(paras[li]) AS ph FROM occ0),
         |dups AS (SELECT ph FROM occ GROUP BY ph HAVING COUNT(*) > 1),
         |ranked AS (
         |  SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY ph ORDER BY doc_id, pos) AS rk
         |  FROM occ JOIN dups USING (ph)),
         |drops AS (SELECT doc_id, list(pos) AS dp FROM ranked WHERE rk > 1 GROUP BY doc_id),
         |fin AS (
         |  SELECT r.doc_id, len(r.paras) AS np,
         |    list_filter(r.paras, (x, i) ->
         |      NOT list_contains(COALESCE(dr.dp, CAST([] AS BIGINT[])), i - 1)) AS kept
         |  FROM rendered r LEFT JOIN drops dr ON r.doc_id = dr.doc_id)
         |SELECT doc_id,
         |  COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
         |  CAST(np AS BIGINT) AS n_paras,
         |  CAST(np - len(kept) AS BIGINT) AS n_dropped
         |FROM fin ORDER BY doc_id""".stripMargin,

    // snapshot-diff replay: same deterministic snapshot derivations,
    // full-outer md5 compare
    "txt_snapshot_diff" ->
      s"""WITH a AS (
         |  SELECT doc_id, md5(text) AS ha FROM documents WHERE doc_id % 11 <> 3),
         |b AS (
         |  SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
         |                          ELSE text END) AS hb
         |  FROM documents WHERE doc_id % 7 <> 2)
         |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         |  CASE WHEN a.doc_id IS NULL THEN 'added'
         |       WHEN b.doc_id IS NULL THEN 'removed'
         |       WHEN ha IS NOT DISTINCT FROM hb THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         |ORDER BY doc_id""".stripMargin,

    "txt_snapshot_churn" ->
      s"""WITH a AS (
         |  SELECT doc_id, md5(text) AS ha FROM documents WHERE doc_id % 11 <> 3),
         |b AS (
         |  SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
         |                          ELSE text END) AS hb
         |  FROM documents WHERE doc_id % 7 <> 2),
         |d AS (
         |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         |    CASE WHEN a.doc_id IS NULL THEN 'added'
         |         WHEN b.doc_id IS NULL THEN 'removed'
         |         WHEN ha IS NOT DISTINCT FROM hb THEN 'unchanged'
         |         ELSE 'changed' END AS status
         |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
         |SELECT s.source, d.status, COUNT(*) AS n
         |FROM d JOIN documents s USING (doc_id)
         |GROUP BY s.source, d.status
         |ORDER BY s.source, d.status""".stripMargin,

    // boilerplate replay: same paragraph rendering, but the drop rule is
    // per-SOURCE doc frequency (>= 3 distinct docs) and drops EVERY
    // occurrence — no keeper ranking
    "txt_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, source, $tokSql AS tk FROM documents),
         |raw AS (
         |  SELECT doc_id, source,
         |    list_transform(
         |      generate_series(0, CAST(ceil(len(tk) / 8.0) AS INT) - 1),
         |      li -> array_to_string(tk[li*8+1 : li*8+8], ' ')) AS r
         |  FROM t),
         |rendered AS (
         |  SELECT doc_id, source,
         |    list_transform(r, (x, li) -> CASE
         |      WHEN (doc_id * 17 + (li - 1)) % 11 = 0
         |        THEN 'the shared boilerplate paragraph'
         |      WHEN (doc_id * 13 + (li - 1)) % 7 = 3 THEN r[1]
         |      ELSE x END) AS paras
         |  FROM raw),
         |occ0 AS (
         |  SELECT doc_id, source, paras,
         |    unnest(generate_series(1, len(paras))) AS li
         |  FROM rendered),
         |occ AS (SELECT doc_id, source, li - 1 AS pos, md5(paras[li]) AS ph FROM occ0),
         |bp AS (SELECT source, ph FROM occ
         |  GROUP BY source, ph HAVING COUNT(DISTINCT doc_id) >= 3),
         |drops AS (SELECT doc_id, list(pos) AS dp
         |  FROM occ JOIN bp USING (source, ph) GROUP BY doc_id),
         |fin AS (
         |  SELECT r.doc_id, len(r.paras) AS np,
         |    list_filter(r.paras, (x, i) ->
         |      NOT list_contains(COALESCE(dr.dp, CAST([] AS BIGINT[])), i - 1)) AS kept
         |  FROM rendered r LEFT JOIN drops dr ON r.doc_id = dr.doc_id)
         |SELECT doc_id,
         |  COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
         |  CAST(np AS BIGINT) AS n_lines,
         |  CAST(np - len(kept) AS BIGINT) AS n_bp
         |FROM fin ORDER BY doc_id""".stripMargin,

    // C4 line/page rules replay: identical deterministic decorations
    // (DuckDB lambda indices are 1-based -> li - 1 in every keyed
    // condition via generate_series), identical keep predicate and
    // page-level flags, same thresholds
    "txt_c4_line_flags" ->
      s"""WITH t AS (SELECT doc_id, text, $tokSql AS tk FROM documents),
         |raw AS (
         |  SELECT doc_id, text,
         |    list_transform(
         |      generate_series(0, CAST(ceil(len(tk) / 8.0) AS INT) - 1),
         |      li -> array_to_string(tk[li*8+1 : li*8+8], ' ')) AS r
         |  FROM t),
         |l AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(0, len(r) - 1), li ->
         |      (CASE WHEN (doc_id * 17 + li) % 29 = 7 THEN 'lorem ipsum ' ELSE '' END)
         |      || r[li + 1]
         |      || (CASE WHEN (doc_id * 11 + li) % 7 = 3 THEN ' javascript' ELSE '' END)
         |      || (CASE WHEN (doc_id * 13 + li) % 23 = 5 THEN ' {' ELSE '' END)
         |      || (CASE WHEN (doc_id * 7 + li) % 3 != 2 THEN '.' ELSE '' END)
         |    )) AS line
         |  FROM raw),
         |f AS (SELECT doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_lines,
         |    CAST(SUM(CASE WHEN
         |        (ends_with(line, '.') OR ends_with(line, '!')
         |          OR ends_with(line, '?') OR ends_with(line, '"'))
         |        AND len(string_split(line, ' ')) >= 3
         |        AND NOT contains(line, 'javascript')
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    MAX(CASE WHEN contains(line, '{') THEN 1 ELSE 0 END) AS brace,
         |    MAX(CASE WHEN contains(line, 'lorem ipsum') THEN 1 ELSE 0 END) AS lorem
         |  FROM l GROUP BY doc_id),
         |b AS (SELECT doc_id, list_contains($tokSql, 'dup') AS bad FROM documents)
         |SELECT f.doc_id, n_lines, n_kept,
         |  n_kept >= 3 AS ok_sentences,
         |  brace = 0 AS ok_brace,
         |  lorem = 0 AS ok_lorem,
         |  NOT bad AS ok_badword,
         |  n_kept >= 3 AND brace = 0 AND lorem = 0 AND NOT bad AS pass
         |FROM f JOIN b ON f.doc_id = b.doc_id
         |ORDER BY f.doc_id""".stripMargin,

    // C4 span-dedup replay: raw 8-token lines, 3-line spans hashed as the
    // chr(10)-joined text, keep-first by (doc_id, pos) via row_number,
    // covered line positions unioned per doc, reassembly in document order
    "dedup_c4_spans" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |raw AS (
         |  SELECT doc_id,
         |    list_transform(
         |      generate_series(0, CAST(ceil(len(tk) / 8.0) AS INT) - 1),
         |      li -> array_to_string(tk[li*8+1 : li*8+8], ' ')) AS r
         |  FROM t),
         |s AS (SELECT doc_id, li AS pos,
         |    md5(r[li+1] || chr(10) || r[li+2] || chr(10) || r[li+3]) AS sh
         |  FROM raw, unnest(generate_series(0, len(r) - 3)) AS u(li)
         |  WHERE len(r) >= 3),
         |dups AS (SELECT sh FROM s GROUP BY sh HAVING COUNT(*) > 1),
         |ranked AS (
         |  SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rk
         |  FROM s JOIN dups USING (sh)),
         |dp AS (SELECT doc_id,
         |    list_distinct(flatten(list([pos, pos + 1, pos + 2]))) AS dp
         |  FROM ranked WHERE rk > 1 GROUP BY doc_id),
         |fin AS (
         |  SELECT raw.doc_id, len(raw.r) AS nl,
         |    list_filter(raw.r, (x, i) ->
         |      NOT list_contains(COALESCE(dp.dp, CAST([] AS BIGINT[])), i - 1)) AS kept
         |  FROM raw LEFT JOIN dp ON raw.doc_id = dp.doc_id)
         |SELECT doc_id,
         |  COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
         |  CAST(nl AS BIGINT) AS n_lines,
         |  CAST(nl - len(kept) AS BIGINT) AS n_dropped
         |FROM fin ORDER BY doc_id""".stripMargin,

    "txt_pii_redact" ->
      """WITH r AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or 555-'
        |      || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
        |      || ' ip 10.0.' || (doc_id % 256) || '.' || (doc_id * 3 % 256) AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(raw, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_digest
        |FROM r ORDER BY doc_id""".stripMargin,

    "txt_winnow" ->
      s"""WITH $winnowCte
         |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
         |  md5(array_to_string(list_transform(fps, x -> CAST(x AS VARCHAR)), ',')) AS fp_digest
         |FROM f ORDER BY doc_id""".stripMargin,

    "dedup_winnow_pairs" ->
      s"""WITH $winnowCte,
         |fx AS (SELECT doc_id, unnest(fps) AS fp FROM f)
         |SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_shared
         |FROM fx a JOIN fx b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 3 ORDER BY a, b""".stripMargin,

    "dedup_jaccard" ->
      s"""WITH ${lshBandsCte()},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |t AS (
         |  SELECT doc_id, list_distinct($shSql) AS sh
         |  FROM documents WHERE len($tokSql) >= 2)
         |SELECT a, b,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
         |  CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS BIGINT) AS uni,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
         |FROM cand JOIN t x ON x.doc_id = a JOIN t y ON y.doc_id = b
         |ORDER BY a, b""".stripMargin,

    // containment replay: same candidates + shingle sets, overlap
    // coefficient inter / min(|A|, |B|) instead of Jaccard
    "dedup_containment" ->
      s"""WITH ${lshBandsCte()},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |t AS (
         |  SELECT doc_id, list_distinct($shSql) AS sh
         |  FROM documents WHERE len($tokSql) >= 2)
         |SELECT a, b,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
         |  CAST(len(x.sh) AS BIGINT) AS n_a,
         |  CAST(len(y.sh) AS BIGINT) AS n_b,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |    / least(len(x.sh), len(y.sh)) AS ovl
         |FROM cand JOIN t x ON x.doc_id = a JOIN t y ON y.doc_id = b
         |ORDER BY a, b""".stripMargin
  )
}
