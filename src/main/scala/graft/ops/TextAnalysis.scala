package graft.ops

import graft.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token statistics, fingerprinting. All columnar
  * (one narrow stage), no shuffle.
  */
object TextAnalysis {

  /** Adds lang_pred, n_tokens, quality, fingerprint columns. */
  def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", gr_langId(col(textCol)))
      .withColumn("n_tokens", gr_tokenCount(col(textCol)))
      .withColumn("quality", gr_qualityScore(col(textCol)))
      .withColumn("fingerprint", gr_fingerprint(col(textCol), lit(8)))

  /** Corpus-level stats per predicted language. */
  /** CCNet-style per-language quality buckets: rank every document inside
    * its language by a quality score and split the ranking into `n`
    * equal-size tiers — bucket 1 ("head") is the best-scoring third, then
    * "middle", then "tail" (Wenzek et al. 2019, CCNet; the reference
    * pipeline keeps head+middle for training). `ntile` over a
    * deterministic total order (`scoreCol` DESC, `tieCol`) gives integer
    * bucket boundaries that are exactly reproducible across engines — no
    * interpolated float cutpoints.
    *
    * Scale: one hash exchange on `langCol` plus a per-language sort.
    * Languages are few and huge, so this is the exact small-N
    * formulation; at 100 TB swap the window for approx_percentile
    * cutpoints per language (a tiny broadcast table) and bucket by
    * comparison — same output contract modulo boundary-tie placement.
    */
  def qualityBuckets(df: DataFrame, langCol: String, scoreCol: String,
      tieCol: String, n: Int = 3): DataFrame = {
    require(n >= 2, "qualityBuckets: n >= 2") // parity with the approx twin
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col(scoreCol).desc, col(tieCol))
    df.withColumn("bucket_idx", ntile(n).over(w))
      .withColumn("bucket",
        when(col("bucket_idx") === 1, "head")
          .when(col("bucket_idx") === n, "tail").otherwise("middle"))
  }

  /** The 100 TB variant of [[qualityBuckets]]: per-language
    * `approx_percentile` cutpoints (a tiny broadcast table — one row per
    * language) instead of a per-language window sort, so no single task
    * ever sorts a whole language. Buckets place by value comparison
    * against the cutpoints, so boundary-tied rows may land one tier away
    * from the exact rank-based variant — the documented trade for
    * removing the giant-partition sort.
    */
  def qualityBucketsApprox(df: DataFrame, langCol: String, scoreCol: String,
      n: Int = 3, accuracy: Int = 10000): DataFrame = {
    require(n >= 2, "qualityBucketsApprox: n >= 2")
    val ps = (1 until n).map(i => i.toDouble / n)
    // rename via col() first: a quotable score name spliced raw into the
    // expr would parse as SQL (and a score column literally named "c"
    // would be shadowed by the filter lambda variable below)
    val scored = df.withColumn("_qb_s", col(scoreCol))
    val cuts = scored.groupBy(col(langCol)).agg(
      expr(s"percentile_approx(_qb_s, array(${ps.mkString(", ")}), $accuracy)")
        .as("_cuts"))
    // null-safe equality: the exact twin windows NULL-lang rows into
    // their own partition — a plain using-join would DROP them here
    scored.join(broadcast(cuts), scored(langCol) <=> cuts(langCol))
      .drop(cuts(langCol))
      // ascending cutpoints; clearing k of them puts the row k tiers up
      // (bucket 1 = "head" = above every cutpoint)
      .withColumn("bucket_idx",
        lit(n) - expr("size(filter(_cuts, c -> _qb_s >= c))"))
      .withColumn("bucket",
        when(col("bucket_idx") === 1, "head")
          .when(col("bucket_idx") === n, "tail").otherwise("middle"))
      .drop("_cuts", "_qb_s")
  }

  def langProfile(df: DataFrame, textCol: String): DataFrame =
    annotate(df, textCol)
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        round(avg(col("quality")), 4).as("avg_quality"))

  /** Gopher quality-rule bundle (Rae et al. 2021, Appendix A): the
    * repetition-independent document filters a large-scale curation
    * pipeline runs before any model-based scoring — word-count window,
    * mean-word-length window, symbol-to-word ratio (# and ellipsis),
    * bullet-start / ellipsis-end line fractions, alphabetic-word
    * fraction, and a minimum stop-word hit count. Output: one row per
    * document with each rule's boolean, the measured ratios, and the
    * conjunction `keep`.
    *
    * Entirely narrow (one codegen'd stage over the text column, no
    * shuffle, no UDF — higher-order array functions only), so it runs at
    * scan speed on a 100 TB corpus. Thresholds are the paper's; the
    * word-count window and stop list are parameters because they are the
    * two knobs every deployment retunes.
    */
  /* KNOWN DEVIATION (r15 review, oracle-coupled): r_symbol applies the
   * 0.1 threshold to hash + ellipsis counts SUMMED into one ratio;
   * Rae 2021 Appendix A thresholds each symbol's ratio separately. The
   * t43 oracle mirrors the summed form.
   */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50, maxWords: Long = 100000,
      stopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with")): DataFrame = {
    require(stopWords.nonEmpty, "gopherRules: stop-word list must be non-empty")
    val t = df.select(col(idCol), col(textCol).as("_tx"))
      .withColumn("_toks", gr_tokens(col("_tx")))
      .withColumn("n_words", size(col("_toks")).cast("long"))
      .withColumn("_lines", split(col("_tx"), "\n"))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("_sumlen",
        expr("aggregate(_toks, 0L, (a, x) -> a + length(x))"))
      .withColumn("_nhash",
        (length(col("_tx")) - length(regexp_replace(col("_tx"), "#", "")))
          .cast("long"))
      .withColumn("_nell", regexp_count(col("_tx"), lit("\\.\\.\\.")).cast("long"))
      .withColumn("_nbullet", expr(
        "size(filter(_lines, l -> startswith(ltrim(l), '-') OR " +
          "startswith(ltrim(l), '*') OR startswith(ltrim(l), '•')))")
        .cast("long"))
      .withColumn("_nellend",
        expr("size(filter(_lines, l -> endswith(rtrim(l), '...')))").cast("long"))
      .withColumn("_nalpha",
        expr("size(filter(_toks, x -> x rlike '[a-zA-Z]'))").cast("long"))
      .withColumn("_nstop", stopWords.map(w =>
        when(array_contains(col("_toks"), w), 1L).otherwise(0L))
        .reduce(_ + _))
    t.select(col(idCol), col("n_words"),
      round(when(col("n_words") >= 1,
        col("_sumlen").cast("double") / col("n_words")).otherwise(0.0), 4)
        .as("mean_word_len"),
      round(when(col("n_words") >= 1,
        (col("_nhash") + col("_nell")).cast("double") / col("n_words"))
        .otherwise(0.0), 4).as("symbol_ratio"),
      (col("n_words") >= minWords && col("n_words") <= maxWords).as("r_wordcount"),
      (col("n_words") >= 1 &&
        col("_sumlen").cast("double") / col("n_words") >= 3.0 &&
        col("_sumlen").cast("double") / col("n_words") <= 10.0).as("r_wordlen"),
      (col("n_words") >= 1 &&
        (col("_nhash") + col("_nell")).cast("double") <= lit(0.1) * col("n_words"))
        .as("r_symbol"),
      (col("_nbullet").cast("double") <= lit(0.9) * col("n_lines")).as("r_bullet"),
      (col("_nellend").cast("double") <= lit(0.3) * col("n_lines")).as("r_ellipsis"),
      (col("n_words") >= 1 &&
        col("_nalpha").cast("double") >= lit(0.8) * col("n_words")).as("r_alpha"),
      (col("_nstop") >= 2L).as("r_stop"))
      .withColumn("keep",
        col("r_wordcount") && col("r_wordlen") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") && col("r_stop"))
  }

  /** HTML → text extraction (the WET-generation step of a crawl
    * pipeline): drop script/style blocks, strip tags, decode the five
    * predefined character entities, collapse whitespace; reports the
    * markup ratio (1 − text/html length) — the classic boilerplate
    * signal. Entities are decoded AFTER tag stripping so text that spells
    * `&lt;x&gt;` stays literal text. Script/style patterns run with
    * `(?is)` — real crawl HTML has multiline and mixed-case blocks, and
    * both flags are RE2-safe inline. Entirely narrow codegen'd
    * `regexp_replace` builtins (no UDF), so it runs at scan speed; the
    * regex subset (lazy quantifiers, character classes) is RE2-safe so
    * the operator mirrors into any engine.
    */
  /* KNOWN DEVIATIONS (r15 review, oracle-coupled — a fix must land in
   * lockstep with the t46 DuckDB mirror): (a) &amp; decodes FIRST, so
   * doubly-escaped entities (&amp;lt;) double-decode; spec order decodes
   * &amp; last. (b) the <[^>]+> strip truncates at a '>' INSIDE an HTML
   * comment, leaking the remainder as text. Both are mirrored exactly by
   * the oracle, so cross-engine parity holds while spec fidelity does
   * not.
   */
  /* r18: the script-block / style-block / tag strips merged into ONE
   * alternation pass (three full-document regex rewrites were the bulk
   * of the column wall). Alternatives try left-to-right at each
   * position, so a <script...> opener still prefers its whole lazy
   * block over the bare-tag strip — outputs are identical on all
   * non-pathological inputs, and the ORACLE runs the same single
   * alternation, so the two sides stay in lockstep by construction.
   */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.withColumn("_t2", regexp_replace(col(htmlCol),
        "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]+>", " "))
      // entity patterns are LITERAL strings — StringReplace (no regex
      // engine, no per-row pattern scan state) replaces byte-identically
      // to the regexp form for these five patterns (r18 profile: the five
      // regex passes were the bulk of the post-strip wall). Oracle
      // untouched: literal == regex semantics here.
      .withColumn("_t3",
        expr("replace(replace(replace(replace(replace(_t2, " +
          "'&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
          "'&#39;', '''')"))
      .withColumn("text", trim(regexp_replace(col("_t3"), "\\s+", " ")))
      .select(col(idCol),
        length(col(htmlCol)).cast("long").as("html_len"),
        length(col("text")).cast("long").as("text_len"),
        round(lit(1.0) - length(col("text")).cast("double")
          / length(col(htmlCol)).cast("double"), 4).as("markup_ratio"),
        col("text"))

  /** C4 line-level filters (Raffel et al. 2020 §2.2) with page rewrite:
    * keep only lines that end in terminal punctuation (., !, ?, or a
    * closing quote after one), carry at least `minLineWords` words, and
    * do not mention "javascript"; rebuild the page from the kept lines;
    * then drop pages with fewer than `minSentences` sentences (terminal
    * punctuation marks in the rebuilt text), any `{` (code), or a
    * blocklist phrase. The line-granular complement to the document-level
    * [[gopherRules]] — C4 rewrites pages, Gopher drops them whole.
    *
    * One narrow codegen'd stage (higher-order array functions over the
    * split lines, no shuffle, no UDF) — scan speed at 100 TB.
    */
  /* KNOWN DEVIATION (r15 review, oracle-coupled): the terminal-punct
   * rule accepts a closing quote only after ./!/? — C4 §2.2 keeps ANY
   * line ending in an end quotation mark. The t47 oracle mirrors the
   * stricter form.
   */
  def c4Filters(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minSentences: Int = 3,
      blocklist: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    require(blocklist.nonEmpty, "c4Filters: blocklist must be non-empty")
    val keepPred =
      s"""l -> (endswith(rtrim(l), '.') OR endswith(rtrim(l), '!')
         |  OR endswith(rtrim(l), '?') OR endswith(rtrim(l), '."')
         |  OR endswith(rtrim(l), '!"') OR endswith(rtrim(l), '?"'))
         | AND size(filter(split(l, ' '), x -> length(x) > 0)) >= $minLineWords
         | AND NOT contains(lower(l), 'javascript')""".stripMargin.replace("\n", " ")
    val base = df.select(col(idCol), col(textCol).as("_tx"))
      .withColumn("_lines", split(col("_tx"), "\n"))
      .withColumn("_kept", expr(s"filter(_lines, $keepPred)"))
      .withColumn("new_text", array_join(col("_kept"), "\n"))
      .withColumn("n_sentences",
        (length(col("new_text")) -
          length(translate(col("new_text"), ".!?", ""))).cast("long"))
      .withColumn("has_brace", col("_tx").contains("{"))
      .withColumn("has_blocked", blocklist.map(t =>
        lower(col("_tx")).contains(t.toLowerCase)).reduce(_ || _))
    base.select(col(idCol),
      size(col("_lines")).cast("long").as("n_lines"),
      size(col("_kept")).cast("long").as("n_kept"),
      col("n_sentences"), col("has_brace"), col("has_blocked"),
      (col("n_sentences") >= minSentences && !col("has_brace") &&
        !col("has_blocked")).as("keep"),
      col("new_text"), md5(col("new_text")).as("new_hash"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed n-gram features
    * (unigrams + word bigrams into `buckets` buckets), bag-of-words
    * bucket distributions estimated on the TARGET slice (`isTarget`) and
    * the full RAW corpus with add-1 smoothing, and each document scored
    * with its log importance weight Σ_f c_doc(f)·(ln p_target(f) −
    * ln p_raw(f)). Positive weight = looks more like the target than the
    * raw pool; the paper resamples on these weights, downstream here that
    * is one deterministic hash filter.
    *
    * Scale shape (100 TB): the feature stream is a narrow explode; the
    * two bucket distributions come from ONE hash aggregation over it
    * (`buckets` rows) that broadcasts back onto the stream; the per-doc
    * reduce is a hash agg keyed by the id. The corpus text never
    * shuffles and no state exceeds the bucket count.
    */
  /* KNOWN LIMIT (r15 review): documents whose text tokenizes empty have
   * no feature rows and therefore no output row (explode drops them) —
   * join the result back LEFT if every input document must appear.
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column, buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"dsirWeights: buckets >= 2 (got $buckets)")
    // gr_tokens matches the oracle's \s+ tokenizer (a bare split on
    // ' ' diverges on tab/CR-bearing text)
    // pinned: the corpus-sized tokenize+explode feeds BOTH the bucket
    // distribution and the scoring join — without the checkpoint each
    // consumer re-runs it (the bm25 tf lesson)
    val feats = org.apache.spark.sql.GraftInterop.localCheckpointCappedStats(df
      .select(col(idCol), isTarget.as("_tgt"), gr_tokens(col(textCol)).as("_a"))
      .select(col(idCol), col("_tgt"), explode(expr(
        "concat(_a, IF(size(_a) >= 2, " +
          "transform(sequence(0, size(_a) - 2), i -> concat(_a[i], ' ', _a[i + 1])), " +
          "array()))")).as("_g"))
      .select(col(idCol), col("_tgt"),
        gr_md5Bucket(col("_g"), lit(buckets)).as("_b")))
    val dist = feats.groupBy(col("_b"))
      .agg(sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
        count(lit(1)).as("_cr"))
    val tot = dist.agg(sum(col("_ct")).cast("double").as("_tt"),
      sum(col("_cr")).cast("double").as("_rt"))
    val lw = dist.crossJoin(broadcast(tot))
      .select(col("_b"),
        (log((col("_ct").cast("double") + lit(1.0)) / (col("_tt") + lit(buckets.toDouble)))
          - log((col("_cr").cast("double") + lit(1.0)) / (col("_rt") + lit(buckets.toDouble))))
          .as("_lw"))
    feats.join(broadcast(lw), Seq("_b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), round(sum(col("_lw")), 4).as("log_weight"))
      .withColumn("keep", col("log_weight") >= 0.0)
  }

  /** Corpus-trained interpolated bigram language model, applied back to
    * every document — the CCNet / KenLM perplexity-filter shape (Wenzek et
    * al. 2019 train a 5-gram KenLM on Wikipedia and bucket CommonCrawl by
    * per-doc perplexity; the bigram order keeps the oracle exactly
    * SQL-mirrorable while exercising the identical plan).
    *
    * Model: p(w2|w1) = λ·c(w1w2)/c(w1) + (1−λ)·c(w2)/T over
    * whitespace tokens (empty tokens dropped before adjacency, so the
    * model sees the same stream the tokenizer emits). Output: one row per
    * document with ≥2 tokens — `n_bigrams` and `cross_entropy` =
    * avg(−ln p) (perplexity = exp of it).
    *
    * Scale shape (100 TB): the unigram and bigram count tables are
    * plain hash aggregations with map-side partial combine; scoring joins
    * the position stream to the count tables on the token keys — the
    * count tables are corpus-vocabulary-sized, so neither side is
    * broadcast structurally (AQE picks broadcast exactly when a count
    * table fits, the t19 rule); the grand-total rides in as a 1-row
    * broadcast. The per-doc reduce is a hash agg keyed by the id. Nothing
    * in the plan holds unbounded per-key state.
    */
  /* KNOWN DEVIATION (r15 review, oracle-coupled): tokenizes on a single
   * space (the t39 oracle mirrors it); gr_tokens' \s+ split is the
   * whitespace-robust form siblings use — migrate both sides together.
   */
  def bigramLm(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"bigramLm: lambda in [0,1] (got $lambda)")
    val a = df.select(col(idCol),
      expr(s"filter(split($textCol, ' '), x -> length(x) > 0)").as("_a"))
    // uni (vocab-sized) feeds tot + two scoring joins; pairs (corpus-
    // sized) feeds the bigram count AND the scoring join — pin both so no
    // consumer re-runs the tokenize+explode (the bm25 tf lesson)
    val uni = org.apache.spark.sql.GraftInterop.localCheckpointCappedStats(
      a.select(explode(col("_a")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c_w")))
    val tot = uni.agg(sum(col("c_w")).as("c_total"))
    val pairs = org.apache.spark.sql.GraftInterop.localCheckpointCappedStats(
      a.filter(size(col("_a")) >= 2)
        .select(col(idCol), explode(expr(
          "transform(sequence(0, size(_a) - 2), i -> struct(_a[i] AS w1, _a[i + 1] AS w2))"))
          .as("p"))
        .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2")))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_12"))
    pairs
      .join(big, Seq("w1", "w2"))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        (-log(lit(lambda) * col("c_12").cast("double") / col("c_1").cast("double")
          + lit(1.0 - lambda) * col("c_2").cast("double") / col("c_total").cast("double")))
          .as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("nll")).as("cross_entropy"))
  }

  /** WARC → WET conversion — the Common Crawl pipeline step that turns a
    * raw capture into the text extraction LLM pipelines actually train
    * on: read the `.warc.gz` capture ([[graft.io.WarcIO.read]] — tasks
    * frame their own gzip members), [[htmlExtract]] each `response`
    * payload, and write the extracted text back as `conversion` records
    * in per-member `.wet.gz` files ([[graft.io.WarcIO.write]]). Fully
    * distributed end to end: no driver data path, the capture bytes
    * cross the cluster exactly once (read → narrow extract → task-side
    * write; no shuffle at all unless the caller repartitions).
    */
  def wetFromWarc(spark: org.apache.spark.sql.SparkSession,
      warcPath: String, wetPath: String,
      splitBytes: Long = 32L << 20): Unit = {
    val resp = graft.io.WarcIO.read(spark, warcPath, splitBytes)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"), col("payload").cast("string").as("_html"))
    val wet = htmlExtract(resp, "target_uri", "_html")
      .select(col("target_uri"), col("text").as("payload"))
    graft.io.WarcIO.write(wet, wetPath)
  }

  // ------------------------------------------------- subword tokenization

  /** The pluggable token-counting hook for the token-budget operators
    * (shard packing t56, sequence packing t14, mixture math): a counter
    * is any `Column => Column` producing a LONG token count from a text
    * column. [[whitespaceTokenCounter]] is the default every existing
    * oracle mirrors; [[wordpieceTokenCounter]] meters REAL subword tokens
    * — what a training run actually consumes (whitespace undercounts
    * budgets by ~1.3-1.5x on natural text).
    */
  val whitespaceTokenCounter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => gr_tokenCount(c).cast("long")

  /** Counter metering greedy longest-match subword pieces over `vocab`
    * ([[wordpieceEncode]]); the vocab rides into the plan as one literal
    * (the model-rides-to-data shape — no join, no UDF, narrow codegen'd
    * stage at corpus scale).
    */
  def wordpieceTokenCounter(vocab: Seq[String], maxWordChars: Int = 32)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => size(wordpieceEncode(c, vocab, maxWordChars)).cast("long")

  /** Greedy longest-match WordPiece encoding of a text column: array of
    * pieces, unmatchable words as `[UNK]`. See
    * [[graft.sql.TextKernel.wordpiece]] for the exact rule (mirrored by
    * the t67 recursive-CTE oracle).
    */
  def wordpieceEncode(text: org.apache.spark.sql.Column, vocab: Seq[String],
      maxWordChars: Int = 32): org.apache.spark.sql.Column = {
    require(vocab.nonEmpty, "wordpieceEncode: empty vocab")
    gr_wordpiece(text, typedlit(vocab), lit(maxWordChars))
  }

  /** Deterministic BPE-style vocabulary training (Sennrich et al. 2016,
    * adapted to WordPiece-shaped pieces): the corpus reduces to its
    * word-frequency table — the SUFFICIENT STATISTIC for pair-merge
    * training — with one hash aggregation capped at the `maxWords` most
    * frequent words (count desc, word asc: deterministic under ties);
    * merges then run at the DRIVER over that bounded table. Each round
    * merges the most frequent adjacent symbol pair (ties broken by the
    * lexicographically smallest pair) until `vocabSize` pieces exist or
    * no pair reaches `minPairFreq`. Start symbols are first characters
    * plain and continuations `##`-prefixed, so the result feeds
    * [[wordpieceEncode]] directly.
    *
    * 100 TB posture: the distributed pass is ONE map-side-combined
    * groupBy(word) + partial top-`maxWords` — word counts compress a
    * corpus by ~10^6x, and truncating the rare tail perturbs merges only
    * at frequencies that never win a merge round anyway. The driver loop
    * is O(vocabSize x maxWords x avg word length).
    */
  def trainWordpieceVocab(df: DataFrame, textCol: String,
      vocabSize: Int = 512, maxWords: Int = 50000,
      minPairFreq: Long = 2L): Seq[String] = {
    require(vocabSize >= 1 && maxWords >= 1 && minPairFreq >= 1,
      "trainWordpieceVocab: bad parameters")
    val counts: Array[(String, Long)] = df
      .select(explode(gr_tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("_w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(counts.nonEmpty, "trainWordpieceVocab: no words in corpus")
    // symbol sequences: first char plain, the rest ##-prefixed
    val words: Array[(Array[String], Long)] = counts.map { case (w, n) =>
      (Array.tabulate(w.length)(i =>
        if (i == 0) w.substring(0, 1) else "##" + w.substring(i, i + 1)), n)
    }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach(_._1.foreach(vocab += _))
    var syms = words
    var continue = vocab.size < vocabSize
    while (continue) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (s, n) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        val (bestPair, bestN) = pairCounts.minBy { case ((a, b), n) =>
          (-n, a, b) // max count, then lexicographically smallest pair
        }
        if (bestN < minPairFreq) continue = false
        else {
          val merged = bestPair._1 + bestPair._2.stripPrefix("##")
          vocab += merged
          syms = syms.map { case (s, n) =>
            if (s.length < 2) (s, n)
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < s.length) {
                if (i + 1 < s.length && s(i) == bestPair._1 && s(i + 1) == bestPair._2) {
                  out += merged; i += 2
                } else { out += s(i); i += 1 }
              }
              (out.toArray, n)
            }
          }
          continue = vocab.size < vocabSize
        }
      }
    }
    vocab.toSeq
  }
}

/** Multimodal column plumbing: images/audio/video ride as opaque binary
  * columns with typed metadata extracted by per-row kernels. The decode is
  * REAL (`javax.imageio` PNG decoding over the raster — see
  * [[graft.sql.ImageCodec]]); payloads are deterministic synthesized PNGs /
  * GRV0 containers because the testdata ships no media files, and their
  * closed-form synthesis lets the DuckDB oracle recompute the decoded
  * values independently.
  */
object Multimodal {

  /** Attach a binary payload column (utf-8 bytes of a text column — used
    * directly by text kernels and as the seed for media synthesis).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, encode(col(srcCol), "UTF-8").cast("binary"))

  /** Attach a REAL PNG payload synthesized deterministically from the
    * source column's byte length (stand-in for image bytes read from
    * files; the bitstream is a genuine PNG that any decoder reads).
    */
  def withImagePayload(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, gr_synthPng(encode(col(srcCol), "UTF-8").cast("binary")))

  /** Attach a GRV0 video-container payload (real binary header the
    * frame-sample kernel parses back).
    */
  def withVideoPayload(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, gr_synthVideo(encode(col(srcCol), "UTF-8").cast("binary")))

  /** Attach a REAL RIFF/WAVE PCM payload synthesized deterministically
    * from the source column's byte length.
    */
  def withAudioPayload(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, gr_synthWav(encode(col(srcCol), "UTF-8").cast("binary")))

  /** Per-window energy rows (doc-id preserved): the silence-trim /
    * voice-activity feature shape — one row per (row, window) with the
    * integer-exact sum of |sample| in that window, from a REAL
    * javax.sound PCM decode. Narrow codegen'd stage + posexplode.
    */
  def audioEnergyWindows(df: DataFrame, binCol: String, nWindows: Int): DataFrame =
    df.select(col("*"),
        posexplode(gr_audioEnergy(col(binCol), lit(nWindows))).as(Seq("win", "energy")))
      .drop(binCol)

  /** Decode the audio payload with javax.sound and extract typed metadata
    * from the decoded stream: sample rate, channels, frame count, sample
    * sum. Narrow stage, no shuffle.
    */
  def extractAudioMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("audio_meta", gr_audioMeta(col(binCol)))
      .withColumn("sample_rate", col("audio_meta.sample_rate"))
      .withColumn("channels", col("audio_meta.channels"))
      .withColumn("n_samples", col("audio_meta.n_samples"))
      .withColumn("sample_sum", col("audio_meta.sample_sum"))
      .drop("audio_meta")

  /** Decode the binary column with javax.imageio and extract typed metadata
    * from the decoded raster: width/height/band-count/pixel-sum. Narrow
    * stage, no shuffle.
    */
  def extractImageMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("image_meta", gr_imageMeta(col(binCol)))
      .withColumn("width", col("image_meta.width"))
      .withColumn("height", col("image_meta.height"))
      .withColumn("channels", col("image_meta.channels"))
      .withColumn("pixel_sum", col("image_meta.pixel_sum"))
      .drop("image_meta")

  /** Partition-wise BATCHED decode — the Spark analog of the reference's
    * `map_partitions` (SURVEY §2.10) and of mapInPandas-style batch UDFs.
    * One PNG ImageReader is created per partition and re-pointed at each
    * row's bytes, amortizing plugin lookup + reader construction across the
    * partition (the codec-context-reuse pattern a real media pipeline
    * needs); rows stream through in groups of `batchSize`.
    */
  def extractImageMetaBatched(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1,
      s"extractImageMetaBatched: batchSize >= 1 (got $batchSize)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val reader = graft.sql.ImageCodec.newPngReader()
          it.grouped(batchSize).flatMap { batch =>
            batch.iterator.map { case (id, bytes) =>
              val (w, h, c, s) = graft.sql.ImageCodec.metaOf(
                graft.sql.ImageCodec.decodeWith(reader, bytes))
              (id, w, h, c, s)
            }
          }
        }
      }
      .toDF(idCol, "width", "height", "channels", "pixel_sum")
  }

  /** Real decode + nearest-neighbor fit-into-target resize over the decoded
    * raster: output dims, byte size, and the resized pixel sum (integer
    * source-index math, so the oracle mirrors it exactly).
    */
  def resizeMeta(df: DataFrame, binCol: String, target: Int): DataFrame =
    df.withColumn("resize_meta", gr_imageResize(col(binCol), lit(target)))
      .withColumn("out_w", col("resize_meta.out_w"))
      .withColumn("out_h", col("resize_meta.out_h"))
      .withColumn("out_bytes", col("resize_meta.out_bytes"))
      .withColumn("out_sum", col("resize_meta.out_sum"))
      .drop("resize_meta")

  /** Video frame sampling: parse the container header for the frame count,
    * emit a uniform stride of frame indices toward `targetFrames`. The
    * struct + array schema and downstream explode-ability are the tested
    * shape a real extract pipeline plugs into.
    */
  def frameSample(df: DataFrame, binCol: String, targetFrames: Int): DataFrame =
    df.withColumn("fs", gr_frameSample(col(binCol), lit(targetFrames)))
      .withColumn("n_frames", col("fs.n_frames"))
      .withColumn("frame_indices", col("fs.indices"))
      .drop("fs")
}
