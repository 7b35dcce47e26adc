package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Text-analysis Column functions for the LLM-data-pipeline pack.
  *
  * Everything here is a composition of built-in Catalyst expressions —
  * no UDFs — so whole-stage codegen and pushdown survive, and each function
  * has an exact ANSI-SQL oracle (see SparkEntry.oracleSql).
  */
object TextFunctions {

  /** Whitespace-delimited token count — the delimiter class is the
    * EXPLICIT `[ \t\n\f\r]` (= RE2's `\s`), never Java's `\S`: Java adds
    * `\x0B` to whitespace, so a bare `\S+` here and `\S+` in the DuckDB
    * oracle count a vertical-tab-bearing document differently. */
  def tokenCount(text: Column): Column =
    F.regexp_count(text, F.lit("[^ \\t\\n\\f\\r]+")).cast("long")

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token — a cheap deterministic proxy for a BPE
    * tokenizer's piece count. */
  def bpeishTokenCount(text: Column): Column =
    F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]")).cast("long")

  /** Whitespace-split tokens (lowercased), as an array column.
    *
    * Evaluated as [[graft.functions.expressions.ShingleExpr]] with n = 1
    * (a 1-gram IS the token stream, same tokenizer fold): the previous
    * `filter(split(lower(...)))` lambda was a Catalyst higher-order
    * function, which is CodegenFallback and drops the WHOLE stage using
    * it onto the interpreted path (measured 2x on the bloom scan,
    * round 13) — the native form keeps token-consuming scans in
    * whole-stage codegen. */
  def tokens(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.ShingleExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), 1))

  /** Word n-gram shingles over the token array; empty when fewer than `n`
    * tokens, NULL for a NULL array (strict semantics so any engine — and
    * the native [[graft.functions.expressions.ShingleExpr]], which
    * null-propagates — replicates it exactly; without the explicit NULL
    * branch, size(NULL) >= n is NULL and falls into the empty-array
    * otherwise, silently diverging from the native path on NULL text).
    * Uses O(1) element_at lookups per gram (a slice per position would be
    * O(tokens²) per document). */
  def wordShingles(toks: Column, n: Int): Column =
    F.when(toks.isNull, F.lit(null).cast("array<string>"))
      .when(F.size(toks) >= n,
        F.transform(
          F.sequence(F.lit(1), F.size(toks) - (n - 1)),
          i => F.concat_ws(" ", (0 until n).map(j => F.element_at(toks, i + j)): _*)))
      .otherwise(F.array().cast("array<string>"))

  private def countMatches(text: Column, re: String): Column =
    F.regexp_count(text, F.lit(re)).cast("double")

  /** Ratio of punctuation characters to total characters (explicit
    * whitespace class — see [[tokenCount]] on the Java-vs-RE2 `\s` trap). */
  def punctRatio(text: Column): Column =
    countMatches(text, "[^A-Za-z0-9 \\t\\n\\f\\r]") / F.greatest(F.length(text).cast("double"), F.lit(1.0))

  /** Ratio of digit characters to total characters. */
  def digitRatio(text: Column): Column =
    countMatches(text, "[0-9]") / F.greatest(F.length(text).cast("double"), F.lit(1.0))

  /** Ratio of alphabetic characters to total characters. */
  def alphaRatio(text: Column): Column =
    countMatches(text, "[A-Za-z]") / F.greatest(F.length(text).cast("double"), F.lit(1.0))

  /** Small per-language stopword inventories for the heuristic language ID.
    * Public-knowledge word lists; intentionally tiny and deterministic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** True when an inventory is CJK: `\b` in Java (and DuckDB/RE2) regex
    * only fires next to `[A-Za-z0-9_]`, so boundary-anchored patterns can
    * NEVER match ideographs — CJK inventories must match bare. Chinese
    * text has no word delimiters anyway, so bare substring hits are the
    * correct token semantics for it. */
  private[graft] def isCjkInventory(words: Seq[String]): Boolean =
    words.forall(_.forall(ch => Character.UnicodeScript.of(ch) == Character.UnicodeScript.HAN))

  /** Regex matching `words` as standalone tokens (boundary-anchored for
    * alphabetic scripts, bare for CJK — see [[isCjkInventory]]). */
  private[graft] def hitsPattern(words: Seq[String]): String =
    if (isCjkInventory(words)) "(" + words.mkString("|") + ")"
    else "\\b(" + words.mkString("|") + ")\\b"

  /** Count of hits of `words` as standalone tokens in lowercased `text`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    F.regexp_count(F.lower(text), F.lit(hitsPattern(words))).cast("long")

  /** Heuristic language ID: argmax of per-language stopword hits, ties
    * broken by the stopword INVENTORY order (the `stopwords` Seq below —
    * "en" wins an en/de tie; NOT alphabetical, and the DuckDB oracle
    * mirrors the same order, so reordering the inventory is a
    * result-changing edit); "und" (undetermined) when no hits. */
  def langId(text: Column): Column = {
    // ONE single-pass native expression for all five inventory counts
    // ([[graft.functions.expressions.LangIdHitsExpr]], r21 — the former
    // form paid five separate regex scans over the lowered text per
    // row); the argmax fold below is the identical Catalyst ops over the
    // struct fields, so every consumer's hash is unchanged.
    val st = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.LangIdHitsExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))
    val scored = stopwords.zipWithIndex.map { case ((lang, _), i) =>
      (lang, st.getField(s"h$i").cast("long")) }
    val best = scored.map(_._2).reduce((a, b) => F.greatest(a, b))
    scored.foldRight(F.lit("und"): Column) { case ((lang, hits), els) =>
      F.when(hits > 0 && hits === best, F.lit(lang)).otherwise(els)
    }
  }

  /** The pre-r21 five-regex-pass formulation of [[langId]], kept ONLY as
    * the equivalence witness for QualityStatsSpec. */
  private[graft] def langIdLegacy(text: Column): Column = {
    val scored = stopwords.map { case (lang, words) => (lang, stopwordHits(text, words)) }
    val best = scored.map(_._2).reduce((a, b) => F.greatest(a, b))
    scored.foldRight(F.lit("und"): Column) { case ((lang, hits), els) =>
      F.when(hits > 0 && hits === best, F.lit(lang)).otherwise(els)
    }
  }

  /** English stopword ratio over whitespace tokens. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, stopwords.head._2).cast("double") /
      F.greatest(tokenCount(text).cast("double"), F.lit(1.0))

  /** Composite quality score in [0,1]: favors mid-length documents with
    * high alphabetic content, some stopwords, low digit/punct noise.
    * Deterministic per-row double arithmetic (same result in any engine).
    *
    * All five counters come from ONE single-pass native expression
    * ([[graft.functions.expressions.QualityStatsExpr]], r21 — the former
    * form paid five separate regexp_count scans over the full text per
    * row, the CPU inside the suite's worst scale exponent, q_psi_drift);
    * the score is the IDENTICAL Catalyst double arithmetic over the
    * struct fields, so every consumer's hash is unchanged (the counters
    * are defined as the regex counts — see the expression's contract —
    * and int→long→double casts are value-exact). The struct subtree is
    * referenced once and shared: whole-stage codegen's subexpression
    * elimination evaluates the pass once per row. */
  def qualityScore(text: Column): Column =
    qualityScoreFromStats(qualityStats(text))

  /** The single-pass counter struct behind [[qualityScore]]
    * (`struct<n_len, n_tokens, n_alpha, n_digits, n_punct, n_stop>`) —
    * exposed so a caller that ALSO emits the underlying ratios (the
    * q_quality gate) can project the struct once and derive every column
    * from it instead of paying separate regex passes per column. */
  def qualityStats(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.QualityStatsExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** [[qualityScore]]'s arithmetic over an already-projected stats struct
    * column — bit-identical Catalyst ops to the pre-r21 regex chain. */
  def qualityScoreFromStats(st: Column): Column = {
    val len = st.getField("n_len").cast("double")
    val lenScore = F.least(len / F.lit(500.0), F.lit(1.0))
    val alpha = st.getField("n_alpha").cast("double") / F.greatest(len, F.lit(1.0))
    val stop = F.least(
      (st.getField("n_stop").cast("double") /
        F.greatest(st.getField("n_tokens").cast("double"), F.lit(1.0))) * 4.0,
      F.lit(1.0))
    val noise = st.getField("n_digits").cast("double") / F.greatest(len, F.lit(1.0)) +
      st.getField("n_punct").cast("double") / F.greatest(len, F.lit(1.0))
    F.greatest(F.least(
      lenScore * 0.3 + alpha * 0.4 + stop * 0.3 - noise * 0.5,
      F.lit(1.0)), F.lit(0.0))
  }

  /** The pre-r21 five-regex-pass formulation of [[qualityScore]], kept
    * ONLY as the equivalence witness: QualityStatsSpec asserts the two
    * forms agree bit-for-bit (raw doubles, no rounding) on the gate
    * tables and on adversarial unicode. Never used in a query path. */
  private[graft] def qualityScoreLegacy(text: Column): Column = {
    val lenScore = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    val alpha = alphaRatio(text)
    val stop = F.least(stopwordRatio(text) * 4.0, F.lit(1.0))
    val noise = digitRatio(text) + punctRatio(text)
    F.greatest(F.least(
      lenScore * 0.3 + alpha * 0.4 + stop * 0.3 - noise * 0.5,
      F.lit(1.0)), F.lit(0.0))
  }

  /** Whitespace-normalized text: trim + collapse runs of whitespace. */
  def normalizeWs(text: Column): Column =
    F.trim(F.regexp_replace(text, "[ \\t\\n\\f\\r]+", " "))

  /** Content fingerprint: md5 of lowercased whitespace-normalized text —
    * the exact-dup key that survives formatting differences. */
  def fingerprint(text: Column): Column = F.md5(F.lower(normalizeWs(text)))

  /** PII/noise scrubbing for training corpora: emails → `<EMAIL>`,
    * URLs → `<URL>`, digit runs (2+) → `<NUM>`, applied in that order
    * (emails before the digit pass so an address is one `<EMAIL>`, not a
    * shredded mix). A chain of codegen'd regexp_replace — no UDF — using
    * the Java∩RE2 regex subset so the SQL oracle replays it verbatim. */
  def scrub(text: Column): Column =
    F.regexp_replace(
      F.regexp_replace(
        F.regexp_replace(text,
          F.lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), F.lit("<EMAIL>")),
        F.lit("https?://[^ \\t\\n\\f\\r]+"), F.lit("<URL>")),
      F.lit("[0-9]{2,}"), F.lit("<NUM>"))

  /** HTML → text extraction (the WET-style first step of a web-corpus
    * pipeline): drop `<script>`/`<style>` blocks WITH their contents,
    * drop comments, strip remaining tags, decode the five common
    * entities plus `&amp;` LAST (the standard order — decoding `&amp;`
    * first would re-decode text like `&amp;lt;`), collapse whitespace.
    * A chain of codegen'd regexp_replace/replace in the Java∩RE2 regex
    * subset (inline `(?is)` flags + non-greedy spans work in both
    * dialects) so the SQL oracle replays it verbatim. Scan-only: a pure
    * map at 100 TB — no exchange, no UDF, no DOM allocation. */
  def htmlExtract(html: Column): Column = {
    // TWO per-tag passes, not one alternation: the alternating form
    // <(script|style)...</(script|style)> accepts MISMATCHED open/close
    // pairs, so an embedded "</style>" inside a script string literal
    // would terminate the script block early and leak code into the
    // extracted text (RE2 has no backreferences to tie the tags).
    val noScript = F.regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noBlock = F.regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = F.regexp_replace(noBlock, "(?s)<!--.*?-->", " ")
    val noTags = F.regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => F.replace(c, F.lit(e), F.lit(v)) }
    normalizeWs(decoded)
  }

  /** Unicode NFC normalization ([[graft.functions.expressions.NfcNormalizeExpr]]):
    * composes decomposed combining sequences so visually-identical text
    * hashes identically before dedup/fingerprinting. Native, codegen'd,
    * zero-allocation on already-normalized rows. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.NfcNormalizeExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** ftfy-style mojibake repair ([[graft.functions.expressions
    * .MojibakeRepairExpr]]): fix UTF-8 text that an upstream system
    * decoded as cp1252 ("cafÃ©" → "café"), up to two layers deep; text
    * that is not mojibake by the strict-decode rule passes through
    * unchanged. Run BEFORE [[nfcNormalize]] in extraction order. */
  def repairMojibake(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.MojibakeRepairExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** URL canonicalization — the key-normalization step URL-level crawl
    * dedup needs before any exact grouping: lowercase scheme + host
    * (path/query case is significant, so left alone), strip the scheme's
    * default port (:80/http, :443/https), default an empty path to "/",
    * sort query parameters bytewise (param order is transport noise),
    * drop the fragment. Pure regexp_extract/array_sort Column algebra in
    * the Java∩RE2 subset — codegen'd, scan-only, replayed verbatim by
    * the SQL oracle. Non-URL input degrades to "://" + best-effort parts
    * rather than erroring (crawl data is dirty by definition). */
  def canonicalUrl(url: Column): Column = {
    val scheme = F.lower(F.regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = F.lower(F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    val port = F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)", 1)
    val path0 = F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = F.when(path0 === "", F.lit("/")).otherwise(path0)
    val query = F.regexp_extract(url, "\\?([^#]*)", 1)
    val sortedQ = F.array_join(F.array_sort(F.split(query, "&")), "&")
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    F.concat(scheme, F.lit("://"), host,
      F.when(keepPort, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
      path,
      F.when(query === "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), sortedQ)))
  }

  /** The host of a URL, lowercased (port/userinfo-free) — the join key of
    * domain-level crawl policy. The optional `userinfo@` authority prefix
    * is skipped (real crawl URLs carry it; matching it as host would let
    * `https://user@bad-ads.net/` sail past a blocklist), and a single
    * trailing dot (the absolute-FQDN root marker) is stripped so
    * `example.com.` joins the same policy row as `example.com`. */
  def urlHost(url: Column): Column =
    F.lower(F.regexp_replace(
      F.regexp_extract(url,
        "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]*)", 1),
      "\\.$", ""))

  /** Domain-blocklist filtering — the UT1-style step every crawl pipeline
    * runs before anything content-based: a URL is blocked iff its host or
    * ANY parent dot-suffix (>= 2 labels) appears in `blocklist`
    * (an `example.com` entry covers every subdomain; a bare TLD never
    * matches — [[graft.functions.expressions.HostSuffixesExpr]]).
    *
    * Scale shape (the [[graft.dedup.Dedup.bloomContamination]] pattern):
    * the blocklist builds a driver-side md5 Bloom bitset (bounded collect,
    * `maxBlocklist` guard), and the corpus scan tests each host's suffix
    * array against it with ONE codegen'd expression — no join, no
    * exchange for the overwhelming clean majority. Only Bloom-POSITIVE
    * rows (true matches + bounded false positives) explode their suffixes
    * into a broadcast join against the real list for exact adjudication
    * (most-specific = longest matching entry wins), so the output is
    * EXACT — the sketch is pruning, not truth (the
    * [[Sketches.heavyHitters]] discipline) — and the only exchange is the
    * match-side aggregation, bounded by the blocked fraction of the
    * corpus, never corpus-sized.
    *
    * Output: (`idCol`, host, blocked, matched_domain — null when clean).
    */
  def domainBlocklist(df: org.apache.spark.sql.DataFrame, urlCol: String,
                      blocklist: org.apache.spark.sql.DataFrame,
                      idCol: String = "doc_id", domainCol: String = "domain",
                      mBits: Int = 1 << 20, kHashes: Int = 4,
                      maxBlocklist: Int = 4000000): org.apache.spark.sql.DataFrame = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      s"mBits must be a power of two >= 64, got $mBits")
    require(kHashes >= 1 && kHashes * 8 <= 32, s"kHashes in 1..4, got $kHashes")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // blocklist -> driver bitset: bounded BEFORE the collect (limit max+1
    // then require — the bloomContamination guard shape).
    val domRows = blocklist.select(F.lower(F.col(domainCol))).limit(maxBlocklist + 1).collect()
    require(domRows.length <= maxBlocklist,
      s"blocklist exceeds $maxBlocklist entries; raise maxBlocklist deliberately")
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val words = new Array[Long](mBits / 64)
    domRows.foreach { r =>
      if (!r.isNullAt(0)) {
        val digest = md5.digest(r.getString(0).getBytes("UTF-8"))
        var j = 0
        while (j < kHashes) {
          var v = 0L; var b = 0
          while (b < 4) { v = (v << 8) | (digest(j * 4 + b) & 0xffL); b += 1 }
          val p = (v % mBits).toInt
          words(p >>> 6) |= (1L << (p & 63))
          j += 1
        }
        md5.reset()
      }
    }
    // base projection once; the bloom test in a CHAINED select so the
    // suffix array is computed a single time per row (CollapseProject
    // keeps non-cheap expressions single-evaluation — the docShingleIndex
    // precedent).
    val sfx = ColumnBridge.column(graft.functions.expressions.HostSuffixesExpr(
      ColumnBridge.expression(urlHost(F.col(urlCol)))))
    val base = df
      .select(F.col(idCol), urlHost(F.col(urlCol)).as("host"), sfx.as("_sfx"))
      .select(F.col(idCol), F.col("host"), F.col("_sfx"),
        // coalesce: a null url (null host/suffixes) is CLEAN, not dropped
        // — without it the null _cand fails both filters below
        F.coalesce(
          ColumnBridge.column(graft.functions.expressions.BloomHitsExpr(
            ColumnBridge.expression(F.col("_sfx")), words, mBits, kHashes)) >= 1,
          F.lit(false)).as("_cand"))
    val clean = base.filter(!F.col("_cand"))
      .select(F.col(idCol), F.col("host"), F.lit(false).as("blocked"),
        F.lit(null).cast("string").as("matched_domain"))
    // Deliberate-size note (review r16): the hint forces the broadcast at
    // any legal size — at the 4M-entry guard ceiling that is hundreds of
    // MB shipped to every executor. Acceptable because only BLOOM-POSITIVE
    // rows reach this join (a vanishing corpus fraction), so the shuffled
    // alternative saves little; callers above ~1M entries who see driver
    // memory pressure should drop the hint and let AQE pick (the
    // leakageSafeSplit precedent).
    val decided = base.filter(F.col("_cand"))
      .select(F.col(idCol), F.col("host"), F.explode(F.col("_sfx")).as("_s"))
      .join(F.broadcast(blocklist.select(F.lower(F.col(domainCol)).as("_dom"))),
        F.col("_s") === F.col("_dom"), "left")
      .groupBy(F.col(idCol), F.col("host"))
      .agg(F.max_by(F.col("_dom"), F.length(F.col("_dom"))).as("matched_domain"))
      .select(F.col(idCol), F.col("host"),
        F.col("matched_domain").isNotNull.as("blocked"), F.col("matched_domain"))
    clean.unionByName(decided)
  }

  /** Winnowing fingerprints: rolling-hash k-gram minima per w-window
    * (see [[graft.functions.expressions.WinnowExpr]]). array<bigint>. */
  def winnowFingerprints(text: Column, k: Int = 16, w: Int = 32): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.WinnowExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), k, w))

  /** The positional rolling k-gram hash stream winnowing folds
    * ([[graft.functions.expressions.KgramHashesExpr]]) — staged for the
    * oracle so the w-window selection grades as SQL window arithmetic. */
  def kgramHashes(text: Column, k: Int = 16): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.KgramHashesExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), k))

  /** The Gopher quality-rule suite (Rae et al. 2021 §A1.1): per-document
    * rule stats plus a pass/fail flag per rule and overall — the standard
    * heuristic pre-filter every web-scale pretraining pipeline runs
    * before the model-based ones. Defaults are the published thresholds.
    *
    * All eight counters come from ONE single-pass native expression
    * ([[graft.functions.expressions.GopherStatsExpr]] — eight separate
    * higher-order-function folds would drop the scan to the interpreted
    * path); the flags are plain Column comparisons on exact integer
    * ratios (single IEEE divisions, bit-identical in the SQL oracle).
    * Scan-only: no exchange, no join — at 100 TB this is a pure map.
    *
    * Emits every document with >= 1 token (the tokenizer contract's
    * dropped-doc convention); ratios are rounded to 6 dp for display,
    * flags are computed on the UNROUNDED values in both engines. */
  def gopherRules(docs: org.apache.spark.sql.DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
                  maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
                  minStopwords: Int = 2): org.apache.spark.sql.DataFrame = {
    val st = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.GopherStatsExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(F.col(textCol))))
    def ratio(n: Column, d: Column): Column = n.cast("double") / d.cast("double")
    graft.Spread(docs)
      .select(F.col(idCol), st.as("st"))
      .filter(F.col("st.n_words") >= 1)
      .select(
        F.col(idCol),
        F.col("st.n_words").as("n_words"),
        ratio(F.col("st.n_chars"), F.col("st.n_words")).as("mwl"),
        ratio(F.col("st.n_symbols"), F.col("st.n_words")).as("symr"),
        ratio(F.col("st.n_bullet"), F.col("st.n_lines")).as("bulr"),
        ratio(F.col("st.n_ellipsis"), F.col("st.n_lines")).as("ellr"),
        ratio(F.col("st.n_alpha"), F.col("st.n_words")).as("alpr"),
        F.col("st.n_stop").as("n_stop"))
      .select(
        F.col(idCol), F.col("n_words"),
        F.round(F.col("mwl"), 6).as("mean_word_len"),
        F.round(F.col("symr"), 6).as("symbol_ratio"),
        F.round(F.col("bulr"), 6).as("bullet_ratio"),
        F.round(F.col("ellr"), 6).as("ellipsis_ratio"),
        F.round(F.col("alpr"), 6).as("alpha_ratio"),
        F.col("n_stop"),
        (F.col("n_words") >= minWords && F.col("n_words") <= maxWords)
          .as("ok_words"),
        (F.col("mwl") >= minMeanWordLen && F.col("mwl") <= maxMeanWordLen)
          .as("ok_word_len"),
        (F.col("symr") <= maxSymbolRatio).as("ok_symbols"),
        (F.col("bulr") <= maxBulletRatio).as("ok_bullets"),
        (F.col("ellr") <= maxEllipsisRatio).as("ok_ellipsis"),
        (F.col("alpr") >= minAlphaRatio).as("ok_alpha"),
        (F.col("n_stop") >= minStopwords).as("ok_stopwords"))
      .withColumn("passes",
        F.col("ok_words") && F.col("ok_word_len") && F.col("ok_symbols") &&
          F.col("ok_bullets") && F.col("ok_ellipsis") && F.col("ok_alpha") &&
          F.col("ok_stopwords"))
  }

  /** The C4 cleaning rule suite (Raffel et al. 2020 §2.2; c4.py
    * constants) — the web-corpus LINE filter that complements
    * [[gopherRules]]' document-statistics filter: per '\n'-line, keep
    * only terminal-punctuated (. ! ? ") lines of ≥ 5 words that are
    * neither javascript-enable boilerplate nor cookie/policy notices;
    * per document, drop pages mentioning "lorem ipsum" or containing
    * '{' (code), and require ≥ `minKeptLines` surviving lines.
    *
    * Output: (idCol, text_clean, n_lines, n_kept, has_lorem, has_brace,
    * c4_keep) — the cleaned text is the kept lines re-joined with '\n',
    * hash-exact vs the oracle INCLUDING the rebuilt text.
    *
    * Scale shape: scan-only — one single-pass native expression
    * ([[graft.functions.expressions.C4StatsExpr]]; the HOF formulation
    * is CodegenFallback) and zero exchanges beyond Spread. */
  def c4Rules(docs: org.apache.spark.sql.DataFrame,
              idCol: String = "doc_id", textCol: String = "text",
              minKeptLines: Int = 3): org.apache.spark.sql.DataFrame = {
    val st = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.C4StatsExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(F.col(textCol))))
    graft.Spread(docs)
      .select(F.col(idCol), st.as("st"))
      .select(
        F.col(idCol),
        F.col("st.text_clean").as("text_clean"),
        F.col("st.n_lines").cast("long").as("n_lines"),
        F.col("st.n_kept").cast("long").as("n_kept"),
        F.col("st.has_lorem").as("has_lorem"),
        F.col("st.has_brace").as("has_brace"),
        (F.col("st.n_kept") >= minKeptLines &&
          !F.col("st.has_lorem") && !F.col("st.has_brace")).as("c4_keep"))
  }

  /** Compression-ratio quality signal ([[graft.functions.expressions
    * .DeflateSizeExpr]]) — the Dolma gzip-ratio filter: ratio =
    * utf8_bytes / deflate_bytes, round 6; boilerplate compresses far
    * better than prose (high ratio), noise worse (low). `keep` brackets
    * the ratio in [lo, hi]. Zero-shuffle scan; engine-internal byte
    * counts (JDK zlib), so the gate is rows-only and the spec pins the
    * ordering property the filter actually uses. */
  def compressionRatio(df: org.apache.spark.sql.DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       lo: Double = 1.2, hi: Double = 6.0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val comp = ColumnBridge.column(
      graft.functions.expressions.DeflateSizeExpr(
        ColumnBridge.expression(F.col(textCol))))
    df.select(F.col(idCol),
        F.length(F.col(textCol).cast("binary")).cast("long").as("n_bytes"),
        comp.as("n_deflate"))
      .select(F.col(idCol), F.col("n_bytes"), F.col("n_deflate"),
        F.round(F.col("n_bytes").cast("double") /
          F.greatest(F.col("n_deflate").cast("double"), F.lit(1.0)), 6)
          .as("compression_ratio"))
      .withColumn("keep",
        F.col("compression_ratio") >= lo && F.col("compression_ratio") <= hi)
  }

  /** Unicode-script mix profile ([[graft.functions.expressions
    * .ScriptStatsExpr]]): per document, explicit-range character counts
    * (latin/digit/CJK/cyrillic/space/other), round-6 script fractions,
    * and the majority script (ties to the lexicographically smallest
    * name) — the mC4/CCNet script-routing signal (a lang=zh page with a
    * 2% CJK ratio is misrouted boilerplate). ONE pass per document in
    * whole-stage codegen vs six regex scans; the oracle runs the
    * equivalent explicit-range regexes. */
  def scriptProfile(df: org.apache.spark.sql.DataFrame,
                    idCol: String = "doc_id",
                    textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val st = ColumnBridge.column(
      graft.functions.expressions.ScriptStatsExpr(
        ColumnBridge.expression(F.col(textCol))))
    def frac(c: String) = F.expr(
      s"round(CAST($c AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0), 6)")
    df.select(F.col(idCol), st.as("sc"))
      .select(F.col(idCol),
        F.col("sc.n_chars").as("n_chars"), F.col("sc.n_latin").as("n_latin"),
        F.col("sc.n_digit").as("n_digit"), F.col("sc.n_cjk").as("n_cjk"),
        F.col("sc.n_cyrillic").as("n_cyrillic"), F.col("sc.n_space").as("n_space"),
        F.col("sc.n_other").as("n_other"))
      .select(F.col("*"),
        frac("n_latin").as("latin_frac"), frac("n_cjk").as("cjk_frac"),
        frac("n_cyrillic").as("cyrillic_frac"),
        F.expr("""CASE
          WHEN n_cjk >= n_cyrillic AND n_cjk >= n_latin AND n_cjk >= n_other THEN 'cjk'
          WHEN n_cyrillic >= n_latin AND n_cyrillic >= n_other THEN 'cyrillic'
          WHEN n_latin >= n_other THEN 'latin'
          ELSE 'other' END""").as("main_script"))
  }

  /** Phrase-blocklist filtering ([[graft.functions.expressions
    * .PhraseHitsExpr]], Aho–Corasick 1975) — the C4 "bad words" policy
    * step (Raffel et al. 2020): per document, the distinct blocklist
    * phrases contained in the lowercased text (sorted), their count, and
    * the blocked verdict. ONE automaton pass per document — O(len +
    * hits) regardless of blocklist size, vs P contains() scans; the
    * automaton ships with the plan and builds once per executor, and the
    * scan stays inside whole-stage codegen (codegen-parity-pinned).
    * Case-insensitivity = lower(text) vs lowercase phrases, so the
    * oracle is the literal per-phrase contains(). */
  def phraseBlocklist(docs: org.apache.spark.sql.DataFrame, phrases: Seq[String],
                      idCol: String = "doc_id",
                      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val matched = ColumnBridge.column(
      graft.functions.expressions.PhraseHitsExpr(
        ColumnBridge.expression(F.lower(F.col(textCol))),
        phrases.map(_.toLowerCase(java.util.Locale.ROOT)).toArray))
    docs.select(F.col(idCol), matched.as("matched"))
      .select(F.col(idCol), F.col("matched"),
        F.size(F.col("matched")).cast("long").as("n_matched"),
        (F.size(F.col("matched")) > 0).as("blocked"))
  }
}
