package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline
  * (SURVEY.md §7.5): tokenization, quality scoring, language ID,
  * fingerprinting, SimHash, MinHash.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * higher-order array functions, so the whole pipeline stays inside
  * whole-stage codegen — no Scala UDF boundary, no serialization of
  * row data to closures, and Catalyst can still prune/push the scan.
  */
object Text {

  /** Projection-level `let`: evaluate `c` ONCE and derive `f(bound)`
    * against the bound value. Encoded as
    * `element_at(transform(array(c), x => f(x)), 1)` — the lambda
    * variable is materialized before `f`'s body runs, and Catalyst
    * cannot rewrite extraction through the lambda, so however many
    * times `f` references its argument, `c` is computed exactly once
    * per row.
    *
    * Why it exists: Catalyst does NOT common-subexpression-eliminate
    * across higher-order-function lambdas, and predicate pushdown /
    * CollapseProject substitute a `withColumn` alias back into every
    * use site — a token array consumed by N HOF sites re-runs the
    * tokenizer N times (measured: d10's pre-fix plan evaluated it 20×).
    * Binding through a lambda is the one projection-local barrier the
    * optimizer honors. */
  def let(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Lowercased whitespace tokenization; empty strings removed.
    * `lower()` stays the Spark builtin (collation semantics
    * untouched); the split+filter pair is the native one-pass
    * [[WhitespaceTokens]] — the composed ArrayFilter ran an
    * interpreted lambda per element (CodegenFallback) in the hottest
    * expression of the catalog. Equivalence pinned in
    * TokenExprsSpec against [[tokensComposed]]. */
  def tokens(text: Column): Column =
    TokenExprs.whitespaceTokens(lower(text))

  /** The pre-r14 composed form — kept as the semantic reference the
    * spec compares [[tokens]] against. */
  private[graft] def tokensComposed(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Word n-gram shingles as space-joined strings: the unit set for
    * MinHash / Jaccard near-dup detection.
    *
    * PERF: pass `toks` as a *materialized column reference*, not an
    * inline expression — Catalyst does not CSE across higher-order-
    * function lambdas, so an inline tokenizer here would re-run once
    * per shingle position (O(T²) per row). See BENCH notes. */
  def wordShingles(toks: Column, n: Int): Column =
    // Native one-pass shingler (r14): the composed transform+slice+
    // concat_ws form ran an interpreted ArrayTransform lambda per
    // shingle position and allocated a sliced array copy each time.
    // Same values incl. the short-doc and NULL-array guards —
    // equivalence pinned in TokenExprsSpec vs [[wordShinglesComposed]].
    TokenExprs.wordShingles(toks, n)

  /** The pre-r14 composed form — kept as the semantic reference the
    * spec compares [[wordShingles]] against. */
  private[graft] def wordShinglesComposed(toks: Column, n: Int): Column =
    // Docs shorter than n tokens have no shingles. Without the guard,
    // sequence(1, 0) DESCENDS ([1,0] — Spark sequence is inclusive both
    // ways) and slice(toks, 0, n) throws INVALID_PARAMETER_VALUE.START.
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Ratio of characters matching a class (e.g. punctuation) —
    * building block for quality scores. */
  def charClassRatio(text: Column, regexClass: String): Column = {
    val total = greatest(length(text), lit(1)).cast("double")
    length(regexp_replace(text, s"[^$regexClass]", "")).cast("double") / total
  }

  /** Fraction of tokens found in `words` (e.g. a stopword list).
    * Native one-pass counter ([[WordSetHits]]) — the composed
    * `size(filter(..., array_contains))` form ran an interpreted
    * lambda (ArrayFilter is CodegenFallback) with a linear list scan
    * per token; occurrence semantics are identical. */
  def listHitRatio(toks: Column, words: Seq[String]): Column =
    element_at(WordSetHits.wordSetHits(toks, Seq(words)), 1)
      .cast("double") / greatest(size(toks), lit(1)).cast("double")

  /** Minimal per-language function-word lists for the n-gram/stopword
    * language-ID heuristic. Tiny on purpose: these ship into the plan
    * as literals (broadcast with the task binary, zero shuffle). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"))

  /** Language-ID: struct(lang, score) with the max marker-hit ratio;
    * ties and zero-hit rows → "und". Deterministic argmax (lexicographic
    * tie-break via the ordered fold). */
  def langId(toks: Column): Column = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    // ONE native hash-probe pass counts all four marker lists
    // (WordSetHits; the four element_at references share the
    // subexpression — codegen subexpression elimination applies to
    // non-HOF exprs, and even a miss costs 4 native passes, not 4
    // interpreted filter lambdas). The zero-hit fallback rides
    // INSIDE the greatest as a sentinel struct: "und" sorts above
    // every marker language, so it wins exactly when all scores are
    // 0 and any positive score beats it — semantically identical to
    // the previous when(best.score > 0) fallback, with neither the
    // duplicated `best` dag (pre-r3: every marker scan ran twice per
    // row) nor the interpreted `let` wrapper (r3-r4: ArrayTransform
    // is CodegenFallback, so binding through it dragged the whole
    // argmax out of codegen — the measured d03 0.72 → 1.2 s drift).
    val h = WordSetHits.wordSetHits(toks, langs.map(_._2))
    val n = greatest(size(toks), lit(1)).cast("double")
    greatest(langs.zipWithIndex.map { case ((lang, _), i) =>
      struct((element_at(h, i + 1).cast("double") / n).as("score"),
        lit(lang).as("lang"))
    } :+ struct(lit(0.0).as("score"), lit("und").as("lang")): _*)
  }

  /** Heuristic document quality in [0,1]: rewards normal-length docs,
    * penalizes punctuation/digit-heavy text, rewards stopword presence
    * (prose-likeness). Mirrors C4/Gopher-style rule scoring.
    *
    * PERF: prefer [[qualityScoreFromToks]] with a MATERIALIZED token
    * column — this convenience overload inlines the tokenizer, which
    * Catalyst re-evaluates at each HOF use site (no CSE across
    * lambdas). */
  def qualityScore(text: Column): Column =
    qualityScoreFromToks(text, Text.tokens(text))

  def qualityScoreFromToks(text: Column, toks: Column): Column = {
    val lenScore = least(size(toks).cast("double") / 20.0, lit(1.0))
    val punct = charClassRatio(text, "\\p{Punct}")
    val digits = charClassRatio(text, "0-9")
    val stop = listHitRatio(toks, langMarkers.values.flatten.toSeq)
    val raw = lenScore * 0.4 + (lit(1.0) - punct) * 0.2 +
      (lit(1.0) - digits) * 0.2 + least(stop * 5.0, lit(1.0)) * 0.2
    round(raw, 4)
  }

  /** Stopword list shared by the Gopher-rule filter and its DuckDB
    * oracle (the English function-word markers). */
  val gopherStopwords: Seq[String] = langMarkers("en")

  /** Gopher-style repetition/quality gate signals (Rae et al. 2021,
    * "Scaling Language Models", table A1 heuristics) restated in EXACT
    * integer arithmetic so the oracle hash-compares without float
    * rounding hazards:
    *
    *   - `n_words`         token count
    *   - `n_chars`         summed token length
    *   - `n_alpha`         tokens containing at least one [a-z]
    *   - `stop_hits`       distinct stopwords present (of 8 markers)
    *   - `passes`          50 ≤ n_words ≤ 100000
    *                       ∧ 3 ≤ mean word length ≤ 10  (3n ≤ chars ≤ 10n)
    *                       ∧ alpha fraction ≥ 0.8        (5·alpha ≥ 4n)
    *                       ∧ stop_hits ≥ 2
    *
    * One pass over a MATERIALIZED token column; pure codegen (HOF
    * folds), no shuffle — the scan stays the only exchange at 100 TB. */
  def gopherStats(toks: Column): Column = {
    val n = size(toks).cast("long")
    val chars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val alpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val stops = size(filter(array(gopherStopwords.map(lit): _*),
      w => array_contains(toks, w))).cast("long")
    struct(n.as("n_words"), chars.as("n_chars"), alpha.as("n_alpha"),
      stops.as("stop_hits"),
      (n.between(50L, 100000L) && (lit(3L) * n <= chars) &&
        (chars <= lit(10L) * n) && (lit(5L) * alpha >= lit(4L) * n) &&
        stops >= 2L).as("passes"))
  }

  /** Content fingerprint over whitespace-normalized lowercase text —
    * exact-dup key that survives formatting noise. md5 keeps the
    * oracle (DuckDB) bit-identical. Prefer [[fingerprintFromToks]]
    * when a materialized token column already exists. */
  def fingerprint(text: Column): Column =
    fingerprintFromToks(tokens(text))

  def fingerprintFromToks(toks: Column): Column =
    md5(concat_ws(" ", toks))

  /** 64-bit SimHash over the token multiset, xxhash64 per token.
    * bit_i(sig) = majority over tokens of bit_i(xxhash64(token)).
    * Returned as Long. Pure expression fold: aggregate() keeps a
    * 64-wide count vector per row; no shuffle, no UDF. */
  def simhash64(toks: Column): Column = {
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, i) => c + when(
            call_function("shiftright", h, i).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
      })
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** BPE-ish tokenization: the GPT-2-style pre-tokenizer regex
    * (contractions, letter runs, digit runs, punct runs — lookahead
    * variant dropped for RE2/Java portability). Counting these
    * approximates BPE token counts for budget accounting. */
  val bpeishPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  def bpeishCount(text: Column): Column =
    size(bpeishTokens(text)).cast("long")

  /** Order-sensitive rolling fingerprint over the token sequence:
    * acc_{i+1} = xxhash64(acc_i, hash(tok_i)). Unlike the set-based
    * [[fingerprint]], token order matters; overflow-free (no a*x+b),
    * so ANSI-mode safe. */
  def rollingFingerprint(toks: Column, seed: Long = 0L): Column =
    aggregate(toks, lit(seed),
      (acc, t) => xxhash64(acc, xxhash64(t)))

  /** X8 / base-meta (reference services/block_processing/base-meta.ts:
    * twitter-text extractHashtags/extractUrls — NB the reference's
    * only call site computes and then discards the result, a dead
    * path; these are the training-pipeline versions of the same ops).
    * Patterns are RE2-safe (no lookbehind) so the SAME string runs in
    * DuckDB for the oracle; simplified vs the full twitter-text spec
    * (documented divergence: no punycode/TLD validation). */
  val hashtagPattern: String =
    "(?:^|[^\\p{L}\\p{N}&/])#([\\p{L}\\p{N}_]*\\p{L}[\\p{L}\\p{N}_]*)"

  val urlPattern: String = "https?://[^\\s<>\"')\\]]+"

  def extractHashtags(text: Column): Column =
    transform(regexp_extract_all(text, lit(hashtagPattern), lit(1)),
      t => lower(t))

  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** URL canonicalization — the normalization step web-crawl corpora
    * apply before URL-level dedup (one canonical key per page across
    * scheme-case / www / default-port / tracking-param / fragment /
    * trailing-slash variants):
    *
    *   1. drop the `#fragment`;
    *   2. lowercase scheme + authority only (paths are case-sensitive
    *      per RFC 3986 — left untouched);
    *   3. strip a leading `www.`;
    *   4. strip default ports (`:80` http, `:443` https);
    *   5. drop tracking params (`utm_*`, `fbclid`, `gclid`), sort the
    *      survivors byte-wise, drop the `?` if none survive;
    *   6. strip one trailing `/` from a non-root path.
    *
    * Pure codegen regex/array chain, zero shuffle; every step is
    * anchored single-replacement so the DuckDB oracle can mirror it
    * exactly (d37). */
  def canonicalizeUrl(url: Column): Column = let(
    regexp_replace(url, "#.*$", "")) { noFrag =>
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val auth = regexp_replace(
      regexp_replace(
        regexp_replace(
          lower(regexp_extract(base,
            "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)),
          "^(https?://)www\\.", "$1"),
        "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val path0 = regexp_replace(base,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    val path = when(length(path0) > 1,
      regexp_replace(path0, "/$", "")).otherwise(path0)
    val keep = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    val q = array_join(array_sort(keep), "&")
    concat(auth, path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Overlapping token windows — chunking for context-bounded
    * training. Chunks start every `stride` tokens; the tail chunks
    * may be shorter than `win`; an empty token list yields no chunks
    * (the guard also keeps sequence() from descending). Pass a
    * MATERIALIZED token column (referenced twice). */
  def tokenChunks(toks: Column, win: Int, stride: Int): Column = {
    require(win >= 1 && stride >= 1, "tokenChunks: win/stride >= 1")
    when(size(toks) >= 1,
      transform(sequence(lit(1), size(toks), lit(stride)),
        st => slice(toks, st, lit(win))))
      .otherwise(array().cast("array<array<string>>"))
  }

  /** PII patterns — RE2-safe (char classes + bounded repeats, no
    * lookaround) so the SAME strings run in the DuckDB oracle.
    * Deliberately simple: the point is the scrubbing pipeline shape;
    * swap patterns per corpus policy. */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  val phonePattern: String = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails then phones (order matters and is mirrored in the
    * oracle SQL). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")

  /** Count of the most frequent token — the Gopher-style repetition
    * signal's numerator — WITHOUT an explode+groupBy shuffle: sort
    * the array and take 1 + the longest run of adjacent-equal flags,
    * all inside codegen. Empty input → 0. O(T log T) per row.
    *
    * The adjacent-equality flags are materialized ONCE (zip_with
    * against the shifted array): a direct (prev, run, best) fold
    * would reference its string-compare CaseWhen twice per step and
    * Catalyst does not CSE inside HOF lambdas — the flag array keeps
    * the fold int-only (one string compare per token). */
  def topTokenCount(toks: Column): Column = {
    val sorted = sort_array(toks)
    // zip_with pads the shorter (shifted) side with null: the last
    // element's flag compares against null → 0, which is correct
    val eq = zip_with(sorted,
      slice(sorted, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => when(a === b, lit(1)).otherwise(lit(0)))
    when(size(toks) === 0, lit(0)).otherwise(
      aggregate(eq,
        struct(lit(0).as("run"), lit(0).as("best")),
        (acc, x) => {
          val r = when(x === 1, acc.getField("run") + 1)
            .otherwise(lit(0))
          struct(r.as("run"),
            greatest(acc.getField("best"), r).as("best"))
        },
        acc => acc.getField("best") + 1))
  }

  /** Portable order-sensitive fingerprint: md5 chain SEEDED WITH THE
    * FIRST TOKEN (exactly DuckDB's `list_reduce` semantics, so the
    * catalog row is oracle-verifiable; empty input → null, single
    * token → the raw token). The xxhash64 [[rollingFingerprint]] is
    * the cheap engine-specific scale-path variant (spec-tested).
    * Pass a MATERIALIZED, already-truncated token column — the
    * argument is referenced three times. */
  def rollingFingerprintPortable(tk: Column): Column =
    when(size(tk) === 0, lit(null).cast("string"))
      .otherwise(aggregate(slice(tk, lit(2), size(tk)),
        element_at(tk, 1),
        (acc, t) => md5(concat(acc, t))))

  /** Engine-portable 60-bit token hash: the first 15 hex digits of
    * md5, parsed base-16. Reproducible in DuckDB as
    * `('0x' || substr(md5(t), 1, 15))::BIGINT`, which is what lets
    * the portable-simhash catalog row (m02) verify against a SQL
    * oracle; xxhash64 stays the cheap scale-path hash. 60 bits so the
    * value fits a signed long without sign games; simhash bits 60-63
    * are then constant 0 on every doc (hamming unaffected). */
  def portableTokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** fastText-style hashed-feature LINEAR quality classifier: each
    * token hashes to one of `buckets` feature slots, the doc score is
    * the integer sum of the slot weights (milli-units), label =
    * sign. The weights here are a deterministic md5-derived stand-in
    * (range ±1000 milli) so the oracle reproduces them — a real
    * deployment broadcasts trained weights as a plan-literal array
    * and changes NOTHING about the shape, which is the point: one
    * `aggregate` HOF over the token array, pure per-row codegen,
    * zero shuffle, zero joins. The model-based quality filter that
    * costs the same as a length count at 100 TB. */
  def hashLinearScore(toks: Column, buckets: Int = 4096): Column = {
    def w(t: Column): Column = pmod(portableTokenHash(
      concat(lit("w#"), pmod(portableTokenHash(t), lit(buckets.toLong))
        .cast("string"))), lit(2001L)) - lit(1000L)
    aggregate(toks, lit(0L), (acc, t) => acc + w(t))
  }

  /** Driver-side twin of [[portableTokenHash]] — same 60-bit value,
    * for deriving plan-literal constants (hash-family coefficients,
    * sign matrices) that SQL oracles re-derive via md5(). */
  def portableHashLocal(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** SimHash via the native codegen expression ([[SimHashExpr]]) over
    * pre-hashed tokens — same bits as [[simhash64]], one generated
    * loop per row instead of 64 composed ops per token. */
  def simhash64Fast(tokenHashes: Column): Column =
    SimHashExpr.simhash64FromHashes(tokenHashes)

  /** Hamming distance between two SimHash longs. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** MinHash signature (k permutations) over a shingle array.
    * One xxhash64 over the string per shingle, then k cheap fixed-width
    * re-hashes `xxhash64(h, salt_i)` over the resulting long — the
    * one-hash trick without the a*h+b overflow that ANSI mode rejects.
    * All codegen'd; deterministic: salts derived from `seed`. */
  def minhashSig(shingles: Column, k: Int, seed: Long = 42L): Column =
    minhashSigFromHashes(transform(shingles, s => xxhash64(s)), k, seed)

  /** MinHash over pre-hashed shingles. PERF: materialize the hash
    * array (`withColumn`) before calling — the k salt branches each
    * reference it, and an inline hash expression would be recomputed
    * k times (k full string-hash passes instead of 1). */
  def minhashSigFromHashes(hashes: Column, k: Int,
                           seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val salts = Seq.fill(k)(rng.nextLong())
    array(salts.map { salt =>
      coalesce(array_min(transform(hashes,
        h => xxhash64(h, lit(salt)))), lit(Long.MaxValue))
    }: _*)
  }

  /** LSH band keys for a MinHash signature: `bands` hashes, each over
    * `rows = k/bands` consecutive signature slots. Two docs sharing any
    * band key are near-dup candidates → equi-join on (band, key). */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          slice(sig, b * rowsPerBand + 1, rowsPerBand))).as("key"))
    }: _*)

  /** Markup tag pattern — RE2-safe (no backtracking, no lookaround),
    * identical in the DuckDB oracle. */
  val markupTagPattern: String = "<[^>]*>"

  /** HTML/markup → text cleaning (the CommonCrawl-style extraction
    * step before every text-quality op): drop tags, decode the
    * common entities, collapse whitespace. Pure codegen regexp/replace
    * chain — zero shuffle, embarrassingly parallel at 100 TB.
    *
    * Entity order matters and is mirrored verbatim in the oracle:
    * named entities first, `&amp;` LAST — so `&amp;lt;` decodes to
    * the literal text `&lt;` (one decoding pass, as a browser shows
    * it), not to `<`. This is deliberately a cleaning heuristic, not
    * a full HTML5 parser (no DOM, no numeric-entity table beyond
    * `&#39;`) — the pipeline shape is the point; swap the chain for a
    * parser UDF per corpus policy. */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, markupTagPattern, " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Exact Jaccard similarity of two string arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    val uni = size(array_union(ad, bd)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Shannon character entropy in bits — the low-cost "is this text
    * or line noise" quality signal (near 0 for single-char spam,
    * ~4.1 bits for English prose, higher for base64/hex blobs; both
    * tails are drop candidates in C4/Gopher-style filters).
    *
    *   H(d) = −Σ_c (n_c/L)·log2(n_c/L)   over the doc's distinct chars
    *
    * Determinism (house contract, see UnigramLm): each term is
    * quantized to INTEGER micro-bits (round(1e6·term)) and the sum is
    * exact integer addition — no float-sum-order dependence; the only
    * cross-engine float surface is log2 itself (≤1-ulp libm gap).
    *
    * Shape at 100 TB: per-row expression, zero shuffle — unlike the
    * explode-and-count formulation, the char histogram never leaves
    * the row. O(U·L) per doc for U distinct chars (U ≤ charset size,
    * ~70 for ASCII text), all inside whole-stage codegen.
    *
    * `chars` must be a MATERIALIZED column holding `split(text, "")`
    * (the wordShingles rule: Catalyst does not CSE across HOF
    * lambdas). Returns struct(n_uniq_chars LONG, ent_micro LONG);
    * entropy in bits = −ent_micro/1e6 (ent_micro carries the sign of
    * the summed terms, which are ≤ 0). NOTE on empty docs: with the
    * documented `split(text, "")` input an empty doc arrives as
    * [""] (Java split semantics), flows through the entropy branch,
    * and yields (1, 0) — the size-0 guard below applies only to a
    * genuinely empty array from some other producer. The native
    * [[CharEntropyMicro]] returns (0, 0) for empty strings and
    * counts CODE POINTS (the oracle alphabet), not UTF-16 units —
    * parity with this composed form holds on BMP text only.
    *
    * Histogram via SORTED RUN LENGTHS, not per-distinct-char filter
    * scans: sort once (O(L log L)), find run boundaries, diff
    * adjacent boundary positions. The naive
    * `transform(distinct, c => count(filter(chars, = c)))` is
    * O(U·L) string compares per row — measured 2.8× slower on the
    * sf0.1 corpus (5.2 s → 1.9 s steady-state). */
  def charEntropyParts(chars: Column): Column = {
    val len = size(chars).cast("double")
    val ent = let(array_sort(chars)) { sorted =>
      // run END positions (1-based): i where sorted[i] ≠ sorted[i+1]
      let(filter(sequence(lit(1), size(sorted)), i =>
        (i === size(sorted)) ||
          element_at(sorted, i) =!= element_at(sorted, i + 1))) {
        bounds =>
          struct(
            size(bounds).cast("long").as("n_uniq_chars"),
            aggregate(sequence(lit(1), size(bounds)), lit(0L),
              (acc, j) => acc + let(
                (element_at(bounds, j) -
                  when(j === 1, lit(0))
                    .otherwise(element_at(bounds, j - 1)))
                  .cast("double") / len) { p =>
                round(lit(1e6) * p * log2(p)).cast("long")
              }).as("ent_micro"))
      }
    }
    when(size(chars) === 0,
      struct(lit(0L).as("n_uniq_chars"), lit(0L).as("ent_micro")))
      .otherwise(ent)
  }
}
