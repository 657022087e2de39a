package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.expressions.WordShingles

/** Text-analysis column functions for the training-data pipeline:
  * tokenization, shingling, language-ID heuristics, quality ratios.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) and has an exact DuckDB-SQL equivalent so results are
  * oracle-verifiable.
  */
object TextFns {

  /** Whitespace tokens, empties dropped (split on single space — the
    * synthetic corpus is single-space separated; matches DuckDB
    * `string_split(text, ' ')`). */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => length(t) > lit(0))

  /** Distinct word k-shingles: contiguous k-grams joined by one space.
    * Guarded for < k tokens (Spark `sequence(1, 0)` counts *down*). */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(1), size(toks) - lit(k - 1)),
            i =>
              concat_ws(
                " ",
                (0 until k).map(j => element_at(toks, i + lit(j))): _*))))

  /** Every word k-gram occurrence in text order (NON-distinct — the
    * shape n-gram counting and repetition metrics need; the distinct
    * variant for dedup shingling is [[graft.dedup.Dedup.shingled]]).
    * Codegen'd flat loop, not an interpreted HOF. */
  def ngramsAll(text: Column, k: Int): Column =
    ColumnBridge.column(
      WordShingles(ColumnBridge.expression(text), k, distinct = false))

  /** Distinct word k-grams, first-occurrence order (codegen'd twin of
    * [[ngramsAll]]). */
  def ngramsDistinct(text: Column, k: Int): Column =
    ColumnBridge.column(
      WordShingles(ColumnBridge.expression(text), k, distinct = true))

  /** BPE-ish token count: words, single digits, and punctuation runs. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0)))

  // --- language-ID marker sets (disjoint across languages) ---
  val EnMarkers = Seq("the", "and", "is", "of", "to")
  val DeMarkers = Seq("und", "der", "die", "das", "nicht")
  val FrMarkers = Seq("le", "les", "des", "est", "une")
  val EsMarkers = Seq("el", "los", "las", "es", "una")
  val CjkPattern = "[\\u4e00-\\u9fff]"

  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))

  /** N-gram/stopword heuristic language ID. CJK chars force `zh`;
    * otherwise the marker-set with the highest hit count wins, ties
    * resolved en > de > fr > es, no hits at all → `und` (undetermined). */
  def langId(text: Column): Column = langIdFrom(text, tokens(text))

  /** [[langId]] over a pre-materialized tokens column — callers on the
    * hot path project tokens once so the four marker filters don't each
    * re-tokenize. */
  def langIdFrom(text: Column, toks: Column): Column =
    langIdFromCounts(
      text,
      markerCount(toks, EnMarkers),
      markerCount(toks, DeMarkers),
      markerCount(toks, FrMarkers),
      markerCount(toks, EsMarkers))

  /** THE language decision chain (CJK override, then marker-count
    * argmax with en > de > fr > es tie precedence) over pre-computed
    * marker counts — one definition, so callers that materialize the
    * counts in their own projection (qLangId) cannot drift from the
    * direct path. */
  def langIdFromCounts(
      text: Column,
      en: Column,
      de: Column,
      fr: Column,
      es: Column): Column = {
    val top = greatest(en, de, fr, es)
    when(regexp_count(text, lit(CjkPattern)) > 0, lit("zh"))
      .when(top === 0, lit("und"))
      .when(en === top, lit("en"))
      .when(de === top, lit("de"))
      .when(fr === top, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Stopword ratio against the combined marker sets. */
  def stopwordRatio(text: Column): Column = stopwordRatioFrom(tokens(text))

  def stopwordRatioFrom(toks: Column): Column = {
    val all = EnMarkers ++ DeMarkers ++ FrMarkers ++ EsMarkers
    when(size(toks) === 0, lit(0.0))
      .otherwise(markerCount(toks, all).cast("double") / size(toks))
  }

  /** Characters counted as "punctuation": anything that is not a
    * Unicode letter, digit, or space. The Unicode classes matter: the
    * ASCII-only `[^A-Za-z0-9 ]` would count every accented or CJK
    * LETTER as punctuation, so the quality model (punct weight −6.0)
    * would silently filter exactly the non-English documents langId
    * supports. `\p{L}\p{N}` parse identically in Java regex and
    * DuckDB's RE2 — shared with the SQL oracles. */
  val PunctClass = "[^\\p{L}\\p{N} ]"

  /** Fraction of punctuation characters (see [[PunctClass]]). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, PunctClass, "")))
          .cast("double") / length(text))

  /** Distinct-token / total-token ratio (1.0 = no repetition). */
  def distinctTokenRatio(text: Column): Column =
    distinctTokenRatioFrom(tokens(text))

  def distinctTokenRatioFrom(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))

  def meanTokenLen(text: Column): Column = meanTokenLenFrom(tokens(text))

  def meanTokenLenFrom(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks))

  /** Keep threshold for [[qualityScore]]. */
  val QualityThreshold = 0.7

  /** Literal-weight linear quality model over the shared feature set —
    * ONE definition for the batch query (`q_quality_model`) and the
    * streaming pipeline ([[graft.streaming.StreamLog.prepareStream]]),
    * so the scoring formula cannot drift between the two paths. Inputs
    * are the round(6) feature columns; the weighted sum is written in
    * one fixed association order so every engine evaluates identical
    * IEEE arithmetic. */
  def qualityScore(
      nTokens: Column,
      stopwordRatio: Column,
      distinctRatio: Column,
      punctRatio: Column): Column =
    round(
      lit(1.2) * stopwordRatio + lit(0.8) * distinctRatio
        - lit(6.0) * punctRatio + lit(0.002) * nTokens,
      4)

  /** HTML → text rules, applied strictly in order: container elements
    * whose CONTENT must go (script/style), comments, then every
    * remaining tag, then entity decodes (after tag stripping, so
    * `&lt;div&gt;` decodes to a literal `<div>` instead of becoming a
    * strippable tag), then whitespace collapse. One shared rule list so
    * [[stripHtml]] and the DuckDB oracle compile the identical chain.
    * RE2-safe subset only (no backreferences, no lookaround) — the
    * patterns mean the same thing to Java regex and to RE2. */
  val HtmlRules: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]*>" -> " ",
    "&nbsp;" -> " ",
    "&amp;" -> "&",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "\\s+" -> " ")

  /** Boilerplate-stripping HTML → plain text (tags, script/style
    * bodies, comments, the common entities, whitespace collapse). A
    * linear per-row regexp chain — stateless, pushdown-friendly, no
    * shuffle; a no-op on text that contains no markup. */
  def stripHtml(c: Column): Column =
    trim(HtmlRules.foldLeft(c) { case (acc, (p, r)) =>
      regexp_replace(acc, p, r)
    })

  /** Query parameters dropped by [[normalizeUrl]] — the tracking keys
    * every web-curation pipeline strips before URL-level dedup (CCNet /
    * RefinedWeb lineage). A FIXED literal alternation, shared verbatim
    * with the DuckDB oracle (RE2-safe: no lookaround). */
  val TrackingParamsRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

  /** URL normalization — the canonical form behind domain rollups and
    * URL-level dedup. Rules, in order (the fixed table the oracle
    * replays): (1) lowercase scheme and host; (2) strip one leading
    * `www.`; (3) drop the scheme's default port (`:443` https, `:80`
    * http); (4) strip trailing slashes from the path; (5) drop
    * [[TrackingParamsRe]] query parameters, and the `?` itself when
    * nothing survives (fragments are dropped with everything after
    * `#`). Pure string/regex column ops — bit-identical across engines
    * by construction, no parser library. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val tail = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_replace(regexp_extract(tail, "^([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(tail, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(query, "&"), p => !p.rlike(TrackingParamsRe)),
      "&")
    concat(
      scheme,
      lit("://"),
      host,
      path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Registrable domain key of a [[normalizeUrl]]-normalized URL: the
    * host with any explicit (non-default) port stripped. */
  def urlDomain(normalized: Column): Column =
    regexp_replace(
      regexp_extract(normalized, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
      ":[0-9]+$",
      "")

  /** Unicode script classes as (name, Java-regex class, RE2 class):
    * Java spells a script `\p{IsHan}`, RE2 (DuckDB) spells the same set
    * `\p{Han}` — two spellings, one meaning, kept side by side so the
    * oracle can't drift from the Spark column. */
  val ScriptClasses: Seq[(String, String, String)] = Seq(
    ("latin", "[\\p{IsLatin}]", "[\\p{Latin}]"),
    ("han", "[\\p{IsHan}]", "[\\p{Han}]"),
    ("cyrillic", "[\\p{IsCyrillic}]", "[\\p{Cyrillic}]"),
    ("arabic", "[\\p{IsArabic}]", "[\\p{Arabic}]"),
    ("digit", "[0-9]", "[0-9]"))

  /** Characters of `text` matching a regex character class, by the
    * strip-and-diff trick (same as [[punctRatio]]) — one linear pass,
    * no explode. */
  def classCount(text: Column, pattern: String): Column =
    (length(text) - length(regexp_replace(text, pattern, ""))).cast("long")

  /** The common UTF-8-read-as-Latin-1/Windows-1252 mojibake digraphs →
    * the character they encode, ORDERED longest-first so three-byte
    * sequences (â€™) repair before their two-byte prefixes could
    * mis-match. A fixed literal table rather than a byte-level
    * re-decode: the repair is then expressible identically in any
    * engine (the DuckDB oracle replays the same replace chain), covers
    * the sequences that dominate real crawl corpora, and can never
    * corrupt text that merely LOOKS like Latin-1 — the failure mode
    * that makes blind encode-roundtrip repair unsafe to run corpus-wide. */
  val MojibakeRules: Seq[(String, String)] = Seq(
    // U+2018/2019/201C/201D quotes, U+2013/2014 dashes, U+2026 ellipsis
    ("â€˜", "‘"),
    ("â€™", "’"),
    ("â€œ", "“"),
    ("â€", "”"),
    ("â€“", "–"),
    ("â€”", "—"),
    ("â€¦", "…"),
    // NBSP (C2 A0, normalized to a plain space) and the common C3
    // accents; every "bad" string is the cp1252 rendering of the
    // character's UTF-8 bytes (unmapped bytes pass through as controls)
    ("Â ", " "),
    ("Ã©", "é"), // é
    ("Ã¨", "è"), // è
    ("Ã ", "à"), // à
    ("Ã§", "ç"), // ç
    ("Ã±", "ñ"), // ñ
    ("Ã¶", "ö"), // ö
    ("Ã¼", "ü"), // ü
    ("Ã¤", "ä"), // ä
    ("ÃŸ", "ß")) // ß

  /** Repair the common double-encoding artifacts by the shared literal
    * table — linear per-row `replace` chain, no regex engine, no
    * shuffle; identity on clean text. */
  def fixMojibake(c: Column): Column =
    MojibakeRules.foldLeft(c) { case (acc, (bad, good)) =>
      org.apache.spark.sql.functions.replace(acc, lit(bad), lit(good))
    }
}
