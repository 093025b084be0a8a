package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines, all
 * as pure Column expressions (whole-stage-codegen friendly — no UDFs):
 * tokenization, token counting, quality scoring, language ID, document
 * fingerprinting.
 */
object TextFunctions {

  /** Whitespace tokenization (empty input ⇒ empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, typedLit(Seq.empty[String]))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Fused per-document statistics — STRUCT(n_tokens, n_distinct,
    * n_chars) in ONE tokenize + one hash pass ([[TokenStats]]), vs the
    * unfused triple that tokenizes twice and materializes the token
    * array for `array_distinct`. Bit-identical fields (the q10 oracle
    * checks it). */
  def tokenStats(text: Column): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("token_stats", text)
  }

  /** BPE-ish subword proxy: alpha runs, digit runs, and single
    * punctuation marks each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct-token fraction, riding the fused [[TokenStats]] kernel
    * (TokenStatsSpec pins n_tokens/n_distinct parity with the unfused
    * size/array_distinct formulation this replaces). */
  def distinctTokenRatio(text: Column): Column = {
    val ts = tokenStats(text)
    when(ts.getField("n_tokens") === 0, lit(0.0))
      .otherwise(ts.getField("n_distinct").cast("double") / ts.getField("n_tokens"))
  }

  /** Punctuation fraction: code points outside [A-Za-z0-9] ∪ ASCII-\s
    * over code-point length — [[TokenStats]]'s n_punct/n_chars. The
    * regexp_extract_all formulation this replaces MATERIALIZED every
    * punctuation match to count them (TextQualitySpec pins parity). */
  def punctRatio(text: Column): Column = {
    val ts = tokenStats(text)
    when(ts.getField("n_chars") === 0, lit(0.0))
      .otherwise(ts.getField("n_punct").cast("double") / ts.getField("n_chars"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  private[functions] val stopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with", "as"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que", "des", "du"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "para", "en", "que", "de"),
    "it" -> Seq("il", "lo", "la", "e", "è", "un", "una", "per", "che", "di", "non", "con"))

  /** Fraction of tokens that are (English, by default) stopwords —
    * a standard quality signal. Fused byte-level kernel
    * ([[StopwordRatio]]; the interpreted-HOF Column formulation it
    * replaces measured 18.5 s over 550k sf10 docs vs the 0.7 s scan
    * floor — TextQualitySpec pins bit-parity against it). */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    require(stopwordsByLang.contains(lang),
      s"unsupported language '$lang' (have ${stopwordsByLang.keys.toSeq.sorted.mkString(", ")})")
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("stopword_ratio", text, lit(lang))
  }

  /**
   * Heuristic document quality score in [0, 1]: length saturation ×
   * lexical diversity, penalized for extreme punctuation density and
   * degenerate token lengths. Deterministic and SQL-mirrorable.
   */
  def qualityScore(text: Column): Column =
    round(qualityScoreRaw(text), 4)

  /** Unrounded quality score. Cross-engine comparisons should grid this
    * with identical float arithmetic (floor(x·10⁴ + 0.5)/10⁴) rather
    * than each engine's round(): a product landing exactly on a .00005
    * boundary rounds differently between decimal-exact and
    * float-multiply round implementations. */
  def qualityScoreRaw(text: Column): Column = {
    val lenScore = least(lit(1.0), length(text).cast("double") / 500.0)
    val diversity = distinctTokenRatio(text)
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    lenScore * diversity * punctPenalty
  }

  /** Stopword-hit language ID over the supported languages; returns the
    * language code with the most stopword matches ("und" when nothing
    * matches; score tie → largest language code, the `array_max`
    * struct-comparison rule). Fused byte-level kernel ([[LangId]]): the
    * Column formulation it replaces ran one interpreted HOF filter PER
    * LANGUAGE over a materialized token array — 81 s over 550k sf10
    * docs vs the 0.7 s scan floor. TextQualitySpec pins parity against
    * the original formulation; the q13 oracle replicates the tables and
    * tie-break in SQL. */
  def langId(text: Column): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("lang_id", text)
  }

  /** Token-budget document chunking — ≤`maxTokens`-token windows
    * overlapping by `overlap` tokens, each window's tokens re-joined
    * with single spaces ([[ChunkText]]; `posexplode` the result for
    * (chunk_idx, chunk) rows). The context-window prep step of a
    * training-data pipeline, as one byte-level pass per document. */
  def chunkText(text: Column, maxTokens: Int, overlap: Int = 0): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("chunk_text", text, lit(maxTokens), lit(overlap))
  }

  /** Distinct word `n`-grams of the document (space-joined,
    * first-occurrence order), one byte walk ([[DistinctNgrams]]) —
    * the per-document input of cross-corpus duplicated n-gram mining
    * (see [[graft.operators.TextRank.duplicatedNgrams]]). */
  def distinctNgrams(text: Column, n: Int): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("distinct_ngrams", text, lit(n))
  }

  /** Blocklist statistics — `(n_matched, n_tokens)` of whitespace
    * tokens hitting the term SET, one byte walk per document at O(1)
    * per token regardless of list size ([[BlocklistStats]]; thousands
    * of terms compile into one hashed table per expression). Filter on
    * `n_matched > 0` or threshold the ratio (obscenity density). */
  def blocklistStats(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BlocklistStats(org.apache.spark.sql.graft.ColumnBridge.expression(text), terms))

  /** Every word `n`-gram WITH multiplicity (document order), one byte
    * walk ([[AllNgrams]]) — the training-side counting input of
    * [[graft.operators.LmQuality]]; documents with < n tokens yield an
    * empty array (no short-document rule — a model statistic needs n
    * tokens, unlike the mining walker). */
  def allNgrams(text: Column, n: Int): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("all_ngrams", text, lit(n))
  }

  /** The Gopher word-level quality-rule inputs in one byte walk
    * ([[GopherStats]]): `(n_tokens, n_token_chars, n_alpha_tokens,
    * n_stop_hits, n_symbols)`. */
  def gopherStats(text: Column): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("gopher_stats", text)
  }

  /** The composed Gopher keep decision (Rae et al. 2021, Table A1 word
    * rules) as a pure BOOLEAN Column over [[gopherStats]]: word count
    * in `[minWords, maxWords]`, mean word length in `[minMeanLen,
    * maxMeanLen]`, symbol-to-word ratio below `maxSymbolRatio`, at
    * least `minAlphaRatio` of words containing an alphabetic
    * character, and at least `minStopHits` distinct canonical
    * stopwords. Defaults are the paper's; the line-shaped rules
    * (bullet/ellipsis line fractions) live at line granularity with
    * the line operators. A 0-token document never keeps; NULL text →
    * NULL (the caller's policy). */
  def gopherKeep(text: Column, minWords: Int = 50, maxWords: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
                 minStopHits: Int = 2): Column =
    gopherKeepFromStats(gopherStats(text), minWords, maxWords, minMeanLen,
      maxMeanLen, maxSymbolRatio, minAlphaRatio, minStopHits)

  /** [[gopherKeep]] over an ALREADY-COMPUTED [[gopherStats]] struct —
    * callers projecting both the metrics and the decision pay ONE byte
    * walk (the struct is NULL exactly when the text was, so the NULL
    * contract carries). */
  def gopherKeepFromStats(g: Column, minWords: Int = 50, maxWords: Int = 100000,
                          minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                          maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
                          minStopHits: Int = 2): Column = {
    val nt = g("n_tokens").cast("double")
    val mean = g("n_token_chars").cast("double") / nt
    when(g.isNull, lit(null)).otherwise(
      g("n_tokens") >= minWords && g("n_tokens") <= maxWords &&
      nt > 0 && mean >= minMeanLen && mean <= maxMeanLen &&
      g("n_symbols").cast("double") / nt < maxSymbolRatio &&
      g("n_alpha_tokens").cast("double") / nt >= minAlphaRatio &&
      g("n_stop_hits") >= minStopHits)
  }

  /** Content fingerprint: 64-bit hash of the normalized text (lowered,
    * punctuation stripped, whitespace collapsed). */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(trim(regexp_replace(lower(text), "[^a-z0-9\\s]", " ")), "\\s+", " "))

  /** Order-insensitive fingerprint: hash of the sorted distinct token
    * set (bag-of-words identity). */
  def bagFingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))))

  /** Word n-gram shingles as an array of 64-bit hashes — native
    * single-pass expression ([[ShingleHashes]]). The earlier
    * `transform(sequence…)` Column tree re-evaluated the regex `split`
    * once per shingle (interpreted HOF lambda), i.e. quadratic per doc. */
  def shingles(text: Column, n: Int = 3): Column = shingleHashes(text, n)

  /** Shingle hashes over the lowered, whitespace-tokenized text. */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    // raw text: the expression's byte-level path reproduces
    // tokens(lower(text)) bit-exactly (ShinglingTextSpec fuzz) without
    // the lowercase copy, regex split, or token-array materialization
    call_function("shingle_hashes", text, lit(n))
  }

  /** PII patterns shared with the DuckDB oracle — kept to syntax that
    * Java regex and RE2 interpret identically (no lookarounds, no
    * backrefs). Order matters: emails first (their local parts contain
    * digits), then IPs (dotted quads would otherwise part-match the
    * phone pattern), then phones (dot excluded from the body charset so
    * leftovers of dotted quads never re-match). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d\\s()-]{7,}\\d"

  /** Redact emails, IPv4 addresses, and phone-shaped digit runs with
    * typed placeholders — a pure-Column scrub (three codegen'd
    * regexp_replace passes, no UDF), the standard pre-training PII
    * hygiene step. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** Top n-gram fraction (most frequent token n-gram / total n-grams) —
    * the within-document repetition signal; single-pass native
    * expression ([[RepetitionScore]]), no shuffle. */
  def repetitionScore(text: Column, n: Int = 2): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("repetition_score", text, lit(n))
  }

  /** Jaccard similarity of the two texts' n-gram shingle-hash sets. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val (sa, sb) = (array_distinct(shingleHashes(a, n)), array_distinct(shingleHashes(b, n)))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }
}
