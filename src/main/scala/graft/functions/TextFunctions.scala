package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, fingerprinting, language-ID. All pure Column
  * expressions (codegen'd) — at 100 TB these run inside the scan stage
  * with zero shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization. `\\s+` split after trim; empty text → 0. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0L).otherwise(size(tokens(text)).cast("long"))

  /** BPE-ish subword count estimate: word-piece regex splits on
    * letter/digit/punct class changes (a public approximation of byte-pair
    * pre-tokenization — one token per contiguous letter run, digit run, or
    * punctuation char). Letter↔digit transitions split too, so "abc123"
    * is two pieces. */
  def subwordCount(text: Column): Column =
    size(filter(split(text,
      """(?<=[\p{L}])(?=[\p{N}])|(?<=[\p{N}])(?=[\p{L}])|(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""),
      (t: Column) => length(trim(t)) > 0)).cast("long")

  /** Distinct word set (for Jaccard similarity). */
  def wordSet(text: Column): Column = array_distinct(tokens(text))

  /** n-gram Jaccard similarity between two texts' distinct token sets:
    * |A ∩ B| / |A ∪ B|, via the native two-pointer
    * [[graft.expr.JaccardSorted]] kernel over per-text sorted word sets
    * (no per-invocation hash set; value-identical to the
    * intersect/union form — pinned by the test suite). */
  def jaccard(a: Column, b: Column): Column =
    call_function("graft_jaccard_sorted",
      sort_array(wordSet(a)), sort_array(wordSet(b)))

  /** Composed reference for [[jaccard]] (array_intersect/array_union
    * arithmetic), kept for the native-expression parity spec. */
  def jaccardComposed(a: Column, b: Column): Column = {
    val sa = wordSet(a)
    val sb = wordSet(b)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Word n-gram shingles (default 3) over the token sequence — the unit
    * for MinHash document fingerprints. */
  def shingles(text: Column, n: Int = 3): Column =
    call_function("graft_shingles", text, lit(n))

  /** Composed-Column reference for [[shingles]]: sliding window via
    * interpreted `transform` over indices (short docs yield the
    * whole-text single shingle so they still participate). Kept for the
    * native-expression parity spec — the lambda evaluates interpreted
    * once per shingle position, which made shingling the dominant scan
    * cost of every near-dup detector. */
  def shinglesComposed(text: Column, n: Int = 3): Column = {
    val ts = tokens(text)
    when(size(ts) < n, array(concat_ws(" ", ts)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
  }

  /** RAW word n-grams (duplicates preserved, unlike [[shingles]]) — the
    * unit for repetition analysis: Gopher-style quality filters measure
    * the fraction of text claimed by the single most repeated n-gram.
    * Docs with fewer than n tokens yield an empty array. */
  def ngramsRaw(text: Column, n: Int): Column =
    ngramsRawFromTokens(tokens(text), n)

  /** [[ngramsRaw]] over an already-tokenized array — for callers that
    * need the token array AND its windows without re-splitting. */
  def ngramsRawFromTokens(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Punctuation/symbol ratio: fraction of chars outside [a-z0-9 ] after
    * lowercasing. One of the standard quality-filter features. */
  def symbolRatio(text: Column): Column = {
    val total = length(text).cast("double")
    // clean length via the native scan kernel — value-identical to
    // length(regexp_replace(lower(text), "[^a-z0-9 ]", "")), which was
    // measured at 420 cpu-s per 500 k-doc pass (java.util.regex builds
    // the replacement string row by row); the kernel is a byte scan
    val clean = call_function("graft_clean_len", lower(text)).cast("double")
    when(total === 0, 0.0).otherwise((total - clean) / total)
  }

  /** Stopword ratio over a fixed public stopword list. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column =
    // native single-split kernel — value-identical to
    // when(size(ts) === 0, 0.0).otherwise(size(filter(ts, _ IN
    // Stopwords)) / size(ts)) over ts = tokens(lower(text)), whose
    // composed form re-evaluated the split THREE times plus an
    // interpreted per-token lambda (118 cpu-s per 500 k-doc pass)
    call_function("graft_stop_ratio", lower(text), typedLit(Stopwords))

  /** Mean word length — another classic quality feature. */
  def meanWordLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0)
      .otherwise(aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(ts).cast("double"))
  }

  /** Share of whitespace tokens appearing in `words` (case-insensitive,
    * occurrence count not distinct) — the word-list toxicity/NSFW gate
    * every public curation stack ships (a blocklist tagger, not a
    * classifier: deterministic, auditable, oracle-checkable). */
  def blocklistShare(text: Column, words: Seq[String]): Column = {
    val ts = tokens(lower(text))
    val hits = size(filter(ts, (t: Column) => t.isInCollection(words)))
    when(tokenCount(text) === 0, 0.0)
      .otherwise(hits.cast("double") / size(ts).cast("double"))
  }

  /** Occurrences of blocklisted tokens (the numerator of
    * [[blocklistShare]], exposed for reporting). */
  def blocklistHits(text: Column, words: Seq[String]): Column =
    when(tokenCount(text) === 0, 0L)
      .otherwise(size(filter(tokens(lower(text)),
        (t: Column) => t.isInCollection(words))).cast("long"))

  /** Characters of one Unicode script, counted by stripping the
    * complement class — scan-stage regex, no explode. Counts UTF-16
    * units, which equals code points for BMP scripts (Latin, Cyrillic,
    * Greek, BMP Han — the corpus invariant the t88 fixture keeps), so
    * a code-point-counting replay (DuckDB) is value-identical.
    * `script` is the Java binary-property name (`Latin`, `Cyrillic`,
    * `Greek`, `Han`). */
  def scriptCount(text: Column, script: String): Column =
    length(regexp_replace(coalesce(text, lit("")), "\\P{Is" + script + "}", ""))
      .cast("long")

  /** Digit characters (0-9). */
  def digitCount(text: Column): Column =
    length(regexp_replace(coalesce(text, lit("")), "[^0-9]", "")).cast("long")

  private def docLines(text: Column): Column =
    split(coalesce(text, lit("")), "\n", -1)

  private def isCodeLine(l: Column): Column =
    length(trim(l)) > 0 && (
      l.startsWith("    ") || l.startsWith("\t") ||
        substring(trim(l), -1, 1).isin("{", "}", ";") ||
        trim(l).startsWith("```"))

  /** Non-blank line count — pure array arithmetic over the split text,
    * scan-stage (no explode, no shuffle). */
  def nonblankLines(text: Column): Column =
    size(filter(docLines(text), l => length(trim(l)) > 0)).cast("long")

  /** Code-looking non-blank lines: ≥4-space or tab indent, a trimmed
    * line ending in one of `{` `}` `;`, or a markdown fence marker —
    * the structure signals code-vs-prose corpus routing keys on (the
    * Stack-style pipelines gate source files in, C4-style pipelines
    * gate stray code out of prose). */
  def codeLines(text: Column): Column =
    size(filter(docLines(text), isCodeLine(_))).cast("long")

  /** Whether any line opens/closes a markdown code fence. */
  def hasCodeFence(text: Column): Column =
    exists(docLines(text), l => trim(l).startsWith("```"))

  /** Sentence count: `[.!?]+` segments with non-blank content, floored
    * at 1 for non-blank text (a fragment without terminal punctuation
    * is one sentence). Blank text → 0. */
  def sentenceCount(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(greatest(
        size(filter(split(text, "[.!?]+"),
          (s: Column) => length(trim(s)) > 0)).cast("long"),
        lit(1L)))

  /** Vowel-group syllable estimate: one syllable per maximal
    * `[aeiouy]+` run — the standard cheap approximation for
    * readability formulas (vowelless tokens contribute 0; both engines
    * count the same runs, so the estimate is oracle-exact even where
    * it deviates from dictionary syllabification). */
  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long")

  /** Flesch reading ease (Flesch 1948) with the vowel-group syllable
    * estimate: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), rounded to 4 dp; blank text → 0.0. Unbounded on both ends
    * like the original formula.
    *
    * The rounding is EXACT-INTEGER, not floating (the t57 margin
    * lesson, re-learned here when the sf0.1 replay found five rows
    * sitting exactly on a …5·10⁻⁵ boundary where the two engines'
    * double formulas rounded apart): the score is the exact rational
    * T/D with T = 206835·s·w − 1015·w² − 84600·sy·s and D = 1000·s·w
    * in decimal(38) arithmetic, and its 4-dp half-away rounding is the
    * pure integer sign(T)·((|T|·10⁴ + D/2) div D) — bit-identical in
    * any engine (DuckDB replays it in HUGEINT). */
  def fleschScore(text: Column): Column = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = dec(tokenCount(text))
    val s = dec(sentenceCount(text))
    val sy = dec(syllableCount(text))
    val t = dec(lit(206835)) * s * w - dec(lit(1015)) * w * w -
      dec(lit(84600)) * sy * s
    val d = dec(lit(1000)) * s * w
    val half = dec(lit(500)) * s * w
    val m4 = when(t < 0, lit(-1L)).otherwise(lit(1L)) *
      call_function("div", abs(t) * dec(lit(10000)) + half, d)
    when(w === 0, 0.0).otherwise(m4.cast("double") / 10000.0)
  }

  /** Composite quality score in [0,1]: rewards moderate length, low symbol
    * noise, and a natural-language stopword ratio. Deterministic arithmetic
    * only, so it is oracle-checkable. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val symScore = lit(1.0) - least(symbolRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    round((lenScore + symScore + stopScore) / 3.0, 4)
  }

  /** Language-ID by stopword-profile voting: score each candidate
    * language's function-word hit ratio, pick the argmax (ties → 'und').
    * The profile lists are public-knowledge function words. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "en", "que", "une"))

  def langScore(text: Column, lang: String): Column =
    // the same shape as stopwordRatio with the language's function-word
    // profile — and the same native kernel: the composed form paid the
    // triple split + interpreted lambda ONCE PER CANDIDATE LANGUAGE
    call_function("graft_stop_ratio", lower(text),
      typedLit(LangProfiles(lang)))

  def languageId(text: Column, minScore: Double = 0.02): Column = {
    val langs = LangProfiles.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(text, l).as("score"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("score") >= minScore, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling polynomial hash fingerprint over words (base-31 mod 2^31-1) —
    * a locality-insensitive whole-document hash usable for shard-local
    * bucketing. Deterministic, order-sensitive; modulus keeps
    * acc*31 + h < 2^36, far inside Long range. */
  def rollingHash(text: Column): Column = {
    val p = lit(2147483647L) // Mersenne prime 2^31-1
    aggregate(
      tokens(lower(text)),
      lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), p), p))
  }
}
