package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY §2.10 U4 / BASELINE.json north-star): language ID, quality
  * scoring, token counting, fingerprinting. All pure column expressions
  * (codegen-friendly, no UDFs) so they run inside whole-stage codegen
  * over 100 TB of documents.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish lexical token count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the standard cheap
    * proxy for subword token counts when no tokenizer model is loaded.
    * (Regex kept in the POSIX-common subset so Java and RE2-style
    * engines agree.) */
  val BpeTokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column = size(regexp_extract_all(c, lit(BpeTokenRegex), lit(0)))

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: language ID at pipeline scale is a
    * cheap first-pass filter, not a model. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** Count how many tokens of `c` are in `words`. */
  def markerHits(c: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(tokens(lower(c)), t => array_contains(set, t)))
  }

  /** Heuristic language ID: argmax of marker-word hits; ties break to
    * the lexicographically larger code (struct-max ordering), no hits →
    * "und". The rule is deliberately total and portable so the DuckDB
    * oracle can mirror it exactly.
    *
    * Single pass: one `aggregate` over the token array accumulating all
    * five counters in a struct — tokenization happens once per
    * document, not once per language (an expression referenced by N
    * sub-expressions is evaluated N times unless it is a lambda input). */
  def langId(c: Column): Column = {
    val codes = LangMarkers.map(_._1)
    val sets = LangMarkers.map { case (_, words) => array(words.map(lit): _*) }
    val zero = struct(codes.map(code => lit(0).as(s"h_$code")): _*)
    aggregate(tokens(lower(c)), zero,
      (acc, t) => struct(codes.zip(sets).map { case (code, set) =>
        (acc.getField(s"h_$code") +
          when(array_contains(set, t), 1).otherwise(0)).as(s"h_$code")
      }: _*),
      // argmax in the finish lambda: `acc` is a bound variable here, so
      // the fold runs once however many times the result is referenced
      acc => {
        val best = array_max(array(codes.map(code =>
          struct(acc.getField(s"h_$code").as("hits"), lit(code).as("code"))): _*))
        when(best.getField("hits") > 0, best.getField("code")).otherwise(lit("und"))
      })
  }

  /** Quality features: the standard cheap signals used to filter web
    * text before training (length, token stats, punctuation and
    * stopword ratios, mean word length). */
  def qualityFeatures(c: Column): Seq[(String, Column)] = {
    val toks = tokens(c)
    val nTok = size(toks)
    val nChar = length(c)
    val nPunct = length(c) - length(regexp_replace(c, "[.,;:!?]", ""))
    val enSet = array(LangMarkers.head._2.map(lit): _*)
    val nStop = size(filter(split(trim(lower(c)), "\\s+"), t => array_contains(enSet, t)))
    Seq(
      "n_chars" -> nChar,
      "n_tokens" -> nTok,
      "punct_ratio" -> nPunct.cast("double") / nChar,
      "stopword_ratio" -> nStop.cast("double") / nTok,
      "mean_word_len" -> (length(regexp_replace(c, "\\s+", "")).cast("double") / nTok))
  }

  /** 64-bit content fingerprint of the token stream (xxhash64 of the
    * normalized text) — exact-dedup key at scale. */
  def fingerprint64(c: Column): Column =
    xxhash64(concat_ws(" ", tokens(lower(c))))

  /** Order-sensitive polynomial rolling fingerprint over tokens,
    * expressible in portable SQL (used by the oracle gate):
    * sum over tokens of (position+1) * first-char-code * token-length,
    * mod 2^31-1. Cheap, deterministic, order-sensitive — a stand-in for
    * Rabin-Karp where cross-engine reproducibility matters more than
    * collision resistance (the xxhash64 variant above is the production
    * key). */
  def rollingFingerprint(c: Column): Column = {
    val toks = tokens(c)
    val terms = zip_with(toks, sequence(lit(1), size(toks)),
      (t, i) => i.cast("long") * ascii(substring(t, 0, 1)).cast("long") * length(t).cast("long"))
    aggregate(terms, lit(0L), (acc, x) => (acc + x) % 2147483647L)
  }
}
