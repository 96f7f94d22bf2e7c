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

  /** Whitespace tokens. Blank text yields an EMPTY array: Spark's
    * `split("", "\\s+")` returns `[""]` — a phantom token that would
    * make an empty document pass `minTokens = 1` gates and count 1 in
    * every length statistic. (DuckDB's bare `regexp_split_to_array`
    * shares the quirk; oracle twins over corpora that can contain
    * blank documents need the matching `CASE WHEN trim(x) = ''`.) */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Unicode normalization (UAX #15, JDK tables; NFC default) — run it
    * BEFORE dedup/shingling/tokenization so composed and decomposed
    * spellings of the same text hash identically, and use NFKC when
    * compatibility folding (ligatures, fullwidth forms, super/
    * subscripts) should also collapse. Codegen kernel with an
    * isNormalized fast path — most real text is already NFC, so the
    * allocating normalize runs only on rows that need it
    * ([[graft.functions.TextExpressions.UnicodeNormalizeExpr]]). */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    graft.functions.TextExpressions.unicodeNormalize(c, form)

  /** Mojibake repair (the ftfy core case): UTF-8 text mis-decoded as
    * Latin-1/Windows-1252 ("cafÃ©", "â€™") re-encodes per Windows-1252
    * and strictly re-decodes as UTF-8; applies only when the full
    * round-trip succeeds AND shrinks, so genuine Latin-1 text passes
    * through untouched ([[graft.functions.TextExpressions
    * .FixMojibakeExpr]]). */
  def fixMojibake(c: Column): Column =
    graft.functions.TextExpressions.fixMojibake(c)

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

  /** Deflate compression ratio of the UTF-8 text: compressed bytes /
    * raw bytes (null for empty/null text). The cheap whole-document
    * repetition proxy the published web-corpus quality batteries carry
    * alongside the Gopher n-gram rules (RedPajama-v2 / Dolma class
    * signals): boilerplate and template spam compress far below
    * natural prose, gibberish/encrypted blobs compress above it —
    * gate on a LOW floor to kill repetition, a HIGH ceiling to kill
    * noise. Not in [[qualityFeatures]] (that Seq's shape is
    * oracle-pinned by x9); [[Cleaning]]'s `minQuality` knob resolves
    * `"compression_ratio"` to this column. Determinism rides the JDK's
    * zlib — see [[graft.functions.TextExpressions.DeflateSizeExpr]]. */
  def compressionRatio(c: Column): Column = {
    val raw = octet_length(c)
    when(raw > 0,
      graft.functions.TextExpressions.deflateSize(c).cast("double") / raw)
  }

  /** 64-bit content fingerprint of the token stream (xxhash64 of the
    * normalized text) — exact-dedup key at scale. */
  def fingerprint64(c: Column): Column =
    xxhash64(concat_ws(" ", tokens(lower(c))))

  // -- repetition / quality filters (Gopher-style, MassiveText rules) ----
  // Public provenance: Rae et al. 2021 ("Scaling Language Models",
  // Gopher appendix A) describe the standard repetition filters used to
  // clean web corpora: duplicate line/paragraph fractions and the
  // fraction of characters in the most-frequent / in duplicated word
  // n-grams. All scalar metrics here are pure column expressions; the
  // n-gram metrics are DataFrame ops (explode + hash agg) so the heavy
  // counting runs distributed, never per-row quadratic.

  private def splitLines(c: Column): Column = split(c, "\n")
  private def splitParagraphs(c: Column): Column = split(c, "\n\n")

  private def dupFraction(parts: Column): Column = {
    val n = size(parts)
    when(n > 0, (n - size(array_distinct(parts))).cast("double") / n).otherwise(lit(0.0))
  }

  private def dupCharFraction(parts: Column): Column = {
    val charSum = (a: Column) => aggregate(a, lit(0L), (acc, x) => acc + length(x))
    val total = charSum(parts)
    when(total > 0,
      (total - charSum(array_distinct(parts))).cast("double") / total).otherwise(lit(0.0))
  }

  /** Fraction of lines that are repeats of an earlier line. */
  def dupLineFraction(c: Column): Column = dupFraction(splitLines(c))

  /** Fraction of line characters inside repeated lines. */
  def dupLineCharFraction(c: Column): Column = dupCharFraction(splitLines(c))

  /** Fraction of paragraphs (blank-line separated) that are repeats. */
  def dupParagraphFraction(c: Column): Column = dupFraction(splitParagraphs(c))

  /** Word n-grams of the lowercased token stream, space-joined. Empty
    * array when the document has fewer than n tokens (`sequence` would
    * otherwise run DESCENDING for a negative span — never let it). */
  def wordNgrams(c: Column, n: Int): Column =
    // one codegen'd pass (graft_word_ngrams). History of this hot spot:
    // transform(sequence(i), i => ...slice(toks, i)...) re-ran the regex
    // split per element — O(tokens²) splits per document (90% of the
    // x19 gate's cost at sf0.1); the zip_with chain that replaced it was
    // O(tokens) but a higher-order function — no codegen path, n−1
    // interpreted lambda passes per row (the same gap measured at
    // ~1.7 s on the x42 gram explode). The custom kernel is one
    // generated loop; FunctionsSpec pins it bit-identical to both.
    graft.functions.TextExpressions.wordNgramsOf(tokens(lower(c)), n)

  /** Per-document n-gram repetition stats as PURE COLUMN EXPRESSIONS —
    * a single codegen'd run-length fold over the doc's sorted gram
    * array. A document's grams already live in its own row, so shipping
    * them through an explode + (doc, gram) shuffle (the first-cut
    * implementation — measured 3.4 s for the x19 gate at sf0.1, ~6
    * stages) bought nothing: the fold computes the same numbers in the
    * scan itself, zero shuffles, and at 100 TB the whole Gopher gate
    * stays embarrassingly parallel.
    *
    *  - `top` / `topg`: count and text of the most frequent word n-gram
    *    (ties by lexicographically greatest gram — grams are folded in
    *    ascending order, so `>=` keeps the greatest; a total,
    *    engine-portable rule)
    *  - `dup`: characters covered by every gram occurring more than once
    *    (Gopher's duplicate-n-gram mass; overlap-counted, the standard
    *    cheap approximation)
    *
    * Fold state: (prev gram, current run length, best run, best gram,
    * dup chars); each new run flushes the previous one, `finish`
    * flushes the last. Empty/short docs fold to zeros. */
  def ngramRepetitionCols(textCol: Column, n: Int): Column =
    repetitionFold(textCol, n, (top, topg, dup) =>
      struct(top.as("top"), topg.as("topg"), dup.as("dup")))

  /** Single-scalar finishes of the same fold, for GATE PREDICATES:
    * Catalyst's filter pushdown substitutes a projected alias into the
    * predicate once per field reference, so a gate written against the
    * (top, topg) struct pair evaluates the whole fold twice per row
    * (measured in the x30 plan: 3 fold copies). A predicate that
    * references ONE scalar column gets exactly one substituted copy. */
  def topNgramCharMass(textCol: Column, n: Int): Column =
    repetitionFold(textCol, n, (top, topg, _) => top * length(topg))

  def dupNgramCharMass(textCol: Column, n: Int): Column =
    repetitionFold(textCol, n, (_, _, dup) => dup)

  private def repetitionFold(textCol: Column, n: Int,
      finish: (Column, Column, Column) => Column): Column = {
    // One codegen'd kernel call (graft_ngram_repetition) sorts the
    // row's grams and walks the runs inside the JVM. History: a string
    // array_sort + interpreted aggregate state machine; then a
    // (hash, gram)-struct sort to cheapen the comparisons — still an
    // interpreted higher-order fold with per-element lambda boxing (the
    // x42 gap). All three outputs are order-independent (tie rule:
    // global max string among max-count runs), so the kernel is
    // bit-identical (FunctionsSpec pins it against the struct-fold
    // reference).
    val st = graft.functions.TextExpressions.ngramRepetitionOf(
      wordNgrams(textCol, n))
    finish(st.getField("top"), st.getField("topg"), st.getField("dup"))
  }

  /** [[ngramRepetitionCols]] with the Gopher fractions attached:
    * (idCol, top_gram, top_cnt, top_frac, dup_frac) — one shuffle-free
    * select over the corpus. */
  def ngramRepetitionStats(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val st = ngramRepetitionCols(col(textCol), n)
    val nChars = length(col(textCol)).cast("double")
    df.select(col(idCol), st.as("_st"), nChars.as("_nc"))
      .select(
        col(idCol),
        col("_st.topg").as("top_gram"),
        col("_st.top").as("top_cnt"),
        when(col("_nc") > 0,
          col("_st.top") * length(col("_st.topg")) / col("_nc"))
          .otherwise(lit(0.0)).as("top_frac"),
        when(col("_nc") > 0, col("_st.dup") / col("_nc"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Thresholds for [[repetitionKeep]]. Line/paragraph fractions and
    * the top-2-gram bound are the Gopher appendix-A values; note the
    * 3-gram bound applies 0.18 to the DUPLICATE-3-gram character mass
    * (all repeated 3-grams, overlap-counted) — a deliberately STRICTER
    * house rule than the paper, whose 0.18 bounds only the single most
    * frequent 3-gram's mass (its duplicate-mass thresholds start at
    * 5-grams, 0.15). Tune `maxDup3GramCharFrac` up if you want the
    * paper's laxer behavior approximated. */
  final case class RepetitionThresholds(
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxDupParagraphFrac: Double = 0.30,
      maxTop2GramCharFrac: Double = 0.20,
      maxDup3GramCharFrac: Double = 0.18)

  /** Composite repetition gate: every metric — line/paragraph dup
    * fractions AND the 2-/3-gram stats — is a pure column expression
    * now, so the whole Gopher gate is ONE join-free, shuffle-free
    * select over the corpus. */
  def repetitionKeep(df: DataFrame, idCol: String, textCol: String,
      t: RepetitionThresholds = RepetitionThresholds()): DataFrame = {
    // fold structs materialized once in a child projection — inlining
    // them would re-run the fold per consuming column (see the x19 gate)
    df.select(col(idCol), col(textCol),
        ngramRepetitionCols(col(textCol), 2).as("_t2"),
        ngramRepetitionCols(col(textCol), 3).as("_t3"),
        length(col(textCol)).cast("double").as("_nc"))
      .select(col(idCol),
        dupLineFraction(col(textCol)).as("dup_line_frac"),
        dupLineCharFraction(col(textCol)).as("dup_line_char_frac"),
        dupParagraphFraction(col(textCol)).as("dup_para_frac"),
        when(col("_nc") > 0,
          col("_t2.top") * length(col("_t2.topg")) / col("_nc"))
          .otherwise(lit(0.0)).as("top2_frac"),
        when(col("_nc") > 0, col("_t3.dup") / col("_nc"))
          .otherwise(lit(0.0)).as("dup3_frac"))
      .withColumn("keep",
        col("dup_line_frac") <= t.maxDupLineFrac &&
        col("dup_line_char_frac") <= t.maxDupLineCharFrac &&
        col("dup_para_frac") <= t.maxDupParagraphFrac &&
        col("top2_frac") <= t.maxTop2GramCharFrac &&
        col("dup3_frac") <= t.maxDup3GramCharFrac)
  }

  // -- PII detection / redaction -----------------------------------------
  // Regex scrubbing of well-formed identifiers (emails, IPv4, US phone,
  // SSN) — the rule-based pass every training-data pipeline runs before
  // release. Patterns are deliberately RE2-compatible (no backreferences
  // or lookaround) so the identical pattern runs in Spark (java.util
  // .regex), DuckDB (RE2), and most other engines. All of it is pure
  // column expressions — codegen'd, no UDF, scales with the scan.

  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Rx = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRx = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val SsnRx = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Count of matches per PII class, as (name, column) pairs. Counts are
    * taken on the ORIGINAL text, before any redaction reshapes it. */
  def piiCounts(c: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(c, lit(EmailRx), lit(0))),
    "n_ipv4"   -> size(regexp_extract_all(c, lit(Ipv4Rx), lit(0))),
    "n_phones" -> size(regexp_extract_all(c, lit(PhoneRx), lit(0))),
    "n_ssns"   -> size(regexp_extract_all(c, lit(SsnRx), lit(0))))

  /** Replace each PII class with a typed placeholder. Order matters and
    * is fixed: email → SSN → phone → IPv4 (SSN before phone because the
    * shapes share a prefix; email first because addresses embed dots and
    * digits the later passes could chew on). */
  def piiRedact(c: Column): Column = {
    val e = regexp_replace(c, EmailRx, "<EMAIL>")
    val s = regexp_replace(e, SsnRx, "<SSN>")
    val p = regexp_replace(s, PhoneRx, "<PHONE>")
    regexp_replace(p, Ipv4Rx, "<IP>")
  }

  // -- C4-style line filtering ---------------------------------------------
  // The rule set of C4 (Raffel et al. 2020, §2.2) reduced to its
  // engine-shaped core: keep a line only if it ends in terminal
  // punctuation, has at least `minWords` words, and contains no
  // blacklisted fragment; keep a document only if enough lines survive.
  // Higher-order array functions keep the whole pass inside codegen —
  // one projection, no explode, no shuffle.

  val C4Blacklist: Seq[String] = Seq("javascript", "lorem ipsum", "cookie policy", "{")

  /** Per-line keep predicate (case-insensitive blacklist). */
  def c4LineKeep(line: Column, minWords: Int = 5,
      blacklist: Seq[String] = C4Blacklist): Column = {
    val lw = lower(line)
    line.rlike("[.!?\"]$") &&
      size(split(trim(line), "\\s+")) >= minWords &&
      // foldLeft, not reduce: an EMPTY blacklist (disable the term rule,
      // keep punctuation/min-words) must not throw empty.reduce
      !blacklist.foldLeft(lit(false))((acc, b) => acc || lw.contains(b))
  }

  /** Filter an array-of-lines column by [[c4LineKeep]]. */
  def c4FilterLines(lines: Column, minWords: Int = 5,
      blacklist: Seq[String] = C4Blacklist): Column =
    filter(lines, l => c4LineKeep(l, minWords, blacklist))

  /** C4 line-filter stats per document over an array-of-lines column:
    * total lines, surviving lines, characters surviving (line text only).
    * Compose with a doc gate (`n_kept >= 3` in C4) downstream. */
  def c4LineStats(lines: Column, minWords: Int = 5,
      blacklist: Seq[String] = C4Blacklist): Seq[(String, Column)] = {
    val kept = c4FilterLines(lines, minWords, blacklist)
    Seq(
      "n_lines" -> size(lines).cast("long"),
      "n_kept" -> size(kept).cast("long"),
      "kept_chars" -> aggregate(kept, lit(0L), (acc, l) => acc + length(l)))
  }

  /** Token-distribution DIVERGENCE between two corpora — the drift
    * monitor a training-data pipeline runs between corpus versions
    * ("did the new filter shift the data?"): KL(P‖Q), KL(Q‖P), and the
    * symmetric bounded Jensen-Shannon divergence over the UNION vocab
    * with add-α smoothing (α > 0 keeps disjoint-vocab terms finite —
    * plain KL is +∞ the moment Q misses a P term). Returns ONE row:
    * (n_terms, n_tokens_a, n_tokens_b, kl_ab, kl_ba, js).
    *
    * Shape: one token-count aggregation per corpus (map-side partials
    * over tokens), one full-outer join of the two vocab frames, totals
    * as a broadcast 1-row stats frame (the BM25 pattern), and the
    * divergence as a per-term fold. Cross-engine determinism follows
    * the round-9 consensus: probabilities are IEEE-double expressions
    * of exact integer counts, each term's contribution rounds to 12
    * decimals and sums as DECIMAL — the oracle twin runs the identical
    * forms. Natural-log units. */
  def vocabDivergence(a: DataFrame, b: DataFrame, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive for finite KL (got $alpha)")
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(tokens(lower(col(textCol)))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as(as))
    val merged = counts(a, "ca").join(counts(b, "cb"), Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val stats = merged.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val joined = merged.crossJoin(broadcast(stats))
    val p = (col("ca") + lit(alpha)) / (col("na") + lit(alpha) * col("v"))
    val q = (col("cb") + lit(alpha)) / (col("nb") + lit(alpha) * col("v"))
    val m = (p + q) / 2
    def dec(c: Column): Column = round(c, 12).cast("decimal(32,14)")
    joined
      .select(col("na"), col("nb"), col("v"),
        dec(p * log(p / q)).as("c_ab"), dec(q * log(q / p)).as("c_ba"),
        dec(p * log(p / m) / 2 + q * log(q / m) / 2).as("c_js"))
      .groupBy("na", "nb", "v")
      .agg(sum(col("c_ab")).as("s_ab"), sum(col("c_ba")).as("s_ba"),
        sum(col("c_js")).as("s_js"))
      .select(col("v").as("n_terms"),
        col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"),
        round(col("s_ab").cast("double"), 6).as("kl_ab"),
        round(col("s_ba").cast("double"), 6).as("kl_ba"),
        round(col("s_js").cast("double"), 6).as("js"))
  }

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
