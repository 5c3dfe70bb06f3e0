package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines — all pure
  * Catalyst Column expressions, shuffle-free, scaling with the scan. Note the
  * higher-order functions (filter/transform/aggregate) here are
  * CodegenFallback — interpreted per element, and one in a projection evicts
  * the whole stage from whole-stage codegen. That is the deliberate trade for
  * oracle-reproducible token semantics at these ops' measured costs
  * (3-9us/row); the per-row loops that proved genuinely hot (MinHash, SimHash,
  * dot product, centroid argmax) live as native codegen Expressions in
  * graft.functions instead.
  */
object TextOps {

  /** Whitespace tokenization; empty text -> empty array (not [""]). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Unicode normalization (NFC default; NFD/NFKC/NFKD) — the canonical first
    * step of text ingestion: composed vs decomposed forms of the same text
    * otherwise break exact dedup, fingerprints and token counts. A native
    * codegen Expression (graft.functions.UnicodeNormalize) with an
    * allocation-free fast path for already-normalized input. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    graft.functions.UnicodeNormalize(text, form)

  /** BPE-ish token count: alpha runs, digit runs, and single non-space symbols
    * each count as one token (the usual pre-tokenizer regex shape). */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles (joined with single spaces); texts shorter than n
    * words yield one whole-text shingle. */
  def shingles(text: Column, n: Int): Column = {
    val ws = tokens(text)
    val ngrams = transform(sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", slice(ws, i, lit(n))))
    array_distinct(when(size(ws) >= n, ngrams).otherwise(array(concat_ws(" ", ws))))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Real pipelines plug bigger lists; the operator shape
    * (argmax over per-language evidence counts) is the point. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que"))

  /** Language-ID: argmax of stopword hits; ties and zero evidence -> "und".
    * Deterministic tie-break: higher count wins, then earlier lang in `table`.
    * A native codegen Expression (graft.functions.LangIdBest): the Column
    * shape ([[langIdColumnTree]], kept for the equivalence spec) re-walked the
    * token array once per language through interpreted HOF filters — the
    * largest remaining interpreted-HOF battery line before this. Null text ->
    * "und" (the Column version's when/otherwise falls through on null too). */
  def langId(text: Column, table: Seq[(String, Seq[String])] = stopwords): Column =
    coalesce(graft.functions.LangIdBest(text, table), lit("und"))

  /** The original Column-tree language-ID — retained as the reference
    * implementation the native expression is spec-checked against. */
  private[graft] def langIdColumnTree(
      text: Column, table: Seq[(String, Seq[String])] = stopwords): Column = {
    val ts = tokens(lower(text))
    // struct ordering compares fields left-to-right: (count, -position) argmax
    val scored = table.zipWithIndex.map { case ((lang, sw), i) =>
      struct(
        size(filter(ts, t => t.isin(sw: _*))).as("score"),
        lit(-i).as("prio"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality signals: token count, char count, mean token length (x100, integer
    * for cross-engine determinism), stopword count, alpha-char ratio (x100),
    * and a composite 0-100 score. Integer arithmetic end-to-end so results are
    * bit-stable across engines. */
  def qualitySignals(text: Column, stopwordList: Seq[String] = stopwords.head._2): Column = {
    val ts = tokens(text)
    val nTok = size(ts).cast("long")
    val nChars = length(text).cast("long")
    val meanLenX100 = when(nTok > 0,
      floor(aggregate(ts, lit(0L), (acc, t) => acc + length(t)) * 100L / nTok).cast("long")).otherwise(0L)
    val stopCnt = size(filter(ts, t => t.isin(stopwordList: _*))).cast("long")
    val alphaCnt = length(regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    val alphaRatioX100 = when(nChars > 0, floor(alphaCnt * 100L / nChars).cast("long")).otherwise(0L)
    val lengthScore = least(nTok, lit(50L)) * 2L // 0..100, saturates at 50 tokens
    val score = floor((lengthScore + alphaRatioX100) / 2L).cast("long")
    struct(
      nTok.as("n_tokens"),
      nChars.as("n_chars"),
      meanLenX100.as("mean_token_len_x100"),
      stopCnt.as("stopword_count"),
      alphaRatioX100.as("alpha_ratio_x100"),
      score.as("quality_score"))
  }

  /** Rolling polynomial document fingerprint over words:
    * acc = (acc*31 + wordHash(w)) mod 1e9+7. `wordHash` is pluggable so an
    * oracle in another engine can reproduce it without xxhash. */
  val FingerprintMod = 1000000007L
  def simpleWordHash(w: Column): Column =
    (length(w).cast("long") * 131L + ascii(substring(w, 1, 1)).cast("long")) % FingerprintMod
  def fingerprint(text: Column, wordHash: Column => Column = simpleWordHash): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => pmod(acc * 31L + wordHash(w), lit(FingerprintMod)))

  /** PII redaction patterns, applied IN ORDER (emails first, so a digit-heavy
    * local part can't be half-eaten by the phone rule). Every pattern is valid
    * under both Java regex and RE2 (no lookaround/backrefs), so another engine
    * reproduces the scrub byte-for-byte. Conservative recall by design — a
    * production pipeline extends this table; the operator shape (ordered
    * regexp_replace chain, all codegen'd) is the point. */
  // phone: whole digit runs only, bounded on BOTH sides — '[0-9]{7,15}\b'
  // alone would partially redact a 16-digit card ("1<PHONE>", leaking the
  // lead digit) and eat the digit tail of identifiers ("ID<PHONE>"); with \b
  // on both ends a digit run inside a word token is left intact (an
  // identifier, not a phone) and a standalone run is consumed WHOLE
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>",
    "\\+[0-9]{7,}\\b|\\b[0-9]{7,}\\b" -> "<PHONE>")

  /** Text with emails, IPv4s and phone-shaped digit runs redacted. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }

  /** Per-category redaction counts (emails, ips, phones), counted on the same
    * progressively-scrubbed text as [[scrubPii]] — so a digit run inside an
    * email is an email, never also a phone. */
  def piiCounts(text: Column): Column = {
    val (counts, _) = piiPatterns.foldLeft((Seq.empty[Column], text)) {
      case ((acc, c), (re, tag)) =>
        val cnt = size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
        val name = tag.stripPrefix("<").stripSuffix(">").toLowerCase + "s"
        (acc :+ cnt.as(name), regexp_replace(c, re, tag))
    }
    struct(counts: _*)
  }

  /** Within-document repetition signals (the Gopher/MassiveText-style quality
    * filters: pages dominated by one word or by repeated n-grams are
    * boilerplate). Exact integer numerators/denominators, not float ratios —
    * bit-stable across engines; thresholding (e.g. top_word_count/n_tokens >
    * 0.2) is the caller's policy. A native codegen Expression
    * (graft.functions.RepetitionStats): the Column-tree version's
    * distinct-x-filter top-word fold was an interpreted HOF measuring
    * ~1.2 ms/row at sf0.1; this is one JITed pass. Null text -> null struct. */
  def repetitionSignals(text: Column): Column = graft.functions.RepetitionStats(text)
}
