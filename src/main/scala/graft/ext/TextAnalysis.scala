package graft.ext

import graft.expr._
import graft.expr.E._

/** Scalar text-analysis operators for large-scale corpus pipelines:
  * quality scoring, token counting, language-ID heuristic, fingerprinting.
  * All closed-form expressions over the `documents` table (driver testdata),
  * fully codegen'd, shuffle-free, with DuckDB oracles.
  *
  * String primitives are restricted to length/replace/lower/concat/md5 whose
  * semantics are identical across engines — occurrence counts use the
  * length-difference trick instead of regex (dialects differ).
  */
object TextAnalysis {

  /** Text padded with single spaces so word-boundary markers match at the
    * edges. */
  private def padded(text: E): E = concatS(SLit(" "), text, SLit(" "))

  /** Character count. */
  def charCount(text: E): E = CastD(length(text))

  /** Whitespace token count: spaces + 1 (documents are single-space
    * separated). */
  def tokenCount(text: E): E =
    CastD(length(text) - length(replace(text, SLit(" "), SLit("")))) + Lit(1.0)

  /** Mean token length. */
  def avgTokenLength(text: E): E =
    CastD(length(replace(text, SLit(" "), SLit("")))) / tokenCount(text)

  private val punctMarks = Seq(".", ",", "!", "?", ";", ":")

  def punctCount(text: E): E =
    sumAll(punctMarks.map(m => countOccurrences(text, m)))

  /** BPE-ish subword token ESTIMATE without a vocabulary, mirroring what a
    * GPT-2-style pre-tokenizer + merges produce on prose: whitespace words
    * count one each, punctuation marks split off as their own tokens, and
    * words fragment roughly every 4 characters beyond the first 6 (BPE
    * merges rarely span word boundaries). Deterministic closed form over
    * length/replace arithmetic — identical in Spark and DuckDB. */
  def bpeTokenEstimate(text: E): E = {
    val words = tokenCount(text)
    val chars = CastD(length(replace(text, SLit(" "), SLit(""))))
    words + punctCount(text) +
      greatest(Lit(0.0), (chars - Lit(6.0) * words) / Lit(4.0))
  }

  /** English stopword occurrences per token — a quality signal
    * (real-corpus heuristics: too-low stopword density flags non-prose). */
  val stopwords: Seq[String] = Seq(" the ", " a ", " and ", " of ", " to ", " in ")

  def stopwordCount(text: E): E =
    sumAll(stopwords.map(m => countOccurrences(padded(text), m)))

  def stopwordRatio(text: E): E = stopwordCount(text) / tokenCount(text)

  /** Composite quality score in [0,1]-ish: length saturation x stopword
    * density x mean-token-length window. */
  def qualityScore(text: E): E = {
    val lenScore = least(charCount(text) / Lit(200.0), Lit(1.0))
    val stopScore = least(stopwordRatio(text) * Lit(5.0), Lit(1.0))
    val tokLen = avgTokenLength(text)
    val tokScore = If((tokLen >= Lit(3.0)) && (tokLen <= Lit(10.0)), Lit(1.0), Lit(0.5))
    lenScore * stopScore * tokScore
  }

  /** Punctuation marks per token. */
  def punctRatio(text: E): E = punctCount(text) / tokenCount(text)

  /** Model-based quality filtering, the stage production pipelines run
    * after heuristic gates (fastText/linear classifiers over shallow text
    * features): a logistic model with fixed interpretable weights over
    * the heuristic signals above. The weights stand in for a fitted
    * model — what matters for the engine is the operator shape: a fully
    * codegen'd closed-form projection (ln/exp/arithmetic), shuffle-free
    * at any scale, identical in both engines. Returns the sigmoid score
    * in (0, 1). */
  def qualityLogit(text: E): E = {
    val z = Lit(-2.0) +
      Lit(0.6) * ln(Lit(1.0) + charCount(text)) +
      Lit(5.0) * stopwordRatio(text) -
      Lit(0.4) * abs(avgTokenLength(text) - Lit(5.0)) -
      Lit(2.0) * punctRatio(text)
    Lit(1.0) / (Lit(1.0) + exp(Lit(0.0) - z))
  }

  /** Language-ID: marker-word densities per language, argmax with a fixed
    * precedence order for ties. N-gram/stopword heuristic — deterministic
    * and cheap at 100 TB (no model inference). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los "),
    "zh" -> Seq("的", "是"))

  def langScore(text: E, lang: String): E = {
    val ms = langMarkers.find(_._1 == lang).get._2
    sumAll(ms.map(m => countOccurrences(padded(text), m)))
  }

  /** Winning language as a code string; "und" (undetermined) when all
    * scores are zero. Ties resolve in `langMarkers` order. */
  def langId(text: E): E = {
    val scored = langMarkers.map { case (lang, _) => lang -> langScore(text, lang) }
    // best = fold over langs: keep lang with strictly greater score
    def pick(rest: List[(String, E)], bestLang: E, bestScore: E): E = rest match {
      case Nil => If(bestScore > Lit(0.0), bestLang, SLit("und"))
      case (lang, s) :: tail =>
        pick(tail,
          If(s > bestScore, SLit(lang), bestLang),
          If(s > bestScore, s, bestScore))
    }
    pick(scored.toList.tail, SLit(scored.head._1), scored.head._2)
  }

  /** Alphabet of the character-entropy gate: the 26 lowercase letters.
    * Characters outside it (spaces, digits, punctuation) are excluded from
    * the distribution — the signal wanted from an entropy quality gate is
    * letter diversity, not separator density. */
  val entropyAlphabet: Seq[String] = ('a' to 'z').map(_.toString)

  /** Count of one alphabet character (the length-difference trick — no
    * explode, no regex). */
  def charCountOf(text: E, ch: String): E = countOccurrences(text, ch)

  /** Shannon entropy (bits/char) of a character distribution given the
    * per-character count COLUMNS (produced by a prior [[charCountOf]]
    * stage so each count is computed once) and the total-count column.
    * Zero-count characters contribute 0; an empty distribution scores 0.
    * Low entropy flags degenerate text (single-character floods, heavy
    * repetition) — the classic cheap quality gate next to
    * [[qualityScore]]. Closed-form sum over a FIXED alphabet: fully
    * codegen'd, shuffle-free at any scale (a per-row expression), unlike
    * the explode-and-group formulation whose shuffle carries one row per
    * (doc, char). */
  def charEntropyBits(countCols: Seq[E], total: E): E = {
    val ln2 = ln(Lit(2.0))
    val terms = countCols.map { c =>
      If(c > Lit(0.0), (c / total) * (ln(c / total) / ln2), Lit(0.0))
    }
    If(total > Lit(0.0), Lit(0.0) - sumAll(terms), Lit(0.0))
  }

  /** Content fingerprint: md5 of the raw text — the exact-dedup key. */
  def fingerprint(text: E): E = md5S(text)

  /** Normalised fingerprint: md5 of lowercased text with collapsed spacing
    * removed — catches case/spacing-only near-dups. */
  def normalizedFingerprint(text: E): E =
    md5S(replace(lower(text), SLit(" "), SLit("")))
}
