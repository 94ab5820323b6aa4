package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expr.{E, SLit, Lit}

/** Deterministic greedy byte-pair-encoding token counting with a LITERAL
  * merges table (Sennrich, Haddow, Birch, "Neural Machine Translation of
  * Rare Words with Subword Units", ACL 2016) — the real unit a training-
  * data token budget is denominated in, where the whitespace token count
  * the rest of the corpus family uses is only a proxy.
  *
  * Both engines run the IDENTICAL computation, so the DuckDB oracle
  * hash-matches bit-for-bit (the same dual-rendering discipline as
  * `hashUniform`): the token stream is represented as a separator string
  * (`||` between tokens, `||` at both ends) built by one `replace` per
  * alphabet character, and each merge rank is ONE left-to-right
  * non-overlapping `replace("|x||y|" -> "|xy|")` — both engines'
  * `replace` scan exactly that way, and the single un-consumed `|` on
  * each side keeps back-to-back merge sites independent. No regex, no
  * UDF: a codegen'd chain of string primitives.
  *
  * Rank-sequential application (one full pass per merge, in table order)
  * is equivalent to the classic priority-queue BPE ("repeatedly merge
  * the lowest-ranked pair present") PROVIDED the table is
  * creation-ordered — every multi-character side is the output of an
  * earlier merge — because a pair's occurrences can only appear when its
  * constituent tokens are created, which creation order confines to
  * earlier passes. The constructor enforces creation order with a
  * `require`, and BpeSpec pins the equivalence against a driver-side
  * priority-queue reference on randomized corpora.
  *
  * Domain: lowercase ASCII text over `[a-z ]` (the synthetic corpus
  * alphabet — input is lowercased first). Space never appears in a merge
  * side, so tokens never cross word boundaries; space tokens are
  * subtracted from the count. Characters outside the alphabet are not
  * seeded with separators and therefore fuse into the preceding token —
  * identically in both engines — so they cannot cause an oracle
  * mismatch, but a production vocabulary would extend the alphabet.
  *
  * Scale shape: a pure per-row projection — no shuffle, no state, no
  * driver round-trip; the merges table is compiled into the expression
  * tree (66 string passes over ~3x-expanded text per row). */
object Bpe {

  /** The seeded alphabet: characters that become initial tokens. */
  val Alphabet: Seq[String] = ('a' to 'z').map(_.toString) :+ " "

  /** Creation-ordered merges (rank = position): every multi-char side is
    * the output of an earlier merge — validated below, and the property
    * that licenses rank-sequential application (see scaladoc). The table
    * is tuned to the synthetic corpus's vocabulary so real merges fire
    * at every depth of the derivation chains (e.g. b+at, bat+ch). */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "o" -> "n",
    "e" -> "r", "r" -> "e", "a" -> "t", "s" -> "t", "o" -> "r",
    "e" -> "n", "a" -> "r", "in" -> "g", "an" -> "d", "o" -> "u",
    "l" -> "e", "c" -> "h", "s" -> "h", "s" -> "c", "sc" -> "an",
    "b" -> "at", "bat" -> "ch", "t" -> "a", "ta" -> "b", "w" -> "in",
    "d" -> "o", "k" -> "e", "ke" -> "y", "m" -> "er", "mer" -> "g",
    "s" -> "or", "sor" -> "t", "h" -> "a", "ha" -> "sh", "p" -> "ar",
    "j" -> "o", "jo" -> "in", "or" -> "d", "ord" -> "er")

  // creation-order validation: each side is a single alphabet char or an
  // earlier merge's output; no side contains the separator or a space
  locally {
    val produced = scala.collection.mutable.Set[String]()
    for (((x, y), r) <- Merges.zipWithIndex) {
      def ok(s: String) =
        (s.length == 1 && s != " " && Alphabet.contains(s)) ||
          produced.contains(s)
      require(ok(x) && ok(y),
        s"merge #$r ($x, $y) is not creation-ordered")
      require(!x.contains("|") && !y.contains("|"), "separator in merge")
      produced += (x + y)
    }
    require(Merges.map(p => p._1 + p._2).distinct.size == Merges.size,
      "duplicate merge output")
  }

  /** The merged separator-string form of lower(text): `||`-delimited
    * tokens with leading/trailing `||` — the shared core of the count
    * and the token list, as a dual-rendered E expression. */
  private[graft] def mergedE(text: E): E = {
    val lowered = E.lower(text)
    val seeded = E.concatS(SLit("||"),
      Alphabet.foldLeft(lowered)((s, c) =>
        E.replace(s, SLit(c), SLit(c + "||"))))
    Merges.foldLeft(seeded) { case (s, (x, y)) =>
      E.replace(s, SLit("|" + x + "||" + y + "|"), SLit("|" + x + y + "|"))
    }
  }

  /** BPE token count of `text` (space tokens excluded), as a
    * dual-rendered E expression: separator arithmetic over [[mergedE]] —
    * (#`|` / 2 − 1) tokens minus the space-character count. Exact whole
    * numbers in double arithmetic in both engines. */
  def tokenCountE(text: E): E = {
    val m = mergedE(text)
    val lowered = E.lower(text)
    val nAll =
      (E.length(m) - E.length(E.replace(m, SLit("|"), SLit("")))) /
        Lit(2.0) - Lit(1.0)
    val nSpaces =
      E.length(lowered) - E.length(E.replace(lowered, SLit(" "), SLit("")))
    nAll - nSpaces
  }

  /** Engine-side column forms. */
  def tokenCount(text: Column): Column =
    E.toColumn(tokenCountE(graft.expr.Raw(text, "?"))).cast("long")

  /** The token sequence itself (engine-only — specs and downstream
    * consumers; includes the single-space word separators). */
  def tokens(text: Column): Column =
    filter(split(E.toColumn(mergedE(graft.expr.Raw(text, "?"))), "\\|\\|"),
      t => t =!= "")

  /** DuckDB rendering of the count over a column expression. */
  def tokenCountSql(textExpr: String): String =
    E.toSql(tokenCountE(graft.expr.Raw(null, textExpr)))

  /** DuckDB rendering of the token LIST (the `||`-split of the merged
    * separator string, empties and space tokens removed) — lets the
    * oracle unnest the identical token stream the engine's [[tokens]]
    * produces. */
  def tokensSql(textExpr: String): String = {
    val merged = E.toSql(mergedE(graft.expr.Raw(null, textExpr)))
    s"list_filter(string_split($merged, '||'), t -> t <> '' AND t <> ' ')"
  }

  /** Driver-side reference: classic priority-queue BPE (merge ALL
    * left-to-right non-overlapping occurrences of the lowest-ranked pair
    * present, repeat until none applies). BpeSpec pins engine ≡ this. */
  private[graft] def referenceTokens(text: String): Vector[String] = {
    val rank = Merges.zipWithIndex.map { case ((x, y), r) => (x, y) -> r }.toMap
    var toks = text.toLowerCase.map(_.toString).toVector
    var done = false
    while (!done && toks.length > 1) {
      val present = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))).map(r => r))
      if (present.isEmpty) done = true
      else {
        val r = present.min
        val (x, y) = Merges(r)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
            out += (x + y); i += 2 // left-to-right non-overlapping
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }
}
