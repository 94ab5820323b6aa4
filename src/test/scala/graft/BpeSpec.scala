package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** Laws for the greedy-BPE tokenizer:
  *
  *  - the engine's rank-sequential replace-chain tokenization is
  *    EQUIVALENT to the classic priority-queue BPE (merge all
  *    occurrences of the lowest-ranked pair present, repeat) — the
  *    property the creation-ordered merges table licenses;
  *  - the count column equals the non-space token count;
  *  - merge-table validity (creation order) is enforced at load.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def engineTokens(texts: Seq[String]): Seq[Vector[String]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    df.select(col("id"), Bpe.tokens(col("text")).as("toks"))
      .orderBy("id").collect()
      .map(_.getSeq[String](1).toVector).toSeq
  }

  test("engine tokenization equals priority-queue BPE on the corpus " +
      "vocabulary and crafted derivation chains") {
    val texts = Seq(
      "the fast key order sort table scan merge part window small hash",
      "batch batch stream spark window dup join order",
      "scanning batches and sorting the windowed merges",
      "a", "", " ", "ab", "thethethe", "aaaa", "ststst",
      "sort sorted sorts resort", "batch batching batched",
      "keys keyed keying", "order ordering ordered orders",
      "join joins joining joined", "hash hashes hashing")
    val got = engineTokens(texts)
    for ((t, toks) <- texts.zip(got)) {
      assert(toks == Bpe.referenceTokens(t),
        s"'$t': engine $toks != reference ${Bpe.referenceTokens(t)}")
    }
  }

  test("randomized equivalence: 300 random [a-z ] strings tokenize " +
      "identically to the priority-queue reference") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcdefghijklmnopqrstuvwxyz "
    // bias toward merge-table letters so merges actually fire
    val biased = "thethinandineranorstbatchscanwinkeymergsortjoin " * 2 +
      alphabet
    val texts = (0 until 300).map { _ =>
      val n = 1 + rnd.nextInt(60)
      (0 until n).map(_ => biased(rnd.nextInt(biased.length))).mkString
    }
    val got = engineTokens(texts)
    for ((t, toks) <- texts.zip(got))
      assert(toks == Bpe.referenceTokens(t),
        s"'$t': engine $toks != reference ${Bpe.referenceTokens(t)}")
  }

  test("tokenCount equals the non-space token count and undercuts the " +
      "whitespace proxy on merging text") {
    val texts = Seq(
      "the fast key order sort table scan merge part window small hash",
      "batch batch stream spark window dup join order", "", "a b c")
    val counts = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), Bpe.tokenCount(col("text")).as("n"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    for ((t, n) <- texts.zip(counts)) {
      val ref = Bpe.referenceTokens(t).count(_ != " ")
      assert(n == ref, s"'$t': count $n != reference $ref")
    }
    // "the" is one BPE token but the char count is 3: BPE < chars;
    // and multi-word text has BPE >= word count (no cross-space merges)
    assert(counts.head < texts.head.count(_ != ' '))
    assert(counts.head >= texts.head.split(" ").length)
  }

  test("corpus documents tokenize identically to the priority-queue " +
      "reference (real data, not just synthetic strings)") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 25 === 0) // ~20 real documents
      .select(col("doc_id"), col("text"),
        Bpe.tokenCount(col("text")).as("n"))
      .collect()
    assert(docs.length >= 10, "sample too small to be meaningful")
    for (r <- docs) {
      val ref = Bpe.referenceTokens(r.getString(1)).count(_ != " ")
      assert(r.getLong(2) == ref,
        s"doc ${r.getLong(0)}: engine ${r.getLong(2)} != reference $ref")
    }
  }

  test("distributed merge training equals the driver reference trainer " +
      "on randomized corpora, and learned tables are creation-ordered") {
    val rnd = new scala.util.Random(77)
    // includes digits/punctuation: printable ASCII is fully seeded, so
    // "v2" symbolises as [v, 2] and "a-b" as [a, -, b] — the reference
    // trainer must symbolise identically
    val words = Seq("the", "then", "batch", "batching", "scan", "scans",
      "sort", "sorted", "win", "window", "key", "keys", "merge", "hash",
      "v2", "a-b", "2fast", "x99")
    for (trial <- 0 until 3) {
      val texts = (0 until 40).map { _ =>
        (0 until (3 + rnd.nextInt(8)))
          .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      }
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bpe.train(df, rounds = 6).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val wc = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val want = Bpe.referenceTrain(wc, rounds = 6)
      assert(got == want, s"trial $trial: engine $got != reference $want")
      // creation order: every learned side is a letter or an earlier output
      val produced = scala.collection.mutable.Set[String]()
      for ((x, y, _) <- got) {
        def ok(s: String) = s.length == 1 || produced.contains(s)
        assert(ok(x) && ok(y), s"($x, $y) not creation-ordered")
        produced += (x + y)
      }
    }
  }

  test("punctuated and digit-bearing text tokenizes: every printable-" +
      "ASCII char is seeded (no silent fusing), engine == reference, " +
      "and a literal separator char in the input cannot break framing") {
    val texts = Seq(
      "the batch-sort v2.1 costs $14,900 (99% off!)",
      "x99 a-b 2fast #tag @user [k]=v {j: 1} \"quoted\" 'single'",
      "a|b || pipe|batch the|n", // '|' is ordinary alphabet now
      "mixed CASE With 42 Digits & PUNCT.",
      "\u0001sep\u0001inside\u0001", // stripped before seeding
      "tab\tand\nnewline are tokens") // control chars seed too (r15)
    val got = engineTokens(texts)
    for ((t, toks) <- texts.zip(got))
      assert(toks == Bpe.referenceTokens(t),
        s"'$t': engine $toks != reference ${Bpe.referenceTokens(t)}")
    // digits/punct are REAL tokens: the budget counts them
    import spark.implicits._
    val n = Seq((0L, "v2 a-b")).toDF("id", "text")
      .select(Bpe.tokenCount(col("text"))).head.getLong(0)
    assert(n == 5L, s"'v2 a-b' must count 5 tokens (v,2,a,-,b), got $n")
  }

  test("non-ASCII and mixed-script text tokenizes per code point: " +
      "engine == reference, counts exact even for trailing control " +
      "chars, and ASCII tokenization is unchanged by the seeding") {
    val texts = Seq(
      "déjà vu naïve café", // combining-free accented Latin
      "русский текст и цифры 42", // Cyrillic
      "日本語のテキスト with ascii batch", // CJK + ASCII mix
      "emoji 😀🚀 inside the batch", // supplementary plane
      "Ñandú ÉCLAIR Σx mixed CASE", // lowercasing crosses scripts
      "x\t", "x", "lead", // trailing/leading control chars
      "tab\there the batch sorts\n") // controls inside + trailing
    val got = engineTokens(texts)
    for ((t, toks) <- texts.zip(got))
      assert(toks == Bpe.referenceTokens(t),
        s"'$t': engine $toks != reference ${Bpe.referenceTokens(t)}")
    import spark.implicits._
    // r14-advice exactness: "x\t" is 2 tokens, counted as 2 (the old
    // printable-only seeding counted 1 — count and token list disagreed)
    def count(t: String): Long = Seq((0L, t)).toDF("id", "text")
      .select(Bpe.tokenCount(col("text"))).head.getLong(0)
    assert(count("x\t") == 2L, "trailing control char must be counted")
    // every non-space token is counted, per code point: 😀🚀 is 2
    assert(count("😀🚀") == 2L, "supplementary chars count per code point")
    // ASCII text: merges still fire across the new seeding (the merged
    // token 'batch' survives), so ASCII budgets are unchanged
    assert(engineTokens(Seq("the batch"))
      .head == Vector("the", " ", "batch"))
  }

  test("merges table is creation-ordered by construction (object loads) " +
      "and a non-creation-ordered table would be rejected") {
    assert(Bpe.Merges.nonEmpty) // touching the object runs the validation
    // "ing" as a SIDE before (i,n) exists is the classic invalid table
    val bad = Seq("in" -> "g")
    val produced = scala.collection.mutable.Set[String]()
    val invalid = bad.exists { case (x, y) =>
      !((x.length == 1 || produced.contains(x)) &&
        (y.length == 1 || produced.contains(y)))
    }
    assert(invalid, "validation logic must reject un-derived sides")
  }
}
