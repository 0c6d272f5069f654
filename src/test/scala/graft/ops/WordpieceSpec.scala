package graft.ops

import graft.sql.{TestSpark, TextKernel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Subword tokenization (r18): greedy longest-match WordPiece encoding +
  * deterministic BPE-style vocab training, and the tokenizer= hook the
  * token-budget operators gained (specced against the whitespace
  * default, per the r17 directive).
  */
class WordpieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def enc(text: String, vocab: Seq[String], maxChars: Int = 32) =
    TextKernel.wordpiece(text, new TextKernel.WpVocab(vocab), maxChars).toSeq

  test("greedy longest match: always the longest piece, continuations in " +
      "##-form, whole word [UNK] on any dead end") {
    val v = Seq("a", "b", "c", "ab", "##c", "##bc", "x", "##y")
    assert(enc("abc", v) == Seq("ab", "##c"))      // ab beats a at pos 0
    assert(enc("a", v) == Seq("a"))
    // dead end mid-word (no ##a): the WHOLE word is [UNK], not a prefix
    assert(enc("abcabc", v) == Seq("[UNK]"))
    assert(enc("aba", v) == Seq("[UNK]"))
    assert(enc("x xy ab", v) == Seq("x", "x", "##y", "ab"))
  }

  test("maxWordChars caps a word to [UNK] before any matching") {
    val v = Seq("a", "##a")
    assert(enc("aaaaa", v, maxChars = 4) == Seq("[UNK]"))
    assert(enc("aaaa", v, maxChars = 4) == Seq("a", "##a", "##a", "##a"))
  }

  test("trainWordpieceVocab: deterministic, bounded, and merges make " +
      "frequent words single pieces") {
    val corpus = (
      Seq.fill(8)("newest") ++ Seq.fill(5)("low") ++ Seq.fill(3)("lower") ++
        Seq.fill(6)("widest")).mkString(" ")
    val df = Seq((1L, corpus)).toDF("id", "text")
    val v1 = TextAnalysis.trainWordpieceVocab(df, "text", vocabSize = 40)
    val v2 = TextAnalysis.trainWordpieceVocab(df, "text", vocabSize = 40)
    assert(v1 == v2, "training must be bit-deterministic")
    assert(v1.size <= 40)
    // base symbols all present -> training corpus never UNKs
    val pieces = enc(corpus, v1)
    assert(!pieces.contains("[UNK]"))
    // the most frequent word compresses to ONE piece once merges saturate
    assert(enc("newest", v1) == Seq("newest"),
      s"expected 'newest' as a single piece in $v1")
    // and total piece count is far below character count (merges bite)
    assert(pieces.length < corpus.replace(" ", "").length / 2)
  }

  test("trainWordpieceVocab stops at minPairFreq: singleton words stay " +
      "character-split") {
    val df = Seq((1L, "qz")).toDF("id", "text") // every pair freq 1
    val v = TextAnalysis.trainWordpieceVocab(df, "text", vocabSize = 100)
    assert(v.toSet == Set("q", "##z"), s"no merge may fire at freq 1: $v")
  }

  test("tokenizer= hook: wordpiece counter with a whole-word vocab packs " +
      "identically to the whitespace default; a subword vocab meters more") {
    val docs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(3 + i % 5)("alpha beta gamma").mkString(" ")))
      .toDF("doc_id", "text")
    val wholeWordVocab = Seq("alpha", "beta", "gamma")
    def packs(counter: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Sharding.packByTokenBudgetText(docs, "doc_id", "text", 40L,
          tokenCounter = counter, keepText = false)
        .select(col("doc_id"), col("shard_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ws = packs(TextAnalysis.whitespaceTokenCounter)
    val wpWhole = packs(TextAnalysis.wordpieceTokenCounter(wholeWordVocab))
    assert(ws == wpWhole,
      "a vocab holding every word whole must reproduce whitespace packing")
    // subword vocab: every word splits into >1 piece -> more tokens ->
    // earlier shard rollover
    val sub = Seq("al", "##pha", "be", "##ta", "ga", "##mma")
    val wpSub = packs(TextAnalysis.wordpieceTokenCounter(sub))
    assert(wpSub.values.max > ws.values.max,
      "subword metering must consume the budget faster")
    // sequencePack honors the same hook
    val sp = Sharding.sequencePack(
      docs.withColumn("src", lit("s")), "src", "doc_id", "text", 40.0,
      tokenCounter = TextAnalysis.wordpieceTokenCounter(wholeWordVocab),
      keepText = false)
    val spWs = Sharding.sequencePack(
      docs.withColumn("src", lit("s")), "src", "doc_id", "text", 40.0,
      keepText = false)
    assert(sp.select("doc_id", "pack_id").collect().toSeq ==
      spWs.select("doc_id", "pack_id").collect().toSeq)
  }

  test("wordpieceEncode DataFrame path matches the kernel row by row") {
    val vocab = Seq("s", "c", "a", "n", "##c", "##a", "##n", "scan")
    val df = Seq((1L, "scan scan sc"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.wordpieceEncode(col("text"), vocab).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got(1L) == Seq("scan", "scan", "s", "##c"))
    assert(got(2L) == Seq.empty && got(3L) == Seq.empty)
  }
}
