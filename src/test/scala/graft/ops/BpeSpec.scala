package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** BPE tokenizer semantics pins (Sennrich et al. 2016 greedy merges):
  * deterministic tie-breaks, left-to-right non-overlapping merge
  * application, apply == training segmentation for trained words, UNK
  * for unseen characters, and the Spark expression agreeing with the
  * driver-side encode on every path.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("greedy merge training: classic corpus learns the frequency-ordered merges") {
    // weighted word table (the subword-nmt teaching example, trimmed):
    // 'es' dominates (est in newest/widest), then 'est', ...
    val words = Seq(("newest", 6L), ("widest", 3L), ("low", 5L), ("lower", 2L))
    val m = Bpe.trainFromCounts(words, numMerges = 4)
    // pair counts round 0: (e,s)=9, (s,t)=9, (n,e)=6, (e,w)=8, (w,e)=8(6+2)...
    // tie (e,s) vs (s,t) at 9 breaks lexicographically -> (e,s)
    assert(m.merges.head == ("e", "s"), m.merges)
    // round 1: es+t = 9 wins outright
    assert(m.merges(1) == ("es", "t"), m.merges)
    // 'low' count 5 + 'lower' 2 -> (l,o)=7, (o,w)=7 ties; (l,o) < (o,w)
    assert(m.merges(2) == ("l", "o"), m.merges)
    assert(m.merges(3) == ("lo", "w"), m.merges)
  }

  test("merge application is left-to-right non-overlapping") {
    assert(Bpe.mergeAll(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.mergeAll(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    // and training counts overlapping pair occurrences (aaa has (a,a) x2):
    // corpus {aaa x2, bc x3}: (b,c)=3 beats (a,a)=4? No — (a,a)=4 wins.
    val m = Bpe.trainFromCounts(Seq(("aaa", 2L), ("bc", 3L)), 1)
    assert(m.merges.head == ("a", "a"), m.merges)
  }

  test("training stops early when no pairs remain; single-char words never crash") {
    val m = Bpe.trainFromCounts(Seq(("ab", 1L), ("c", 9L)), numMerges = 10)
    assert(m.merges == IndexedSeq(("a", "b")))
    assert(m.vocab == Map("a" -> 0, "b" -> 1, "c" -> 2, "ab" -> 3))
    assert(m.nBase == 3)
  }

  test("apply reproduces the training segmentation for every trained word") {
    val words = Seq(("newest", 6L), ("widest", 3L), ("low", 5L),
      ("lower", 2L), ("lowest", 4L), ("wider", 1L), ("new", 2L))
    val m = Bpe.trainFromCounts(words, numMerges = 8)
    // re-derive training segs by replaying merges in rank order (the
    // independent definition), then check encodeString picks identical
    // subwords via lowest-rank-present iteration
    for ((w, _) <- words) {
      var sy = w.map(_.toString).toArray
      for ((l, r) <- m.merges) sy = Bpe.mergeAll(sy, l, r)
      val expected = sy.map(s => m.vocab(s)).toSeq
      assert(Bpe.encodeString(w, m).toSeq == expected, s"word $w")
    }
  }

  test("non-BMP text: symbols are CODEPOINTS, never split surrogate pairs") {
    // base alphabet in codepoint order: 'x' (0x78) sorts BELOW the emoji
    // (0x1F600) — String order would have ranked the surrogate first —
    // and the emoji stays ONE symbol (a UTF-16 walk would seed two
    // malformed lone-surrogate symbols; round-6 review finding)
    val m = Bpe.trainFromCounts(Seq(("😀x", 2L)), 2)
    assert(m.nBase == 2)
    assert(m.vocab("x") == 0 && m.vocab("😀") == 1)
    assert(m.vocab("😀x") == 2) // the one merge
    assert(Bpe.encodeString("😀x", m).toSeq == Seq(2))
    assert(Bpe.encodeString("😀", m).toSeq == Seq(1))
    assert(Bpe.encodeString("x 😀x x", m).toSeq == Seq(0, 2, 0))
  }

  test("unseen characters encode as UnkId; empty words are skipped") {
    val m = Bpe.trainFromCounts(Seq(("ab", 2L)), 1)
    assert(Bpe.encodeString("ab zb", m).toSeq ==
      Seq(m.vocab("ab"), Bpe.UnkId, m.vocab("b")))
    assert(Bpe.encodeString("", m).isEmpty)
    assert(Bpe.encodeString("  ab  ", m).toSeq == Seq(m.vocab("ab")))
  }

  test("distributed train matches trainFromCounts on the same corpus; column encode matches driver encode") {
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest"),
      (3L, null.asInstanceOf[String]),
      (4L, "low wider new")).toDF("doc_id", "text")
    val words = Seq("low" -> 6L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "wider" -> 1L, "new" -> 1L)
    val local = Bpe.trainFromCounts(words, 6)
    val dist = Bpe.train(docs, "text", numMerges = 6)
    assert(dist.merges == local.merges)
    assert(dist.vocab == local.vocab)

    val got = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), Bpe.encode(col("text"), dist).as("toks"))
      .orderBy("doc_id").as[(Long, Seq[Int])].collect()
    for ((id, toks) <- got) {
      val text = docs.filter(col("doc_id") === id)
        .select("text").as[String].head()
      assert(toks == Bpe.encodeString(text, dist).toSeq, s"doc $id")
    }
    // null text -> null tokens (expression is null-safe)
    val n = docs.select(Bpe.encode(col("text"), dist).as("t"))
      .filter(col("t").isNull).count()
    assert(n == 1)
  }

  test("NUL-bearing symbols keep distinct merge ranks (pair-keyed rank map)") {
    // the pre-round-7 rank map joined l + NUL + r into one string key, so
    // merges ("a<NUL>", "b") and ("a", "<NUL>b") collided; the
    // pair-keyed map must rank them independently. Symbols here contain a
    // NUL codepoint (written as the backslash-u0000 escape per repo policy).
    val nul = "\u0000"
    val model = Bpe.Model(
      merges = IndexedSeq(("a" + nul) -> "b", "a" -> (nul + "b")),
      vocab = Map("a" -> 0, "b" -> 1, nul -> 2,
        ("a" + nul) -> 3, ("a" + nul + "b") -> 4, (nul + "b") -> 5),
      nBase = 3)
    val rt = model.runtime
    assert(rt.ranks.get(("a" + nul, "b")) == 0)
    assert(rt.ranks.get(("a", nul + "b")) == 1)
    // encoding "a<NUL>b": symbols [a, NUL, b]; neither merge-0's left
    // ("a<NUL>") nor its pair exists until ("a",<NUL>) merges — which is
    // NOT a merge — so only rank-1's ("a", "<NUL>b") could apply after
    // (<NUL>, b)... which is also not a merge. The word stays 3 symbols.
    assert(Bpe.encodeString("a" + nul + "b", model).toSeq == Seq(0, 2, 1))
  }

  test("maxWords cap keeps the most frequent words deterministically") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    // cap 2 keeps {a x3, b x2}; 'c' drops out -> becomes UNK at encode
    val m = Bpe.train(docs, "text", numMerges = 2, maxWords = 2)
    assert(!m.vocab.contains("c"))
    assert(Bpe.encodeString("c", m).toSeq == Seq(Bpe.UnkId))
  }
}
