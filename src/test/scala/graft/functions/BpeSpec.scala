package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained batched-merge BPE: deterministic training (tie-break by
  * (count desc, pair asc)), hierarchical round-2 merges over round-1
  * placeholders, and token counts on a hand-traceable corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-traceable training: pair counts, tie-break, application") {
    // "aaab": pairs aa,aa,ab; "aaba": aa,ab,ba -> counts aa:3, ab:2, ba:1
    val docs = Seq((1L, "aaab"), (2L, "aaba")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(docs, mergesPerRound = 2, rounds = 1)
    assert(merges.map(_.pair) == Seq("aa", "ab"))
    assert(merges.map(_.rank) == Seq(1, 2))
    assert(merges.map(_.repl) == Seq("", ""))
    // apply in rank order: "aaab" -> (aa->α) "αab" -> (ab->β) "αβ" = 2
    //                      "aaba" -> "αba" (no "ab" left)          = 3
    val counts = docs.select(col("doc_id"),
        BpeTokenizer.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts == Map(1L -> 2, 2L -> 3))
  }

  test("round 2 merges placeholders with neighbors (hierarchical tokens)") {
    // round 1 on "abab..." learns ab (and ba); round 2 must merge the
    // resulting placeholder RUNS — pairs of round-1 symbols — proving
    // later rounds build multi-char tokens on earlier rounds' output
    val docs = Seq((1L, "ab" * 12)).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(docs, mergesPerRound = 1, rounds = 2)
    assert(merges.length == 2)
    assert(merges(0).pair == "ab")
    assert(merges(1).pair == "") // (ab)(ab) -> one token
    // "abababab..."(24 chars) -> 12 x α -> 6 x round-2 token
    val n = docs.select(BpeTokenizer.tokenCount(col("text"), merges))
      .head.getInt(0)
    assert(n == 6)
  }

  test("a 765-merge table applies as one loop expression (no fold-depth limit)") {
    // the replace-FOLD form overflowed the driver stack at ~700 merges
    // (Column->Expression conversion recurses per nesting level); the
    // BpeApply loop must be depth-1 at any vocabulary size. Synthetic
    // merges: aa->PUA_1, then chains of placeholder+placeholder — only
    // the first merge ever matches this corpus, the rest must be inert.
    val merges = (1 to 765).map { i =>
      val repl = (0xE000 + i).toChar.toString
      val pair = if (i == 1) "aa" else (0xE000 + i - 1).toChar.toString * 2
      BpeTokenizer.Merge(pair, repl, i)
    }
    val docs = Seq((1L, "aaaa"), (2L, "b" * 10)).toDF("doc_id", "text")
    val counts = docs.select(col("doc_id"),
        BpeTokenizer.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // "aaaa" -> aa->α twice -> "αα" -> merge 2 (αα->β) -> "β" = 1 token
    assert(counts == Map(1L -> 1, 2L -> 10))
  }

  test("BpeApply loop is step-equivalent to a per-merge replace fold") {
    // the loop expression replaced the fold for depth reasons; its
    // semantics must stay EXACTLY the fold's (left-to-right,
    // non-overlapping, all occurrences, rank order) — compare both forms
    // over real corpus text and real trained merges
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val merges = BpeTokenizer.train(docs, mergesPerRound = 24, rounds = 2)
    val loop = BpeTokenizer.applyMerges(coalesce(col("text"), lit("")), merges)
    val fold = merges.sortBy(_.rank).foldLeft(coalesce(col("text"), lit(""))) {
      (acc, m) => org.apache.spark.sql.functions.replace(acc, lit(m.pair), lit(m.repl))
    }
    assert(docs.select(loop.as("a"), fold.as("b"))
      .filter(col("a") =!= col("b")).count() == 0)
  }

  test("placeholder paging: page boundaries, codepoint counting, block cap") {
    // exact page-boundary slots: BMP PUA end -> plane-15 start -> plane-15
    // end -> plane-16 start -> last addressable slot
    assert(BpeTokenizer.placeholderCp(1) == 0xE001)
    assert(BpeTokenizer.placeholderCp(6399) == 0xF8FF)
    assert(BpeTokenizer.placeholderCp(6400) == 0xF0000)
    assert(BpeTokenizer.placeholderCp(71933) == 0xFFFFD)
    assert(BpeTokenizer.placeholderCp(71934) == 0x100000)
    assert(BpeTokenizer.placeholderCp(137467) == 0x10FFFD)
    intercept[IllegalArgumentException](BpeTokenizer.placeholderCp(0))
    intercept[IllegalArgumentException](BpeTokenizer.placeholderCp(137468))
    // a paged placeholder is ONE codepoint (two UTF-16 chars)
    val p = BpeTokenizer.placeholder(6400)
    assert(p.length == 2 && p.codePointCount(0, p.length) == 1)
    // MaxBlocks: the last block's window must fit; one past throws
    assert(BpeTokenizer.MaxBlocks == 536)
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      BpeTokenizer.train(docs, mergesPerRound = 1, rounds = 1,
        firstBlock = BpeTokenizer.MaxBlocks))
    assert(e.getMessage.contains("private-use blocks"))
  }

  test("firstBlock continuation trains supplementary-plane placeholders") {
    // block 25 = first plane-15 page: every learned merge's placeholder is
    // a surrogate pair in UTF-16, and token counting must still count it
    // as ONE token (Spark length() counts codepoints)
    val docs = Seq((1L, "abab"), (2L, "abba")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(docs, mergesPerRound = 1, rounds = 1,
      firstBlock = 25)
    assert(merges.length == 1 && merges.head.pair == "ab")
    val repl = merges.head.repl
    assert(repl.codePointAt(0) == 0xF0000 + 1) // slot 25*256+1, paged
    assert(repl.length == 2 && repl.codePointCount(0, 2) == 1)
    val counts = docs.select(col("doc_id"),
        BpeTokenizer.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // "abab" -> 2 placeholders = 2 tokens; "abba" -> (ab)ba = 3 tokens
    assert(counts == Map(1L -> 2, 2L -> 3))
    // round 2 of a continuation merges paged placeholders hierarchically
    // (single-doc corpus so the only round-2 pair IS the placeholder run)
    val docs1 = Seq((1L, "abab")).toDF("doc_id", "text")
    val m2 = BpeTokenizer.train(docs1, mergesPerRound = 1, rounds = 2,
      firstBlock = 25)
    assert(m2(1).pair == m2(0).repl * 2) // placeholder pair, round 2
    assert(m2(1).repl.codePointAt(0) == 0xF0000 + 256 + 1)
    val n1 = docs1.select(BpeTokenizer.tokenCount(col("text"), m2))
      .head.getInt(0)
    assert(n1 == 1) // (ab)(ab) -> one round-2 token
  }

  test("training is deterministic and counts never exceed char length") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val m1 = BpeTokenizer.train(docs)
    val m2 = BpeTokenizer.train(docs)
    assert(m1 == m2)
    assert(m1.size == 32) // 2 rounds x 16 on a real corpus
    val bad = docs.select(
        length(col("text")).as("nc"),
        BpeTokenizer.tokenCount(col("text"), m1).as("nt"))
      .filter(col("nt") > col("nc") || col("nt") <= 0)
    assert(bad.count() == 0)
  }
}
