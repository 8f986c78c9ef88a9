package graft.functions

import graft.SparkSpec
import graft.functions.BpeTokenizer.Merge
import org.apache.spark.sql.functions._

/** Fuzz conformance for the [[BpeApply]] codegen loop — the same
  * interpreter-vs-engine pattern FuzzSpec applies to the filter language:
  * the documented semantics (apply merges in rank order; each merge
  * replaces ALL occurrences left-to-right, non-overlapping) have a
  * trivially-correct JVM interpreter (a sequential `String.replace`
  * fold), and the custom expression must agree with it on adversarial
  * inputs the corpus never produces: empty strings, runs of a repeated
  * symbol (overlap resolution), placeholders feeding later merges
  * (hierarchy), supplementary-plane placeholders (surrogate pairs in
  * UTF-16, single codepoints to length/substr), and merge tables whose
  * pairs shadow each other. Token counting must equal the interpreter's
  * CODEPOINT count, never its UTF-16 length. */
class BpeFuzzSpec extends SparkSpec {

  private def cpStr(cp: Int): String = new String(Character.toChars(cp))

  /** The spec's independent semantics: rank-ordered sequential replace.
    * Java String.replace is left-to-right, non-overlapping, all
    * occurrences — exactly the documented per-merge contract. */
  private def interpret(text: String, merges: Seq[Merge]): String =
    merges.sortBy(_.rank).foldLeft(text)((t, m) => t.replace(m.pair, m.repl))

  test("BpeApply loop matches the interpreter on 1200 fuzz cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    // symbol pool: ASCII letters, a space, a BMP PUA placeholder, and a
    // PLANE-15 placeholder (surrogate pair) — the paged-placeholder shape
    val basePool = Vector("a", "b", "c", " ", cpStr(0xE001), cpStr(0xF0000))
    var checked = 0
    for (tbl <- 0 until 20) {
      // random merge table, ranks 1..m; later merges may consume earlier
      // placeholders (hierarchical tokens), and repls page across the
      // private-use ranges incl. supplementary slots
      val m = 1 + rnd.nextInt(10)
      var symbols = basePool
      val merges = (1 to m).map { rank =>
        val pair = symbols(rnd.nextInt(symbols.size)) +
          symbols(rnd.nextInt(symbols.size))
        val repl = cpStr(BpeTokenizer.placeholderCp(
          1 + rnd.nextInt(137000)))
        symbols = symbols :+ repl // later pairs can reference it
        Merge(pair, repl, rank)
      }
      val texts = (0 until 60).map { i =>
        if (i == 0) ""
        else if (i == 1) "aaaaaaa" // overlap resolution on a pure run
        else (0 until rnd.nextInt(40))
          .map(_ => symbols(rnd.nextInt(symbols.size))).mkString
      }
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text")
      val got = df.select(col("i"),
          BpeTokenizer.applyMerges(col("text"), merges).as("a"),
          BpeTokenizer.tokenCount(col("text"), merges).as("n"))
        .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getInt(2)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = interpret(t, merges)
        val (gotStr, gotN) = got(i)
        assert(gotStr == want,
          s"table $tbl case $i: loop='${gotStr}' interpreter='$want' " +
            s"text='$t' merges=$merges")
        assert(gotN == want.codePointCount(0, want.length),
          s"table $tbl case $i: tokenCount $gotN != codepoints of '$want'")
        checked += 1
      }
    }
    assert(checked == 1200)
  }
}
