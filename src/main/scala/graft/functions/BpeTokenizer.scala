package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-TRAINED byte-pair-encoding token counting — the canonical
  * "tokens per document" a training-data pipeline reports, upgraded from
  * the pre-tokenization-only [[TextFunctions.bpeTokenCount]].
  *
  * Training is the batched-merge variant of the public BPE algorithm
  * (Sennrich et al. 2016, arXiv:1508.07909; batching as in fastBPE-style
  * implementations): instead of recounting after every single merge, each
  * ROUND counts all adjacent symbol pairs corpus-wide in ONE DataFrame
  * aggregation and adopts the top-K by (count desc, pair asc — the
  * deterministic tie-break), then rewrites the corpus and runs the next
  * round. Later rounds see the placeholder symbols earlier rounds
  * introduced, so merges compose into genuinely multi-character tokens
  * (round 2 can merge a round-1 pair with a neighbor — the hierarchical
  * structure that makes BPE BPE).
  *
  * Scale shape: each round is one explode/count shuffle on 2-char pair
  * keys plus one bounded top-K collect (K merges, never row data);
  * application is a scan-side chain of codegen `StringReplace`s — no UDF,
  * no extra shuffle, 100 TB-safe. Placeholders live in the Unicode
  * private-use ranges (one 256-slot block per round, PAGED across BMP
  * U+E000.. then planes 15/16 — ~137K slots, production-vocab scale), one
  * CODEPOINT per merged token, so `length(rewritten)` IS the token count
  * in both engines (length/substr count codepoints, not UTF-16 chars).
  *
  * Every step is deliberately engine-replayable (the `bpe_tokenize`
  * oracle re-trains AND re-applies the same merges in DuckDB SQL:
  * identical pair extraction by position, identical tie-break, identical
  * left-to-right non-overlapping `replace`), so the trained tokenizer is
  * hash-checked end-to-end, not just spec-asserted.
  */
object BpeTokenizer {

  /** One learned merge: `pair` (2 symbols, possibly placeholders) ->
    * `repl` (1 private-use CODEPOINT — possibly a surrogate pair in
    * UTF-16, always one codepoint, which is the unit both engines'
    * `length`/`substr` count). Rank is global application order. */
  case class Merge(pair: String, repl: String, rank: Int)

  // ---- placeholder paging ----------------------------------------------
  // Merged tokens are stand-ins: one private-use codepoint each, so
  // `length(rewritten)` IS the token count. Slots are numbered globally
  // (block*256 + rankInBlock, one 256-slot block per training round) and
  // PAGE across the three Unicode private-use ranges:
  //   page 0: U+E000..U+F8FF   (BMP PUA,   slots     0..6399  — 25 blocks)
  //   page 1: U+F0000..U+FFFFD (plane 15,  slots  6400..71933 — 255+ blocks)
  //   page 2: U+100000..U+10FFFD (plane 16, slots 71934..137467)
  // 137k slots ≈ 536 blocks — past a production 50K vocab with room over.
  // Pages 1-2 are supplementary codepoints (2 UTF-16 chars) but one
  // CODEPOINT, and Spark's length/substr and DuckDB's length/substr both
  // count codepoints, so token counting and pair extraction are unchanged.
  private val BmpBase = 0xE000
  private[graft] val BmpSlots = 6400
  private val PuaABase = 0xF0000
  private[graft] val PuaSlots = 65534
  private val PuaBBase = 0x100000
  /** Max usable placeholder blocks: each block owns a 256-slot window,
    * and the last block's window must fit inside the slot space. */
  val MaxBlocks: Int = (BmpSlots + 2 * PuaSlots) / 256 // = 536

  private[graft] def placeholderCp(slot: Int): Int = {
    require(slot >= 1 && slot < BmpSlots + 2 * PuaSlots,
      s"placeholder slot $slot outside the three private-use pages")
    if (slot < BmpSlots) BmpBase + slot
    else if (slot < BmpSlots + PuaSlots) PuaABase + (slot - BmpSlots)
    else PuaBBase + (slot - BmpSlots - PuaSlots)
  }

  private[graft] def placeholder(slot: Int): String =
    new String(Character.toChars(placeholderCp(slot)))

  /** The SAME paging as a DuckDB expression over a (1-based) slot
    * expression — one arithmetic, two engines: the `bpe_tokenize`/
    * `bpe_paged` oracle generators interpolate this, so the replay can
    * never drift from [[placeholderCp]]. */
  def placeholderSql(slotExpr: String): String =
    s"chr((CASE WHEN ($slotExpr) < $BmpSlots THEN $BmpBase + ($slotExpr) " +
      s"WHEN ($slotExpr) < ${BmpSlots + PuaSlots} " +
      s"THEN $PuaABase + (($slotExpr) - $BmpSlots) " +
      s"ELSE $PuaBBase + (($slotExpr) - ${BmpSlots + PuaSlots}) END)::INT)"

  /** Sequential merge application as ONE codegen expression looping over a
    * runtime merge table — not a fold of per-merge `replace` Columns. The
    * fold builds an expression tree as deep as the vocabulary, which
    * overflows the driver stack during Column->Expression conversion at
    * ~700 merges (measured: StackOverflowError at 765) and bloats
    * generated code linearly in vocab; the loop form is depth-1 at any
    * vocabulary size, keeps generated code constant-size (the merge table
    * rides as a reference object), and is the shape a production 50K-merge
    * tokenizer needs. Semantics are identical to the fold: each step is
    * UTF8String.replace — left-to-right, non-overlapping, all occurrences
    * — applied in rank order, the exact contract the DuckDB oracle
    * replays step by step. */
  case class BpeApply(child: Expression, pairs: Array[UTF8String],
      repls: Array[UTF8String]) extends UnaryExpression with ExpectsInputTypes {
    require(pairs.length == repls.length, "pairs/repls length mismatch")
    override def prettyName: String = "bpe_apply"
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType

    override def nullSafeEval(v: Any): Any = {
      var s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < pairs.length) { s = s.replace(pairs(i), repls(i)); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val ps = ctx.addReferenceObj("bpePairs", pairs,
          "org.apache.spark.unsafe.types.UTF8String[]")
        val rs = ctx.addReferenceObj("bpeRepls", repls,
          "org.apache.spark.unsafe.types.UTF8String[]")
        val i = ctx.freshName("i")
        val cur = ctx.freshName("cur")
        s"""
           |org.apache.spark.unsafe.types.UTF8String $cur = $s;
           |for (int $i = 0; $i < ${pairs.length}; $i++) {
           |  $cur = $cur.replace($ps[$i], $rs[$i]);
           |}
           |${ev.value} = $cur;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): BpeApply =
      copy(child = newChild)
  }

  /** Adjacent symbol pairs of `c` by position: ["ab","bc",...] for "abc";
    * empty below 2 chars (guarded: Spark's sequence(1, 0) would DESCEND). */
  private def charPairs(c: Column): Column =
    when(length(c) >= 2,
      transform(sequence(lit(1), length(c) - 1), i => substr(c, i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** Apply merges scan-side in rank order — one codegen [[BpeApply]] loop
    * over the merge table (see its scaladoc for why not a replace fold). */
  def applyMerges(c: Column, merges: Seq[Merge]): Column =
    if (merges.isEmpty) c
    else {
      val sorted = merges.sortBy(_.rank)
      ColumnBridge.column(BpeApply(ColumnBridge.expression(c),
        sorted.map(m => UTF8String.fromString(m.pair)).toArray,
        sorted.map(m => UTF8String.fromString(m.repl)).toArray))
    }

  /** Train `rounds` rounds of `mergesPerRound` batched merges from the
    * corpus. Each round: one pair-count aggregation over the
    * so-far-rewritten text (an expression chain — the corpus is scanned,
    * never materialized), one bounded driver collect of K pairs.
    *
    * `firstBlock` offsets the placeholder block numbering — the
    * incremental-vocab hook: training that CONTINUES a tokenizer whose
    * first N blocks are already assigned starts at block N, and it is
    * also how the `bpe_paged` oracle row exercises the supplementary-
    * plane pages cross-engine without training hundreds of rounds. */
  def train(docs: DataFrame, textCol: String = "text",
      mergesPerRound: Int = 16, rounds: Int = 2,
      firstBlock: Int = 0): Seq[Merge] = {
    require(mergesPerRound >= 1 && mergesPerRound <= 255,
      s"mergesPerRound must be in [1, 255], got $mergesPerRound")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(firstBlock >= 0 && firstBlock + rounds <= MaxBlocks,
      s"placeholder blocks [$firstBlock, ${firstBlock + rounds}) exceed " +
        s"the $MaxBlocks private-use blocks (~${MaxBlocks * 255} merges)")
    var merges = Vector.empty[Merge]
    for (r <- 0 until rounds) {
      val current = applyMerges(coalesce(col(textCol), lit("")), merges)
      // bind the rewritten string ONCE per row before pair extraction:
      // charPairs' transform lambda references its input per ELEMENT, so
      // an unbound `current` would re-run the whole replace chain per
      // extracted pair — O(len x merges) per row, measured ~20 s/round-3
      // at 64 merges vs ~0.2 s bound
      val top = docs.select(
          explode(ColumnOps.bindOnce(current)(charPairs)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(mergesPerRound)
        .select("pair").collect().map(_.getString(0))
      merges = merges ++ top.zipWithIndex.map { case (p, i) =>
        // rank is 1-based within the round; blocks are 256 slots apart so
        // rounds never collide (K <= 255), paged across the PUA ranges
        Merge(p, placeholder((firstBlock + r) * 256 + i + 1),
          merges.size + i + 1)
      }
    }
    merges
  }

  /** Tokenized length of `c` under the trained merges: each placeholder
    * char is one token, every untouched char is one token. */
  def tokenCount(c: Column, merges: Seq[Merge]): Column =
    length(applyMerges(coalesce(c, lit("")), merges))
}
