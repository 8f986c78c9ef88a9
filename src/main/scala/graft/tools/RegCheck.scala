package graft.tools

/** One-shot registry audit: every query needs an oracle (or a recorded
  * rows-only exemption) and no oracle may be orphaned. */
object RegCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[regcheck] queries=${q.size} oracles=${o.size}")
    println(s"[regcheck] rows-only (no oracle): ${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"[regcheck] orphan oracles: ${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
