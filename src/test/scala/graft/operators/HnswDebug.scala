package graft.operators

import graft.operators.Hnsw.{Graph, HnswConfig}

object HnswDebug {
  def main(args: Array[String]): Unit = {
    val n = 3000; val dim = 64
    val rnd = new java.util.Random(7)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val cfg = HnswConfig(efConstruction = 100, efSearch = 80)
    // warm JIT
    locally { val g0 = new Graph("l2", cfg); (0 until 500).foreach(i => g0.insert(i.toLong, vecs(i))) }
    val g = new Graph("l2", cfg)
    val t0 = System.nanoTime()
    (0 until n).foreach(i => g.insert(i.toLong, vecs(i)))
    println(s"build: ${(System.nanoTime() - t0) / 1e9}s")
    val fg = g.freeze()
    var liveMiss = 0; var frozenMiss = 0
    (0 until 500).foreach { i =>
      val lv = g.search(vecs(i), k = 1, ef = 80)
      if (lv.isEmpty || lv.head._1 != i.toLong) liveMiss += 1
      val fr = fg.search(vecs(i), k = 1, ef = 80)
      if (fr.isEmpty || fr.head._1 != i.toLong) frozenMiss += 1
    }
    println(s"live miss: $liveMiss/500, frozen miss: $frozenMiss/500")
    val (nodes, edges, avgDeg, maxLvl) = fg.stats
    println(s"nodes=$nodes edges=$edges avgDeg0=$avgDeg maxLevel=$maxLvl")
  }
}
