package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that keep these plans viable at
  * 100 TB — predicate pushdown into the parquet scan, column pruning,
  * broadcast of the small join side, and partial (map-side) aggregation.
  */
class PlanAuditSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("filters are pushed into the parquet scan") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val plan = executedPlan(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)"), plan)
  }

  test("column pruning reaches the scan (ReadSchema only projects used columns)") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = executedPlan(df)
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string>"), plan)
  }

  test("dim-table join is broadcast, not shuffled") {
    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    val plan = executedPlan(
      orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment").count())
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("grouped top-k aggregator does partial (map-side) aggregation") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val df = graft.operators.Knn.batch(corpus, queries, k = 5)
    val plan = executedPlan(df)
    // two-phase hash aggregate around the shuffle => partial aggregation ran
    assert("(?s).*HashAggregate.*Exchange hashpartitioning\\(query_id.*HashAggregate.*".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("histogram fold plans: map-side partials, value-column-only scan, no sort") {
    // the streaming histogram's per-batch aggregation: bin assignment is
    // a scan-side project (IEEE-exact arithmetic, codegen), the count is
    // a two-phase hash aggregate over <= nBins+2 keys — each task ships
    // its tiny partial bin vector, never its rows — and nothing sorts
    val ev = Tables.load(spark, sfDir, "events")
    val spec = graft.operators.HistogramSketch.HistogramSpec(0.0, 1000.0, 2000)
    val flat = executedPlan(
      graft.operators.HistogramSketch.counts(ev, "value", spec))
    assert("(?s).*HashAggregate.*Exchange hashpartitioning\\(bin.*HashAggregate.*".r
      .findFirstIn(flat).isDefined, flat)
    assert(!flat.contains("Sort "), flat)
    // column pruning: the scan reads ONLY the value column
    assert("ReadSchema: struct<value:double>".r.findFirstIn(flat).isDefined, flat)
    // grouped: same two-phase shape on the (group, bin) compound key
    val grouped = executedPlan(
      ev.select(col("event_type").as("g"), spec.binExpr(col("value")).as("bin"))
        .groupBy("g", "bin").agg(count(lit(1)).as("cnt")))
    assert("(?s).*HashAggregate.*Exchange hashpartitioning\\(g.*bin.*HashAggregate.*".r
      .findFirstIn(grouped).isDefined, grouped)
  }

  test("moments fold plans: map-side partials, two-column scan, no sort") {
    // the moments folds' per-batch aggregation: seven counters per
    // group, all map-side combined — the exchange carries one partial
    // per group per task, never rows — and nothing sorts
    val docs = Tables.load(spark, sfDir, "documents")
    val flat = executedPlan(graft.operators.Profile.moments(docs, "n_chars"))
    // ungrouped two-phase: final agg above the exchange, partial_* below
    assert("(?s).*HashAggregate.*Exchange.*HashAggregate.*partial_min.*".r
      .findFirstIn(flat).isDefined, flat)
    assert(!flat.contains("Sort "), flat)
    // column pruning: the scan reads ONLY the value column
    assert(flat.contains("ReadSchema: struct<n_chars:bigint>"), flat)
    val grouped = executedPlan(graft.operators.Profile.momentsPerGroup(
      docs, "source", "n_chars"))
    assert("(?s).*HashAggregate.*Exchange hashpartitioning\\(source.*HashAggregate.*partial_min.*".r
      .findFirstIn(grouped).isDefined, grouped)
    assert(grouped.contains("ReadSchema: struct<source:string,n_chars:bigint>"),
      grouped)
  }

  test("distinct fold plans: sketch partials map-side, no raw values in the exchange") {
    // the cardinality fold's per-batch aggregation: a two-phase HLL
    // sketch aggregate — fixed-size sketch partials merge map-side, so
    // the exchange carries sketches per group per task, never values
    val docs = Tables.load(spark, sfDir, "documents")
    val grouped = executedPlan(
      docs.groupBy(col("source").as("g"))
        .agg(count(lit(1)).as("n_rows"), count(col("text")).as("n"),
          hll_sketch_agg(col("text"), lit(12)).as("sk")))
    assert("(?s).*Aggregate.*Exchange hashpartitioning\\(source.*Aggregate.*partial_hll_sketch_agg.*".r
      .findFirstIn(grouped).isDefined, grouped)
    assert(grouped.contains("ReadSchema: struct<text:string,source:string>") ||
      grouped.contains("ReadSchema: struct<source:string,text:string>"),
      grouped)
  }

  test("OPQ rotation is a scan-side codegen project; search is the PQ two-phase top-k") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = graft.queries.QueryShapes.stretchedCorpus(emb)
    val model = graft.operators.Opq.train(corpus, dim = 64, m = 8, k = 16,
      trainSize = 200, iters = 1)
    // encode (rotation dots + per-subspace argmin) is ONE map-only
    // projection: no exchange anywhere, and it stays in whole-stage
    // codegen — at 100 TB this is a pure scan
    val enc = corpus.select(col("id"),
      graft.operators.Opq.encode(model, col("embedding")).as("codes"))
    val encPlan = executedPlan(enc)
    assert(!encPlan.contains("Exchange"), encPlan)
    // the *(n) prefix is the executed plan's whole-stage-codegen marker
    assert("(?s).*\\*\\(\\d+\\) Project \\[id.*nearest_centroid.*".r
      .findFirstIn(encPlan).isDefined, encPlan)
    // the ADC search over the encoded corpus is plain PQ machinery: the
    // query relation broadcasts, the shortlist is the same two-phase
    // top_k as knn_scale (partials before the query_id exchange)
    val queries = corpus.filter(col("id") < 4)
      .select(col("id").as("query_id"), col("embedding").as("q_embedding"))
    val hits = graft.operators.Opq.searchBatch(enc, model, queries,
      k = 5, shortlist = 20)
    val searchPlan = executedPlan(hits)
    assert(searchPlan.contains("Broadcast"), searchPlan)
    assert("(?s).*Exchange hashpartitioning\\(query_id.*".r
      .findFirstIn(searchPlan).isDefined, searchPlan)
  }

  test("heavy-hitters pass 1 partial-aggregates the MG summary map-side") {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs.select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val df = toks.agg(
      graft.operators.HeavyHitters.mgCandidates(64)(col("token")).as("c"),
      count(col("token")).as("n"))
    val plan = executedPlan(df)
    // partial misra_gries below the exchange => each task ships one <= k
    // summary, never its token stream; the single exchange is the k-sized
    // partials meeting, not a token shuffle
    assert(("(?s).*ObjectHashAggregate.*partial_misra_gries.*Exchange" +
      ".*ObjectHashAggregate.*misra_gries.*").r.findFirstIn(plan).isDefined, plan)
  }

  test("streaming-HH recount filters to candidates BELOW the aggregate") {
    // the on-demand exact recount from a folded stream state filters the
    // exploded token stream by the <= k candidate set BEFORE any
    // aggregation. The predicate targets the explode's output, so it
    // cannot reach the parquet scan (the corpus is still read and
    // tokenized once — that one scan is the recount's honest cost); the
    // scale property this pins is that the AGGREGATE and the exchange
    // above it see candidate rows only, never the full token stream's
    // cardinality. (The fold's own per-batch plan is the pass-1 MG
    // shape already asserted above.)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_pa_shh_").toString
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_pa_shh_src_")
      .toString + "/files"
    Seq((1L, "alpha beta alpha gamma"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingHeavyHitters.ingest(spark, src, stateDir,
      java.nio.file.Files.createTempDirectory("graft_pa_shh_ck_").toString,
      denominator = 3L, sketchK = 8)
    q.processAllAvailable(); q.stop()
    val toks = spark.read.parquet(src).select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val df = graft.streaming.StreamingHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks, "token", 3L)
    val plan = executedPlan(df)
    // the candidate filter executes BELOW the aggregate (printed after it
    // in the top-down plan string): the aggregate's input is candidate
    // rows only — the scale property. The tokens come out of an explode,
    // so the static set shows as an INSET/IN Filter over the generator.
    assert(("(?s).*HashAggregate.*Filter.*token.*(INSET| IN \\()").r
      .findFirstIn(plan).isDefined, plan)
  }

  test("grouped streaming-HH recount broadcasts candidates; per-batch fold partial-aggregates") {
    // (1) the per-batch grouped MG shape: partial misra_gries per group
    // below the exchange — each task ships <= k-entry summaries per group
    // it saw, never its token stream (the grouped sibling of the flat
    // pass-1 assertion above)
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs.select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val perGroup = toks.groupBy("source").agg(
      graft.operators.HeavyHitters.mgCandidates(64)(col("token")).as("c"),
      count(col("token")).as("n"))
    val plan1 = executedPlan(perGroup)
    assert(("(?s).*ObjectHashAggregate.*partial_misra_gries.*Exchange" +
      ".*ObjectHashAggregate.*misra_gries.*").r.findFirstIn(plan1).isDefined,
      plan1)
    // (2) the recount from a folded grouped state joins the token stream
    // to the <= groups x k candidate relation by BROADCAST (the relation
    // is already driver-local in the state), so the count's exchange sees
    // candidate keys only — never the full (group, token) cardinality
    val stateDir = java.nio.file.Files.createTempDirectory("graft_pa_gshh_").toString
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_pa_gshh_src_")
      .toString + "/files"
    Seq((1L, "a", "alpha beta alpha"), (2L, "b", "gamma gamma delta"))
      .toDF("doc_id", "source", "text").coalesce(1).write.parquet(src)
    val q = graft.streaming.StreamingGroupedHeavyHitters.ingest(spark, src,
      stateDir,
      java.nio.file.Files.createTempDirectory("graft_pa_gshh_ck_").toString,
      denominator = 3L, sketchK = 8)
    q.processAllAvailable(); q.stop()
    val toks2 = spark.read.parquet(src).select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val df = graft.streaming.StreamingGroupedHeavyHitters
      .heavyHittersFromState(spark, stateDir, toks2, "source", "token", 3L)
    val plan2 = executedPlan(df)
    assert("(?s).*HashAggregate.*BroadcastHashJoin.*".r
      .findFirstIn(plan2).isDefined, plan2)
  }

  test("store searchBatch carries string ids natively (no surrogate remap joins)") {
    import graft.store.VectorStore, VectorStore._
    import spark.implicits._
    val st = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_audit_").toString)
    st.insert((0 until 20).map(i => VectorRecord(s"s$i",
      Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat))))
    val queries = Seq((1L, Array.tabulate(8)(j => math.sin(3 * (j + 1)).toFloat)))
      .toDF("query_id", "q_embedding")
    val df = st.searchBatch(queries, k = 5, metric = "l2")
    assert(df.collect().head.getString(1) == "s3") // natural id, not a hash
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("xxhash64"), plan) // no surrogate remap
    assert(plan.contains("top_k_str"), plan) // string top-k aggregate in-plan
  }

  test("IVF/PQ training samples in one pass (no count scan before sampling)") {
    // lineitem/l_shipdate: no other suite caches this projection, so the
    // audit always sees the real file scan (a cached embeddings relation
    // would satisfy the query and hide the ReadSchema)
    val corpus = Tables.load(spark, sfDir, "lineitem")
    // the sampling subplan is TakeOrderedAndProject by rand over a pruned
    // single-column scan — per-partition top-n, merged once on the driver
    val sampled = corpus.select(col("l_shipdate"))
      .orderBy(rand(42L)).limit(100)
    val plan = executedPlan(sampled)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("ReadSchema: struct<l_shipdate:"), plan)
    assert(!plan.contains("count("), plan)
  }

  test("knn scan stays in whole-stage codegen through the distance kernel") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val df = emb.crossJoin(broadcast(q))
      .select(graft.functions.VectorExpressions.vecL2(col("embedding"), col("q_emb")).as("d"))
      .orderBy(col("d").asc).limit(5)
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"), plan) // heap top-k, not full sort
    assert("(?s).*\\*\\(\\d+\\) Project \\[vec_l2.*".r.findFirstIn(plan).isDefined, plan)
  }

  test("SQ code-table search prunes partitions and keeps the kernel in codegen") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sqplan_").toString
    val enc = (0 until 200).map { i =>
      (i.toLong, (i % 4).toLong,
        Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat))
    }.toDF("id", "cluster_id", "embedding")
      .select(col("id"), col("cluster_id"),
        graft.operators.Sq.encode(col("embedding")).as("sq"))
      .select(col("id"), col("cluster_id"), col("sq.codes").as("codes"),
        col("sq.vmin").as("vmin"), col("sq.vmax").as("vmax"))
    enc.write.partitionBy("cluster_id").parquet(s"$tmp/codes")
    val cents = (0 until 4).map(c =>
      (c.toLong, Array.tabulate(8)(j => math.sin(c * 37 * (j + 1)).toFloat)))
      .toDF("cluster_id", "centroid")
    val queries = Seq((7L, Array.tabulate(8)(j => math.sin(7 * (j + 1)).toFloat)))
      .toDF("query_id", "q_embedding")
    val df = graft.operators.Sq.searchBatchIvfSq(
      spark.read.parquet(s"$tmp/codes"), cents, queries,
      k = 5, nProbe = 1, shortlist = 50)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // static cluster_id IN (...) reaches the scan as a partition filter:
    // only probed cluster directories are read (nProbe=1 of 4)
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"), plan)
    // the dequantize-L2 kernel runs inside whole-stage codegen
    assert("(?s).*\\*\\(\\d+\\)[^\\n]*sq_l2.*".r.findFirstIn(plan).isDefined, plan)
    // the cosine variant keeps both plan properties — same scan shape,
    // different fused kernel
    val dfCos = graft.operators.Sq.searchBatchIvfSq(
      spark.read.parquet(s"$tmp/codes"), cents, queries,
      k = 5, nProbe = 1, shortlist = 50, metric = "cosine")
    dfCos.collect()
    val planCos = dfCos.queryExecution.executedPlan.toString
    assert(planCos.contains("PartitionFilters") && planCos.contains("cluster_id"), planCos)
    assert("(?s).*\\*\\(\\d+\\)[^\\n]*sq_cosine.*".r.findFirstIn(planCos).isDefined, planCos)
  }

  test("BQ code-table search prunes partitions and reads only the words column") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bqplan_").toString
    val enc = (0 until 200).map { i =>
      (i.toLong, (i % 4).toLong,
        Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat))
    }.toDF("id", "cluster_id", "embedding")
      .select(col("id"), col("cluster_id"),
        graft.operators.Bq.encode(col("embedding"), 8).as("words"))
    enc.write.partitionBy("cluster_id").parquet(s"$tmp/codes")
    val cents = (0 until 4).map(c =>
      (c.toLong, Array.tabulate(8)(j => math.sin(c * 37 * (j + 1)).toFloat)))
      .toDF("cluster_id", "centroid")
    val queries = Seq((7L, Array.tabulate(8)(j => math.sin(7 * (j + 1)).toFloat)))
      .toDF("query_id", "q_embedding")
    val df = graft.operators.Bq.searchBatchIvfBq(
      spark.read.parquet(s"$tmp/codes"), cents, queries,
      dim = 8, k = 5, nProbe = 1, shortlist = 50)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // static cluster_id IN (...) reaches the scan as a partition filter
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"), plan)
    // the 32x-compression claim is real only if the scan reads the packed
    // words and nothing else — the whole point of the code tier
    assert(plan.contains("ReadSchema: struct<id:bigint,words:array<bigint>>"), plan)
    // and the xor+popcount kernel must run inside whole-stage codegen —
    // an interpreted higher-order lambda would cost more than the work
    assert("(?s).*\\*\\(\\d+\\)[^\\n]*bq_hamming.*".r.findFirstIn(plan).isDefined, plan)
  }

  test("store searchBatch plans without running a Spark job") {
    // tier presence / sidecar elision decisions are FS-metadata checks:
    // CONSTRUCTING the search plan (no historical tier here, so no probe
    // collect either) must launch zero jobs
    import graft.store.VectorStore, VectorStore._
    import spark.implicits._
    val st = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("graft_nojob_").toString)
    st.insert((0 until 10).map(i => VectorRecord(s"n$i",
      Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat))))
    st.delete(Seq("n9")) // tombstones present => the elision check itself runs
    val queries = Seq((1L, Array.tabulate(8)(j => math.sin(3 * (j + 1)).toFloat)))
      .toDF("query_id", "q_embedding")
    // defense vs suite-ordering flakes: a streaming query leaked by an
    // earlier suite would land ITS micro-batch jobs inside the counting
    // window below — quiesce the shared session first
    spark.streams.active.foreach(_.stop())
    @volatile var jobs = 0
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
        names.add(js.stageInfos.map(_.name).mkString("|"))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = st.searchBatch(queries, k = 3, metric = "l2")
      // the listener bus is async but ordered: run one sentinel job and
      // wait for ITS event specifically (by stage name) — waiting for just
      // any event could exit on a job searchBatch itself launched, before
      // the sentinel's event arrives, and falsely pass. Anything searchBatch
      // launched is ordered before the sentinel, so once the sentinel is
      // visible the count is complete. RDD count = exactly one job (an SQL
      // count under AQE runs two).
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 10e9.toLong
      def sentinelSeen = names.toArray(Array.empty[String])
        .exists(_.contains("PlanAuditSpec"))
      while (!sentinelSeen && System.nanoTime() < deadline) Thread.sleep(50)
      assert(sentinelSeen, "sentinel job event never arrived")
      assert(jobs == 1,
        s"plan construction launched ${jobs - 1} extra job(s): " +
          String.join(" ;; ", names))
      assert(df.collect().nonEmpty) // and the plan itself is sound
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("prep funnel's fingerprint window never shuffles the document text") {
    val docs = Tables.load(spark, sfDir, "documents")
    val df = graft.operators.Dedup.prepPipeline(docs, minQuality = 0.3,
      lang = "en", shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3)
    // the flagged corpus is persisted, so the window lives inside the
    // InMemoryRelation's cached physical plan — behind an
    // AdaptiveSparkPlanExec, which is a LEAF node (collect won't descend)
    val windows = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        (r.cachedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.inputPlan
          case p => p
        }).collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
    }.flatten
    assert(windows.nonEmpty, "expected the exact-dedup window in the plan")
    windows.foreach { w =>
      assert(!w.child.output.exists(_.name == "text"),
        s"text column crosses the window shuffle: ${w.child.output.map(_.name)}")
    }
  }

  test("capPerGroup selects via bounded heaps, never a window sort") {
    val docs = Tables.load(spark, sfDir, "documents")
    val df = graft.operators.Curation.capPerGroup(docs, "source", n = 5)
    val plan = executedPlan(df)
    // the skew-safety claim: per-group selection is the two-phase top_k
    // aggregate (map-side capped partials), not row_number over the group
    assert(plan.contains("partial_top_k"), plan)
    val windows = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "capPerGroup must not plan a window sort")
  }

  test("cluster balance finds keep-thresholds via bounded heaps, never a window sort") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = emb.groupBy(col("label").cast("int").as("cluster_id"))
      .agg(org.apache.spark.sql.functions.array(
        (0 until 64).map(i => avg(col("embedding").getItem(i)).cast("float")): _*)
        .as("centroid"))
    val assigned = emb.select(col("vec_id").as("id"), col("embedding"),
      col("label").cast("int").as("cluster_id"))
    val df = graft.operators.Ivf.balance(assigned, cents, maxSize = 40)
    val plan = executedPlan(df)
    // the skew-safety claim: the per-cluster keep-rank comes from the
    // two-phase top_k aggregate over (dist, id) + a broadcast threshold
    // join, not row_number over the cluster (which full-sorts the biggest
    // cluster — exactly the cluster balance exists to shrink — on one task)
    assert(plan.contains("partial_top_k"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    val windows = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "balance must not plan a window sort")
  }

  test("dupSpanStats hashes windows at the scan; no text in any exchange") {
    val docs = Tables.load(spark, sfDir, "documents")
    val df = graft.operators.Dedup.dupSpanStats(docs, n = 3)
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach { e =>
      assert(!e.child.output.exists(_.name == "text"),
        s"text crosses a shuffle: ${e.child.output.map(_.name)}")
    }
  }

  test("decontamination joins broadcast the eval side, never sort-merge") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = executedPlan(graft.operators.Curation.contaminationPairs(
      docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("eval_id"), col("text")),
      shingleN = 2, threshold = 0.2))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("embedding decontamination broadcasts eval; corpus never shuffles pre-agg") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val flagged = graft.operators.Curation.embeddingContamination(
      emb, emb.filter(col("vec_id") % 97 === 0), threshold = 0.9,
      idCol = "vec_id")
    flagged.collect()
    val plan = flagged.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastNestedLoopJoin"), plan.toString)
    // the only exchange is the tiny post-filter (id, cos) aggregate —
    // corpus embeddings never cross a shuffle
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.forall(!_.child.schema.fieldNames.contains("embedding")),
      plan.toString)
  }

  test("blocked kNN-graph joins on the block key, never a nested loop") {
    val df = SparkEntry.queries("knn_join_blocked")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    // the pair expansion rides an equi-join on blk (hash or sort-merge —
    // either shuffles on the low-cardinality block key, not N^2)
    assert(plan.contains("blk"), plan)
  }

  test("DSIR scoring is map-only: a scan-side fold, no join, no shuffle") {
    val docs = Tables.load(spark, sfDir, "documents")
    val df = graft.operators.Curation.dsirWeights(docs, col("lang") === "en")
    df.collect()
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, df.queryExecution.executedPlan)
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      df.queryExecution.executedPlan)
  }

  test("BPE application is one scan-side codegen loop, constant plan size") {
    val docs = Tables.load(spark, sfDir, "documents")
    // a full-cap merge table: the plan must stay ONE bpe_apply node inside
    // whole-stage codegen (not 765 nested replaces), so plan size — and
    // Janino compile time — is independent of the vocabulary
    val merges = (1 to 765).map { i =>
      graft.functions.BpeTokenizer.Merge(
        if (i == 1) "th" else (0xE000 + i - 1).toChar.toString + "x",
        (0xE000 + i).toChar.toString, i)
    }
    val df = docs.select(
      graft.functions.BpeTokenizer.tokenCount(col("text"), merges).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the *(N) prefix marks the whole-stage-codegen span the Project
    // (and thus the bpe_apply loop) lives in
    assert("(?s).*\\*\\(\\d+\\) Project \\[length\\(bpe_apply.*".r
      .findFirstIn(plan).isDefined, plan)
    assert("bpe_apply".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("replace("), plan)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, plan) // pure map: application never shuffles
  }

  test("savedStats reads ONLY the graph column and partial-aggregates") {
    // A8 over a persisted index must stay O(blob bytes): the scan reads
    // the binary column alone (never part_id/centroid), the peek runs in
    // a typed map, and the global row partial-aggregates before the one
    // SinglePartition exchange — no join, no second scan, no collect.
    val path = graft.queries.AnnQueries.ensureGraphStatsIndex(spark, sfDir)
    val plan = executedPlan(graft.operators.Hnsw.savedStats(spark, path))
    assert(plan.contains("ReadSchema: struct<graph:binary>"), plan)
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("Join"), plan)
    // exactly one FileScan in the FINAL plan (the AQE dump repeats the
    // tree under "== Initial Plan =="): the stats never rescan the index
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("FileScan".r.findAllIn(finalPlan).length == 1, finalPlan)
  }

  test("integrity per-id pass: ONE id exchange carries map-side-combined counters") {
    // the r17 one-pass checkIntegrity rewrite (plans/r18/integrity_perid.txt):
    // every tier scan unions into one partial HashAggregate, ONE
    // Exchange(hashpartitioning(id)) moves the combined counters, and no
    // join appears anywhere — a regression back to per-tier full_outer
    // joins or per-tier scans would add exchanges/joins here
    val path = java.nio.file.Files
      .createTempDirectory("graft_planaudit_integ_").toString
    try {
      val store = new graft.store.VectorStore(spark, path,
        graft.store.VectorStore.Config(
          recentThresholdSeconds = 7L * 24 * 3600, nClusters = 4, nProbe = 2))
      val emb = Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") < 200)
      store.insertDF(emb.select(
        concat(lit("v"), col("vec_id")).as("id"), col("embedding"),
        when(col("vec_id") % 2 === 0, lit("2020-01-01 00:00:00"))
          .otherwise(lit("2026-01-01 23:00:00")).cast("timestamp").as("ts")))
      store.migrate(Some(java.sql.Timestamp.valueOf("2026-01-02 00:00:00")))
      store.enableSq()
      val plan = store.integrityPerIdPlan().queryExecution.executedPlan.toString
      val idExchanges = "Exchange hashpartitioning\\(id".r.findAllIn(plan).length
      assert(idExchanges == 1, plan)
      assert(!plan.contains("Join"), plan)
      assert(plan.contains("Union"), plan)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path))
  }

  test("LSH candidates generate from ONE banded pass, not a band self-join") {
    // the r18 bucket-group rewrite (plans/r18/minhash_lsh_pairs_*.txt):
    // the banded relation is exploded ONCE into a groupBy — the former
    // self-join exploded it twice (once per join side) and shuffled both
    // sides at scale. Exactly one posexplode Generate pins the shape.
    val docs = Tables.load(spark, sfDir, "documents")
    val df = graft.operators.Dedup.minhashLshPairs(docs,
      shingleN = 2, bands = 4, rowsPerBand = 2, threshold = 0.3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("posexplode".r.findAllIn(finalPlan).length == 1, finalPlan)
    assert(!finalPlan.contains("SortMergeJoin"), finalPlan)
  }

  test("text prep queries (html/quality/url) are pure map until the final sort") {
    for (name <- Seq("html_extract", "quality_rules", "url_canonical")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // one rangepartitioning exchange for the ORDER BY, nothing else
      assert(shuffles.size <= 1, s"$name: ${df.queryExecution.executedPlan}")
      assert(shuffles.forall(_.outputPartitioning.toString.contains("range")),
        s"$name: ${df.queryExecution.executedPlan}")
    }
  }
}
