package graft.tools

import graft.core.Tables
import graft.store.VectorStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the scale serving store: times each tier of the
  * store_*_scale serving composition separately to localize overhead. */
object DebugScale {
  private val verbose = new java.util.concurrent.atomic.AtomicBoolean(false)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("GRAFT_CP", "true"))
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job-level profiler: print every job's wall time + callsite
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val tRef = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(40)}(${si.numTasks})").mkString(" | ")
        jobStart.put(js.jobId, (System.nanoTime(), desc))
        if (verbose.get()) println(f"[jobS] ${js.jobId}%4d start ${(System.nanoTime() - tRef.get()) / 1e9}%6.2fs $desc")
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, site) = jobStart.getOrDefault(je.jobId, (0L, "?"))
        if (verbose.get())
          println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $site")
      }
    })
    spark.range(1000000L).agg(sum("id")).collect()
    // watchdog: sample the main thread stack every 400ms while verbose
    val mainThread = Thread.currentThread()
    val wd = new Thread(() => {
      while (true) {
        Thread.sleep(400)
        if (verbose.get()) {
          val st = mainThread.getStackTrace.take(14)
          println("[stack] " + st.drop(2).take(8).map(f =>
            f.getClassName.split("\\.").last + "." + f.getMethodName + ":" + f.getLineNumber).mkString(" <- "))
        }
      }
    })
    wd.setDaemon(true); wd.start()

    val base = graft.queries.StoreQueries.ensureScaleServingStore(spark, dir)
    val store = s"$base/store"
    val cfg = VectorStore.Config(recentThresholdSeconds = 3600, nClusters = 32, nProbe = 4)
    val st = new VectorStore(spark, store, cfg)
    val e = Tables.load(spark, dir, "embeddings")
    def qs(off: Int) = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"),
          x => (x.cast("double") + lit(off).cast("double") * 0.001).cast("float"))
          .as("q_embedding"))

    def time(name: String)(f: => Long): Unit = {
      f // warm
      verbose.set(true)
      println(s"[debug] --- $name ---")
      val t0 = System.nanoTime(); tRef.set(t0); val n = f
      verbose.set(false)
      println(f"[debug] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    time("hnsw.searchSaved(recent blobs)") {
      graft.operators.Hnsw.searchSaved(spark, s"$store/recent_index/blobs",
        qs(1), 10, 120).count()
    }
    time("searchBatch(useRecentIndex)") {
      st.searchBatch(qs(1), 10, "l2", nProbe = 4, useRecentIndex = true,
        recentEfSearch = 120).count()
    }
    time("searchBatch(exact recent)") {
      st.searchBatch(qs(1), 10, "l2", nProbe = 4).count()
    }
    val codes = spark.read.parquet(s"$store/sq_codes")
    val hist = spark.read.parquet(s"$store/historical")
    time("sq.searchBatchIvfSq(codes only)") {
      graft.operators.Sq.searchBatchIvfSq(
        codes.select(col("id"), col("cluster_id"), col("codes"), col("vmin"), col("vmax")),
        spark.read.parquet(s"$store/centroids"), qs(0), 10, 4, 200,
        rerank = Some(hist.select(col("id"), col("embedding")))).count()
    }
    time("searchBatchSq(exact recent)") {
      st.searchBatchSq(qs(0), 10, nProbe = 4, shortlist = 200).count()
    }
    time("searchBatchSq(useRecentIndex)") {
      st.searchBatchSq(qs(0), 10, nProbe = 4, shortlist = 200,
        useRecentIndex = true).count()
    }
    spark.stop()
  }
}
