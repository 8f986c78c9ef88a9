package graft.store

import graft.functions.{FilterJson, VectorFunctions}
import graft.operators.{Ivf, Knn, Opq, Pq, TopK}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The vector-store session API — full CRUD + hybrid tiering + persistence
  * (SURVEY.md §2.9 X11-X16, §2.10 C1-C7, §2.1 S3-S6), re-expressed as two
  * partitioned Parquet tables plus small sidecars:
  *
  * {{{
  * path/
  *   manifest.json       version gate + dim + config (S3/S4 manifest analog)
  *   recent/             parquet: young vectors (HNSW tier analog)
  *   historical/         parquet partitioned by cluster_id (IVF tier analog)
  *   centroids/          parquet: IVF centroid sidecar
  *   tombstones/         parquet: soft-deleted vids (deleted_vectors analog)
  *   meta_updates/       parquet: metadata overlay (updateMetadata C4)
  *   schema.json         optional metadata schema (F11)
  * }}}
  *
  * Mutations are appends (inserts, tombstones, metadata updates); `vacuum`
  * compacts them away (C6). The read view stitches tiers + overlays with
  * anti-joins — Delta-style semantics from plain Parquet, no driver-side
  * state. Contrast with the reference, which keeps the whole index in
  * memory behind RwLocks and rebuilds clusters on every load
  * (`hybrid/persistence.rs:497-693`).
  */
class VectorStore(val spark: SparkSession, val path: String,
    val config: VectorStore.Config = VectorStore.Config()) {
  import VectorStore._

  // S7 analog: zstd-compressed storage, 10K-row chunking via
  // maxRecordsPerFile (the reference's CBOR chunks + zstd,
  // `ivf/persistence.rs:101-117`, `chunk.rs:36-97`) — applied per store
  // write below, never by mutating the shared session conf (which would
  // silently change every other job's output format).
  private def storeWrite(df: DataFrame) =
    df.write.option("compression", "zstd")
      .option("maxRecordsPerFile", config.chunkSize.toString)

  // All sidecar/metadata IO goes through the Hadoop FileSystem of `path`,
  // so the store works identically on local disk, file://-qualified paths,
  // HDFS, and object stores (the reference's S5 adapter concern, S2).
  private val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dir(name: String) = s"$path/$name"

  // Single-writer ENFORCEMENT (not just FsSwap's documented contract):
  // every mutating entry point below runs under this lease; a second live
  // writer fails loudly with ConcurrentWriterException. Readers stay
  // lock-free.
  private val lease =
    new graft.core.WriterLease(fs, new Path(path), config.leaseTtlMs)

  // Finish any swap a previous process died inside (see recoverSwaps) —
  // but NOT while a live writer holds the lease: its swap is in flight,
  // not crashed, and the writer finishes it itself. (Recovery itself is
  // also convergent under racers — FsSwap never deletes a live dir — so
  // this check is about not duplicating work, not about safety.)
  if (!lease.heldByOther()) recoverSwaps()
  private def exists(name: String) = fs.exists(new Path(dir(name), "_SUCCESS"))

  private def readText(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  private def writeText(p: Path, text: String): Unit = {
    val out = fs.create(p, true)
    try out.write(text.getBytes(UTF_8)) finally out.close()
  }

  /** [[writeText]] for sidecars that LEASE-FREE readers (search deltas,
    * `checkIntegrity`, the REST admin scan) may read concurrently with a
    * rewrite: plain `fs.create(overwrite = true)` truncates the file
    * BEFORE writing, so a concurrent reader could observe an empty or
    * partial file and misreport healthy maintenance as corruption.
    * Write-aside + delete + rename shrinks the observable window to
    * BRIEFLY ABSENT, which every reader of these sidecars already
    * handles as the benign no-record state (part-list absent → delta
    * fallback; index meta absent → index treated as not built). A crash
    * in the window leaves the file absent with a `_wtmp` aside — the
    * same benign state plus debris the next rewrite overwrites. */
  private def writeTextAtomic(p: Path, text: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + "_wtmp")
    writeText(tmp, text)
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(
        s"rename $tmp -> $p failed; the sidecar rewrite did not land")
  }

  /** FS-metadata check (no Spark job): does this (flat) table dir contain
    * any non-empty parquet part? Lets the read path skip tombstone/overlay
    * joins entirely in the common no-mutation case. */
  private def hasRows(name: String): Boolean = {
    ensureTierReadable(name) // a mid-swap tombstone tier misread as empty
    // would silently resurrect every deleted row in the read view
    exists(name) && fs.listStatus(new Path(dir(name))).exists(st =>
      st.getPath.getName.endsWith(".parquet") && st.getLen > 0)
  }

  /** Recursive walk via listStatus, NOT listFiles: listFiles materializes
    * LocatedFileStatus, whose permission fields RawLocalFileSystem loads
    * by FORKING a shell per file — hundreds of part files would cost
    * seconds of driver time per search. listStatus keeps permissions lazy
    * (never read here), so the walk stays pure metadata on every FS. */
  private def walkStatuses(p: Path)(f: org.apache.hadoop.fs.FileStatus => Boolean): Boolean = {
    val stack = scala.collection.mutable.Stack(p)
    while (stack.nonEmpty) {
      for (st <- fs.listStatus(stack.pop())) {
        if (st.isDirectory) stack.push(st.getPath)
        else if (f(st)) return true
      }
    }
    false
  }

  /** [[hasRows]] for nested layouts (the cluster-partitioned historical
    * tier): walks the file tree via FS metadata only — still no Spark job,
    * short-circuits on the first non-empty part file. */
  private def hasRowsRecursive(name: String): Boolean = {
    ensureTierReadable(name)
    exists(name) && walkStatuses(new Path(dir(name)))(st =>
      st.getPath.getName.endsWith(".parquet") && st.getLen > 0)
  }

  /** All non-empty parquet parts under a table dir, as paths RELATIVE to
    * the store root (relative so a [[backup]]ed store's recorded lists
    * stay valid at the new location). FS metadata only — no Spark job.
    *
    * This is the store's delta primitive: parquet mutation here is append-
    * only (appends create new part files; existing parts are immutable;
    * rewrites go through tmp+swap and invalidate dependent artifacts), so
    * "rows added since artifact X was built" is EXACTLY "parts not in X's
    * recorded list" — an FS file-diff, never a row-level anti-join. At a
    * billion-row historical tier the anti-join shuffles the tier; the
    * file-diff reads nothing when nothing changed. */
  private def listDataParts(name: String): Seq[String] = {
    if (!exists(name)) return Nil
    val prefix = fs.makeQualified(new Path(path)).toUri.getPath.stripSuffix("/") + "/"
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    walkStatuses(new Path(dir(name))) { st =>
      val p = st.getPath.toUri.getPath
      if (p.endsWith(".parquet") && st.getLen > 0)
        out += p.stripPrefix(prefix)
      false // never short-circuit: collect every part
    }
    out.sorted.toSeq
  }

  /** Write a recorded part list as a JSON sidecar (artifact build/refresh
    * time) / read it back (search time — an FS read, never a Spark job). */
  private def writePartList(sidecar: String, parts: Seq[String]): Unit = {
    val node = mapper.createObjectNode()
    val arr = node.putArray("files")
    parts.foreach(arr.add)
    writeTextAtomic(new Path(path, sidecar), mapper.writeValueAsString(node))
  }

  private def readPartList(sidecar: String): Option[Seq[String]] = {
    val p = new Path(path, sidecar)
    if (!fs.exists(p)) None
    else {
      // unparseable counts as malformed here, same degrade policy: the
      // SERVING callers (refresh deltas, code-tier search) fall back to
      // the anti-join instead of crashing on a damaged sidecar — the
      // integrity scan is the surface that names it loudly
      val node =
        try mapper.readTree(readText(p))
        catch {
          case _: com.fasterxml.jackson.core.JacksonException => null
          case _: java.io.FileNotFoundException => null // deleted mid-read
        }
      recordedFiles(node) match {
        case RecordedList.Files(parts) => Some(parts)
        case _ => None
      }
    }
  }

  /** The recorded `files` part list classified out of a JSON node — the
    * ONE three-way classification shared by the sidecar readers, the
    * saved-index delta scan, and the integrity probe, so each consumer
    * maps the states to ITS policy from one shared decision instead of
    * re-deriving (and drifting on) the predicate:
    *
    *  - [[RecordedList.Absent]]: a well-formed object with NO `files`
    *    entry — a genuine pre-list-era artifact; coverage unknown, the
    *    caller must fall back, never assume empty coverage.
    *  - [[RecordedList.Malformed]]: unusable — non-object root, explicit
    *    `files: null`, or a non-array value (no writer ever produces
    *    these; they mean hand-editing or corruption). A naive parse
    *    would read them as an EMPTY list = "nothing covered" (whole tier
    *    stale / whole tier re-scanned as delta). The integrity scan
    *    fails LOUDLY on it; the search DELTA branch degrades to the
    *    anti-join fallback — though for the non-object-root shape search
    *    fails anyway at its own metric read, which this classification
    *    doesn't (and shouldn't) mask: a defaulted metric would serve
    *    wrong distances silently.
    *  - [[RecordedList.Files]]: the usable recorded list. */
  private def recordedFiles(node: com.fasterxml.jackson.databind.JsonNode)
      : RecordedList =
    if (node == null || !node.isObject)
      RecordedList.Malformed(
        s"root is ${if (node == null) "empty" else node.getNodeType}, " +
          "expected an object")
    // an explicit JSON null parses to a NullNode (never Java null after
    // has() passed), so the !isArray test below classifies it too; the
    // reason string still names it for the operator
    else if (!node.has("files")) RecordedList.Absent
    else if (!node.get("files").isArray)
      RecordedList.Malformed(
        s"`files` is ${node.get("files").getNodeType}, expected an array")
    else {
      val b = Seq.newBuilder[String]
      node.get("files").forEach(e => b += e.asText())
      RecordedList.Files(b.result())
    }

  /** The rows of `name` added after `recorded` was captured, as a DataFrame
    * over just the new part files — None (decided from FS metadata alone,
    * no Spark job, no scan) when nothing was appended. Partition columns
    * (cluster_id) are recovered from the directory layout via basePath.
    * A caller that will RECORD a listing afterwards must pass that exact
    * listing as `current` — re-listing here could see parts appended in
    * between, encoding rows the caller's record then doesn't cover (they'd
    * be re-encoded as duplicates on the next refresh). */
  private def newPartsDF(name: String, recorded: Seq[String],
      schema: StructType, current: Option[Seq[String]] = None): Option[DataFrame] = {
    val newParts = (current.getOrElse(listDataParts(name)).toSet -- recorded)
      .toSeq.sorted
    if (newParts.isEmpty) None
    else Some(spark.read.option("basePath", dir(name)).schema(schema)
      .parquet(newParts.map(p => s"$path/$p"): _*))
  }

  /** Blocking read of a single observed count metric. */
  private def obsLong(o: org.apache.spark.sql.Observation): Long =
    o.get("n") match {
      case l: Long => l
      case x: Number => x.longValue()
      case other => throw new IllegalStateException(s"unexpected metric: $other")
    }

  // ---- manifest (version-gated like persistence.rs:499-520) ----

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def writeManifest(m: Manifest): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", m.version); node.put("dim", m.dim)
    // the full behavior-relevant config, persisted like the reference's
    // HybridMetadata.config (hybrid/persistence.rs:58-67) so
    // [[VectorStore.open]] can restore the store AS CONFIGURED (its
    // load_index analog, `:696-740`) — without this, a reopen with the
    // default Config would silently serve a 1-hour-threshold store with
    // 7-day tier semantics
    node.put("recentThresholdSeconds", config.recentThresholdSeconds)
    node.put("nClusters", config.nClusters)
    node.put("nProbe", config.nProbe)
    node.put("chunkSize", config.chunkSize)
    node.put("maxReturnedIds", config.maxReturnedIds)
    node.put("leaseTtlMs", config.leaseTtlMs)
    fs.mkdirs(new Path(path))
    writeText(new Path(path, "manifest.json"), mapper.writeValueAsString(node))
  }

  def readManifest(): Option[Manifest] = {
    val p = new Path(path, "manifest.json")
    if (!fs.exists(p)) None
    else {
      val n = mapper.readTree(readText(p))
      val v = n.get("version").asInt()
      VectorStore.gateVersion(v)
      Some(Manifest(v, n.get("dim").asInt()))
    }
  }

  def dimension: Option[Int] = readManifest().map(_.dim).filter(_ > 0)

  // ---- metadata schema (F11) ----

  private var schemaOpt: Option[MetadataSchema.Schema] = {
    val p = new Path(path, "schema.json")
    if (fs.exists(p)) Some(MetadataSchema.parse(readText(p))) else None
  }

  def setSchema(schemaJson: String): Unit = lease.withLease {
    val s = MetadataSchema.parse(schemaJson)
    fs.mkdirs(new Path(path))
    writeText(new Path(path, "schema.json"), s.json)
    schemaOpt = Some(s)
  }

  // ---- init ----

  /** Init = manifest only. Table dirs materialize on first append — readOr/
    * hasRows treat a missing dir as empty, so a fresh store costs one
    * sidecar write, not four empty-parquet Spark jobs. */
  def initIfNeeded(dim: Int): Unit = lease.withLease {
    if (readManifest().isEmpty) writeManifest(Manifest(FormatVersion, dim))
  }

  // ---- reads ----

  /** A tier dir that looks MISSING while its swap marker is live is not
    * empty — it is mid-swap (the rename-aside window of a concurrent
    * commit, or a crashed writer's unfinished swap). Reading it as an
    * empty table would silently drop the whole tier from query results.
    * FsSwap.recover serializes on the swap lock, so this call BLOCKS
    * until a live writer's in-flight commit completes (then no-ops) or
    * finishes a crashed writer's swap itself — either way the re-check
    * sees the real tier. */
  private def ensureTierReadable(name: String): Unit =
    if (!exists(name)) // recover() fast-paths to 2 exists probes when the
      // tier is genuinely absent (no marker, no tmp) — cheap per read
      graft.core.FsSwap.recover(fs, new Path(dir(name)),
        new Path(dir(name) + "_tmp"), swapMarker(name))

  private def readOr(name: String, schema: StructType): DataFrame = {
    ensureTierReadable(name)
    if (exists(name)) spark.read.schema(schema).parquet(dir(name))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  def recent: DataFrame = readOr("recent", vectorSchema)
  def historical: DataFrame =
    readOr("historical", vectorSchema.add(StructField("cluster_id", IntegerType)))
  def tombstones: DataFrame = readOr("tombstones", tombSchema)
  def metaUpdates: DataFrame = readOr("meta_updates", metaUpdateSchema)
  def centroids: DataFrame =
    if (exists("centroids"))
      spark.read.schema(centroidSchema).parquet(dir("centroids"))
    else spark.emptyDataFrame

  /** Tombstones only kill rows inserted before the delete, so
    * delete-then-reinsert resurrects the id (reference removes the id from
    * its timestamp map on delete, allowing re-insert). */
  private def dropTombstoned(df: DataFrame): DataFrame =
    if (!hasRows("tombstones")) df
    else {
      val t = tombstones.select(col("vid").as("t_vid"), col("deleted_at"))
      df.join(t, df("vid") === t("t_vid") && df("ts") <= t("deleted_at"), "left_anti")
    }

  /** Latest live overlay per vid. An update belongs to the row GENERATION
    * that was live when it was made, so updates at-or-before a tombstone's
    * deleted_at die with that generation (same guard as [[dropTombstoned]]):
    * without it, update(a) -> delete(a) -> reinsert(a) resurrects the stale
    * overlay onto the new row — and vacuum would bake it in permanently. */
  private def latestMetaOverlay: DataFrame = {
    val mu = metaUpdates
    val live =
      if (!hasRows("tombstones")) mu
      else {
        val t = tombstones.select(col("vid").as("t_vid"), col("deleted_at"))
        mu.join(t, mu("vid") === t("t_vid") && mu("updated_at") <= t("deleted_at"),
          "left_anti")
      }
    live.groupBy("vid").agg(max_by(col("metadata"), col("updated_at")).as("meta_new"))
  }

  private def applyMetaOverlay(df: DataFrame): DataFrame =
    if (!hasRows("meta_updates")) df
    else df.join(latestMetaOverlay, Seq("vid"), "left")
      .withColumn("metadata", coalesce(col("meta_new"), col("metadata")))
      .drop("meta_new")

  /** The live view: both tiers, tombstones anti-joined away, metadata
    * overlay applied (latest update wins). Sidecar joins are elided via FS
    * metadata when there are no mutations to apply. */
  def vectors: DataFrame = {
    val base = recent.withColumn("tier", lit("recent"))
      .unionByName(historical.drop("cluster_id").withColumn("tier", lit("historical")))
    applyMetaOverlay(dropTombstoned(base))
  }

  // ---- C1 insert (dup anti-join, dim check, schema validation) ----

  /** Insert a batch; duplicate ids (against live data or within the batch)
    * are rejected and reported, mirroring the reference's per-id dup error
    * (`hybrid/core.rs:317-321`). Returns (inserted, duplicates). */
  def insert(batch: Seq[VectorRecord]): InsertResult = lease.withLease {
    require(batch.nonEmpty, "empty batch")
    // diagnostic rejection with the offending id, not a bare NPE from the
    // .length below — insertDF's per-row "null embedding" check, Seq form
    batch.find(_.embedding == null).foreach(r =>
      throw new IllegalArgumentException(s"id=${r.id}: null embedding"))
    // a null id hashes to vid=NULL, which no join (dedup anti-join,
    // tombstone, delete target) can ever match again — the row would be
    // live forever and undeletable, violating the non-null schema
    require(!batch.exists(_.id == null), "null id in batch")
    val dims = batch.map(_.embedding.length).distinct
    require(dims.size == 1, s"mixed dimensions in batch: $dims")
    val dim = dims.head
    dimension match {
      case Some(d) => require(d == dim, s"dimension mismatch: store=$d batch=$dim")
      case None => initIfNeeded(dim)
    }
    // metadata must parse as JSON even without a schema: every filtered
    // read path runs parse_json over the column, so one unparseable row
    // would poison all later searches/deletes instead of failing here
    batch.foreach { r =>
      r.metadata.foreach { m =>
        try mapper.readTree(m)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"id=${r.id}: metadata is not valid JSON: ${e.getMessage}")
        }
      }
    }
    schemaOpt.foreach { sch =>
      batch.foreach { r =>
        sch.validate(r.metadata).foreach(err =>
          throw new MetadataSchema.SchemaViolation(s"id=${r.id}: $err"))
      }
    }
    import spark.implicits._
    val deduped = batch.groupBy(_.id).map(_._2.head).toSeq
    val df = deduped.toDF()
      .withColumn("vid", vidExpr(col("id")))
      // an unparseable tsString must FAIL, not silently become now(): the
      // caller intended a backdated row, and a fabricated timestamp skews
      // migrate cutoffs / ageStats / tombstone generations undetectably —
      // the same loudness contract as the metadata and dimension checks
      .withColumn("ts",
        when(col("tsString").isNull, current_timestamp())
          .when(to_timestamp(col("tsString")).isNotNull, to_timestamp(col("tsString")))
          .otherwise(raise_error(concat(lit("id="), col("id"),
            lit(": unparseable tsString: "), col("tsString"))).cast("timestamp")))
      .select("id", "vid", "embedding", "metadata", "ts")
    val existing = vectors.select("vid")
    val fresh = df.join(existing, Seq("vid"), "left_anti").cache()
    // FULL id echo: the record API's batch is a caller-held Seq, so the
    // collected id list is bounded by memory the caller already committed
    // — no cap needed (insertDF is the unbounded front door and returns
    // none). The completeness is load-bearing for the REST update feed:
    // every inserted id must produce a change event, and a silently capped
    // echo would lose feed events WITHOUT a seq gap for consumers to
    // detect. The count stays exact via a metric observed ON the append
    // pass itself — no separate count job.
    val freshIds = fresh.select("id").as[String].collect().toSeq
    val obs = org.apache.spark.sql.Observation()
    storeWrite(fresh.observe(obs, count(lit(1)).as("n")))
      .mode(SaveMode.Append).parquet(dir("recent"))
    fresh.unpersist()
    val inserted = obsLong(obs)
    InsertResult(inserted = inserted, duplicates = batch.size - inserted,
      insertedIds = freshIds)
  }

  /** C1 at DataFrame scale — the "ingest this 10 TB DataFrame" front door
    * the Seq API can't be: same dup/dim/JSON/schema checks as [[insert]],
    * but every check and the dedup run distributed; nothing batch-sized
    * ever lands on the driver.
    *
    * Expected columns: `id STRING`, `embedding ARRAY<FLOAT>`; optional
    * `metadata STRING` (JSON) and `ts TIMESTAMP` (defaults now). Exactly
    * two passes over the input: one validation aggregate (row count +
    * first offender, all checks fused into one projection), then the
    * dedup anti-join + append. Within-batch duplicate ids keep one
    * arbitrary row (a DataFrame has no order to define "first").
    * `insertedIds` is left empty by design — collecting 10^9 ids to the
    * driver is the OOM this API exists to avoid. */
  def insertDF(df: DataFrame): InsertResult = lease.withLease {
    val cols = df.columns.toSet
    require(cols.contains("id") && cols.contains("embedding"),
      "insertDF requires id and embedding columns")
    val base = df
      .withColumn("metadata",
        if (cols.contains("metadata")) col("metadata") else lit(null).cast(StringType))
      .withColumn("ts",
        if (cols.contains("ts")) coalesce(col("ts"), current_timestamp())
        else current_timestamp())
    // infer the dimension for a fresh store from a non-null row but do NOT
    // persist it yet: writing the manifest before validation would let a
    // malformed sampled row poison the store's dimension forever
    val manifestDim = dimension
    val dim = manifestDim.getOrElse {
      val h = base.filter(col("embedding").isNotNull)
        .select(size(col("embedding"))).head(1)
      require(h.nonEmpty, "empty batch or all embeddings null")
      h(0).getInt(0)
    }
    // all per-row checks fused into one error expression: dim mismatch,
    // unparseable metadata (try_parse_json -> null = would poison every
    // later filtered read), schema violation (executor-side validator)
    val jsonErr = when(col("metadata").isNotNull &&
        try_parse_json(col("metadata")).isNull, lit("metadata is not valid JSON"))
    // null id first: it hashes to vid=NULL, which no join (dedup
    // anti-join, tombstone, delete target) can ever match — the row would
    // be permanently live and undeletable
    val err = schemaOpt match {
      case None =>
        when(col("id").isNull, lit("null id"))
          .when(col("embedding").isNull, lit("null embedding"))
          .when(size(col("embedding")) =!= dim,
            concat(lit("dimension mismatch: store="), lit(dim),
              lit(" row="), size(col("embedding"))))
          .otherwise(jsonErr)
      case Some(sch) =>
        val vErr = VectorStore.schemaErrUdf(sch.json)(col("metadata"))
        when(col("id").isNull, lit("null id"))
          .when(col("embedding").isNull, lit("null embedding"))
          .when(size(col("embedding")) =!= dim,
            concat(lit("dimension mismatch: store="), lit(dim),
              lit(" row="), size(col("embedding"))))
          .otherwise(coalesce(jsonErr, vErr))
    }
    val audit = base.select(col("id"), err.as("err"))
      .agg(count(lit(1)).as("total"),
        count(col("err")).as("bad"),
        first(col("err"), ignoreNulls = true).as("sample_err"),
        first(when(col("err").isNotNull, col("id")), ignoreNulls = true).as("sample_id"))
      .head()
    val total = audit.getLong(0)
    require(total > 0, "empty batch")
    if (audit.getLong(1) > 0)
      throw new IllegalArgumentException(
        s"id=${audit.getString(3)}: ${audit.getString(2)} " +
          s"(${audit.getLong(1)} of $total rows rejected)")
    if (manifestDim.isEmpty) initIfNeeded(dim) // batch validated — safe now
    val prepared = base
      .withColumn("vid", vidExpr(col("id")))
      .select("id", "vid", "embedding", "metadata", "ts")
      .dropDuplicates("vid")
    val fresh = prepared.join(vectors.select("vid"), Seq("vid"), "left_anti")
    // the inserted count is a metric observed on the append pass — the
    // batch streams through exactly once (no persist, no pre-count); at
    // 10 TB that's one less full materialization of the input
    val obs = org.apache.spark.sql.Observation()
    storeWrite(fresh.observe(obs, count(lit(1)).as("n")))
      .mode(SaveMode.Append).parquet(dir("recent"))
    val inserted = obsLong(obs)
    InsertResult(inserted = inserted, duplicates = total - inserted)
  }

  // ---- C2/C3/C5 soft delete ----

  def delete(ids: Seq[String]): DeleteResult = lease.withLease {
    import spark.implicits._
    val target = ids.toDF("id").withColumn("vid", vidExpr(col("id")))
    val found = vectors.select("id", "vid")
      .join(broadcast(target.select("vid")), Seq("vid"), "left_semi")
    tombstone(found)
  }

  /** C3: delete everything matching a Mongo-style metadata filter; empty
    * filter deletes everything (session.rs:838-841). `deletedIds` is
    * capped at config.maxReturnedIds (count stays exact). */
  def deleteByMetadata(filterJson: String): DeleteResult = lease.withLease {
    val matched = vectors.filter(FilterJson.predicate(filterJson, col("metadata")))
      .select("id", "vid")
    tombstone(matched)
  }

  /** Shared tail of both deletes: capped id echo (one job on the cached
    * match set), then the tombstone append with the exact count observed
    * on the append pass itself — two jobs total, driver memory bounded by
    * maxReturnedIds however many rows the delete matches. */
  private def tombstone(matchedRaw: DataFrame): DeleteResult = {
    import spark.implicits._
    val matched = matchedRaw.cache()
    val ids = matched.select("id").orderBy("id")
      .limit(config.maxReturnedIds).as[String].collect()
    val obs = org.apache.spark.sql.Observation()
    storeWrite(matched.observe(obs, count(lit(1)).as("n"))
        .select(col("vid"), current_timestamp().as("deleted_at")))
      .mode(SaveMode.Append).parquet(dir("tombstones"))
    matched.unpersist()
    DeleteResult(obsLong(obs), ids)
  }

  // ---- C4 metadata update (full replace, schema-validated) ----

  def updateMetadata(id: String, metadataJson: String): Unit = lease.withLease {
    try mapper.readTree(metadataJson)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"id=$id: metadata is not valid JSON: ${e.getMessage}")
    }
    schemaOpt.foreach(_.validate(Some(metadataJson)).foreach(err =>
      throw new MetadataSchema.SchemaViolation(s"id=$id: $err")))
    import spark.implicits._
    val t = Seq(id).toDF("id").withColumn("vid", vidExpr(col("id")))
    val known = vectors.join(broadcast(t.select("vid")), Seq("vid"), "left_semi").count()
    if (known == 0) throw new NoSuchElementException(s"unknown id: $id")
    storeWrite(t.select(col("vid"), lit(metadataJson).as("metadata"),
        current_timestamp().as("updated_at")))
      .mode(SaveMode.Append).parquet(dir("meta_updates"))
  }

  // ---- search (X12 hybrid union is implicit: one view, two tiers) ----

  /** Single-query search (session.search shape, session.rs:203-336):
    * optional metadata filter (pre-filter, exact-k), score threshold (F9),
    * metadata in the result (J2), and `includeVectors` to return the
    * embedding payload (session.rs:266-281). */
  def search(query: Array[Float], k: Int, metric: String = "cosine",
      filterJson: Option[String] = None, scoreThreshold: Option[Double] = None,
      includeVectors: Boolean = false,
      searchRecent: Boolean = true, searchHistorical: Boolean = true): DataFrame = {
    require(searchRecent || searchHistorical,
      "at least one of searchRecent/searchHistorical must be true")
    // tier selection (the reference's search_recent/search_historical
    // options, rest.rs:105-113): the live view carries a tier column, so
    // restriction is one pushed-down filter
    val view =
      if (searchRecent && searchHistorical) vectors
      else vectors.filter(col("tier") ===
        (if (searchRecent) "recent" else "historical"))
    // metadata/embedding ride through the top-k (carryCols) instead of a
    // second full live-view scan + join: the live view costs a
    // tombstone-anti-join + overlay pass over both tiers, and paying it
    // twice doubled the dominant cost of every single-query search
    val hits = Knn.search(view, query, k, metric, idCol = "id",
      filterJson = filterJson, scoreThreshold = scoreThreshold,
      carryCols = Seq("metadata", "embedding"))
    val base = hits
      .withColumn("result_embedding", col("embedding"))
      .select(
        (Seq("id", "distance", "score", "metadata") ++
          (if (includeVectors) Seq("result_embedding") else Nil)).map(col): _*)
    base.orderBy(col("distance").asc, col("id").asc)
  }

  /** Single-query search dispatched through a chosen serving path — the
    * REST layer's bridge to the serving artifacts. Modes: "exact" (the
    * [[search]] scan), "recent_index" (saved-HNSW recent tier),
    * "pq" / "opq" / "sq" / "bq" (historical tier from its code table; l2 or cosine;
    * filters post-filter a k*`oversample` pool on the quantized part —
    * x3 default per the reference, sized via `Tuning.suggestOversample`
    * when the caller knows the filter's selectivity). Results carry the
    * same (id, distance, score, metadata) shape as [[search]], plus
    * `result_embedding` when `includeVectors` (session.rs:266-281) —
    * uniform across every mode, so the REST layer serves the vector
    * payload off the code tiers too. */
  def searchMode(query: Array[Float], k: Int, mode: String = "exact",
      metric: String = "cosine", filterJson: Option[String] = None,
      scoreThreshold: Option[Double] = None, oversample: Int = 3,
      probeBlobs: Int = 0, includeVectors: Boolean = false,
      searchRecent: Boolean = true, searchHistorical: Boolean = true,
      nProbe: Int = config.nProbe, efSearch: Int = 100): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    if (mode == "exact")
      return search(query, k, metric, filterJson, scoreThreshold, includeVectors,
        searchRecent, searchHistorical)
    import spark.implicits._
    val q = Seq((0L, query)).toDF("query_id", "q_embedding")
    val hits = mode match {
      case "recent_index" =>
        searchBatch(q, k, metric, nProbe = nProbe, useRecentIndex = true,
          filterJson = filterJson, recentEfSearch = efSearch,
          recentProbeBlobs = probeBlobs,
          searchRecent = searchRecent, searchHistorical = searchHistorical)
      case "pq" | "opq" | "sq" | "bq" =>
        require(metric == "l2" || metric == "cosine",
          s"mode '$mode' is a code tier serving l2|cosine; got metric '$metric'")
        // tier selection maps to the hybrid paths (the reference's search
        // gates its recent/historical indexes); a code tier IS the
        // historical serving artifact, so partial-tier requests there are
        // a loud error rather than a silently different result
        require(searchRecent && searchHistorical,
          s"search_recent/search_historical apply to exact|recent_index; mode '$mode' serves both tiers")
        // serve the recent tier from its saved graph whenever one exists
        // for this metric — the indexed path is strictly cheaper
        val recIdx = hasRecentIndex && recentIndexMetric == metric
        if (mode == "pq") searchBatchPq(q, k, nProbe = nProbe, metric = metric,
          filterJson = filterJson, oversample = oversample,
          useRecentIndex = recIdx, recentEfSearch = efSearch,
          recentProbeBlobs = probeBlobs)
        else if (mode == "opq") searchBatchOpq(q, k, nProbe = nProbe, metric = metric,
          filterJson = filterJson, oversample = oversample,
          useRecentIndex = recIdx, recentEfSearch = efSearch,
          recentProbeBlobs = probeBlobs)
        else if (mode == "sq") searchBatchSq(q, k, nProbe = nProbe, metric = metric,
          filterJson = filterJson, oversample = oversample,
          useRecentIndex = recIdx, recentEfSearch = efSearch,
          recentProbeBlobs = probeBlobs)
        else searchBatchBq(q, k, nProbe = nProbe, metric = metric,
          filterJson = filterJson, oversample = oversample,
          useRecentIndex = recIdx, recentEfSearch = efSearch,
          recentProbeBlobs = probeBlobs)
      case other => throw new IllegalArgumentException(
        s"unknown search mode '$other' (exact|recent_index|pq|opq|sq|bq)")
    }
    val enrichCols = Seq(col("id"), col("metadata")) ++
      (if (includeVectors) Seq(col("embedding").as("result_embedding")) else Nil)
    val scored = hits
      .join(vectors.select(enrichCols: _*), Seq("id"), "left")
      .select(Seq(col("id"), col("distance"),
        VectorFunctions.distanceToScore(col("distance")).as("score"),
        col("metadata")) ++
        (if (includeVectors) Seq(col("result_embedding")) else Nil): _*)
    scoreThreshold.fold(scored)(t => scored.filter(col("score") >= t))
      .orderBy(col("distance").asc, col("id").asc)
  }

  /** How many tiers a search with these flags ACTUALLY reads — the
    * reference's SearchResponse reports indices searched (rest.rs:638-669),
    * not indices requested: a requested historical tier that has never
    * received a migrated row is absent from the plan ([[searchBatch]]'s
    * histPart is None) and must not be counted. FS-metadata probes only,
    * the same checks the search path itself makes — no Spark job. */
  def tiersSearched(searchRecent: Boolean = true,
      searchHistorical: Boolean = true): Int =
    (if (searchRecent) 1 else 0) +
      // BOTH of searchBatch's preconditions (its histPart gate above):
      // a historical tier with rows but no centroid sidecar is also
      // skipped by the plan and must not count as searched
      (if (searchHistorical && exists("centroids") &&
        hasRowsRecursive("historical")) 1 else 0)

  // ---- X15 migration: recent -> historical ----

  /** Move rows older than the threshold into the cluster-partitioned
    * historical tier; (re)trains centroids when absent. Returns the number
    * migrated. Unlike the reference (which never removes migrated rows from
    * HNSW — the double-count bug at `hybrid/core.rs:579,632`), the rewrite
    * moves rows atomically-per-tier.
    *
    * `maxVectors` (X16 policy, `hybrid/maintenance.rs:40-44`): cap one
    * run at the N oldest eligible rows — a bounded maintenance slice
    * instead of a potentially store-sized rewrite; the remainder migrates
    * on later runs. */
  def migrate(nowOverride: Option[java.sql.Timestamp] = None,
      maxVectors: Int = Int.MaxValue): Long = lease.withLease {
    // resolve "now" ONCE on the driver: migration runs three Spark jobs
    // (count, historical append, recent rewrite), and a per-job
    // current_timestamp() would advance the cutoff between them — rows whose
    // ts lands between the two cutoffs would be neither migrated nor kept
    val now = lit(nowOverride.getOrElse(
      new java.sql.Timestamp(System.currentTimeMillis())))
    val cutoff = now - expr(s"INTERVAL ${config.recentThresholdSeconds} SECOND")
    val rec = recent
    val eligible = rec.filter(col("ts") <= cutoff)
    val nEligible = eligible.count()
    val capped = nEligible > maxVectors
    val old =
      if (!capped) eligible
      // oldest-first slice, ts then vid so the cut is deterministic.
      // PERSISTED: the slice is referenced up to three times (first-
      // migration k-means sample, the historical write's assign, the
      // recent rewrite's anti-join), and each reference would otherwise
      // re-run the global sort-limit (measured as two ~0.6 s single-task
      // jobs of the migrate_tiers bench row). Bounded by maxVectors rows
      // BY CONSTRUCTION, so the pin is broadcast-sized at any corpus
      // scale; the uncapped branch stays unpinned (a plain ts filter over
      // a possibly store-sized tier — scans are cheaper than caching it).
      else eligible.orderBy(col("ts").asc, col("vid").asc).limit(maxVectors)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nOld = math.min(nEligible, maxVectors.toLong)
    try {
    if (nOld > 0) {
      val cents =
        if (exists("centroids")) centroids
        else {
          val kClusters = math.min(config.nClusters, math.max(1, nOld.toInt / 2))
          // train in-driver on the bounded sample (<= IvfConfig.trainSize
          // rows): the sample fits on the driver BY CONSTRUCTION at any
          // corpus size, so the distributed k-means||'s ~15-25 tiny jobs
          // (init passes + per-iteration aggregates) are pure scheduling
          // overhead over a collect-and-loop — measured 2-4 s of the
          // integrity/migrate lifecycle rows at sf0.1, and the same
          // fixed cost on a 100 TB corpus (training is O(sample) either
          // way; only the sampling pass scans the tier)
          val trained = Ivf.train(old, Ivf.IvfConfig(nClusters = kClusters,
            initMode = "driver"))
          storeWrite(trained).mode(SaveMode.Overwrite).parquet(dir("centroids"))
          trained
        }
      val assigned = Ivf.assign(old, cents)
      // one task (= one file) per cluster dir, not one per shuffle
      // partition x cluster: probed reads open n_probe files, and the
      // tier's file count stays O(clusters), not O(appends x parallelism)
      storeWrite(assigned.repartition(col("cluster_id")))
        .mode(SaveMode.Append).partitionBy("cluster_id").parquet(dir("historical"))
      // rewrite the recent tier via tmp+swap (same as vacuum): never
      // overwrite a directory that the plan being written still reads.
      // Under a cap the survivors are "not in the migrated slice", which
      // only an anti-join expresses (a ts cutoff can't split a tie).
      // The join key is (vid, ts), not vid alone: delete-then-reinsert
      // legitimately leaves two recent rows with one vid (tombstoned old +
      // live new), and a vid-only anti-join would drop the live one.
      val keep =
        if (!capped) rec.filter(col("ts") > cutoff)
        else rec.join(old.select("vid", "ts"), Seq("vid", "ts"), "left_anti")
      storeWrite(keep.select(rec.columns.map(col).toSeq: _*))
        .mode(SaveMode.Overwrite).parquet(dir("recent") + "_tmp")
      swap("recent")
      // the recent tier was rewritten: a saved recent index would keep
      // serving (and double-count, against the historical copies) the
      // migrated rows — invalidate; rebuild is explicit
      fs.delete(new Path(dir("recent_index")), true)
    }
    nOld
    } finally if (capped) old.unpersist(blocking = false)
  }

  // ---- X9 rebalance on the historical tier ----

  /** Cap every historical cluster at `maxSize` rows (cluster-closest rows
    * stay; overflow moves to its second-nearest centroid, `Ivf.balance` /
    * `ivf/operations.rs:422-492`), then rewrite the tier tmp+swap.
    * Returns how many rows changed cluster. */
  /** k-NN GRAPH over the live store (the SemDeDup/semantic-dedup and
    * graph-index primitive, built on [[graft.operators.KnnJoin]]): every
    * live vector's k most-cosine-similar neighbors.
    *
    * The point of putting this ON the store: the historical tier's
    * parquet layout IS the graph blocking — rows already carry their
    * `cluster_id` and sit co-located in its partitions, so the blocked
    * self-join shuffles once on a key the data is already organized by,
    * with no assignment pass. Recent rows join the same blocking via a
    * map-only centroid assignment when centroids are trained; with no
    * centroids yet (a young, recent-only store — migration is what trains
    * them) the store is bounded and the exact all-pairs baseline runs
    * instead, behind its own loud guard.
    *
    * `multiProbe > 1` trades cost for recall by routing EVERY vector
    * through its p nearest centroids ([[graft.operators.KnnJoin.blockedMultiProbe]]);
    * cross-boundary true neighbors become reachable at ~p× pair cost.
    * Returns (id, neighbor_id, rank, cosine). */
  def knnGraph(k: Int, multiProbe: Int = 1): DataFrame = {
    require(k > 0 && multiProbe >= 1,
      s"need k > 0 and multiProbe >= 1, got k=$k p=$multiProbe")
    val liveRecent = dropTombstoned(recent)
      .select(col("id"), col("embedding"))
    if (!exists("centroids")) {
      // no trained blocking yet: the store is recent-only and bounded
      return graft.operators.KnnJoin.exact(liveRecent, k)
    }
    val cents = centroids
    val liveHist = dropTombstoned(historical)
      .select(col("id"), col("embedding"), col("cluster_id"))
    if (multiProbe > 1) {
      // multi-probe re-derives assignments for both tiers (map-only):
      // the historical single-assignment can't express "enter p blocks"
      val all = liveRecent.unionByName(liveHist.drop("cluster_id"))
      val centArr = cents.orderBy("cluster_id").collect()
        .map(_.getSeq[Float](1).toArray)
      graft.operators.KnnJoin.blockedMultiProbe(all, k, centArr, multiProbe)
    } else {
      val assignedRecent = Ivf.assign(liveRecent, cents)
        .select(col("id"), col("embedding"), col("cluster_id"))
      graft.operators.KnnJoin.blocked(
        liveHist.unionByName(assignedRecent), k, blockCol = "cluster_id")
    }
  }

  def rebalance(maxSize: Int): Long = lease.withLease {
    // hasRows is flat-dir only; the historical tier nests cluster_id=*/
    if (!exists("centroids") || !exists("historical")) return 0L
    val hist = historical
    val balanced = Ivf.balance(hist, centroids, maxSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // row identity is (vid, ts), like migrate's anti-join: a tombstoned
    // original and its reinserted copy legitimately share a vid, and a
    // vid-only join would many-to-many them into an inflated (and
    // permanently persisted) moved count
    val movedRows = balanced.select(col("vid"), col("ts"), col("cluster_id"))
      .join(hist.select(col("vid"), col("ts"), col("cluster_id").as("old_cid")),
        Seq("vid", "ts"))
      .filter(col("cluster_id") =!= col("old_cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val moved = movedRows.count()
    // clusters touched = distinct sources ∪ destinations of moved rows —
    // the RebalanceResponse.clusters_modified a reference REST client
    // deserializes (the reference's own handler is a TODO stub; ours
    // reports the real number). Bounded: runs only over the moved subset.
    val clustersModified =
      if (moved == 0) 0L
      else movedRows
        .select(explode(array(col("cluster_id"), col("old_cid"))).as("c"))
        .agg(countDistinct("c")).head().getLong(0)
    movedRows.unpersist()
    storeWrite(balanced.repartition(col("cluster_id"))).mode(SaveMode.Overwrite)
      .partitionBy("cluster_id").parquet(dir("historical") + "_tmp")
    balanced.unpersist()
    swap("historical")
    // cluster assignments moved: the PQ/SQ code tables' cluster
    // partitioning is stale — probed search would miss moved rows.
    // Re-encode with enablePq(retrain = false) / enableSq().
    fs.delete(new Path(dir("pq_codes")), true)
    fs.delete(new Path(dir("opq_codes")), true)
    fs.delete(new Path(dir("sq_codes")), true)
    fs.delete(new Path(dir("bq_codes")), true)
    fs.delete(new Path(path, "pq_codes_files.json"), false)
    fs.delete(new Path(path, "opq_codes_files.json"), false)
    fs.delete(new Path(path, "sq_codes_files.json"), false)
    fs.delete(new Path(path, "bq_codes_files.json"), false)
    // maintenance accounting (RebalanceStatistics analog,
    // hybrid/maintenance.rs:115-119): persisted with the store so the
    // counters survive restarts and cover every caller (REST route,
    // scheduler, direct API)
    val prev = maintenanceStats
    writeText(new Path(path, "maintenance.json"), mapper.writeValueAsString(
      mapper.createObjectNode()
        .put("total_rebalances", prev.totalRebalances + 1)
        .put("total_vectors_moved", prev.totalVectorsMoved + moved)
        .put("last_clusters_modified", clustersModified)))
    moved
  }

  /** Persisted rebalance counters (`maintenance.json`); zeros when no
    * rebalance has run. */
  def maintenanceStats: MaintenanceStats = {
    val p = new Path(path, "maintenance.json")
    if (!fs.exists(p)) MaintenanceStats(0L, 0L, 0L)
    else {
      val n = mapper.readTree(readText(p))
      MaintenanceStats(
        n.path("total_rebalances").asLong(0L),
        n.path("total_vectors_moved").asLong(0L),
        n.path("last_clusters_modified").asLong(0L))
    }
  }

  /** The auto-rebalance trigger probe: (totalVectors, avgClusterSize,
    * maxClusterSize) of the historical tier in one small aggregate, or
    * None when the tier or centroids are absent — the scheduler's analog
    * of the reference's imbalance check
    * (`hybrid/maintenance.rs:100-113`, `AutoRebalanceConfig`). */
  def clusterImbalance(): Option[(Long, Double, Long)] = {
    if (!exists("centroids") || !hasRowsRecursive("historical")) None
    else {
      val r = historical.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .agg(sum("sz").as("total"), avg("sz").as("avg_sz"), max("sz").as("max_sz"))
        .head()
      Some((r.getLong(0), r.getDouble(1), r.getLong(2)))
    }
  }

  // ---- backup (admin route parity, rest.rs:715) ----

  /** Recursive FS copy of the whole store (tables + sidecars) to `target`;
    * returns bytes copied. Works across filesystems (the copy goes through
    * the Hadoop API on both ends). */
  def backup(target: String): Long = {
    val src = new Path(path)
    val dst = new Path(target)
    val dstFs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, dstFs, dst,
      false, true, spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(src).getLength
  }

  // ---- C6 vacuum: physical removal of soft-deleted + overlay compaction ----

  def vacuum(): VacuumResult = lease.withLease {
    // nothing to compact -> zero Spark jobs, and the serving artifacts
    // (recent index, code tables) stay valid — vacuum on a clean store is
    // free instead of a full double-tier rewrite + index invalidation
    if (!hasRows("tombstones") && !hasRows("meta_updates"))
      return VacuumResult(0, 0)
    def compact(df: DataFrame): DataFrame =
      applyMetaOverlay(dropTombstoned(df))
    // each tier compacts in ONE pass: before/after counts ride as metrics
    // observed on the rewrite job itself — no counting pass, no caches
    def rewrite(tier: DataFrame)(write: DataFrame => Unit): Long = {
      val before = org.apache.spark.sql.Observation()
      val after = org.apache.spark.sql.Observation()
      write(compact(tier.observe(before, count(lit(1)).as("n")))
        .observe(after, count(lit(1)).as("n")))
      obsLong(before) - obsLong(after)
    }
    val recRemoved = rewrite(recent) { df =>
      storeWrite(df.select(vectorSchema.fieldNames.map(col).toSeq: _*))
        .mode(SaveMode.Overwrite).parquet(dir("recent") + "_tmp")
    }
    swap("recent")
    // an empty historical tier needs no rewrite (absence = empty)
    val histRemoved =
      if (!hasRowsRecursive("historical")) 0L
      else {
        val r = rewrite(historical) { df =>
          storeWrite(df.repartition(col("cluster_id")))
            .mode(SaveMode.Overwrite).partitionBy("cluster_id")
            .parquet(dir("historical") + "_tmp")
        }
        swap("historical")
        r
      }
    // compacted => the mutation sidecars are spent; drop the dirs (absence
    // means empty to readOr/hasRows) instead of writing empty tables
    fs.delete(new Path(dir("tombstones")), true)
    fs.delete(new Path(dir("meta_updates")), true)
    // serving artifacts still contain the physically-removed rows, and with
    // the tombstones gone nothing would mask them — invalidate. The PQ
    // model stays (codebooks are still valid); re-encode cheaply with
    // enablePq(retrain = false) / enableSq().
    fs.delete(new Path(dir("recent_index")), true)
    fs.delete(new Path(dir("pq_codes")), true)
    fs.delete(new Path(dir("opq_codes")), true)
    fs.delete(new Path(dir("sq_codes")), true)
    fs.delete(new Path(dir("bq_codes")), true)
    fs.delete(new Path(path, "pq_codes_files.json"), false)
    fs.delete(new Path(path, "opq_codes_files.json"), false)
    fs.delete(new Path(path, "sq_codes_files.json"), false)
    fs.delete(new Path(path, "bq_codes_files.json"), false)
    VacuumResult(recRemoved, histRemoved)
  }

  private def swapMarker(name: String) = new Path(path, s"${name}_swap.inprogress")

  /** Tier rewrite commit: `_tmp` (already fully written) replaces the live
    * dir under [[graft.core.FsSwap]]'s marker-bracketed protocol — see that
    * object's scaladoc for the crash-recovery and SINGLE-WRITER contract.
    * The lease is re-verified + renewed at this commit point: a writer that
    * stalled past the lease TTL aborts here instead of installing a rewrite
    * that would race the lease's new holder, and a legal long mutation's
    * TTL clock restarts with each tier it commits. */
  private def swap(name: String): Unit = {
    lease.renewAndVerify()
    graft.core.FsSwap.commit(fs, new Path(dir(name)),
      new Path(dir(name) + "_tmp"), swapMarker(name), s"""{"swap": "$name"}""")
  }

  /** Crash recovery for [[swap]], run at every open — [[graft.core.FsSwap]]
    * finishes any marker-evidenced swap, adopts a markerless `_tmp` only
    * when the live dir is missing, and leaves a markerless `_tmp` next to
    * an intact live dir untouched (it may be a concurrent writer's
    * in-flight rewrite). */
  private def recoverSwaps(): Unit =
    Seq("recent", "historical", "tombstones", "meta_updates").foreach { name =>
      graft.core.FsSwap.recover(fs, new Path(dir(name)),
        new Path(dir(name) + "_tmp"), swapMarker(name))
    }

  // ---- A6/C7 stats ----

  /** Operator-facing observability snapshot — pure FS-metadata reads (no
    * Spark job) and, critically, NO recovery side effects: at fleet scale
    * an operator must be able to see a stranded swap marker, a wedged swap
    * lock (FsSwap fails loudly after its 60 s wait), or who holds the
    * writer lease, without reading code or mutating the store. Exposed
    * over REST at `/api/v1/health`. A stranded marker is normal for the
    * instant between a crash and the next open (recovery clears it);
    * one that PERSISTS while `swapLockAgesMs` grows is the wedged-recovery
    * state FsSwap's lock-timeout message describes. */
  def health(): Health = {
    def safeExists(p: Path) =
      try fs.exists(p) catch { case _: java.io.IOException => false }
    val rootOk = safeExists(new Path(path))
    // absent manifest = uninitialized store, still healthy; present but
    // unreadable/unsupported-version = degraded
    val manifestOk =
      try { readManifest(); true } catch { case _: Exception => false }
    val tierNames = Seq("recent", "historical", "tombstones", "meta_updates")
    val markers = tierNames.filter(n => safeExists(swapMarker(n)))
    val now = System.currentTimeMillis()
    val lockAges = tierNames.flatMap { n =>
      val lock = new Path(path, s"${n}_swap.lock")
      try {
        if (fs.exists(lock))
          Some(n -> (now - fs.getFileStatus(lock).getModificationTime))
        else None
      } catch { case _: java.io.IOException => None }
    }.toMap
    // effectiveLease folds in renewal heartbeats, so a long mutation that
    // keeps committing reads as fresh, not as a near-TTL lease
    val leaseInfo = lease.effectiveLease()
    Health(connected = rootOk, manifestReadable = manifestOk,
      strandedSwapMarkers = markers,
      leaseOwner = leaseInfo.map(_._1),
      leaseAgeMs = leaseInfo.map(l => now - l._3),
      swapLockAgesMs = lockAges)
  }

  /** Policy-level health check, the reference HealthMonitor's
    * `check_health` (`hybrid/maintenance.rs:832-863`, `AlertConfig`
    * defaults `:805-810`): backlog = the recent tier's live row count (the
    * reference's own simplification — every recent row is migration
    * backlog), a strict `backlog > threshold` trip; memory analog = bytes
    * on disk of the two tier dirs (the reference sums in-memory index
    * sizes; a parquet-backed store's footprint IS its disk bytes), ok iff
    * strictly under the threshold. Issue strings mirror the reference's.
    * Where the reference hardcodes recent/historical/latency ok = true,
    * the tier flags here are REAL (no stranded swap marker — same pattern
    * as the REST /health envelope); `searchLatencyOk` stays true with no
    * latency tracker, as in the reference. One Spark job (the counts) +
    * FS metadata. */
  def checkHealth(migrationBacklogThreshold: Long = 1000L,
      memoryUsageThresholdBytes: Long = 1000000000L): HealthReport = {
    val h = health()
    // a health check must REPORT an unreadable store, not throw from it
    // (same guard as the REST /health envelope)
    val stOpt =
      try Some(stats())
      catch { case scala.util.control.NonFatal(_) => None }
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]
    if (stOpt.isEmpty) issues += "Store tiers unreadable (stats failed)"
    val backlog = stOpt.map(_.recentCount).getOrElse(0L)
    if (backlog > migrationBacklogThreshold)
      issues += s"High migration backlog: $backlog"
    def dirBytes(name: String): Long =
      try {
        val p = new Path(dir(name))
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      } catch { case _: java.io.IOException => 0L }
    val memoryUsage = dirBytes("recent") + dirBytes("historical")
    val memoryOk = memoryUsage < memoryUsageThresholdBytes
    if (!memoryOk) issues += "Memory usage exceeds threshold"
    val recentOk = tierHealthy(h, "recent")
    val historicalOk = tierHealthy(h, "historical")
    if (!recentOk) issues += "Recent index degraded (stranded swap marker)"
    if (!historicalOk)
      issues += "Historical index degraded (stranded swap marker)"
    HealthReport(
      status = if (issues.isEmpty) "healthy" else "warning",
      recentIndexOk = recentOk, historicalIndexOk = historicalOk,
      migrationBacklog = backlog, searchLatencyOk = true,
      memoryUsageOk = memoryOk, issues = issues.toSeq)
  }

  /** Structural integrity check — the reference `IVFPersister
    * .check_integrity` (`ivf/persistence.rs:299-349`: persisted metadata
    * vs what the lists actually hold) generalized to this store's
    * invariants, as aggregates that scale with the data (no driver-side
    * row loops):
    *
    *  - every live embedding has the manifest dim (a wrong-dim row would
    *    throw mid-scan at SEARCH time — integrity finds it at admin time)
    *  - live ids are unique (the invariant insert's dup anti-join enforces;
    *    violated only by out-of-band writes)
    *  - every historical row's cluster_id addresses a real centroid (the
    *    reference's missing_clusters, inverted: rows pointing nowhere)
    *  - each enabled code tier mirrors the live historical tier exactly —
    *    `drift = (missing, orphaned)` counts per tier (the reference's
    *    expected vs found_vectors; non-zero after out-of-band edits or a
    *    crash between tier rewrite and code refresh)
    *
    * One shuffle over the live view + one small job per enabled code tier.
    * Read-only (no recovery side effects) — pair with [[health]] for the
    * swap/lease view.
    *
    * `confirmTransients = true` additionally runs the confirm pass
    * ([[confirmTransientDefects]]): wait (≤ `confirmWaitMs`) for the
    * writer lease to be free, re-probe only the transient classes, and
    * report the defects present in BOTH observations — turning the
    * "alert only if it persists" guidance into a mechanism. The confirmed
    * counts ride the report (−1 = not confirmed: confirm not requested,
    * writer stayed live, or index coverage unknown); `isComplete` is
    * unchanged — transient classes stay non-gating by design. */
  /** The one-pass per-id frame behind [[checkIntegrity]] (guide §2.4:
    * remove shuffles outright): recent, historical (with its
    * cluster-validity flag riding the same rows), and every enabled code
    * tier are unioned with a source tag and grouped by id ONCE —
    * previously the scan read the historical tier up to six times
    * (per-id agg, the invalid-cluster count, and one anti-join per code
    * tier) across five shuffles; now one Exchange(id) carries
    * map-side-combined per-id counters and every report field falls out
    * of one grouped frame. The drift arithmetic is join-free: per id, a
    * tier missing the id contributes that id's historical row count to
    * `missing`, an id absent from the historical tier contributes its
    * code row count to `orphaned` — exactly the row multiplicities the
    * old per-tier full_outer joins counted (when both sides hold the id
    * both contributed 0). Returns (perId frame, enabled tier names);
    * also the plan-audit hook ([[integrityPerIdPlan]]). */
  private def integrityPerId(): (DataFrame, Seq[String]) = {
    val manifest =
      try readManifest() catch { case _: Exception => None }
    val dim = manifest.map(_.dim)
    val dimCheck = dim match {
      case Some(d) => size(col("embedding")) =!= d // size(null) = -1 ≠ d
      case None => lit(false) // no manifest: nothing to check against
    }
    val hasCentroids = exists("centroids")
    val nCents =
      if (hasCentroids && hasRowsRecursive("historical")) centroids.count()
      else -1L // sentinel: cluster validity not checkable this scan
    val histBad =
      if (nCents < 0) lit(0L)
      else (col("cluster_id").isNull || col("cluster_id") < 0 ||
        col("cluster_id") >= nCents).cast("long")
    val enabledTiers = Seq("pq_codes" -> hasPq, "opq_codes" -> hasOpq,
      "sq_codes" -> hasSq, "bq_codes" -> hasBq).collect {
      case (tier, true) => tier }
    val recentSrc = dropTombstoned(recent)
      .select(col("id"), lit("r").as("src"),
        dimCheck.cast("long").as("w"), lit(0L).as("bad"))
    val histSrc = dropTombstoned(historical)
      .select(col("id"), lit("h").as("src"),
        dimCheck.cast("long").as("w"), histBad.as("bad"))
    val codeSrcs = enabledTiers.map { tier =>
      dropTombstoned(
        spark.read.schema(codesSchema(tier)).parquet(dir(tier)))
        .select(col("id"), lit(tier).as("src"), lit(0L).as("w"),
          lit(0L).as("bad"))
    }
    val tierCnt = enabledTiers.map(t =>
      sum(when(col("src") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val perId0 = (recentSrc +: histSrc +: codeSrcs).reduce(_ unionByName _)
      .groupBy("id").agg(
        sum(when(col("src") === "r", 1L).otherwise(0L)).as("r"),
        (sum(when(col("src") === "h", 1L).otherwise(0L)).as("h") +:
          sum(col("w")).as("w") +: sum(col("bad")).as("bad") +:
          tierCnt): _*)
      // `c` (live row count) kept as a derived column so the
      // crossDupPred and dup predicates below read as before
      .withColumn("c", col("r") + col("h"))
    (perId0, enabledTiers)
  }

  /** Plan-audit hook (tools/PlanCapture, PLANS.md): the one-pass per-id
    * frame for callers to `explain`. NOTE: constructing it is not free —
    * [[integrityPerId]] eagerly runs the bounded centroid count and the
    * tier-existence FS probes while assembling the plan; only the heavy
    * per-id pass itself stays unexecuted. */
  private[graft] def integrityPerIdPlan(): DataFrame = integrityPerId()._1

  def checkIntegrity(confirmTransients: Boolean = false,
      confirmWaitMs: Long = 10000L): IntegrityReport = {
    val manifest =
      try readManifest() catch { case _: Exception => None }
    val hasCentroids = exists("centroids")
    val (perId0, enabledTiers) = integrityPerId()
    // under confirm, the per-id frame is CACHED so the confirm pass's
    // pass-1 cross-tier dup ID SET is derived from the very observation
    // the raw count below reports (one scan, one snapshot — raw and
    // pass-1 cannot disagree within one report), instead of a third
    // full tier scan racing in between
    val perId =
      if (!confirmTransients) perId0
      else perId0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the ONE cross-tier-duplicate predicate, shared by the raw count's
    // aggregate and the confirm pass's pass-1 ID set so the two cannot
    // silently diverge within a report (the coherence the cached perId
    // exists to provide)
    val crossDupPred = col("r") >= 1 && (col("c") - col("r")) >= 1
    // the whole remainder runs under try/finally: a loud mid-scan abort
    // (malformed sidecar, malformed index meta) must not leak the
    // persisted per-id frame into the session's cache
    try {
    // duplicate ids are split by KIND: within one tier (always a hard
    // defect — only out-of-band writes produce it) vs across tiers. The
    // cross-tier count can be TRANSIENTLY non-zero when this read-only
    // scan races a concurrent migrate() between its two tier swaps (the
    // id is legitimately in both tiers for that window); it is therefore
    // reported separately and excluded from `isComplete`, so an operator
    // polling the admin endpoint doesn't false-alarm. A cross-tier count
    // that PERSISTS across consecutive scans with no migrate running is a
    // real defect (e.g. out-of-band tier edits) and should be alerted on.
    // ONE single-row aggregate serves every count, including the
    // per-tier drift legs and the invalid-cluster count that used to be
    // their own scans: per id, `missing` gains the id's historical row
    // count when the tier holds no row for it, `orphaned` gains the
    // tier's row count when the historical tier holds none — the exact
    // row multiplicities of the former per-tier full_outer joins.
    val driftCols = enabledTiers.flatMap { tier =>
      Seq(
        coalesce(sum(when(col(s"n_$tier") === 0L, col("h"))
          .otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("h") === 0L, col(s"n_$tier"))
          .otherwise(0L)), lit(0L)))
    }
    val rowAggs: Seq[org.apache.spark.sql.Column] =
      Seq(coalesce(sum(col("r")), lit(0L)),
        coalesce(sum(col("h")), lit(0L)),
        coalesce(sum(col("w")), lit(0L)),
        coalesce(sum(when(col("r") > 1 || col("h") > 1, 1L)
          .otherwise(0L)), lit(0L)),
        coalesce(sum(when(crossDupPred, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(col("bad")), lit(0L))) ++ driftCols
    val row = perId.agg(rowAggs.head, rowAggs.tail: _*).head()
    val (liveRecent, liveHistorical, wrongDim, dupIds, crossDupIds) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    val invalidCluster = row.getLong(5)
    val driftFromRow = enabledTiers.zipWithIndex.map { case (tier, i) =>
      tier -> ((row.getLong(6 + 2 * i), row.getLong(7 + 2 * i)))
    }.toMap
    // saved-HNSW recent index vs its recorded part list — pure FS
    // metadata, no scan (the r13 "blob count probe" leg): STALE parts
    // (tier parts the index doesn't cover) are normal operation — the
    // search-time delta scan serves them, though a large count says a
    // rebuild would pay off; MISSING parts (recorded-covered parts that
    // no longer exist in the tier) indicate the index's data table is
    // serving rows the tier no longer holds. Like the cross-tier dup
    // count, missing can be TRANSIENTLY non-zero when this lease-free
    // scan races a migrate()/vacuum() between its tier swap and its
    // index invalidation (both swap the tier FIRST), so it is reported
    // but NOT folded into isComplete — a missing count that PERSISTS
    // across scans with no maintenance running is the real out-of-band-
    // edit defect and should be alerted on. UNKNOWN coverage — a
    // pre-list-era meta.json, or the index invalidated between the
    // hasRecentIndex probe and the meta read — reports the -1 SENTINEL
    // on both probes, never a silent 0/0: an alert-if-persists monitor
    // must be able to tell "verified zero" from "could not verify this
    // scan" (a 0 would reset its persistence window over the very
    // defect class it watches for). Unparseable or malformed sidecars
    // fail the scan loudly instead (see below).
    val idxDelta = recentIndexPartsDelta()
    val (idxStale, idxMissing) = idxDelta
      .map { case (st, mi) => (st.size.toLong, mi.size.toLong) }
      .getOrElse((-1L, -1L))
    // the drift counts themselves rode the one grouped pass above
    // (driftFromRow); what remains per enabled tier is the sidecar
    // validation — pure driver-side file reads, no scan
    val drift = enabledTiers.map { tier =>
      // the tier's part-list sidecar gets the same loud-malformed
      // contract as the index meta: a corrupted `*_files.json` makes
      // every refresh and search delta silently degrade to the
      // full-tier anti-join forever (readPartList's safe fallback), and
      // this scan is the one surface that flags it. An ABSENT sidecar
      // FILE is fine (nothing recorded yet); a present sidecar without a
      // usable `files` array was never written by any version — corrupt.
      val sidecar = new Path(path, s"${tier}_files.json")
      val sidecarVerdict: Option[RecordedList] =
        try {
          if (!fs.exists(sidecar)) None
          else Some(
            try recordedFiles(mapper.readTree(readText(sidecar)))
            catch {
              // unparseable is the same defect class as malformed — fold
              // it into the classification so the error NAMES the file
              // and carries remediation, never a raw Jackson 500
              case e: com.fasterxml.jackson.core.JacksonException =>
                RecordedList.Malformed(
                  s"unparseable JSON (${e.getOriginalMessage})")
            })
        // vanished between exists and read: a concurrent (atomic)
        // rewrite's brief absent window — benign, skip this scan's check
        } catch { case _: java.io.FileNotFoundException => None }
      sidecarVerdict.foreach {
        case RecordedList.Files(_) => ()
        case other =>
          val why = other match {
            case RecordedList.Malformed(r) => r
            case _ => "no `files` entry (never written by any version)"
          }
          throw new IllegalStateException(
            s"${tier}_files.json is malformed: $why — the sidecar was " +
              "edited or corrupted (sidecar rewrites are atomic, so a " +
              "live refresh cannot produce this); every refresh and " +
              "search delta for this tier is degrading to the " +
              "full-tier anti-join. Re-enable the tier (or refresh " +
              "it) to rewrite the sidecar")
      }
      tier -> driftFromRow(tier)
    }.toMap
    val (confirmed, confCross, confMissing) =
      if (!confirmTransients) (false, -1L, -1L)
      else {
        // pass 1's cross-tier dup ID SET comes straight off the CACHED
        // perId frame (materialized by the `row` action above): the same
        // observation — and the same crossDupPred — as the raw count,
        // with no extra tier scan; only the pass-2 re-probe inside
        // confirmTransientDefects reads the tiers again, at a genuinely
        // later time
        val p1 = perId.filter(crossDupPred).select("id")
        confirmTransientDefects(p1, idxDelta.map(_._2), confirmWaitMs)
      }
    IntegrityReport(
      hasManifest = manifest.isDefined, hasCentroids = hasCentroids,
      liveRecent = liveRecent, liveHistorical = liveHistorical,
      wrongDimCount = wrongDim, duplicateIdCount = dupIds,
      crossTierDuplicateCount = crossDupIds,
      invalidClusterCount = invalidCluster, codeTierDrift = drift,
      recentIndexStaleParts = idxStale,
      recentIndexMissingParts = idxMissing,
      // the rotation staleness probe rides the scan when the OPQ tier is
      // up: one bounded sample collect + driver-side reconstruction —
      // O(sample x d^2), trivial beside the one-pass tier scan above
      opqRotationMseRatio = opqRotationDrift()
        .map(_.ratio).getOrElse(-1.0),
      isComplete = manifest.isDefined && wrongDim == 0 && dupIds == 0 &&
        invalidCluster == 0 &&
        drift.values.forall(p => p._1 == 0 && p._2 == 0),
      transientsConfirmed = confirmed,
      confirmedCrossTierDuplicateCount = confCross,
      confirmedRecentIndexMissingParts = confMissing)
    } finally { if (confirmTransients) perId.unpersist() }
  }

  /** One observation of the saved-recent-index part-list delta, the ONE
    * implementation behind both [[checkIntegrity]]'s probe and the
    * confirm pass: `Some((stale, missing))` = the actual PART-NAME sets
    * (verified-empty when no index is built); `None` = coverage unknown
    * this observation (pre-list-era meta.json, or the index vanished
    * between the hasRecentIndex probe and the meta read — the −1 sentinel
    * upstream). A meta.json that EXISTS but is unparseable or MALFORMED
    * (non-object root, `files` null/non-array) is a persistent defect,
    * same class as an edited sidecar — it throws LOUDLY here; the SEARCH
    * path degrades to the anti-join delta for the malformed-list state
    * (serving must survive what an admin scan should flag; an UNPARSEABLE
    * meta.json fails search too — it is load-bearing for the metric). */
  private def recentIndexPartsDelta(): Option[(Set[String], Set[String])] =
    try {
      if (!hasRecentIndex) Some((Set.empty, Set.empty))
      else (try recordedFiles(mapper.readTree(
          readText(new Path(dir("recent_index"), "meta.json"))))
        catch {
          // same naming rule as the code-tier sidecars: unparseable
          // surfaces through the loud branch with the file named,
          // never as a raw Jackson error
          case e: com.fasterxml.jackson.core.JacksonException =>
            RecordedList.Malformed(
              s"unparseable JSON (${e.getOriginalMessage})")
        }) match {
        case RecordedList.Absent => None // pre-list-era: unknown
        case RecordedList.Malformed(why) =>
          throw new IllegalStateException(
            s"recent_index/meta.json is malformed: $why — the sidecar " +
              "was edited or corrupted. Where only the `files` list is " +
              "damaged, searches degrade to the full-tier delta scan; " +
              "where the sidecar's metric is unreadable too (non-object " +
              "root or broken JSON), indexed searches FAIL as well. " +
              "Rebuild the index (buildRecentIndex) or restore meta.json")
        case RecordedList.Files(rec) =>
          val recorded = rec.toSet
          val current = listDataParts("recent").toSet
          Some((current -- recorded, recorded -- current))
      }
    // ONLY the vanished-file race maps to unknown; a meta.json that
    // exists but cannot be parsed must fail loudly, not read as healthy
    } catch { case _: java.io.FileNotFoundException => None }

  /** The ids currently present in BOTH tiers (live view) — one
    * observation of the cross-tier-duplicate defect set, shared by the
    * confirm pass. Each invocation re-reads the tiers at job time, so
    * two calls are two temporally distinct observations. */
  private def crossTierDupIds(): DataFrame = {
    val live = dropTombstoned(
      recent.withColumn("tier", lit("recent")).unionByName(
        historical.drop("cluster_id").withColumn("tier", lit("historical"))))
    live.groupBy("id").agg(
        sum(when(col("tier") === "recent", 1L).otherwise(0L)).as("r"),
        sum(when(col("tier") =!= "recent", 1L).otherwise(0L)).as("h"))
      .filter(col("r") >= 1 && col("h") >= 1)
      .select("id")
  }

  /** The confirm pass behind `checkIntegrity(confirmTransients = true)`:
    * the two TRANSIENT defect classes (cross-tier duplicates, index
    * missing parts) are non-gating because this lease-free scan can race
    * a migrate()/vacuum() between its two swaps — "alert if it persists"
    * used to be guidance only; this is the mechanism. It (1) waits,
    * bounded by `maxWaitMs`, for the writer LEASE to be free — every
    * tier swap and index invalidation runs under the lease, so a free
    * lease means the race windows this scan could have hit are closed —
    * then (2) re-probes ONLY the transient classes and intersects the
    * defect SETS with pass 1's: a defect present in both temporally
    * separated observations, the second outside any maintenance window,
    * is a real out-of-band defect, not a race artifact.
    *
    * Returns (confirmed?, confirmedCrossTierDups, confirmedIdxMissing);
    * (false, −1, −1) when a writer stayed live past the wait (cannot
    * separate race from defect while maintenance runs — retry later);
    * confirmedIdxMissing is −1 when either observation's index coverage
    * was unknown. Package-visible so the race-clears / defect-persists
    * split is directly testable around the wait. */
  private[store] def confirmTransientDefects(p1CrossDups: DataFrame,
      p1IdxMissing: Option[Set[String]],
      maxWaitMs: Long): (Boolean, Long, Long) = {
    val deadline = System.currentTimeMillis() + maxWaitMs
    var quiet = !lease.heldByOther()
    while (!quiet && System.currentTimeMillis() < deadline) {
      Thread.sleep(200L)
      quiet = !lease.heldByOther()
    }
    if (!quiet) (false, -1L, -1L)
    else {
      val confirmedCross =
        p1CrossDups.join(crossTierDupIds(), Seq("id")).count()
      val confirmedMissing = (p1IdxMissing, recentIndexPartsDelta()) match {
        case (Some(m1), Some((_, m2))) => (m1 & m2).size.toLong
        case _ => -1L // unknown on either side: cannot confirm this class
      }
      // check-then-act guard: the quiesce check above ran BEFORE the
      // re-probe's Spark jobs — a writer acquiring the lease DURING them
      // re-opens exactly the race window the wait closed, so re-verify
      // the lease stayed free and report could-not-confirm if it didn't.
      // Residual (documented, not mechanized): a writer that acquires
      // AND releases entirely inside the probe window slips both checks;
      // the monitor's defense is the same as for any single scan —
      // confirmed counts are compared ACROSS confirm scans, and a
      // slipped race clears on the next one while a real defect repeats.
      if (lease.heldByOther()) (false, -1L, -1L)
      else (true, confirmedCross, confirmedMissing)
    }
  }

  /** The ONE definition of tier-level degradation shared by
    * [[checkHealth]] and the REST `/health` envelope: reachable store and
    * no stranded swap marker on the tier. Keeping it here means the two
    * surfaces cannot silently diverge on what "degraded" means. */
  def tierHealthy(h: Health, tier: String): Boolean =
    h.connected && !h.strandedSwapMarkers.contains(tier)

  def stats(): Stats = {
    // one job for all three counts, not three
    val counts = dropTombstoned(recent).select(lit("r").as("t"))
      .unionByName(dropTombstoned(historical).select(lit("h").as("t")))
      .unionByName(tombstones.select(lit("t").as("t")))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Stats(
      recentCount = counts.getOrElse("r", 0L),
      historicalCount = counts.getOrElse("h", 0L),
      tombstoneCount = counts.getOrElse("t", 0L))
  }

  /** A6/A7 (`hybrid/core.rs:694-820`): average vector age and the
    * <1h/<1d/<1w/>=1w age histogram over live rows, anchored at `now`. */
  def ageStats(nowOverride: Option[java.sql.Timestamp] = None): DataFrame = {
    val now = nowOverride.map(lit(_)).getOrElse(current_timestamp())
    vectors
      .withColumn("age_s", unix_timestamp(now) - unix_timestamp(col("ts")))
      .withColumn("bucket",
        when(col("age_s") < 3600, "lt_1h")
          .when(col("age_s") < 86400, "lt_1d")
          .when(col("age_s") < 604800, "lt_1w")
          .otherwise("ge_1w"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), avg("age_s").as("avg_age_s"))
  }

  /** Batch hybrid search (X12/X14 at scale): the recent tier is scanned
    * fully (small by construction); the historical tier is probe-pruned on
    * its cluster_id partitions when centroids exist. Results merge through
    * the grouped top-k.
    *
    * `filterJson` (X13 at scale): the same Mongo-style metadata filter as
    * [[search]], composed into BOTH tiers as a pushed pre-filter — the
    * recent scan and the probed inverted lists each drop non-matching rows
    * before any distance is computed, so filtered search keeps exact-k
    * semantics (no oversampling) and the partition pruning of the
    * historical tier. Metadata overlays (C4) are applied before filtering
    * so a filter sees updated values. */
  /** Materialize the (bounded) query batch once as a local relation: every
    * serving path ends up collecting or broadcasting the batch anyway (HNSW
    * query broadcast, driver probe selection, rerank broadcast), so one
    * up-front collect replaces 2-3 per-tier scan jobs of the same frame —
    * measurable fixed cost when the composition fans out to several tiers.
    * The guard bounds the collect BEFORE materializing, like
    * Hnsw.searchSaved's maxQueryBatch. */
  /** Serving-path contract: a store search is an INTERACTIVE batch — the
    * driver needs the query vectors anyway (IVF probe selection, HNSW blob
    * routing, ADC table literals), so the batch is localized once and
    * reused by every tier, bounded by `maxQueryBatch`. An ANALYTICAL
    * million-query join belongs on the operator path (`Knn.batch`,
    * `Ivf.searchBatch`, `Pq.searchBatchIvfPq` over the exported tier
    * tables), which stays fully distributed and unbounded — this cap is a
    * route sign, not a scale ceiling. */
  private def localizeQueries(queries: DataFrame,
      maxQueryBatch: Int = 100000): DataFrame = {
    val rows = queries.limit(maxQueryBatch + 1).collect()
    require(rows.length <= maxQueryBatch,
      s"query batch exceeds maxQueryBatch=$maxQueryBatch; chunk upstream")
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), queries.schema)
  }

  def searchBatch(queriesRaw: DataFrame, k: Int, metric: String = "cosine",
      nProbe: Int = config.nProbe, recentK: Option[Int] = None,
      historicalK: Option[Int] = None,
      filterJson: Option[String] = None,
      useRecentIndex: Boolean = false,
      recentEfSearch: Int = 100,
      recentProbeBlobs: Int = 0,
      searchRecent: Boolean = true,
      searchHistorical: Boolean = true): DataFrame = {
    require(searchRecent || searchHistorical,
      "at least one of searchRecent/searchHistorical must be true")
    val queries = localizeQueries(queriesRaw)
    // the natural string id rides through the string top-k aggregate — no
    // surrogate hash, no collision risk, no join back to recover the id
    val recPart =
      if (!searchRecent) None // reference search_recent=false (rest.rs:106)
      else if (useRecentIndex) Some(indexedRecentPart(queries, recentK.getOrElse(k),
        metric, filterJson, recentEfSearch, recentProbeBlobs))
      else {
        val rec = filterJson match {
          case None => dropTombstoned(recent).select(col("id"), col("embedding"))
          case Some(_) => applyMetaOverlay(dropTombstoned(recent))
            .select(col("id"), col("embedding"), col("metadata"))
        }
        Some(Knn.batch(rec, queries, recentK.getOrElse(k), metric,
            filterJson = filterJson)
          .select(col("query_id"), col("id"), col("distance")))
      }
    val hist = filterJson match {
      case None => dropTombstoned(historical)
      case Some(_) => applyMetaOverlay(dropTombstoned(historical))
    }
    // tier presence is an FS-metadata question (recursive: the tier nests
    // cluster_id=*/), never a Spark job ahead of the search plan
    val histPart =
      if (!searchHistorical) None
      else if (!exists("centroids") || !hasRowsRecursive("historical")) None
      else Some(Ivf.searchBatch(
          hist.select(Seq("id", "embedding", "cluster_id").map(col) ++
            filterJson.map(_ => col("metadata")).toSeq: _*),
          centroids, queries, historicalK.getOrElse(k), nProbe, metric,
          filter = filterJson.map(FilterJson.predicate(_, col("metadata"))))
        .select(col("query_id"), col("id"), col("distance")))
    val parts = recPart.toSeq ++ histPart.toSeq
    require(parts.nonEmpty,
      "no searchable tier: recent disabled and the historical tier is absent")
    mergeTiers(k, parts: _*)
  }

  // ---- recent-tier saved-HNSW serving (X12: the reference serves its
  // recent tier from HNSW inside every hybrid search, hybrid/core.rs:441-486;
  // here it is an OPT-IN index so the default store stays zero-maintenance) --

  /** Build (or rebuild) a persisted HNSW index over the current recent
    * tier. The graph kernel keys nodes by LONG, so rows get a dense
    * surrogate (`lid`) recorded — together with the natural id, vid, ts,
    * metadata — in `recent_index/data`; blobs and surrogate map are written
    * from the SAME materialized table, so they can never disagree.
    *
    * The index serves the rows present at build time. Later mutations stay
    * correct without a rebuild: inserts are caught by the delta scan in
    * [[searchBatch]] (anti-join on (vid, ts)), deletes by the tombstone
    * allow-list, metadata updates by the overlay applied to the allow-list.
    * `migrate`/`vacuum` rewrite the tier itself, so they invalidate the
    * index (delete it) — rebuild after maintenance. */
  def buildRecentIndex(efConstruction: Int = 100, m: Int = 16,
      metric: String = "l2", numBlobs: Int = 0,
      routed: Boolean = false): Unit = lease.withLease {
    require(metric == "l2" || metric == "cosine",
      s"recent index supports l2|cosine, got $metric")
    val parts =
      if (numBlobs > 0) numBlobs else spark.sparkContext.defaultParallelism
    // part list captured BEFORE the tier DataFrame pins its file listing
    // (same ordering as enableSq/enableBq): a part appended by a
    // concurrent insert between listing and recording would otherwise be
    // recorded as covered without being indexed — rows invisible to both
    // the HNSW hits and the file-diff delta scan until a rebuild. Listed
    // first, a racing part is simply NOT in `files` and surfaces through
    // the delta path.
    val coveredParts = listDataParts("recent")
    val base = recent
      .select(col("id"), col("vid"), col("ts"), col("metadata"), col("embedding"))
    // routed: co-locate similar vectors per blob (repartition by k-means
    // cluster) so searches can probe only each query's nearest blobs
    // (searchBatch recentProbeBlobs) — O(probeBlobs) per query instead of
    // O(#blobs), the shape that survives a heavily-sharded index. The
    // store's coarse centroids are reused when present; otherwise a quick
    // driver k-means over the recent tier trains `parts` routing clusters.
    val data = (if (!routed) base.repartition(parts)
      else {
        val cents =
          if (exists("centroids")) centroids
          else Ivf.train(base,
            Ivf.IvfConfig(nClusters = parts, maxIterations = 10,
              trainSize = 10000, initMode = "driver"))
        Ivf.assign(base, cents).repartition(parts, col("cluster_id"))
          .drop("cluster_id")
      })
      .withColumn("lid", monotonically_increasing_id())
    storeWrite(data).mode(SaveMode.Overwrite).parquet(dir("recent_index/data"))
    val written = spark.read.parquet(dir("recent_index/data"))
    graft.operators.Hnsw.buildAndSave(
      written.select(col("lid").as("id"), col("embedding")),
      dir("recent_index/blobs"), metric,
      graft.operators.Hnsw.HnswConfig(efConstruction = efConstruction, m = m))
    // build params ride in meta.json so maintenance (the migration
    // scheduler) can rebuild the index exactly as the operator configured
    // it; the recorded part list makes the search-time delta an FS
    // file-diff (see listDataParts) instead of a row-level anti-join
    val node = mapper.createObjectNode()
    node.put("metric", metric)
    node.put("efConstruction", efConstruction)
    node.put("m", m)
    node.put("numBlobs", numBlobs)
    node.put("routed", routed)
    val arr = node.putArray("files")
    coveredParts.foreach(arr.add)
    // atomic (write-aside + rename): lease-free readers — search's meta
    // read, checkIntegrity's probe — must never observe a truncated
    // meta.json mid-rebuild; briefly-absent reads as not-built, which
    // both handle (see writeTextAtomic)
    writeTextAtomic(new Path(dir("recent_index"), "meta.json"),
      mapper.writeValueAsString(node))
  }

  /** Built = blobs AND meta.json: meta is written last, so a build that
    * died between the two reads as not-built (designed error) instead of
    * failing mid-search on the missing sidecar. */
  def hasRecentIndex: Boolean = exists("recent_index/blobs") &&
    fs.exists(new Path(dir("recent_index"), "meta.json"))

  /** The params the current index was built with, for a like-for-like
    * rebuild: (efConstruction, m, metric, numBlobs, routed). */
  def recentIndexBuildParams: Option[(Int, Int, String, Int, Boolean)] =
    if (!hasRecentIndex) None
    else {
      val n = mapper.readTree(readText(new Path(dir("recent_index"), "meta.json")))
      Some((
        if (n.hasNonNull("efConstruction")) n.get("efConstruction").asInt() else 100,
        if (n.hasNonNull("m")) n.get("m").asInt() else 16,
        n.get("metric").asText(),
        if (n.hasNonNull("numBlobs")) n.get("numBlobs").asInt() else 0,
        n.hasNonNull("routed") && n.get("routed").asBoolean()))
    }

  private def recentIndexMetric: String =
    mapper.readTree(readText(new Path(dir("recent_index"), "meta.json")))
      .get("metric").asText()

  /** The recent-tier contribution of an indexed search: HNSW candidates
    * (k×oversample when a tombstone/filter allow-list applies — the
    * reference's filtered-search semantics, hybrid/core.rs:513-549) mapped
    * back to natural ids, unioned with an exact scan of the post-build
    * delta so fresh inserts are never invisible. */
  private def indexedRecentPart(queries: DataFrame, k: Int, metric: String,
      filterJson: Option[String], efSearch: Int,
      probeBlobs: Int = 0): DataFrame = {
    require(hasRecentIndex, "recent index not built; call buildRecentIndex()")
    // ONE sidecar read per search: metric gate, routed flag, and the
    // recorded part list all come off this node — three separate FS
    // reads + JSON parses of the same file would sit on the hot path
    // (three metadata round-trips per query on a remote FS)
    val meta = mapper.readTree(readText(new Path(dir("recent_index"), "meta.json")))
    val builtMetric = meta.get("metric").asText()
    require(builtMetric == metric,
      s"recent index was built for metric '$builtMetric', search asked '$metric'")
    val idx = spark.read.schema(recentIndexSchema).parquet(dir("recent_index/data"))
    val needAllow = hasRows("tombstones") || filterJson.isDefined
    val allowed =
      if (!needAllow) None
      else {
        val live = applyMetaOverlay(dropTombstoned(idx))
        val kept = filterJson.fold(live)(f =>
          live.filter(FilterJson.predicate(f, col("metadata"))))
        Some(kept.select(col("lid").as("id")))
      }
    // probeBlobs only makes sense against a routed build (blobs co-located
    // by cluster — otherwise every blob centroid sits near the global mean
    // and routing silently loses recall), so an un-routed index ignores it
    val effProbe =
      if (probeBlobs > 0 &&
        meta.hasNonNull("routed") && meta.get("routed").asBoolean()) probeBlobs
      else 0
    val hits = graft.operators.Hnsw.searchSaved(spark, dir("recent_index/blobs"),
        queries, k, efSearch, allowed = allowed, probeBlobs = effProbe,
        metric = builtMetric)
      .select(col("query_id"), col("id").as("lid"), col("distance"))
      .join(idx.select(col("lid"), col("id")), Seq("lid"))
      .select(col("query_id"), col("id"), col("distance"))
    // delta = rows inserted after the build. Inserts only ever APPEND part
    // files and the index build recorded the parts it covered, so the
    // delta is the file-diff — decided from FS metadata, no scan and no
    // extra plan at all in the no-insert case. A delete-then-reinsert
    // lands in a new part like any insert. Indexes built before the list
    // existed fall back to the (vid, ts) anti-join.
    val deltaRawOpt = recordedFiles(meta) match {
      case RecordedList.Files(recorded) =>
        newPartsDF("recent", recorded, vectorSchema)
      // Absent (pre-list-era) and Malformed both fall back to the
      // row-level anti-join: serving survives a damaged sidecar (the
      // integrity scan is the surface that flags it loudly)
      case _ =>
        Some(recent.join(idx.select("vid", "ts"), Seq("vid", "ts"), "left_anti"))
    }
    deltaRawOpt match {
      case None => hits
      case Some(deltaRaw) =>
        val delta = filterJson match {
          case None => dropTombstoned(deltaRaw).select(col("id"), col("embedding"))
          case Some(_) => applyMetaOverlay(dropTombstoned(deltaRaw))
            .select(col("id"), col("embedding"), col("metadata"))
        }
        hits.unionByName(
          Knn.batch(delta, queries, k, metric, filterJson = filterJson)
            .select(col("query_id"), col("id"), col("distance")))
    }
  }

  // ---- PQ as a store artifact (M11/M12 at the storage tier: the reference
  // persists quantization state with the index, ivf/persistence.rs:170-250) --

  /** Encode the historical tier as PQ codes: codebooks at `pq_model`
    * (trained here unless `retrain = false` reuses a saved model — the
    * cheap re-encode path after vacuum), 8-byte-per-vector codes at
    * `pq_codes`, cluster-partitioned like the tier itself so probed search
    * stays partition-pruned. Codes carry (vid, ts) so tombstones and the
    * post-`migrate` delta compose at search time.
    *
    * `residual = true` trains and encodes against each row's coarse
    * centroid (the FAISS IVF-PQ formulation — tighter codes from the same
    * m x k budget); the flag persists with the model so search and
    * refresh dispatch the matching path. The residual tier serves l2 and
    * cosine, like the plain tier (see `Pq.residualCosineChunk` for the
    * cosine table decomposition). With `retrain = false` the SAVED
    * formulation wins — the
    * documented post-vacuum recipe `enablePq(retrain = false)` re-encodes
    * a residual store as residual without restating the flag; only an
    * explicit `residual = true` against a saved PLAIN model errors
    * (switching formulations needs a retrain). */
  def enablePq(m: Int = 8, kCodes: Int = 64, trainSize: Int = 10000,
      retrain: Boolean = true, residual: Boolean = false): Unit = lease.withLease {
    require(hasRowsRecursive("historical"),
      "PQ tier requires a populated historical tier (run migrate first)")
    // part list FIRST, then the DataFrame (which pins its file listing at
    // creation): listed-after, a part appended during the (long) training
    // phase would be recorded as encoded without being encoded — rows
    // invisible to PQ search and to refreshPq's file-diff forever. Listed
    // first, a racing part is simply absent from the record and surfaces
    // through the delta scan. Same ordering as enableSq/enableBq.
    val histParts = listDataParts("historical")
    val hist = historical
    val dim = dimension.getOrElse(
      throw new IllegalStateException("store has no manifest dimension"))
    val reuse = !retrain && exists("pq_model")
    if (reuse)
      require(!residual || pqIsResidual,
        "saved pq_model is plain; retrain to switch to the residual formulation")
    val effResidual = if (reuse) pqIsResidual else residual
    // the residual steps (train + encode) share one centroid collect
    val cents =
      if (effResidual) Some(Pq.collectCentroids(centroids)) else None
    val model =
      if (!retrain && exists("pq_model")) Pq.load(spark, dir("pq_model"))
      else {
        val t = cents match {
          case Some(c) => Pq.trainResidual(
            hist.select(col("embedding"), col("cluster_id")), c,
            dim, m, kCodes, "embedding", trainSize, 42L)
          case None => Pq.train(hist, dim, m, kCodes, trainSize = trainSize)
        }
        Pq.save(spark, t, dir("pq_model"))
        // formulation flag as a JSON sidecar (manifest pattern): searches
        // read it per call, so it must be an FS read, never a Spark job
        writeText(new Path(path, "pq_flags.json"),
          mapper.writeValueAsString(
            mapper.createObjectNode().put("residual", effResidual)))
        t
      }
    val encCol = cents match {
      case Some(c) =>
        Pq.encodeResidual(model, c, col("embedding"), col("cluster_id"))
      case None => Pq.encode(model, col("embedding"))
    }
    val codes = hist.select(col("id"), col("vid"), col("ts"),
      col("cluster_id").cast("long").as("cluster_id"), encCol.as("codes"))
    storeWrite(codes.repartition(col("cluster_id"))).mode(SaveMode.Overwrite)
      .partitionBy("cluster_id").parquet(dir("pq_codes"))
    writePartList("pq_codes_files.json", histParts)
  }

  /** The persisted formulation flag of the saved PQ model (plain stores
    * written before the flag existed read as plain). An FS-sidecar read —
    * this sits on the search hot path, so it must never cost a Spark job. */
  private def pqIsResidual: Boolean = {
    val p = new Path(path, "pq_flags.json")
    fs.exists(p) && mapper.readTree(readText(p)).get("residual").asBoolean()
  }

  private def pqEncodeCol(model: Pq.PqModel, residual: Boolean) =
    if (residual)
      Pq.encodeResidual(model, centroids, col("embedding"), col("cluster_id"))
    else Pq.encode(model, col("embedding"))

  def hasPq: Boolean = exists("pq_model") && hasRowsRecursive("pq_codes")

  /** Incrementally encode the post-enable historical delta — rows
    * `migrate` appended after the last encode, found by the same (vid, ts)
    * anti-join the search-time delta scan uses — and append them to the
    * code table. One map-only pass over the delta reusing the saved
    * codebooks (no training), so post-migrate maintenance cost tracks the
    * migration batch, not the tier size — the 100 TB maintenance shape
    * (a full `enablePq` re-encode is only needed when `rebalance` moves
    * cluster assignments or `vacuum` spends the tombstones). Returns the
    * number of rows encoded. */
  def refreshPq(): Long = lease.withLease {
    require(hasPq, "PQ tier not built; call enablePq()")
    val model = Pq.load(spark, dir("pq_model"))
    val residual = pqIsResidual
    appendCodeDelta("pq_codes") { delta =>
      delta.select(col("id"), col("vid"), col("ts"),
        col("cluster_id").cast("long").as("cluster_id"),
        pqEncodeCol(model, residual).as("codes"))
    }
  }

  /** [[refreshPq]] for the u8 tier (model-free: the per-row affine params
    * make the delta encode a pure projection). */
  def refreshSq(): Long = lease.withLease {
    require(hasSq, "SQ tier not built; call enableSq()")
    appendCodeDelta("sq_codes") { delta =>
      delta.select(col("id"), col("vid"), col("ts"),
        col("cluster_id").cast("long").as("cluster_id"),
        graft.operators.Sq.encode(col("embedding")).as("sq"))
        .select(col("id"), col("vid"), col("ts"), col("cluster_id"),
          col("sq.codes").as("codes"), col("sq.vmin").as("vmin"),
          col("sq.vmax").as("vmax"))
    }
  }

  /** Shared delta-append of both refreshes: encode exactly the historical
    * part files appended since the last encode (the recorded-list
    * file-diff — `migrate` only ever appends parts to the tier) and append
    * their codes into the same cluster_id partition layout. No-delta runs
    * cost zero Spark jobs. Code tables written before the list existed
    * fall back to the (vid, ts) anti-join once, then record the list.
    * Tombstoned rows encode too (like `enablePq`/`enableSq`) — masking
    * stays a search-time concern, so refresh and full re-encode agree
    * row-for-row. */
  private def appendCodeDelta(codesDir: String)(
      enc: DataFrame => DataFrame): Long = {
    val sidecar = s"${codesDir}_files.json"
    val histSchema = vectorSchema.add(StructField("cluster_id", IntegerType))
    val current = listDataParts("historical")
    val delta = readPartList(sidecar) match {
      case Some(recorded) =>
        // diff against the SAME listing recorded below: a part appended
        // between two listings would be encoded but not recorded, then
        // re-encoded (duplicate code rows) on the next refresh
        newPartsDF("historical", recorded, histSchema, Some(current)) match {
          case None => writePartList(sidecar, current); return 0L
          case Some(df) => df
        }
      case None =>
        val existing = spark.read.parquet(dir(codesDir)).select("vid", "ts")
        historical.join(existing, Seq("vid", "ts"), "left_anti")
    }
    val d = enc(delta).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = d.count()
      if (n > 0) storeWrite(d.repartition(col("cluster_id"))).mode(SaveMode.Append)
        .partitionBy("cluster_id").parquet(dir(codesDir))
      // the codes now cover every part that existed when we listed
      writePartList(sidecar, current)
      n
    } finally d.unpersist()
  }

  /** Batch hybrid search serving the historical tier from its PQ codes:
    * coarse n_probe pruning on the code table (8 bytes/vector scanned in
    * probed partitions only), ADC shortlist, exact rerank against raw
    * vectors — [[Pq.searchBatchIvfPq]] composed with the store's
    * tombstones and post-encode delta. `metric` l2 or cosine (the ADC
    * tables switch between squared-L2 and inner-product cells); the
    * recent tier is scanned exactly as in [[searchBatch]]. `filterJson`
    * (X13): exact pre-filter on the raw-vector parts, k*3 oversample +
    * post-filter on the quantized part (the code scan has no metadata
    * column — reference semantics, `hybrid/core.rs:513-549`). */
  def searchBatchPq(queriesRaw: DataFrame, k: Int,
      nProbe: Int = config.nProbe, shortlist: Int = 100,
      recentK: Option[Int] = None, historicalK: Option[Int] = None,
      metric: String = "l2", filterJson: Option[String] = None,
      oversample: Int = 3, useRecentIndex: Boolean = false,
      recentEfSearch: Int = 100, recentProbeBlobs: Int = 0): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    require(hasPq, "PQ tier not built; call enablePq()")
    // localized ONCE here (not in codeTierSearch): the search lambda below
    // closes over `queries`, so the lambda and the shared composition must
    // see the same local relation
    val queries = localizeQueries(queriesRaw)
    val model = Pq.load(spark, dir("pq_model"))
    val residual = pqIsResidual
    codeTierSearch(queries, k, "pq_codes", recentK, historicalK, metric,
        filterJson, oversample, useRecentIndex, recentEfSearch,
        recentProbeBlobs) {
      (codes, hist, histK) =>
        // the oversampled filtered ask (histK = k*oversample) must not be
        // re-truncated by a smaller approximate shortlist upstream of it
        if (residual)
          // l2 AND cosine (the reference's default metric) both serve from
          // the residual tier — cosine via the per-query dot + per-cluster
          // norm table decomposition in Pq.residualCosineChunk
          Pq.searchBatchIvfPqResidual(
            codes.select(col("id"), col("cluster_id"), col("codes")),
            centroids, model, queries, histK, nProbe,
            math.max(shortlist, histK),
            rerank = Some(hist.select(col("id"), col("embedding"))),
            metric = metric)
        else Pq.searchBatchIvfPq(
          codes.select(col("id"), col("cluster_id"), col("codes")),
          centroids, model, queries, histK, nProbe,
          math.max(shortlist, histK),
          rerank = Some(hist.select(col("id"), col("embedding"))),
          metric = metric)
    }
  }

  // ---- OPQ (learned-rotation PQ, Ge et al. 2013) as a store artifact:
  // the anisotropic rung of the code ladder. Same 8-byte-code scan shape
  // as the PQ tier, but the codebooks quantize R*v for a jointly-trained
  // orthogonal rotation R, so a corpus whose variance concentrates in a
  // few dimensions keeps the ADC recall the plain tier wastes (measured
  // +19% rerank recall on the stretched corpus, SCALING.md). Maintenance
  // mirrors PQ exactly: model persisted (rotation rows + codebooks under
  // `opq_model`), delta refresh from the saved model, full re-encode
  // after rebalance/vacuum via `enableOpq(retrain = false)`. ----

  /** Encode the historical tier as OPQ codes at `opq_codes`,
    * cluster-partitioned like the tier so probed search stays
    * partition-pruned. Training (rotation + codebooks) runs on the same
    * bounded sample discipline as [[enablePq]]; the corpus encode is one
    * whole-stage-codegen projection (per-subspace [[graft.functions
    * .kernels.MatVec]] blocks + argmin — no row is rotated twice). Plain
    * formulation only: OPQ's rotation is the alternative to the residual
    * trick, so there is no residual flag here. */
  def enableOpq(m: Int = 8, kCodes: Int = 64, trainSize: Int = 10000,
      retrain: Boolean = true, iters: Int = 5): Unit = lease.withLease {
    require(hasRowsRecursive("historical"),
      "OPQ tier requires a populated historical tier (run migrate first)")
    val histParts = listDataParts("historical") // list-first: see enablePq
    val hist = historical
    val dim = dimension.getOrElse(
      throw new IllegalStateException("store has no manifest dimension"))
    val model =
      if (!retrain && hasOpqModel) Opq.load(spark, dir("opq_model"))
      else {
        val t = Opq.train(hist, dim, m, kCodes, trainSize = trainSize,
          iters = iters)
        Opq.save(spark, t, dir("opq_model"))
        t
      }
    // the staleness baseline: reconstruction MSE of a bounded sample of
    // the corpus the model was trained FOR, persisted beside the model.
    // Written on retrain (fresh model = fresh baseline) and backfilled
    // when a kept model (retrain=false) predates the stats sidecar —
    // that backfill measures the CURRENT corpus, the best available
    // proxy for the lost training-time one (noted in the probe contract)
    if (retrain || !exists("opq_model/train_stats")) {
      val probe = sampleEmbeddings(hist, OpqDriftSampleSize, seed = 7L)
      writeOpqTrainStats(Opq.reconstructionMse(model, probe), probe.length,
        trainSize, iters)
    }
    val codes = hist.select(col("id"), col("vid"), col("ts"),
      col("cluster_id").cast("long").as("cluster_id"),
      Opq.encode(model, col("embedding")).as("codes"))
    storeWrite(codes.repartition(col("cluster_id"))).mode(SaveMode.Overwrite)
      .partitionBy("cluster_id").parquet(dir("opq_codes"))
    writePartList("opq_codes_files.json", histParts)
  }

  // the OPQ model is two parquet tables under opq_model/ (codebooks +
  // rotation), so the _SUCCESS probe goes to the subdirs, not the parent.
  // Public: the REST index route's shape-preserving retrain dispatch
  // needs it (a saved model + no explicit shape => retrainOpq)
  def hasOpqModel: Boolean =
    exists("opq_model/codebooks") && exists("opq_model/rotation")

  def hasOpq: Boolean = hasOpqModel && hasRowsRecursive("opq_codes")

  /** Bounded sample of historical embeddings (the [[Opq.train]] collect
    * discipline: orderBy(rand).limit, never a full scan). */
  private def sampleEmbeddings(hist: DataFrame, n: Int,
      seed: Long): Array[Array[Float]] =
    hist.select(col("embedding")).orderBy(rand(seed)).limit(n)
      .collect().map(_.getSeq[Float](0).toArray)

  // the baseline MSE plus the TRAINING PARAMS it was achieved with —
  // trainSize/iters are not part of the model proper, but a
  // shape-preserving retrain must reproduce them or it silently degrades
  // training quality (the recentIndexBuildParams rule)
  private def writeOpqTrainStats(mse: Double, sampleN: Int,
      trainSize: Int, iters: Int): Unit = {
    import spark.implicits._
    Seq((mse, sampleN.toLong, trainSize, iters))
      .toDF("train_mse", "sample_n", "train_size", "iters").repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(dir("opq_model/train_stats"))
  }

  /** The OPQ rotation staleness probe: reconstruction MSE of a bounded
    * FRESH sample of the current historical tier under the SAVED model,
    * against the persisted training-time baseline. `refreshOpq` always
    * delta-encodes with the saved rotation (correct — codes must share
    * one space), so after heavy drift (many migrations/rebalances since
    * training) the rotation was learned on a corpus that no longer
    * exists and the tier's recall edge over plain PQ silently erodes;
    * the MSE ratio is the leading indicator. Guidance: alert at ratio ≥
    * [[VectorStore.OpqStaleRatioAlert]] (1.5 — reconstruction error half
    * again over baseline) and re-train via `enableOpq(retrain = true)`,
    * which re-encodes the whole tier in the new space and resets the
    * baseline. None when the tier isn't built or the model predates the
    * stats sidecar AND no enableOpq has backfilled it yet — "could not
    * verify", never a fake 1.0 (the -1 sentinel posture). */
  def opqRotationDrift(sampleSize: Int = OpqDriftSampleSize,
      seed: Long = 11L): Option[OpqDriftProbe] = {
    if (!hasOpq || !exists("opq_model/train_stats")) None
    else {
      val stats = spark.read.parquet(dir("opq_model/train_stats"))
        .select(col("train_mse")).head()
      val trainMse = stats.getDouble(0)
      val model = Opq.load(spark, dir("opq_model"))
      // wrong-dim rows are checkIntegrity's wrongDimCount class — the
      // probe skips them rather than turning a counted defect into a
      // scan-killing throw inside reconstructionMse
      val fresh = sampleEmbeddings(historical, sampleSize, seed)
        .filter(_.length == model.dim)
      if (fresh.isEmpty) None
      else {
        val freshMse = Opq.reconstructionMse(model, fresh)
        // a zero baseline (degenerate all-equal training corpus) makes
        // the ratio meaningless — report Inf only when fresh error is
        // real, 1.0 when both are zero (nothing drifted)
        val ratio =
          if (trainMse > 0.0) freshMse / trainMse
          else if (freshMse == 0.0) 1.0
          else Double.PositiveInfinity
        Some(OpqDriftProbe(trainMse, freshMse, ratio))
      }
    }
  }

  /** Re-train the OPQ tier with the parameters it was originally built
    * with — the drift-gate remediation: fresh rotation + codebooks on
    * the CURRENT corpus, full tier re-encode, staleness baseline reset.
    * Shape (m, code count) comes from the saved model and
    * trainSize/iters from the train_stats sidecar (the
    * [[recentIndexBuildParams]] rebuild-with-original-params rule), so a
    * policy-triggered retrain can never silently change the tier's code
    * geometry OR degrade its training quality; explicit overrides win.
    * A pre-param-sidecar model falls back to the enableOpq defaults. */
  def retrainOpq(trainSize: Option[Int] = None,
      iters: Option[Int] = None): Unit = {
    require(hasOpqModel, "no saved OPQ model to take the shape from; " +
      "call enableOpq() with explicit parameters instead")
    val model = Opq.load(spark, dir("opq_model"))
    val (savedTs, savedIt) =
      if (!exists("opq_model/train_stats")) (10000, 5)
      else {
        val df = spark.read.parquet(dir("opq_model/train_stats"))
        if (df.columns.contains("train_size")) {
          val r = df.select(col("train_size"), col("iters")).head()
          (r.getInt(0), r.getInt(1))
        } else (10000, 5) // pre-param sidecar: best available
      }
    enableOpq(m = model.pq.m, kCodes = model.pq.k,
      trainSize = trainSize.getOrElse(savedTs), retrain = true,
      iters = iters.getOrElse(savedIt))
  }

  /** [[refreshPq]] for the OPQ tier: encode the post-enable historical
    * delta with the saved rotation + codebooks and append. */
  def refreshOpq(): Long = lease.withLease {
    require(hasOpq, "OPQ tier not built; call enableOpq()")
    val model = Opq.load(spark, dir("opq_model"))
    appendCodeDelta("opq_codes") { delta =>
      delta.select(col("id"), col("vid"), col("ts"),
        col("cluster_id").cast("long").as("cluster_id"),
        Opq.encode(model, col("embedding")).as("codes"))
    }
  }

  /** Batch hybrid search serving the historical tier from its OPQ codes:
    * [[graft.operators.Opq.searchBatchIvf]] (raw-space coarse probe +
    * rotated-query ADC + raw exact rerank) composed with the store's
    * tombstones and post-encode delta, exactly like [[searchBatchPq]].
    * `filterJson` as there: exact pre-filter on raw parts, k*`oversample`
    * + post-filter on the codes. */
  def searchBatchOpq(queriesRaw: DataFrame, k: Int,
      nProbe: Int = config.nProbe, shortlist: Int = 100,
      recentK: Option[Int] = None, historicalK: Option[Int] = None,
      metric: String = "l2", filterJson: Option[String] = None,
      oversample: Int = 3, useRecentIndex: Boolean = false,
      recentEfSearch: Int = 100, recentProbeBlobs: Int = 0): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    require(hasOpq, "OPQ tier not built; call enableOpq()")
    // see searchBatchPq: one local relation shared by lambda + composition
    val queries = localizeQueries(queriesRaw)
    val model = Opq.load(spark, dir("opq_model"))
    codeTierSearch(queries, k, "opq_codes", recentK, historicalK, metric,
        filterJson, oversample, useRecentIndex, recentEfSearch,
        recentProbeBlobs) {
      (codes, hist, histK) =>
        // same shortlist floor as searchBatchPq: the oversampled ask wins
        Opq.searchBatchIvf(
          codes.select(col("id"), col("cluster_id"), col("codes")),
          centroids, model, queries, histK, nProbe,
          math.max(shortlist, histK),
          rerank = Some(hist.select(col("id"), col("embedding"))),
          metric = metric)
    }
  }

  /** Shared composition of every code-tier serving path (PQ / SQ): exact
    * scan of the live recent tier, `search` over the (tombstone-masked)
    * code table, exact scan of the post-encode historical delta — rows
    * `migrate` appended after the encode, found by (vid, ts) anti-join —
    * merged into one per-query top-k. Keeping it in one place keeps the
    * tombstone/delta semantics of the two quantized tiers identical. */
  private def codeTierSearch(queries: DataFrame, k: Int, codesDir: String,
      recentK: Option[Int], historicalK: Option[Int],
      metric: String = "l2", filterJson: Option[String] = None,
      oversample: Int = 3, useRecentIndex: Boolean = false,
      recentEfSearch: Int = 100, recentProbeBlobs: Int = 0)(
      search: (DataFrame, DataFrame, Int) => DataFrame): DataFrame = {
    // recent tier: saved-HNSW when requested (the steady-state serving
    // shape — code tier AND graph tier both from artifacts), else an exact
    // scan. Raw-vector parts carry metadata, so a filter pre-filters them
    // exactly like the un-quantized searchBatch.
    val recPart =
      if (useRecentIndex) indexedRecentPart(queries, recentK.getOrElse(k),
        metric, filterJson, recentEfSearch, recentProbeBlobs)
      else {
        val rec = filterJson match {
          case None => dropTombstoned(recent).select(col("id"), col("embedding"))
          case Some(_) => applyMetaOverlay(dropTombstoned(recent))
            .select(col("id"), col("embedding"), col("metadata"))
        }
        Knn.batch(rec, queries, recentK.getOrElse(k), metric,
            filterJson = filterJson)
          .select(col("query_id"), col("id"), col("distance"))
      }
    val codesRaw = spark.read.schema(codesSchema(codesDir)).parquet(dir(codesDir))
    val codes = dropTombstoned(codesRaw)
    val hist = dropTombstoned(historical)
    val histK = historicalK.getOrElse(k)
    // the code table carries no metadata: filtered search uses the
    // reference's k*3 oversample + post-filter (hybrid/core.rs:513-549) —
    // rank k*oversample candidates through the quantized scan + exact
    // rerank, then drop non-matching ones against the overlay-aware
    // metadata. A highly selective filter can return fewer than k
    // code-tier hits — raise `oversample` toward 1/selectivity (the
    // reference's filtered-search guidance, PERFORMANCE_TUNING.md:243-249)
    // or use searchBatch's pushed pre-filter path for exact-k semantics.
    val codeK = if (filterJson.isDefined) histK * oversample else histK
    val codeRaw = search(codes, hist, codeK)
      .select(col("query_id"), col("id"), col("distance"))
    val codePart = filterJson match {
      case None => codeRaw
      case Some(f) =>
        // candidates are bounded (|queries| x k*3): broadcast them into the
        // metadata lookup instead of shuffling the tier
        applyMetaOverlay(hist).select(col("id"), col("metadata"))
          .join(broadcast(codeRaw), Seq("id"))
          .filter(FilterJson.predicate(f, col("metadata")))
          .select(col("query_id"), col("id"), col("distance"))
    }
    // post-encode delta: the file-diff against the encode-time record —
    // no plan at all when migrate hasn't appended since (the common case);
    // pre-record code tables fall back to the (vid, ts) anti-join
    val histSchema = vectorSchema.add(StructField("cluster_id", IntegerType))
    val deltaBaseOpt = readPartList(s"${codesDir}_files.json") match {
      case Some(recorded) =>
        newPartsDF("historical", recorded, histSchema)
          .map(df => dropTombstoned(df))
      case None =>
        Some(hist.join(codesRaw.select("vid", "ts"), Seq("vid", "ts"), "left_anti"))
    }
    val parts = deltaBaseOpt match {
      case None => Seq(recPart, codePart)
      case Some(deltaBase) =>
        val delta = filterJson match {
          case None => deltaBase.select(col("id"), col("embedding"))
          case Some(_) => applyMetaOverlay(deltaBase)
            .select(col("id"), col("embedding"), col("metadata"))
        }
        Seq(recPart, codePart,
          Knn.batch(delta, queries, histK, metric, filterJson = filterJson)
            .select(col("query_id"), col("id"), col("distance")))
    }
    mergeTiers(k, parts: _*)
  }

  /** Merge per-tier candidate streams into the final per-query top-k —
    * the shared tail of every approximate serving path. */
  private def mergeTiers(k: Int, parts: DataFrame*): DataFrame = {
    val topk = TopK.topKStr(k)
    parts.reduce(_ unionByName _)
      .groupBy("query_id")
      .agg(topk(col("id"), col("distance")).as("hits"))
      .select(col("query_id"), explode(col("hits")).as("hit"))
      .select(col("query_id"), col("hit.id").as("id"), col("hit.dist").as("distance"))
  }

  // ---- u8 scalar quantization as a store artifact (M11 at the storage
  // tier; the reference keeps SQ utility-only, core/vector_ops.rs:349-387 —
  // here it parallels the PQ tier with 4x-smaller codes and NO training
  // state: the affine params ride with each row) ----

  /** Encode the historical tier as per-vector-affine u8 codes at
    * `sq_codes` (codes BINARY = dim bytes, vmin/vmax FLOAT),
    * cluster-partitioned like the tier itself so probed search stays
    * partition-pruned. Codes carry (vid, ts) so tombstones and the
    * post-`migrate` delta compose at search time. Model-free: re-enabling
    * after vacuum/rebalance is one map-only pass, no training. */
  def enableSq(): Unit = lease.withLease {
    require(hasRowsRecursive("historical"),
      "SQ tier requires a populated historical tier (run migrate first)")
    val histParts = listDataParts("historical") // see enablePq
    val codes = historical
      .select(col("id"), col("vid"), col("ts"),
        col("cluster_id").cast("long").as("cluster_id"),
        graft.operators.Sq.encode(col("embedding")).as("sq"))
      .select(col("id"), col("vid"), col("ts"), col("cluster_id"),
        col("sq.codes").as("codes"), col("sq.vmin").as("vmin"),
        col("sq.vmax").as("vmax"))
    storeWrite(codes.repartition(col("cluster_id"))).mode(SaveMode.Overwrite)
      .partitionBy("cluster_id").parquet(dir("sq_codes"))
    writePartList("sq_codes_files.json", histParts)
  }

  def hasSq: Boolean = hasRowsRecursive("sq_codes")

  /** Batch hybrid search serving the historical tier from its u8 codes:
    * coarse n_probe pruning on the code table (dim bytes/vector scanned in
    * probed partitions only), dequantize-on-the-fly shortlist, exact rerank
    * against raw vectors — [[graft.operators.Sq.searchBatchIvfSq]] composed
    * with the store's tombstones and post-encode delta. `metric` l2 or
    * cosine (the fused kernel switches between asymmetric L2 and
    * dequantized cosine); the recent tier is scanned exactly as in
    * [[searchBatch]]. `filterJson` as in [[searchBatchPq]]: exact
    * pre-filter on raw parts, k*3 oversample + post-filter on the codes. */
  def searchBatchSq(queriesRaw: DataFrame, k: Int,
      nProbe: Int = config.nProbe, shortlist: Int = 100,
      recentK: Option[Int] = None, historicalK: Option[Int] = None,
      metric: String = "l2", filterJson: Option[String] = None,
      oversample: Int = 3, useRecentIndex: Boolean = false,
      recentEfSearch: Int = 100, recentProbeBlobs: Int = 0): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    require(hasSq, "SQ tier not built; call enableSq()")
    // see searchBatchPq: one local relation shared by lambda + composition
    val queries = localizeQueries(queriesRaw)
    codeTierSearch(queries, k, "sq_codes", recentK, historicalK, metric,
        filterJson, oversample, useRecentIndex, recentEfSearch,
        recentProbeBlobs) {
      (codes, hist, histK) =>
        // same shortlist floor as searchBatchPq: the oversampled ask wins
        graft.operators.Sq.searchBatchIvfSq(
          codes.select(col("id"), col("cluster_id"), col("codes"),
            col("vmin"), col("vmax")),
          centroids, queries, histK, nProbe,
          math.max(shortlist, histK),
          rerank = Some(hist.select(col("id"), col("embedding"))),
          metric = metric)
    }
  }

  // ---- binary (sign-bit) quantization as a store artifact: the coarsest
  // rung of the PQ/SQ/BQ code ladder — dim/8 bytes per row, integer-only
  // Hamming scan, model-free like SQ (re-enable after maintenance is one
  // map-only pass) ----

  /** Encode the historical tier as packed sign-bit words at `bq_codes`
    * (words ARRAY<LONG>, 32 bits used per word), cluster-partitioned like
    * the tier so probed search stays partition-pruned. Codes carry
    * (vid, ts) so tombstones and the post-`migrate` delta compose at
    * search time, same as the PQ/SQ tables. */
  def enableBq(): Unit = lease.withLease {
    require(hasRowsRecursive("historical"),
      "BQ tier requires a populated historical tier (run migrate first)")
    val d = dimension.getOrElse(throw new IllegalStateException(
      "store has no recorded dimension; insert before enableBq"))
    val histParts = listDataParts("historical")
    val codes = historical
      .select(col("id"), col("vid"), col("ts"),
        col("cluster_id").cast("long").as("cluster_id"),
        graft.operators.Bq.encode(col("embedding"), d).as("words"))
    storeWrite(codes.repartition(col("cluster_id"))).mode(SaveMode.Overwrite)
      .partitionBy("cluster_id").parquet(dir("bq_codes"))
    writePartList("bq_codes_files.json", histParts)
  }

  def hasBq: Boolean = hasRowsRecursive("bq_codes")

  /** [[refreshPq]] for the sign-bit tier (model-free delta encode). */
  def refreshBq(): Long = lease.withLease {
    require(hasBq, "BQ tier not built; call enableBq()")
    val d = dimension.getOrElse(throw new IllegalStateException(
      "store has no recorded dimension"))
    appendCodeDelta("bq_codes") { delta =>
      delta.select(col("id"), col("vid"), col("ts"),
        col("cluster_id").cast("long").as("cluster_id"),
        graft.operators.Bq.encode(col("embedding"), d).as("words"))
    }
  }

  /** Batch hybrid search serving the historical tier from its sign-bit
    * codes: probed xor+popcount scan ([[graft.operators.Bq.searchBatchIvfBq]])
    * + exact rerank, composed with the store's tombstones and post-encode
    * delta exactly like [[searchBatchSq]]. */
  def searchBatchBq(queriesRaw: DataFrame, k: Int,
      nProbe: Int = config.nProbe, shortlist: Int = 100,
      recentK: Option[Int] = None, historicalK: Option[Int] = None,
      metric: String = "l2", filterJson: Option[String] = None,
      oversample: Int = 3, useRecentIndex: Boolean = false,
      recentEfSearch: Int = 100, recentProbeBlobs: Int = 0): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    require(hasBq, "BQ tier not built; call enableBq()")
    val d = dimension.getOrElse(throw new IllegalStateException(
      "store has no recorded dimension"))
    val queries = localizeQueries(queriesRaw)
    codeTierSearch(queries, k, "bq_codes", recentK, historicalK, metric,
        filterJson, oversample, useRecentIndex, recentEfSearch,
        recentProbeBlobs) {
      (codes, hist, histK) =>
        graft.operators.Bq.searchBatchIvfBq(
          codes.select(col("id"), col("cluster_id"), col("words")),
          centroids, queries, d, histK, nProbe,
          math.max(shortlist, histK),
          rerank = Some(hist.select(col("id"), col("embedding"))),
          metric = metric)
    }
  }
}

object VectorStore {
  /** Bumped to 4 when vid became the full 64-hex sha256 (was 8-hex
    * truncated): a v3 store's stored vids never match freshly computed
    * ones, so mutations would silently miss — fail loudly at open instead. */
  val FormatVersion = 4 // reference manifest version analog (chunk.rs:30)
  /** Oldest manifest version this code still reads. Bump only when a
    * layout change actually drops read support for the previous one. */
  val MinFormatVersion = 4

  /** The version gate, the reference's direction (`chunk.rs:296-301`,
    * `hybrid/persistence.rs:94-100`): only a FUTURE version is rejected
    * outright — it was written by a newer engine; older versions read
    * down to the oldest layout this code supports. One definition shared
    * by readManifest and [[open]]'s pre-construction check. */
  private[store] def gateVersion(v: Int): Unit = {
    if (v > FormatVersion)
      throw new IllegalStateException(
        s"store version $v was written by a newer engine (this one reads <= $FormatVersion)")
    if (v < MinFormatVersion)
      throw new IllegalStateException(
        s"store version $v predates the oldest readable layout $MinFormatVersion")
  }

  case class Config(
      recentThresholdSeconds: Long = 7L * 24 * 3600, // hybrid/core.rs:76-84
      nClusters: Int = 256,
      nProbe: Int = 16,
      chunkSize: Int = 10000, // rows per parquet file (chunk.rs 10K analog)
      // cap on id lists returned by delete/deleteByMetadata: the count is
      // always exact, but a filter matching 10^9 rows must not OOM the
      // driver for the sake of echoing every id back
      maxReturnedIds: Int = 10000,
      // single-writer lease TTL: a lease older than this is presumed a
      // crashed writer's and may be broken (see graft.core.WriterLease);
      // sized to bound the longest store mutation (full-tier compaction)
      leaseTtlMs: Long = 30L * 60 * 1000)

  /** Executor-side schema validator for [[VectorStore.insertDF]]: the
    * schema travels as its JSON string (JsonNode serializability is a
    * Jackson implementation detail) and parses once per JVM. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, MetadataSchema.Schema]()
  private[store] def schemaErrUdf(schemaJson: String) =
    udf { (m: String) =>
      schemaCache.computeIfAbsent(schemaJson, j => MetadataSchema.parse(j))
        .validate(Option(m)).orNull
    }

  case class Manifest(version: Int, dim: Int)

  /** Three-way classification of a recorded `files` part list (see
    * `recordedFiles`): Absent = pre-list-era artifact (coverage unknown,
    * fall back); Malformed = unusable sidecar (search degrades, the
    * integrity scan fails loudly); Files = the usable list. */
  private[store] sealed trait RecordedList
  private[store] object RecordedList {
    case object Absent extends RecordedList
    /** `reason` names the shape that failed (root type / null / node
      * type), so the integrity scan's error can say WHICH defect the
      * operator is looking at instead of enumerating possibilities. */
    case class Malformed(reason: String) extends RecordedList
    case class Files(parts: Seq[String]) extends RecordedList
  }

  /** Open an EXISTING store restoring its persisted configuration — the
    * reference's `load_index` (`hybrid/persistence.rs:696-740`), which
    * reconstructs the index from `metadata.config` rather than a
    * caller-supplied one. The constructor stays the explicit-config path
    * (its `load_index_chunked(path, config)` analog); use this when the
    * caller should NOT have to know how the store was configured — a
    * serving process reopening a store built by an ingest job must not
    * reclassify tiers because it guessed a different threshold. Fields a
    * pre-upgrade manifest lacks fall back to the defaults it was built
    * under. Fails if no manifest exists (the reference's
    * MissingComponent("metadata")): an empty path has no configuration to
    * restore — initialize through the constructor instead. */
  def open(spark: org.apache.spark.sql.SparkSession, path: String): VectorStore = {
    val p = new Path(path, "manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new IllegalStateException(
      s"no manifest at $path: open() restores a persisted config; " +
        "initialize a new store with the constructor")
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val d = Config()
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    // gate BEFORE constructing: the constructor runs swap recovery, and an
    // engine that declares itself incompatible with this store's version
    // must not finish a newer engine's in-flight swap with its own logic
    gateVersion(n.path("version").asInt(FormatVersion))
    val st = new VectorStore(spark, path, Config(
      recentThresholdSeconds =
        n.path("recentThresholdSeconds").asLong(d.recentThresholdSeconds),
      nClusters = n.path("nClusters").asInt(d.nClusters),
      nProbe = n.path("nProbe").asInt(d.nProbe),
      chunkSize = n.path("chunkSize").asInt(d.chunkSize),
      maxReturnedIds = n.path("maxReturnedIds").asInt(d.maxReturnedIds),
      leaseTtlMs = n.path("leaseTtlMs").asLong(d.leaseTtlMs)))
    st
  }

  /** Insert-batch record; tsString optional ISO timestamp (defaults now). */
  case class VectorRecord(id: String, embedding: Array[Float],
      metadata: Option[String] = None, tsString: Option[String] = None)

  case class InsertResult(inserted: Long, duplicates: Long,
      insertedIds: Seq[String] = Nil)
  case class DeleteResult(deletedCount: Long, deletedIds: Seq[String])
  case class VacuumResult(recentRemoved: Long, historicalRemoved: Long)
  case class Stats(recentCount: Long, historicalCount: Long, tombstoneCount: Long)
  /** [[VectorStore.health]] snapshot: `connected` = store root reachable,
    * `strandedSwapMarkers` = tiers with a swap marker present (crash
    * evidence awaiting recovery, or a live writer mid-commit),
    * `leaseOwner`/`leaseAgeMs` = current writer-lease holder if any,
    * `swapLockAgesMs` = age of any swap lock file per tier (a large value
    * with a persisting marker is a wedged recovery). */
  case class Health(connected: Boolean, manifestReadable: Boolean,
      strandedSwapMarkers: Seq[String], leaseOwner: Option[String],
      leaseAgeMs: Option[Long], swapLockAgesMs: Map[String, Long])
  /** [[VectorStore.checkHealth]] report — the reference `HealthReport`
    * field set (`hybrid/maintenance.rs:233-242`) with `status` as its
    * lower-cased enum name ("healthy"/"warning"; the reference's
    * Critical/Unknown variants are never produced by its own check
    * either). */
  case class HealthReport(status: String, recentIndexOk: Boolean,
      historicalIndexOk: Boolean, migrationBacklog: Long,
      searchLatencyOk: Boolean, memoryUsageOk: Boolean, issues: Seq[String])
  /** [[VectorStore.checkIntegrity]] result — the reference
    * `IntegrityCheckResult` (`ivf/persistence.rs:507-515`) restated over
    * this store's invariants: `codeTierDrift(tier) = (missing, orphaned)`
    * is its expected-vs-found comparison per code tier;
    * `invalidClusterCount` is its `missing_clusters` seen from the row
    * side (rows addressing no centroid). `duplicateIdCount` counts ids
    * duplicated WITHIN a tier (a hard defect, gated by `isComplete`);
    * `crossTierDuplicateCount` counts ids live in both tiers — transient
    * when the scan races a migrate() between its two tier swaps, so it is
    * reported but NOT folded into `isComplete` (alert only if it persists
    * across scans with no migration running). r13 adds the saved-HNSW
    * part-list probe (FS metadata only): `recentIndexStaleParts` = tier
    * parts the index's recorded list doesn't cover (normal — the delta
    * scan serves them; a large count is a rebuild hint),
    * `recentIndexMissingParts` = recorded-covered parts no longer in the
    * tier (the index then serves rows the tier no longer holds). Missing
    * shares the cross-tier dup count's alerting contract: this lease-free
    * scan racing a migrate()/vacuum() between its tier swap and its index
    * invalidation sees a transient non-zero, so NEITHER probe gates
    * `isComplete` — alert on a missing count that persists across scans
    * with no maintenance running. Both 0 when no index is built; both -1
    * (the coverage-UNKNOWN sentinel, distinct from verified-zero so a
    * persistence monitor never resets on an unverifiable scan) when the
    * index predates recorded part lists or vanished mid-probe; a
    * meta.json that exists but is unparseable or MALFORMED (non-object
    * root, `files` null/non-array) fails the scan loudly — a persistent
    * defect, not a race. The search path degrades to the anti-join delta
    * on a malformed `files` list (serving survives what the admin scan
    * flags); an UNPARSEABLE meta.json fails search too, since it is
    * load-bearing for the index metric. */
  /** [[VectorStore.opqRotationDrift]] result: training-baseline vs
    * fresh-sample reconstruction MSE under the saved OPQ model, and
    * their ratio (the staleness measurable; alert guidance at
    * [[OpqStaleRatioAlert]]). */
  case class OpqDriftProbe(trainMse: Double, freshMse: Double, ratio: Double)

  /** Bounded sample size for the OPQ train-baseline and drift probes. */
  val OpqDriftSampleSize: Int = 2000

  /** Documented alert threshold for [[VectorStore.opqRotationDrift]]'s
    * MSE ratio: at 1.5 the saved rotation reconstructs the current
    * corpus half again worse than its training baseline — re-train via
    * `enableOpq(retrain = true)`. Advisory (never folded into
    * `isComplete`): drift erodes recall, it does not corrupt data. */
  val OpqStaleRatioAlert: Double = 1.5

  case class IntegrityReport(hasManifest: Boolean, hasCentroids: Boolean,
      liveRecent: Long, liveHistorical: Long, wrongDimCount: Long,
      duplicateIdCount: Long, crossTierDuplicateCount: Long,
      invalidClusterCount: Long,
      codeTierDrift: Map[String, (Long, Long)],
      recentIndexStaleParts: Long, recentIndexMissingParts: Long,
      // OPQ rotation staleness (fresh/train reconstruction-MSE ratio;
      // -1 = no OPQ tier or baseline unknown this scan — never a fake
      // healthy 1.0). Advisory like the index part probes: alert at
      // ratio >= OpqStaleRatioAlert and retrain
      opqRotationMseRatio: Double = -1.0,
      isComplete: Boolean,
      // the r14 confirm pass (checkIntegrity(confirmTransients = true)):
      // transientsConfirmed = the re-probe RAN after the writer lease
      // quiesced; the confirmed counts are the transient-class defects
      // present in BOTH observations (−1 = not confirmed: not requested,
      // writer stayed live past the wait, or index coverage unknown on
      // either side). isComplete never folds these in — the transient
      // classes stay non-gating; the confirmed counts are what an
      // operator alerts on instead of eyeballing scan-over-scan
      transientsConfirmed: Boolean = false,
      confirmedCrossTierDuplicateCount: Long = -1L,
      confirmedRecentIndexMissingParts: Long = -1L)
  /** Persisted rebalance counters (RebalanceStatistics analog,
    * `hybrid/maintenance.rs:115-119`). */
  case class MaintenanceStats(totalRebalances: Long, totalVectorsMoved: Long,
      lastClustersModified: Long = 0L)

  /** VectorId analog (M14, `types.rs:12-34`): "vec_" + the full 256-bit
    * content hash (sha2 here; blake3 byte-compat is irrelevant to
    * capability parity). The reference's identity is the full 32-byte
    * hash too — its 8-hex `to_string()` is a display form only; using a
    * truncated hash as the dedup/delete identity key would collide with
    * ~50% probability at just ~77K distinct ids. */
  def vidExpr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("vec_"), sha2(id.cast("string"), 256))

  /** The reference's short display form (`types.rs: to_string`). */
  def vidDisplay(vid: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(substring(vid, 1, 12)) // "vec_" + 8 hex chars

  val vectorSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("vid", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = false),
    StructField("metadata", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)))

  val tombSchema: StructType = StructType(Seq(
    StructField("vid", StringType, nullable = false),
    StructField("deleted_at", TimestampType, nullable = false)))

  val metaUpdateSchema: StructType = StructType(Seq(
    StructField("vid", StringType, nullable = false),
    StructField("metadata", StringType, nullable = true),
    StructField("updated_at", TimestampType, nullable = false)))

  val centroidSchema: StructType = StructType(Seq(
    StructField("cluster_id", IntegerType, nullable = false),
    StructField("centroid", ArrayType(FloatType), nullable = true)))

  /** recent_index/data layout (buildRecentIndex): the tier row plus the
    * dense LONG surrogate the graph kernel keys on. */
  val recentIndexSchema: StructType =
    vectorSchema.add(StructField("lid", LongType, nullable = false))

  /** Code-table layouts: shared (id, vid, ts, cluster_id) plus the
    * tier-specific payload. cluster_id is the partition directory column. */
  def codesSchema(codesDir: String): StructType = {
    val base = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("vid", StringType, nullable = false),
      StructField("ts", TimestampType, nullable = false)))
    val payload =
      if (codesDir.startsWith("sq")) Seq(
        StructField("codes", BinaryType, nullable = true),
        StructField("vmin", FloatType, nullable = true),
        StructField("vmax", FloatType, nullable = true))
      else if (codesDir.startsWith("bq")) // packed sign bits, 32/word
        Seq(StructField("words", ArrayType(LongType), nullable = true))
      else // PQ: one int sub-code per subspace
        Seq(StructField("codes", ArrayType(IntegerType), nullable = true))
    StructType(base ++ payload :+ StructField("cluster_id", LongType, nullable = true))
  }
}
