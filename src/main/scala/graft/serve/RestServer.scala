package graft.serve

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.store.VectorStore
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Thin REST serving surface over [[VectorStore]] — the reference's primary
  * user API re-served from the Spark driver
  * (`/root/reference/src/api/rest.rs:325-677`), completing capability
  * parity for a user who talks to the store over HTTP.
  *
  * Deliberately thin: one JDK HttpServer (no extra dependency), JSON via
  * the same Jackson the store already uses, and every operation delegates
  * to the one VectorStore instance — the Spark session is shared across
  * requests (no Spark-per-request), exactly the "driver app in front of
  * the engine" shape SURVEY.md assigns to S11.
  *
  * Routes (reference rest.rs:327-342 — including working SSE and WebSocket
  * forms of its declared-but-vestigial update stream):
  *
  *   GET    /api/v1/health
  *   POST   /api/v1/vectors            {id, vector, metadata?}
  *   POST   /api/v1/vectors/batch      {vectors: [{id, vector, metadata?}]}
  *   GET    /api/v1/vectors/{id}
  *   DELETE /api/v1/vectors/{id}
  *   POST   /api/v1/search             {vector, k?, filter?, options?:
  *                                      {include_metadata?, include_vectors?,
  *                                       score_threshold?, metric?, mode?,
  *                                       oversample?, selectivity?,
  *                                       probe_blobs?, search_recent?,
  *                                       search_historical?, ivf_n_probe?,
  *                                       hnsw_ef?, timeout_ms? (ignored)}}
  *                                      — mode:
  *                                      exact | recent_index | pq | sq | bq
  *                                      (serving path); probe_blobs routes a
  *                                      ROUTED saved recent index; the
  *                                      search_recent/search_historical/
  *                                      ivf_n_probe/hnsw_ef names are the
  *                                      reference's SearchOptions
  *                                      (rest.rs:104-113) and behave the
  *                                      same (tier selection, probe depth).
  *                                      Response: {results: [{id, distance,
  *                                      score, metadata?, vector?}],
  *                                      total_count, query_time_ms,
  *                                      search_time_ms, indices_searched,
  *                                      partial_results,
  *                                      cached?} — metadata present iff
  *                                      include_metadata, vector (the stored
  *                                      embedding payload, session.rs:
  *                                      266-281) iff include_vectors
  *   GET    /api/v1/admin/statistics
  *   GET    /api/v1/admin/integrity?confirm=true&confirm_wait_ms=N —
  *                                      confirm=true re-probes the transient
  *                                      defect classes after the writer
  *                                      lease quiesces and reports the
  *                                      persisting ones; the quiesce wait
  *                                      (default 2 s, clamped ≤ 10 s) runs
  *                                      on the serial dispatcher
  *   GET    /api/v1/admin/frequent-items — flat OR grouped OR windowed
  *                                      (the selection ladder; the
  *                                      windowed rung is "trending now":
  *                                      window/ring_depth + the ring-
  *                                      merged MG candidates over the
  *                                      newest N batches); POST recount
  *                                      on a windowed fold is a named
  *                                      409 (the corpus cannot
  *                                      reproduce the window)
  *   GET    /api/v1/admin/histogram?probs=0.5,0.9&bins=true&verify=true —
  *                                      the folded streaming exact-histogram
  *                                      state: rank-exact quantile estimates
  *                                      (value resolution = one bin width),
  *                                      linearizable locked read, with the
  *                                      out_of_range_mass_fraction alert
  *                                      (binning_warning past the threshold);
  *                                      verify=true recounts the per-(group,)
  *                                      bin cells one-shot over the
  *                                      operator-configured source corpus
  *                                      (histogramSourceDir; admin-gated, no
  *                                      client paths) and reports cell-level
  *                                      parity against the same snapshot.
  *                                      Selection ladder: flat → grouped →
  *                                      WINDOWED (the sliding-window rung
  *                                      serves the ring aggregate's
  *                                      quantiles; its verify is a named
  *                                      409 — an all-time recount cannot
  *                                      reproduce a window)
  *   POST   /api/v1/admin/histogram/from-sample {n_bins?, coverage?,
  *                                      group?} — derive a [lo, hi)
  *                                      binning from the standing sample
  *                                      fold's carried values
  *                                      (HistogramSketch.fromSample); the
  *                                      spec an operator passes to a new
  *                                      histogram fold. Derives only —
  *                                      stream lifecycle stays with the
  *                                      operator's driver app. 'group'
  *                                      required when the sample fold is
  *                                      grouped
  *   GET    /api/v1/admin/sample?group=NAME&verify=true — the folded
  *                                      deterministic bottom-k sample,
  *                                      flat OR grouped (the family's
  *                                      selection rule: one state dir,
  *                                      flat wins ties); ids + carried
  *                                      values via the linearizable
  *                                      locked read; exact — a pure
  *                                      function of the corpus. ?group
  *                                      selects one group's sample from a
  *                                      grouped fold (404 if the group
  *                                      was never folded); ?verify=true
  *                                      recomputes the (per-group)
  *                                      bottom-k one-shot over the
  *                                      operator-configured source corpus
  *                                      (sampleSourceDir; admin-gated, no
  *                                      client paths) and reports
  *                                      entry-level parity against the
  *                                      same snapshot
  *   GET    /api/v1/admin/moments?group=NAME&verify=true — the folded
  *                                      streaming exact-moments state
  *                                      (count/nulls/min/max + exact
  *                                      integer sums as strings; mean/
  *                                      stddev_pop derived), flat OR
  *                                      grouped OR windowed (the
  *                                      family's selection ladder: flat
  *                                      → grouped → windowed, one state
  *                                      dir, earlier rungs win ties),
  *                                      linearizable locked read.
  *                                      ?group selects one group (404 if
  *                                      never folded); ?verify=true
  *                                      recomputes the (per-group)
  *                                      moments one-shot over the
  *                                      operator-configured source corpus
  *                                      (momentsSourceDir; admin-gated,
  *                                      no client paths) and reports
  *                                      number-level parity against the
  *                                      same snapshot
  *   GET    /api/v1/admin/distinct?group=NAME&verify=true — the folded
  *                                      streaming distinct-count state
  *                                      (exact row/null counters + the
  *                                      HLL estimate), flat OR grouped
  *                                      OR windowed (the selection
  *                                      ladder: flat → grouped →
  *                                      windowed, earlier rungs win
  *                                      ties), linearizable locked
  *                                      read; ?group selects one group;
  *                                      ?verify=true rebuilds the
  *                                      one-shot sketch over the
  *                                      operator-configured source
  *                                      corpus (distinctSourceDir) and
  *                                      compares canonical estimates +
  *                                      exact counters against the same
  *                                      snapshot (409 on a windowed
  *                                      fold — the corpus cannot
  *                                      reproduce the window)
  *   GET    /api/v1/admin/comoments?group=NAME&verify=true — the folded
  *                                      streaming exact CO-moments state
  *                                      (counts/per-axis nulls/min/max +
  *                                      the five exact integer sums as
  *                                      strings; mean_x/mean_y/
  *                                      covariance_pop/correlation
  *                                      derived), flat OR grouped,
  *                                      linearizable locked read; ?group
  *                                      selects one group; ?verify=true
  *                                      recomputes the (per-group) pair
  *                                      statistics one-shot over the
  *                                      operator-configured source corpus
  *                                      (comomentsSourceDir) and reports
  *                                      number-level parity against the
  *                                      same snapshot
  *   GET    /api/v1/admin/profile    — the ONE-POLL monitor face: every
  *                                      configured profiling face's
  *                                      headline envelope (liveness +
  *                                      the drift number) in a single
  *                                      response; per-face linearizable
  *                                      locked reads (NOT atomic across
  *                                      faces — each carries its own
  *                                      last_batch_id), per-face named
  *                                      errors instead of a whole-poll
  *                                      500, 404 when no face is
  *                                      configured
  *   POST   /api/v1/admin/frequent-items/recount {denominator} — the EXACT
  *                                      face of the folded stream state: a
  *                                      Spark recount of the candidates over
  *                                      the operator-configured source
  *                                      corpus (frequentItemsSourceDir;
  *                                      admin-gated, no client paths)
  *   POST   /api/v1/admin/migrate
  *   POST   /api/v1/admin/vacuum
  *   POST   /api/v1/admin/rebalance   {max_cluster_size?}
  *   POST   /api/v1/admin/index/recent {ef_construction?, m?, metric?}
  *   POST   /api/v1/admin/index/pq     {m?, k_codes?, train_size?, retrain?,
  *                                      residual?, refresh?} — refresh:
  *                                      delta-encode only; residual: FAISS
  *                                      formulation (serves l2 + cosine)
  *   POST   /api/v1/admin/index/opq   {m?, k_codes?, train_size?, retrain?,
  *                                      iters?, refresh?} — learned-rotation
  *                                      PQ (Ge et al. 2013); refresh:
  *                                      delta-encode only
  *   POST   /api/v1/admin/index/sq     {refresh?}
  *   POST   /api/v1/admin/index/bq     {refresh?}
  *   POST   /api/v1/admin/backup      {target}
  *   GET    /api/v1/updates?since=N
  *   GET    /api/v1/updates/stream?since=N   (SSE: backlog replay + live push)
  *   GET    /api/v1/updates/ws?since=N       (WebSocket, on the companion
  *                                      `wsPort` listener / `boundWsPort`:
  *                                      RFC 6455 handshake, backlog replay,
  *                                      live push as text frames, ping→pong,
  *                                      close echo — the working form of the
  *                                      reference's vestigial WS route,
  *                                      rest.rs:342,727-738)
  *
  * Serving-loop extras from the reference:
  *  - repeated-query memo (`hybrid/search_integration.rs:554-623`): LRU on
  *    the canonical search request, invalidated by any mutation — the
  *    reference's query-result cache, which belongs at this layer (the
  *    engine's own results must always reflect the live store)
  *  - update feed (`client/rust.rs:71-98`): every mutation appends a
  *    sequenced change event; clients poll `/updates?since=<seq>` or hold
  *    `/updates/stream` (SSE) for backlog replay + live push — the working
  *    form of the reference's declared-but-vestigial stream surface
  *    (`src/api/rest.rs:727-738`)
  *
  * Security note: like the reference's default server config, routes carry
  * NO authentication — the server is meant to sit behind a trusted proxy
  * or on a private interface. Because of that, `admin/backup` (which
  * writes store contents to a filesystem path) only accepts targets under
  * the operator-configured `backupBase`; with no base configured the route
  * is disabled rather than letting any client write anywhere the driver
  * process can.
  */
class RestServer(store: VectorStore, port: Int = 0, cacheSize: Int = 128,
    maxEvents: Int = 10000, backupBase: Option[String] = None,
    sseWriteDeadlineMs: Long = 5000L, wsPort: Int = 0,
    frequentItemsStateDir: Option[String] = None,
    frequentItemsSourceDir: Option[String] = None,
    histogramStateDir: Option[String] = None,
    histogramSourceDir: Option[String] = None,
    histogramOutOfRangeAlert: Double = 0.05,
    // the verify recount must read the SAME columns the ingest folded;
    // both ingests parameterize them, so the server does too (defaults
    // match the ingest defaults). The state file records no column
    // names — this is operator configuration, like the source dir.
    histogramGroupCol: String = "event_type",
    histogramValueCol: String = "value",
    sampleStateDir: Option[String] = None,
    // the sample verify face's recount corpus (GET /admin/sample?
    // verify=true) — operator-configured like histogramSourceDir /
    // frequentItemsSourceDir: the recount is a Spark job, so client-
    // supplied paths are refused by construction. The recount reads the
    // columns the ingest folded; both ingests parameterize them, so the
    // server does too (defaults match the ingest defaults)
    sampleSourceDir: Option[String] = None,
    sampleGroupCol: String = "source",
    sampleIdCol: String = "doc_id",
    sampleValueCol: Option[String] = None,
    // the moments face (GET /admin/moments): same operator-config posture
    // as the other three profiling monitors — state dir enables the
    // route, source dir enables its verify recount, the column names
    // must name what the ingest folded (defaults match the ingest
    // defaults)
    momentsStateDir: Option[String] = None,
    momentsSourceDir: Option[String] = None,
    momentsGroupCol: String = "source",
    momentsValueCol: String = "value",
    // the cardinality face (GET /admin/distinct): same posture
    distinctStateDir: Option[String] = None,
    distinctSourceDir: Option[String] = None,
    distinctGroupCol: String = "source",
    distinctValueCol: String = "value",
    // the bivariate face (GET /admin/comoments): same posture; the two
    // value columns are an ORDERED pair — they must name (in order) what
    // the ingest folded, the fold's own binding rule
    comomentsStateDir: Option[String] = None,
    comomentsSourceDir: Option[String] = None,
    comomentsGroupCol: String = "source",
    comomentsXCol: String = "x",
    comomentsYCol: String = "y") {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private val queryCache =
    new java.util.LinkedHashMap[String, ObjectNode](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ObjectNode]): Boolean = size() > cacheSize
    }
  private var cacheHits = 0L
  private var cacheMisses = 0L

  // bounded ring: seq numbers keep advancing, but only the newest maxEvents
  // are retained (a lagging consumer sees first_seq > since and re-syncs)
  private val events = new java.util.ArrayDeque[ObjectNode]()
  private var nextSeq = 1L

  // SSE (`/updates/stream`): exchanges held open past handler return — the
  // JDK server keeps an exchange alive until close(). All socket writes
  // happen on ONE dedicated pusher thread fed by a command queue, never on
  // the dispatcher: a stalled client with a full TCP buffer would
  // otherwise block the serial server (and every API request) inside
  // mutated(). Subscriptions flow through the SAME queue as events, and
  // the backlog snapshot is taken on the dispatcher (where the ring
  // mutates), so delivery is exactly-once and ordered: an event enqueued
  // before a subscribe is in its snapshot, one enqueued after follows it.
  // The queue is bounded — when a stalled client backs it up, events are
  // dropped from the STREAM only (the ring keeps them; a consumer that
  // sees a seq gap re-syncs via `since=`, same contract as ring eviction).
  // A stall can't persist: every write runs under the sseWatchdog deadline
  // below, so a stalled-but-alive client is evicted within
  // sseWriteDeadlineMs rather than head-of-line-blocking the stream.
  private sealed trait SseCmd
  private case class SseEvent(e: ObjectNode) extends SseCmd
  private case class SseSubscribe(ex: HttpExchange, backlog: Seq[ObjectNode]) extends SseCmd
  private case class WsSubscribe(c: WsClient, backlog: Seq[ObjectNode]) extends SseCmd
  private val sseQueue = new java.util.concurrent.LinkedBlockingQueue[SseCmd](10000)
  // pusher-thread-only once started; the cap is read from the dispatcher
  private val sseSubs = new java.util.concurrent.CopyOnWriteArrayList[HttpExchange]()
  private val wsSubs = new java.util.concurrent.CopyOnWriteArrayList[WsClient]()
  private val maxSseClients = 64
  // admission counters: subscriptions are queued and only land in
  // sseSubs/wsSubs when the pusher drains them, so a cap checked against
  // the subscriber lists alone is porous exactly under load (a busy pusher
  // + a connect burst admits unboundedly many). pending + subscribed is
  // the number the cap actually bounds; the pusher decrements pending as
  // it processes each subscribe.
  private val ssePending = new java.util.concurrent.atomic.AtomicInteger(0)
  private val wsPending = new java.util.concurrent.atomic.AtomicInteger(0)
  // live handshake THREADS (pre-parse), bounding the per-connection thread
  // spawn at accept time — distinct from wsPending, which counts parsed
  // subscriptions awaiting the pusher's WsSubscribe drain
  private val wsHandshakes = new java.util.concurrent.atomic.AtomicInteger(0)
  // guards the event ring + the append→enqueue window: the HTTP routes all
  // run on the one serial dispatcher, but the WS accept thread must
  // snapshot the ring too, and its snapshot+subscribe must not interleave
  // with an append+enqueue (that's what makes backlog-vs-live exactly-once)
  private val ringLock = new Object
  private val ssePusher = new Thread(() => {
    try while (true) sseQueue.take() match {
      case SseEvent(e) =>
        sseSubs.removeIf(sub => !sseWrite(sub, e))
        wsSubs.removeIf(c => !c.send(e))
      case SseSubscribe(ex, backlog) =>
        if (backlog.forall(e => sseWrite(ex, e))) sseSubs.add(ex)
        ssePending.decrementAndGet()
      case WsSubscribe(c, backlog) =>
        if (backlog.forall(e => c.send(e))) wsSubs.add(c)
        wsPending.decrementAndGet()
    } catch { case _: InterruptedException => }
  }, "graft-sse-push")
  ssePusher.setDaemon(true)

  // Watchdog bounding per-client write latency: a stalled-but-ALIVE client
  // (full TCP send buffer, never reading, never closing) would block the
  // single pusher thread's socket write indefinitely — head-of-line-
  // blocking every other SSE client and backing up the command queue. The
  // JDK exchange exposes no write timeout, so the watchdog closes the
  // exchange from outside after `sseWriteDeadlineMs`; the blocked write
  // then fails and the client is evicted exactly like a dead one.
  private val sseWatchdog =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-sse-watchdog"); t.setDaemon(true); t
    })

  /** One SSE frame to one held connection, under the write deadline; a dead
    * or stalled-past-deadline client is closed and reported so the caller
    * drops it. (private[serve] so the spec can drive the stall path with a
    * stub exchange — a real full-TCP-buffer stall is not reproducible
    * deterministically in a test.) */
  private[serve] def sseWrite(ex: HttpExchange, e: ObjectNode): Boolean = {
    val kill = sseWatchdog.schedule(new Runnable {
      def run(): Unit = try ex.close() catch { case NonFatal(_) => }
    }, sseWriteDeadlineMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    val wrote =
      try {
        ex.getResponseBody.write(
          s"id: ${e.get("seq").asLong()}\ndata: ${mapper.writeValueAsString(e)}\n\n"
            .getBytes(UTF_8))
        ex.getResponseBody.flush()
        true
      } catch { case NonFatal(_) => false }
    // cancel() == false means the deadline already fired (the exchange is
    // closed or closing): treat the write as failed even if it returned —
    // the connection is no longer safe to retain
    val inTime = kill.cancel(false)
    if (wrote && inTime) true
    else {
      try ex.close() catch { case NonFatal(_) => }
      false
    }
  }

  // ---- WebSocket update stream (`GET /updates/ws` on the companion
  // listener): the reference declares a WS route whose handler never sends
  // an update (`/root/reference/src/api/rest.rs:342,727-738`); this is the
  // working form — RFC 6455 server handshake, backlog replay from
  // `since=`, then live push of every mutation event as a text frame,
  // with ping→pong and close-echo. The JDK HttpServer cannot release a
  // connection for protocol upgrade, so the WS endpoint listens on its own
  // ServerSocket (`wsPort`, ephemeral by default, `boundWsPort` to read) —
  // same process, same event ring, same single-pusher delivery contract
  // and write deadline as SSE.

  /** One held WebSocket connection. All frame writes (pusher events, the
    * reader's pongs/close-echo) serialize on the client's own lock, and
    * every write runs under the shared watchdog deadline — a
    * stalled-but-alive client is closed and evicted, never head-of-line
    * blocking the pusher. */
  private final class WsClient(sock: java.net.Socket) {
    private val out = sock.getOutputStream
    private val lock = new Object

    def sendFrame(opcode: Int, payload: Array[Byte]): Boolean = lock.synchronized {
      val kill = sseWatchdog.schedule(new Runnable {
        def run(): Unit = close()
      }, sseWriteDeadlineMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      val wrote =
        try {
          val n = payload.length
          val head =
            if (n <= 125) Array((0x80 | opcode).toByte, n.toByte)
            else if (n <= 0xffff)
              Array((0x80 | opcode).toByte, 126.toByte, (n >> 8).toByte, n.toByte)
            else Array((0x80 | opcode).toByte, 127.toByte,
              0.toByte, 0.toByte, 0.toByte, 0.toByte,
              (n >> 24).toByte, (n >> 16).toByte, (n >> 8).toByte, n.toByte)
          out.write(head); out.write(payload); out.flush()
          true
        } catch { case NonFatal(_) => false }
      val inTime = kill.cancel(false)
      if (wrote && inTime) true else { close(); false }
    }

    def send(e: ObjectNode): Boolean =
      sendFrame(0x1, mapper.writeValueAsBytes(e))

    def close(): Unit = try sock.close() catch { case NonFatal(_) => }
  }

  /** Per-client reader: unmasks client frames, answers ping with pong and
    * close with a close echo, ignores data frames (the feed is one-way).
    * Any protocol violation or oversized frame drops the client. */
  private def wsReadLoop(c: WsClient, in: java.io.InputStream): Unit = {
    def readFully(buf: Array[Byte]): Boolean = {
      var off = 0
      while (off < buf.length) {
        val n = in.read(buf, off, buf.length - off)
        if (n < 0) return false
        off += n
      }
      true
    }
    try {
      var open = true
      while (open) {
        val b0 = in.read(); val b1 = if (b0 < 0) -1 else in.read()
        if (b1 < 0) open = false
        else {
          val op = b0 & 0x0f
          var len: Long = b1 & 0x7f
          if (len == 126) {
            val ext = new Array[Byte](2)
            if (!readFully(ext)) return
            len = ((ext(0) & 0xffL) << 8) | (ext(1) & 0xffL)
          } else if (len == 127) {
            val ext = new Array[Byte](8)
            if (!readFully(ext)) return
            len = ext.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
          }
          // a client of a one-way feed has no business sending big frames
          if (len > (1 << 16)) open = false
          else {
            val mask = if ((b1 & 0x80) != 0) new Array[Byte](4) else null
            if (mask != null && !readFully(mask)) return
            val payload = new Array[Byte](len.toInt)
            if (!readFully(payload)) return
            if (mask != null) {
              var i = 0
              while (i < payload.length) {
                payload(i) = (payload(i) ^ mask(i & 3)).toByte; i += 1
              }
            }
            op match {
              case 0x8 => c.sendFrame(0x8, payload.take(2)); open = false
              case 0x9 => c.sendFrame(0xA, payload)
              case _ => // text/binary/pong/continuation: ignored
            }
          }
        }
      }
    } catch { case NonFatal(_) => }
    finally { c.close(); wsSubs.remove(c) }
  }

  /** Blocking HTTP-upgrade handshake on a freshly accepted socket; on
    * success the client enters the pusher's subscription queue with its
    * ring backlog (snapshot + enqueue under ringLock — the same atomicity
    * the SSE path gets for free from the serial dispatcher). */
  private def wsHandshake(sock: java.net.Socket): Unit = {
    sock.setTcpNoDelay(true)
    sock.setSoTimeout(10000) // a half-open handshake can't pin the acceptor
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val head = new java.io.ByteArrayOutputStream()
    var prev4 = 0
    var b = in.read()
    while (b >= 0 && prev4 != 0x0d0a0d0a && head.size < 8192) {
      head.write(b)
      prev4 = (prev4 << 8) | b
      b = if (prev4 == 0x0d0a0d0a) -1 else in.read()
    }
    val lines = head.toString(UTF_8).split("\r\n")
    val req = lines.headOption.getOrElse("").split(" ")
    val headers = lines.tail.flatMap(_.split(":", 2) match {
      case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
      case _ => None
    }).toMap
    def reject(code: Int, msg: String): Unit = {
      try {
        sock.getOutputStream.write(
          (s"HTTP/1.1 $code $msg\r\nConnection: close\r\n\r\n").getBytes(UTF_8))
        sock.getOutputStream.flush()
      } catch { case NonFatal(_) => }
      try sock.close() catch { case NonFatal(_) => }
    }
    val pathOk = req.length >= 2 && req(0) == "GET" &&
      (req(1) == "/api/v1/updates/ws" || req(1).startsWith("/api/v1/updates/ws?"))
    val key = headers.get("sec-websocket-key")
    if (!pathOk) reject(404, "Not Found")
    else if (!headers.get("upgrade").exists(_.equalsIgnoreCase("websocket")) ||
      key.isEmpty) reject(400, "Bad Request")
    else if (wsSubs.size() + wsPending.get() >= maxSseClients)
      reject(503, "Service Unavailable")
    else {
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key.get + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      sock.getOutputStream.write(
        ("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
          s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
      sock.getOutputStream.flush()
      sock.setSoTimeout(0) // held connection: reads block until the client talks
      val since = req(1).split("\\?", 2).lift(1)
        .flatMap(_.split("&").collectFirst {
          case s if s.startsWith("since=") => s.drop(6) })
        .flatMap(_.toLongOption).getOrElse(0L)
      val client = new WsClient(sock)
      wsPending.incrementAndGet()
      val subscribed = ringLock.synchronized {
        val backlog = events.iterator().asScala
          .filter(_.get("seq").asLong() > since).toSeq
        sseQueue.offer(WsSubscribe(client, backlog))
      }
      if (!subscribed) { wsPending.decrementAndGet(); client.close() }
      else {
        val t = new Thread(() => wsReadLoop(client, in), "graft-ws-read")
        t.setDaemon(true)
        t.start()
      }
    }
  }

  private val wsServer = new java.net.ServerSocket(wsPort)
  private val wsAcceptor = new Thread(() => {
    // per-iteration catch: a transient accept() failure (EMFILE under FD
    // pressure, a reset mid-accept) must not kill the WS endpoint for the
    // server's lifetime — only a closed listener (stop()) ends the loop
    while (!wsServer.isClosed) {
      try {
        val sock = wsServer.accept()
        // handshake OFF the acceptor thread: a client that connects and
        // then dribbles (or sends nothing) would otherwise pin the single
        // accept loop for its whole 10 s read timeout, serializing every
        // other subscription behind it (slow-loris). Each handshake thread
        // lives <= the SoTimeout and then either becomes the client's read
        // loop or dies with the socket. The thread count is BOUNDED before
        // spawning: a connect flood of silent clients would otherwise hold
        // one unbounded thread each for the full SoTimeout — pending
        // handshakes count against the same client cap, and a saturated
        // server sheds the connection at accept instead of queueing it.
        if (wsHandshakes.incrementAndGet() > maxSseClients) {
          wsHandshakes.decrementAndGet()
          try sock.close() catch { case NonFatal(_) => }
        } else {
          val t = new Thread(() => {
            try wsHandshake(sock)
            catch { case NonFatal(_) => try sock.close() catch { case NonFatal(_) => } }
            finally wsHandshakes.decrementAndGet()
          }, "graft-ws-handshake")
          t.setDaemon(true)
          t.start()
        }
      } catch {
        case NonFatal(_) =>
          // transient accept error (or close racing the isClosed check):
          // back off briefly so a persistent EMFILE can't spin the loop hot
          try Thread.sleep(100)
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt() // loop exits once closed
          }
      }
    }
  }, "graft-ws-accept")
  wsAcceptor.setDaemon(true)

  def boundWsPort: Int = wsServer.getLocalPort

  /** Mutations invalidate the memo, append a change event, and hand it to
    * the pusher for every held `/updates/stream` + WebSocket connection. */
  private def mutated(tpe: String, ids: Seq[String]): Unit = {
    queryCache.clear()
    ids.foreach { id =>
      val e = obj()
      e.put("seq", nextSeq)
      e.put("type", tpe)
      e.put("id", id)
      e.put("timestamp", java.time.Instant.now().toString)
      ringLock.synchronized {
        events.addLast(e)
        nextSeq += 1
        if (events.size() > maxEvents) events.removeFirst()
        // offer, not put: a backed-up stream queue must never block the API
        sseQueue.offer(SseEvent(e))
      }
    }
  }

  /** `since=<seq>` query param; non-numeric/absent -> 0 (full feed). */
  private def sinceParam(ex: HttpExchange): Long =
    Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").collectFirst {
        case s if s.startsWith("since=") => s.drop(6) })
      .flatMap(_.toLongOption)
      .getOrElse(0L)

  def boundPort: Int = server.getAddress.getPort

  def start(): RestServer = {
    server.createContext("/api/v1/health", ex => handle(ex) {
      case ("GET", _) =>
        // real probes, not constants: connected/healthy derive from
        // VectorStore.health()'s FS-metadata checks (store root reachable,
        // manifest readable, no stranded swap markers), so a monitoring
        // client CAN observe a degraded store. stats() is guarded — an
        // unreadable tier must degrade the report, not 500 it.
        val h = store.health()
        val stOpt =
          try Some(store.stats())
          catch { case scala.util.control.NonFatal(_) => None }
        val n = obj()
        n.put("status",
          if (h.connected && h.manifestReadable && stOpt.isDefined) "healthy"
          else "degraded")
        n.put("recent_count", stOpt.map(_.recentCount).getOrElse(0L))
        n.put("historical_count", stOpt.map(_.historicalCount).getOrElse(0L))
        // reference HealthResponse envelope (rest.rs:132-161): a client
        // deserializing {status, version, storage, indices} must not break
        n.put("version", "1.0")
        val stor = n.putObject("storage")
        stor.put("mode", "filesystem")
        stor.put("connected", h.connected && stOpt.isDefined)
        val idx = n.putObject("indices")
        // tier flags come from the store's ONE degradation rule
        // (VectorStore.tierHealthy — shared with checkHealth), plus the
        // envelope-level readability of stats
        val hn = idx.putObject("hnsw")
        hn.put("healthy", stOpt.isDefined && store.tierHealthy(h, "recent"))
        hn.put("vector_count", stOpt.map(_.recentCount).getOrElse(0L))
        val iv = idx.putObject("ivf")
        iv.put("healthy", stOpt.isDefined && store.tierHealthy(h, "historical"))
        iv.put("vector_count", stOpt.map(_.historicalCount).getOrElse(0L))
        // graft extension: swap/lease observability (VectorStore.health) —
        // stranded markers, writer-lease holder, swap-lock ages, so a
        // fleet operator can see a wedged recovery without reading code
        val g = n.putObject("graft")
        g.put("manifest_readable", h.manifestReadable)
        val ms = g.putArray("stranded_swap_markers")
        h.strandedSwapMarkers.foreach(ms.add)
        h.leaseOwner.foreach(g.put("writer_lease_owner", _))
        h.leaseAgeMs.foreach(g.put("writer_lease_age_ms", _))
        val locks = g.putObject("swap_lock_ages_ms")
        h.swapLockAgesMs.foreach { case (k, v) => locks.put(k, v) }
        (200, n)
    })
    server.createContext("/api/v1/vectors", ex => handle(ex) {
      case ("POST", "/api/v1/vectors") =>
        val req = body(ex)
        val rec = record(req)
        val res = store.insert(Seq(rec))
        if (res.inserted == 0) (409, err(s"duplicate id: ${rec.id}"))
        else {
          mutated("insert", Seq(rec.id))
          val n = obj()
          n.put("id", rec.id)
          n.put("index", "recent") // inserts land in the recent tier (X11)
          n.put("timestamp", java.time.Instant.now().toString)
          (201, n)
        }
      case ("POST", "/api/v1/vectors/batch") =>
        val arr = body(ex).get("vectors")
        if (arr == null || !arr.isArray) (400, err("'vectors' array required"))
        else {
          val recs = arr.elements().asScala.map(record).toSeq
          val res = store.insert(recs)
          // only rows that actually landed produce change events —
          // duplicate-rejected ids never entered the store
          mutated("insert", res.insertedIds)
          val n = obj()
          n.put("inserted", res.inserted)
          n.put("duplicates", res.duplicates)
          // reference BatchInsertResponse field names (rest.rs:82-93):
          // successful/failed counts plus a per-id error list
          n.put("successful", res.inserted)
          n.put("failed", res.duplicates)
          val errsArr = n.putArray("errors")
          val landed = res.insertedIds.toSet
          recs.filterNot(r => landed.contains(r.id)).foreach { r =>
            val e0 = errsArr.addObject()
            e0.put("id", r.id); e0.put("error", "duplicate id")
          }
          (200, n)
        }
      case ("GET", IdPath(id)) =>
        store.vectors.filter(col("id") === id)
          .select("id", "embedding", "metadata").collect().headOption match {
          case None => (404, err(s"vector not found: $id"))
          case Some(r) =>
            val n = obj()
            n.put("id", r.getString(0))
            val v = n.putArray("vector")
            r.getSeq[Float](1).foreach(v.add)
            n.set[JsonNode]("metadata",
              if (r.isNullAt(2)) mapper.createObjectNode()
              else mapper.readTree(r.getString(2)))
            (200, n)
        }
      case ("DELETE", IdPath(id)) =>
        val res = store.delete(Seq(id))
        if (res.deletedCount == 0) (404, err(s"vector not found: $id"))
        else {
          mutated("delete", Seq(id))
          val n = obj(); n.put("id", id); n.put("deleted", true); (200, n)
        }
      case _ => (405, err("method not allowed"))
    })
    server.createContext("/api/v1/search", ex => handle(ex) {
      case ("POST", _) =>
        val req = body(ex)
        val qv = floats(req.get("vector"))
        val cacheKey = mapper.writeValueAsString(req)
        val memo = queryCache.get(cacheKey)
        if (qv.isEmpty) (400, err("Vector cannot be empty")) // rest.rs:741-746
        else if (memo != null) {
          cacheHits += 1
          val n = memo.deepCopy()
          n.put("cached", true)
          (200, n)
        } else {
          cacheMisses += 1
          val t0 = System.nanoTime()
          val k = if (req.hasNonNull("k")) req.get("k").asInt() else 10
          val opts = Option(req.get("options"))
          def opt(name: String) = opts.flatMap(o => Option(o.get(name)))
          // filtered code-tier searches post-filter a k*oversample pool:
          // callers either pin `oversample` directly or send the filter's
          // estimated `selectivity` (kept-row fraction) and get the
          // principled 1.5/selectivity sizing. Validated like metric/mode:
          // a zero/negative/non-integer oversample would silently empty
          // the quantized tier, so it's a 400, not a quiet no-result
          val osNode = opt("oversample")
          val selNode = opt("selectivity")
          if (osNode.exists(n => !n.isIntegralNumber || n.asInt() < 1))
            (400, err("oversample must be a positive integer"))
          // a kept-row FRACTION: zero/negative (a plausible client bug —
          // e.g. sending a row count of 0) would silently map to the
          // oversample cap, a 33x more expensive search; reject like the
          // oversample check above instead
          else if (selNode.exists(n => !n.isNumber || n.asDouble() <= 0.0 ||
              n.asDouble() > 1.0))
            (400, err("selectivity must be a number in (0, 1]"))
          // probe_blobs: blob routing on the saved recent index (>= 1
          // nearest blobs per query; ignored unless the index was built
          // routed). Same validation convention as oversample.
          else if (opt("probe_blobs").exists(n => !n.isIntegralNumber || n.asInt() < 1))
            (400, err("probe_blobs must be a positive integer"))
          else {
          val oversample = osNode.map(_.asInt())
            .orElse(selNode.map(s =>
              graft.operators.Tuning.suggestOversample(s.asDouble())))
            .getOrElse(3)
          val includeMeta = opt("include_metadata").exists(_.asBoolean())
          val includeVecs = opt("include_vectors").exists(_.asBoolean())
          // the reference SearchOptions names (rest.rs:104-113) map 1:1:
          // search_recent/search_historical select tiers, ivf_n_probe and
          // hnsw_ef set probe depth; timeout_ms is accepted and ignored
          // (a Spark batch query has no per-request deadline — documented
          // in MIGRATION.md)
          val srchRecent = opt("search_recent").forall(_.asBoolean())
          val srchHist = opt("search_historical").forall(_.asBoolean())
          val hits = store.searchMode(
            qv, k,
            mode = opt("mode").map(_.asText()).getOrElse("exact"),
            metric = opt("metric").map(_.asText()).getOrElse("cosine"),
            filterJson = Option(req.get("filter")).map(mapper.writeValueAsString),
            scoreThreshold = opt("score_threshold").map(_.asDouble()),
            oversample = oversample,
            probeBlobs = opt("probe_blobs").map(_.asInt()).getOrElse(0),
            includeVectors = includeVecs,
            searchRecent = srchRecent,
            searchHistorical = srchHist,
            nProbe = opt("ivf_n_probe").map(_.asInt())
              .getOrElse(store.config.nProbe),
            efSearch = opt("hnsw_ef").map(_.asInt()).getOrElse(100)
          ).collect()
          val n = obj()
          val results = n.putArray("results")
          hits.foreach { r =>
            val h = results.addObject()
            h.put("id", r.getString(0))
            h.put("distance", r.getDouble(1))
            h.put("score", r.getDouble(2))
            if (includeMeta)
              h.set[JsonNode]("metadata",
                if (r.isNullAt(3)) mapper.createObjectNode()
                else mapper.readTree(r.getString(3)))
            if (includeVecs) {
              val v = h.putArray("vector")
              if (!r.isNullAt(4)) r.getSeq[Float](4).foreach(v.add)
            }
          }
          n.put("total_count", hits.length)
          n.put("query_time_ms", (System.nanoTime() - t0) / 1e6)
          // reference SearchResponse envelope names (rest.rs:116-121)
          n.put("search_time_ms", (System.nanoTime() - t0) / 1e6)
          // tiers actually searched, not requested (rest.rs:638-669): a
          // requested historical tier with no rows is absent from the plan
          n.put("indices_searched", store.tiersSearched(srchRecent, srchHist))
          n.put("partial_results", false)
          queryCache.put(cacheKey, n.deepCopy())
          (200, n)
          }
        }
      case _ => (405, err("method not allowed"))
    })
    // SSE variant of the update feed (the reference's declared-but-vestigial
    // stream surface, `src/api/rest.rs:727-738` / `client/rust.rs:71-98`):
    // replay the ring from `since`, then hold the connection and push each
    // subsequent mutation as an `id:`/`data:` frame. Registered as its own
    // context (longest-prefix routing beats /updates) because it must NOT
    // go through handle(): the exchange stays open after this returns.
    server.createContext("/api/v1/updates/stream", ex => {
      if (ex.getRequestMethod != "GET") {
        val bytes = mapper.writeValueAsBytes(err("method not allowed"))
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(405, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      } else if (sseSubs.size() + ssePending.get() >= maxSseClients) {
        val bytes = mapper.writeValueAsBytes(err("too many stream clients"))
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(503, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      } else {
        val since = sinceParam(ex)
        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.getResponseHeaders.set("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0) // chunked: the stream has no length
        // leading comment frame: confirms the subscription to clients that
        // wait for first bytes, and probes the socket before we retain it
        val hello =
          try {
            ex.getResponseBody.write(s": stream since=$since\n\n".getBytes(UTF_8))
            ex.getResponseBody.flush()
            true
          } catch { case NonFatal(_) =>
            try ex.close() catch { case NonFatal(_) => }
            false
          }
        // backlog snapshot HERE (dispatcher thread — where the ring
        // mutates), enqueued behind any already-pending events: the pusher
        // replays it and only then holds the connection for live pushes
        if (hello) {
          ssePending.incrementAndGet()
          val backlog = events.iterator().asScala
            .filter(_.get("seq").asLong() > since).toSeq
          if (!sseQueue.offer(SseSubscribe(ex, backlog))) {
            ssePending.decrementAndGet()
            try ex.close() catch { case NonFatal(_) => }
          }
        }
      }
    })
    server.createContext("/api/v1/updates", ex => handle(ex) {
      case ("GET", _) =>
        val since = sinceParam(ex)
        val n = obj()
        val out = n.putArray("events")
        events.iterator().asScala
          .filter(_.get("seq").asLong() > since)
          .foreach(out.add(_: JsonNode))
        n.put("latest_seq", nextSeq - 1)
        n.put("first_seq",
          if (events.isEmpty) nextSeq else events.peekFirst().get("seq").asLong())
        (200, n)
    })
    server.createContext("/api/v1/admin", ex => handle(ex) {
      case ("GET", "/api/v1/admin/statistics") =>
        val st = store.stats()
        val n = obj()
        n.put("recent_count", st.recentCount)
        n.put("historical_count", st.historicalCount)
        n.put("tombstone_count", st.tombstoneCount)
        n.put("dimension", store.dimension.getOrElse(0))
        n.put("cache_hits", cacheHits)
        n.put("cache_misses", cacheMisses)
        // reference StatisticsResponse field names (rest.rs:162-176) —
        // and unlike the reference's in-memory estimates, the byte sizes
        // here are the REAL on-disk footprint per tier family
        n.put("total_vectors", st.recentCount + st.historicalCount)
        n.put("recent_vectors", st.recentCount)
        n.put("historical_vectors", st.historicalCount)
        val mu = n.putObject("memory_usage")
        def dirBytes(names: String*): Long = names.map { nm =>
          val p0 = new org.apache.hadoop.fs.Path(store.path, nm)
          val fsS = p0.getFileSystem(
            store.spark.sparkContext.hadoopConfiguration)
          if (fsS.exists(p0)) fsS.getContentSummary(p0).getLength else 0L
        }.sum
        val hnswB = dirBytes("recent", "recent_index")
        val ivfB = dirBytes("historical", "centroids", "pq_codes",
          "sq_codes", "bq_codes")
        mu.put("hnsw_bytes", hnswB)
        mu.put("ivf_bytes", ivfB)
        mu.put("total_bytes", hnswB + ivfB)
        // maintenance counters (RebalanceStatistics analog): persisted
        // with the store, so they cover scheduler + route + direct calls
        val ms = store.maintenanceStats
        n.put("total_rebalances", ms.totalRebalances)
        n.put("total_vectors_moved", ms.totalVectorsMoved)
        (200, n)
      // deep integrity scan (graft extension; the reference's persisters
      // expose check_integrity only as a library API): structural
      // invariants + per-tier expected-vs-found drift. Runs Spark jobs —
      // an admin action, not a liveness probe ( /health stays FS-only).
      case ("GET", "/api/v1/admin/integrity") =>
        // ?confirm=true runs the r14 confirm pass: wait for the writer
        // lease to quiesce, re-probe ONLY the transient classes, report
        // the defects present in both observations (the mechanism behind
        // "alert only if it persists"). The quiesce wait happens INSIDE
        // this serial dispatcher (setExecutor(null)) — every other route
        // incl. /health stalls behind it — so the route's wait is SHORT
        // by default (2 s, not the Scala API's 10 s) and tunable via
        // ?confirm_wait_ms=N clamped to [0, 10000]; a monitor that finds
        // a writer live gets the not-confirmed sentinel fast and retries
        // later rather than parking the whole server on the lease.
        val qp = Option(ex.getRequestURI.getQuery)
          .map(_.split("&").toSeq).getOrElse(Seq.empty)
        val confirm = qp.contains("confirm=true")
        val waitMs = qp.collectFirst {
            case s if s.startsWith("confirm_wait_ms=") =>
              s.drop("confirm_wait_ms=".length) }
          .map(v => scala.util.Try(v.toLong).toOption
            // LOUD on a malformed value ("5s", "5000ms"): silently
            // substituting the default would park the serial dispatcher
            // for a wait the operator did not choose — same posture as
            // the recount route's denominator validation
            .getOrElse(throw new IllegalArgumentException(
              s"confirm_wait_ms must be an integer (milliseconds), got '$v'")))
          .map(v => math.max(0L, math.min(10000L, v)))
          .getOrElse(2000L)
        val r = store.checkIntegrity(confirmTransients = confirm,
          confirmWaitMs = waitMs)
        val n = obj()
        n.put("is_complete", r.isComplete)
        n.put("has_manifest", r.hasManifest)
        n.put("has_centroids", r.hasCentroids)
        n.put("live_recent", r.liveRecent)
        n.put("live_historical", r.liveHistorical)
        n.put("wrong_dim_count", r.wrongDimCount)
        n.put("duplicate_id_count", r.duplicateIdCount)
        // may be transiently non-zero while a migrate() is between its
        // two tier swaps (this scan takes no lease by design); excluded
        // from is_complete — alert only if it persists across scans
        n.put("cross_tier_duplicate_count", r.crossTierDuplicateCount)
        n.put("invalid_cluster_count", r.invalidClusterCount)
        // saved-HNSW part-list probe (r13): stale = delta-served, a
        // rebuild hint; missing = the index serves rows the tier no
        // longer holds — transient while a migrate/vacuum is between its
        // tier swap and index invalidation (this scan takes no lease),
        // so like cross_tier_duplicate_count it does NOT gate
        // is_complete: alert if it persists across scans. -1 on both =
        // coverage unknown this scan (pre-list-era index, or the index
        // vanished mid-probe) — distinct from verified zero; a MALFORMED
        // meta.json instead fails the scan loudly (this route 500s)
        n.put("recent_index_stale_parts", r.recentIndexStaleParts)
        n.put("recent_index_missing_parts", r.recentIndexMissingParts)
        val d = n.putObject("code_tier_drift")
        r.codeTierDrift.foreach { case (tier, (missing, orphaned)) =>
          val t = d.putObject(tier)
          t.put("missing", missing); t.put("orphaned", orphaned)
        }
        // OPQ rotation staleness: fresh/train reconstruction-MSE ratio
        // under the saved model (-1 = no OPQ tier or baseline unknown
        // this scan). Advisory: at >= OpqStaleRatioAlert (1.5) the
        // rotation was learned on a corpus that has drifted away —
        // retrain via POST /admin/index/opq {retrain: true}; a loud
        // warning field appears so a monitor needn't hardcode the
        // threshold
        // clamped to a finite ceiling: a zero training baseline with real
        // fresh error yields ratio = +Infinity, which Jackson would emit
        // as the non-JSON token "Infinity" and break strict monitors'
        // parse of the WHOLE envelope — 1e12 is unambiguous "retrain now"
        n.put("opq_rotation_mse_ratio",
          math.min(r.opqRotationMseRatio, 1e12))
        if (r.opqRotationMseRatio >= VectorStore.OpqStaleRatioAlert)
          n.put("opq_rotation_warning",
            f"fresh-sample reconstruction MSE is ${r.opqRotationMseRatio}%.2f" +
              "x the training baseline — the saved rotation is stale; " +
              "re-train via POST /admin/index/opq {\"retrain\": true} to " +
              "restore the tier's recall edge")
        // confirm-pass envelope: transients_confirmed = the re-probe ran
        // after the lease quiesced; confirmed counts are −1 when not
        // confirmed (not requested / writer stayed live / coverage
        // unknown) — an operator alerts on confirmed > 0, never on the
        // raw transient counts above
        n.put("transients_confirmed", r.transientsConfirmed)
        n.put("confirmed_cross_tier_duplicate_count",
          r.confirmedCrossTierDuplicateCount)
        n.put("confirmed_recent_index_missing_parts",
          r.confirmedRecentIndexMissingParts)
        (200, n)
      // running frequent-items state of the streaming Misra–Gries fold
      // (graft extension — the reference has no frequent-items surface):
      // served via the LINEARIZABLE locked read, so a monitor polling a
      // hot stream gets a consistent snapshot instead of the lock-free
      // read's by-design contention error. Disabled (404) unless the
      // operator wired a state dir at construction, same posture as
      // admin/backup's backupBase.
      case ("GET", "/api/v1/admin/frequent-items") =>
        frequentItemsStateDir match {
          case None => (404, err(
            "frequent-items state not configured on this server " +
              "(pass frequentItemsStateDir to RestServer)"))
          case Some(sd) =>
            val (st, gst, wst) = foldedFrequentItems(sd)
            val n = obj()
            gst match {
              case None if wst.isDefined =>
                // the selection ladder's windowed rung — "trending now"
                val w = wst.get
                n.put("grouped", false)
                n.put("windowed", true)
                n.put("k", w.k)
                n.put("checkpoint", w.checkpoint)
                n.put("last_batch_id", w.lastBatchId)
                n.put("window", w.window)
                n.put("ring_depth", w.ring.size)
                n.put("n", w.n)
                val agg = w.aggregateCounts
                n.put("state_entries", agg.size)
                val c = n.putObject("counts")
                agg.toSeq.sortBy { case (item, cnt) => (-cnt, item) }
                  .foreach { case (item, cnt) => c.put(item, cnt) }
              case Some(g0) =>
                n.put("grouped", true)
                n.put("k", g0.k)
                n.put("checkpoint", g0.checkpoint)
                n.put("last_batch_id", g0.lastBatchId)
                n.put("n", g0.groups.valuesIterator.map(_.n).sum)
                n.put("state_entries", g0.totalEntries)
                n.put("group_count", g0.groups.size)
                // running count of null-group-key rows the fold excluded
                // (correct per the batch recount's inner-join semantics,
                // but a source column rotting to NULL would quietly thin
                // the profile — this is the monitor's visibility into it)
                n.put("excluded_null_rows", g0.excludedNullRows)
                val gs = n.putObject("groups")
                g0.groups.toSeq.sortBy(_._1).foreach { case (g, grp) =>
                  val gn = gs.putObject(g)
                  gn.put("n", grp.n)
                  val c = gn.putObject("counts")
                  grp.counts.toSeq.sortBy { case (item, cnt) => (-cnt, item) }
                    .foreach { case (item, cnt) => c.put(item, cnt) }
                }
              case None =>
                n.put("grouped", false)
                n.put("k", st.k)
                n.put("checkpoint", st.checkpoint)
                n.put("last_batch_id", st.lastBatchId)
                n.put("n", st.n)
                n.put("state_entries", st.counts.size)
                val c = n.putObject("counts")
                // deterministic envelope order: count desc, item asc (the
                // operator's own output order)
                st.counts.toSeq.sortBy { case (item, cnt) => (-cnt, item) }
                  .foreach { case (item, cnt) => c.put(item, cnt) }
            }
            // the counts are folded MG estimates (lower bounds, off by at
            // most n/(k+1) of the (group's) mass) — exact values need the
            // recount (POST .../recount below), which is a Spark job, not
            // a monitoring read
            n.put("counts_are_mg_estimates", true)
            (200, n)
        }
      // the exact face of the operator (r14): recount the folded
      // candidates over the stream's corpus at the requested threshold —
      // heavyHittersFromState, served. ADMIN-gated by construction: it
      // runs a Spark job over the operator-configured source dir (the
      // backupBase posture — no client-supplied paths), so it completes
      // the serving surface without letting a monitor aim the driver at
      // arbitrary data. Disabled (404) unless BOTH the state dir and the
      // source dir were wired at construction.
      // running value-distribution profile of the streaming exact-
      // histogram fold, flat OR grouped (graft extension): served via
      // the LINEARIZABLE locked read, same posture and flat-vs-grouped
      // selection rule as frequent-items. Unlike the MG envelope's
      // estimates, these counts are EXACT and the quantile estimates are
      // rank-exact — only the VALUE is quantized, to one bin width
      // (reported as value_resolution). ?probs=0.5,0.9 overrides the
      // default probes (malformed values 400 loudly); ?bins=true
      // includes the full per-bin counts.
      case ("GET", "/api/v1/admin/histogram") =>
        histogramStateDir match {
          case None => (404, err(
            "histogram state not configured on this server " +
              "(pass histogramStateDir to RestServer)"))
          case Some(sd) =>
            val qp = Option(ex.getRequestURI.getQuery)
              .map(_.split("&").toSeq).getOrElse(Seq.empty)
            val probsParsed: Either[String, Seq[Double]] =
              qp.collectFirst {
                case s if s.startsWith("probs=") => s.drop("probs=".length)
              } match {
                case None => Right(Seq(0.5, 0.9, 0.99))
                case Some(v) =>
                  val parts = v.split(",").toSeq.filter(_.nonEmpty)
                  val ds = parts.map(p => scala.util.Try(p.toDouble).toOption)
                  // d.isNaN: "NaN".toDouble parses, and NaN fails neither
                  // range bound — without this it slips past the 400 and
                  // trips quantiles' require as a 500
                  if (parts.isEmpty || ds.exists(_.isEmpty)
                      || ds.flatten.exists(d => d.isNaN || d < 0.0 || d > 1.0))
                    Left("probs must be comma-separated numbers in " +
                      s"[0, 1], got '$v'")
                  else Right(ds.flatten)
              }
            probsParsed match {
              case Left(msg) => (400, err(msg))
              case Right(probs) =>
                val (st, gst, wst) = foldedHistograms(sd)
                val wantVerify = qp.contains("verify=true")
                if (wantVerify && wst.isDefined)
                  // the windowed rung cannot be recount-verified: the
                  // corpus does not record which rows arrived in the
                  // newest N micro-batches — a named category error, not
                  // an attempted (wrong) all-time recount
                  (409, err("windowed histogram cannot be " +
                    "recount-verified against the source corpus: the " +
                    "corpus does not record which rows arrived in the " +
                    s"newest ${wst.get.window} micro-batches, so an " +
                    "all-time recount cannot reproduce the window. The " +
                    "ring's exactness is pinned by the fold's own oracle " +
                    "row and spec"))
                else if (wantVerify && histogramSourceDir.isEmpty)
                  (403, err("histogram verify not configured on this " +
                    "server: the recount is a Spark job over the stream's " +
                    "source corpus — pass histogramSourceDir to RestServer " +
                    "(client-supplied paths are not accepted, same posture " +
                    "as frequent-items/recount)"))
                else if (wantVerify && st.lastBatchId < 0L && gst.isEmpty)
                  // nothing folded: verifying is a category error, not a
                  // vacuous match — the frequent-items/recount 409 rule
                  (409, err(s"no folded histogram state under $sd — start " +
                    "the ingest (or point the server at its state dir) " +
                    "before asking for a recount verify"))
                else {
                val n = obj()
                def binning(spec: graft.operators.HistogramSketch
                    .HistogramSpec): Unit = {
                  n.put("lo", spec.lo)
                  n.put("hi", spec.hi)
                  n.put("n_bins", spec.nBins)
                  n.put("value_resolution", spec.width)
                  n.put("counts_are_exact", true)
                }
                // the out-of-range alert: a misconfigured (or drifted)
                // [lo, hi) silently parks mass in under/overflow — the
                // counts stay visible, but a monitor needs the FRACTION
                // and a loud field once it crosses the configured
                // threshold (histogramOutOfRangeAlert; NaN values land in
                // overflow, so they count toward this too)
                def outOfRange(total: Long, oor: Long): Unit = {
                  val frac = if (total == 0L) 0.0 else oor.toDouble / total
                  n.put("out_of_range_mass_fraction", frac)
                  if (frac > histogramOutOfRangeAlert)
                    n.put("binning_warning",
                      f"$frac%.4f of the folded mass fell outside the " +
                        f"configured [lo, hi) — past the " +
                        f"$histogramOutOfRangeAlert alert threshold; the " +
                        "quantile estimates clamp there. Re-derive the " +
                        "binning (HistogramSketch.fromSample) and re-fold " +
                        "with a fresh state dir")
                }
                gst match {
                  case Some(g0) =>
                    n.put("folded", true)
                    n.put("grouped", true)
                    binning(g0.spec)
                    n.put("checkpoint", g0.checkpoint)
                    n.put("last_batch_id", g0.lastBatchId)
                    n.put("n", g0.groups.valuesIterator.map(_.n).sum)
                    n.put("group_count", g0.groups.size)
                    outOfRange(g0.groups.valuesIterator.map(_.n).sum,
                      g0.groups.valuesIterator.map(gh =>
                        gh.bins.getOrElse(-1, 0L) +
                          gh.bins.getOrElse(g0.spec.nBins, 0L)).sum)
                    // the excluded-null observability counter (the r14
                    // grouped-fold rule) rides the envelope
                    n.put("excluded_null_rows", g0.excludedNullRows)
                    val gs = n.putObject("groups")
                    g0.groups.toSeq.sortBy(_._1).foreach { case (g, gh) =>
                      val gn = gs.putObject(g)
                      gn.put("n", gh.n)
                      gn.put("underflow", gh.bins.getOrElse(-1, 0L))
                      gn.put("overflow",
                        gh.bins.getOrElse(g0.spec.nBins, 0L))
                      val qs = gn.putObject("quantiles")
                      graft.operators.HistogramSketch
                        .quantiles(g0.spec, gh.bins, probs)
                        .foreach { case (p, est) =>
                          qs.put(p.toString, est) }
                      if (qp.contains("bins=true")) {
                        val b = gn.putObject("bins")
                        gh.bins.toSeq.sortBy(_._1).foreach { case (bin, c) =>
                          b.put(bin.toString, c)
                        }
                      }
                    }
                  case None if wst.isDefined =>
                    // the windowed rung: the flat envelope over the
                    // ring's bin-wise aggregate, plus the window fields
                    val w = wst.get
                    val agg = w.aggregate
                    n.put("folded", true)
                    n.put("grouped", false)
                    n.put("windowed", true)
                    binning(agg.spec)
                    n.put("checkpoint", w.checkpoint)
                    n.put("last_batch_id", w.lastBatchId)
                    n.put("window", w.window)
                    n.put("ring_depth", w.ring.size)
                    n.put("n", agg.n)
                    n.put("underflow", agg.underflow)
                    n.put("overflow", agg.overflow)
                    outOfRange(agg.n, agg.underflow + agg.overflow)
                    val wq = n.putObject("quantiles")
                    graft.streaming.StreamingHistogram
                      .quantilesFromSnapshot(agg, probs)
                      .foreach { case (p, est) => wq.put(p.toString, est) }
                    if (qp.contains("bins=true")) {
                      val bl = n.putObject("bins")
                      agg.bins.toSeq.sortBy(_._1).foreach { case (b, c) =>
                        bl.put(b.toString, c) }
                    }
                  case None if st.lastBatchId < 0L =>
                    // nothing folded in either shape: a well-formed empty
                    // envelope (the frequent-items convention) — the
                    // placeholder binning is NOT echoed, it would mislead
                    // a monitor
                    n.put("folded", false)
                    n.put("last_batch_id", -1L)
                    n.put("n", 0L)
                  case None =>
                    n.put("folded", true)
                    n.put("grouped", false)
                    binning(st.spec)
                    n.put("checkpoint", st.checkpoint)
                    n.put("last_batch_id", st.lastBatchId)
                    n.put("n", st.n)
                    n.put("underflow", st.underflow)
                    n.put("overflow", st.overflow)
                    outOfRange(st.n, st.underflow + st.overflow)
                    val qs = n.putObject("quantiles")
                    graft.streaming.StreamingHistogram
                      .quantilesFromSnapshot(st, probs)
                      .foreach { case (p, est) => qs.put(p.toString, est) }
                    if (qp.contains("bins=true")) {
                      val b = n.putObject("bins")
                      st.bins.toSeq.sortBy(_._1).foreach { case (bin, c) =>
                        b.put(bin.toString, c)
                      }
                    }
                }
                // ?verify=true: the grouped-HH recount analog for the
                // quantile family — recompute the per-(group,)bin counts
                // ONE-SHOT over the operator-configured source corpus
                // with the state's own binning and compare cell-for-cell
                // against the SAME locked snapshot the envelope serves.
                // The fold is exact, so on a drained (quiesced) stream
                // any mismatch is a real defect: bounds drift, a
                // corrupted state file, or a source/state mismatch. A
                // still-ingesting stream legitimately trails the source;
                // last_batch_id is in the envelope for that call.
                if (wantVerify) {
                  val corpus = store.spark.read.parquet(histogramSourceDir.get)
                  // the recount reads the operator-configured columns; a
                  // source whose schema no longer carries them must be a
                  // configuration-naming 422, not an AnalysisException
                  // surfacing as an opaque 500 mid-recount
                  val srcCols = corpus.columns.toSet
                  val needed =
                    (if (gst.isDefined) Seq(histogramGroupCol)
                     else Seq.empty[String]) :+ histogramValueCol
                  val missing = needed.filterNot(srcCols.contains)
                  if (missing.nonEmpty)
                    (422, err("histogram verify: configured column(s) " +
                      missing.mkString("'", "', '", "'") +
                      " not present in the source corpus schema (" +
                      corpus.columns.mkString(", ") + ") — the server's " +
                      "histogramGroupCol/histogramValueCol must name the " +
                      "columns the ingest folded"))
                  else {
                  val v = n.putObject("verify")
                  def diffCells(state: Map[Int, Long],
                      recount: Map[Int, Long]): Int =
                    (state.keySet ++ recount.keySet).count(b =>
                      state.getOrElse(b, 0L) != recount.getOrElse(b, 0L))
                  gst match {
                    case Some(g0) =>
                      // both the fold and the recount skip NULL values, so
                      // a valueCol rotting to NULL would verify "matched"
                      // invisibly — count the recount-side exclusions on
                      // the SAME scan (a CollectMetrics node under the
                      // aggregation barrier sees every source row, no
                      // second pass)
                      val nullObs = org.apache.spark.sql.Observation()
                      val observed = corpus.observe(nullObs,
                        count(when(col(histogramGroupCol).isNotNull &&
                          col(histogramValueCol).cast("double").isNull,
                          1)).as("null_values"))
                      // bounded collect: the state's own group count is the
                      // healthy recount's cardinality (state bins ⊆ source
                      // groups on a drained stream). The fold's maxGroups
                      // cap bounded the STATE at ingest time, but the
                      // recount reads the CURRENT source — a group column
                      // drifted toward per-row cardinality would otherwise
                      // pull groups × (nBins+2) rows into the serving heap.
                      // Small slack so a few legitimately-new groups still
                      // report as named mismatches rather than a refusal.
                      val cellCap =
                        (g0.groups.size + 16) * (g0.spec.nBins + 2)
                      val rows = graft.operators.HistogramSketch
                        .countsPerGroup(observed, histogramGroupCol,
                          histogramValueCol, g0.spec).head(cellCap + 1)
                      if (rows.length > cellCap) {
                        v.put("matched", false)
                        v.put("error", "source group cardinality exceeds " +
                          s"the verify bound: the folded state holds " +
                          s"${g0.groups.size} groups but the source " +
                          s"recount produced more than $cellCap cells — " +
                          "the group column has drifted (e.g. toward " +
                          "per-row cardinality); the cell compare was " +
                          "skipped rather than collecting an unbounded " +
                          "relation into the serving driver. Fix the " +
                          "source (or re-fold with the wider key) before " +
                          "verifying")
                      } else {
                      val recount = rows.groupBy(_.getString(0)).map {
                        case (g, rs) => g -> rs.map(r =>
                          r.getInt(1) -> r.getLong(2)).toMap
                      }
                      val allGroups =
                        (g0.groups.keySet ++ recount.keySet).toSeq.sorted
                      val bad = allGroups.filter { g =>
                        diffCells(
                          g0.groups.get(g).map(_.bins).getOrElse(Map.empty),
                          recount.getOrElse(g, Map.empty)) > 0
                      }
                      v.put("matched", bad.isEmpty)
                      v.put("recount_n", rows.map(_.getLong(2)).sum)
                      v.put("state_n", g0.groups.valuesIterator.map(_.n).sum)
                      v.put("recount_excluded_null_values",
                        nullObs.get("null_values").asInstanceOf[Long])
                      v.put("mismatched_group_count", bad.size)
                      val bl = v.putArray("mismatched_groups")
                      bad.take(10).foreach(bl.add)
                      }
                    case None =>
                      val nullObs = org.apache.spark.sql.Observation()
                      val recount = graft.operators.HistogramSketch
                        .counts(corpus.select(col(histogramValueCol))
                          .observe(nullObs, count(when(
                            col(histogramValueCol).cast("double").isNull,
                            1)).as("null_values")),
                          histogramValueCol, st.spec)
                        .collect() // bounded: <= nBins+2 rows
                        .map(r => r.getInt(0) -> r.getLong(1)).toMap
                      val mismatches = diffCells(st.bins, recount)
                      v.put("matched", mismatches == 0)
                      v.put("recount_n", recount.valuesIterator.sum)
                      v.put("state_n", st.n)
                      v.put("recount_excluded_null_values",
                        nullObs.get("null_values").asInstanceOf[Long])
                      v.put("mismatched_bin_count", mismatches)
                  }
                  v.put("counts_are_exact", true)
                  (200, n)
                  }
                } else (200, n)
                }
            }
        }
      // the sample→histogram bootstrap face: derive a fresh [lo, hi)
      // binning from the STANDING sample fold's carried values (the
      // HistogramSketch.fromSample arithmetic over the ≤ k locked-read
      // entries — no Spark job, no corpus rescan) and return the spec an
      // operator passes to StreamingHistogram.ingest (or
      // ingestAutoBinned, the one-call programmatic form). The route
      // DERIVES, it does not start a stream — a fold's lifecycle (its
      // checkpoint, its state dir, who stops it) belongs to the
      // operator's driver app, not an HTTP handler. Admin-gated by the
      // same construction as the family: it reads only the
      // operator-configured sampleStateDir.
      case ("POST", "/api/v1/admin/histogram/from-sample") =>
        sampleStateDir match {
          case None => (404, err(
            "sample state not configured on this server (pass " +
              "sampleStateDir to RestServer) — the from-sample binning " +
              "derives from the standing sample fold"))
          case Some(sd) =>
            val req = body(ex)
            val nBins = Option(req).flatMap(r => Option(r.get("n_bins")))
              .map(_.asInt()).getOrElse(32)
            val coverage = Option(req).flatMap(r => Option(r.get("coverage")))
              .map(_.asDouble()).getOrElse(0.99)
            if (nBins <= 0)
              (400, err(s"'n_bins' must be a positive integer, got $nBins"))
            else if (coverage.isNaN || coverage <= 0.0 || coverage > 1.0)
              (400, err(s"'coverage' must be in (0, 1], got $coverage"))
            else {
              // the sample route's flat-vs-grouped selection rule; a
              // grouped fold requires naming WHICH group's distribution
              // to bin for (a stratified binning is per-group by nature)
              val st = graft.streaming.StreamingSample
                .readStateLocked(store.spark, sd)
              val gst =
                if (st.lastBatchId < 0L)
                  Some(graft.streaming.StreamingGroupedSample
                    .readStateLocked(store.spark, sd))
                    .filter(_.lastBatchId >= 0L)
                else None
              val entriesOr: Either[(Int, ObjectNode),
                  Seq[graft.streaming.StreamingSample.SampleEntry]] =
                gst match {
                  case Some(g0) =>
                    Option(req).flatMap(r => Option(r.get("group")))
                      .map(_.asText()) match {
                      case None => Left((400, err("the folded sample is " +
                        s"GROUPED (${g0.groups.size} groups) — pass " +
                        "'group' to derive a binning from one group's " +
                        "sample")))
                      case Some(g) => g0.groups.get(g)
                        .map(gs => Right(gs.entries))
                        .getOrElse(Left((404, err(s"group '$g' not in " +
                          s"the folded grouped sample state " +
                          s"(${g0.groups.size} groups folded)"))))
                    }
                  case None if st.lastBatchId < 0L =>
                    // nothing folded: deriving is a category error (the
                    // recount/verify 409 rule)
                    Left((409, err(s"no folded sample state under $sd — " +
                      "start the sample ingest (with a valueCol) before " +
                      "asking for a from-sample binning")))
                  case None => Right(st.entries)
                }
              entriesOr match {
                case Left(resp) => resp
                case Right(entries)
                    if !entries.exists(_.value.exists(
                      java.lang.Double.isFinite)) =>
                  // folded, but no distribution to bin: a configuration
                  // category (sample folded without a valueCol)
                  (422, err("the folded sample carries no finite values " +
                    "— it was folded without a valueCol (or every value " +
                    "is null/NaN/Inf); re-fold the sample with the " +
                    "column the histogram will bin"))
                case Right(entries) =>
                  val vals = entries.flatMap(_.value)
                    .filter(java.lang.Double.isFinite)
                  // the ONE derive arithmetic — fromValues, shared with
                  // the DataFrame face and ingestAutoBinned so the
                  // three entry points cannot drift — over the ≤ k
                  // already-local carried values (no Spark job)
                  val spec = graft.operators.HistogramSketch
                    .fromValues(vals, nBins, coverage)
                  val n = obj()
                  n.put("lo", spec.lo)
                  n.put("hi", spec.hi)
                  n.put("n_bins", spec.nBins)
                  n.put("value_resolution", spec.width)
                  n.put("coverage", coverage)
                  n.put("sample_values", vals.size)
                  n.put("sample_last_batch_id",
                    gst.map(_.lastBatchId).getOrElse(st.lastBatchId))
                  (200, n)
              }
            }
        }
      // the folded deterministic bottom-k sample (graft extension):
      // served via the LINEARIZABLE locked read like the family's other
      // folds, with the family's flat-vs-grouped selection rule (one
      // state dir holds either fold's file; flat wins ties). Entries are
      // exact — each (group's) sample is a deterministic function of the
      // corpus (salted-hash bottom-k), so a monitor can cross-check it
      // against any batch replay bit-for-bit. ?group=NAME selects one
      // group's sample from a grouped fold.
      case ("GET", "/api/v1/admin/sample") =>
        sampleStateDir match {
          case None => (404, err(
            "sample state not configured on this server " +
              "(pass sampleStateDir to RestServer)"))
          case Some(sd) =>
            def writeEntries(into: ObjectNode,
                es: Seq[graft.streaming.StreamingSample.SampleEntry]): Unit = {
              val arr = into.putArray("entries")
              es.foreach { e =>
                val en = arr.addObject()
                en.put("id", e.id)
                e.value.foreach(v => en.put("value", v))
              }
            }
            val st = graft.streaming.StreamingSample
              .readStateLocked(store.spark, sd)
            val gst =
              if (st.lastBatchId < 0L)
                Some(graft.streaming.StreamingGroupedSample
                  .readStateLocked(store.spark, sd))
                  .filter(_.lastBatchId >= 0L)
              else None
            // RAW query, decoded per VALUE after the '&' split: getQuery
            // pre-decodes percent-escapes, so a group name containing '&'
            // or '=' (sent correctly encoded, e.g. group=r%26d) would be
            // truncated at the decoded separator and 404 as 'r'
            val qp = Option(ex.getRequestURI.getRawQuery)
              .map(_.split("&").toSeq).getOrElse(Seq.empty)
            val wantGroup = qp.collectFirst {
              case s if s.startsWith("group=") => java.net.URLDecoder
                .decode(s.drop("group=".length), "UTF-8")
            }
            // ?verify=true — the sampling face's recount twin (the
            // histogram's verify=true / frequent-items' /recount analog):
            // recompute the (per-group) bottom-k ONE-SHOT over the
            // operator-configured source corpus with the state's own
            // (k, salt) and compare entry-for-entry against the SAME
            // locked snapshot the envelope serves. The fold is a pure
            // function of the corpus, so on a drained stream any
            // mismatch is a real defect — skipped data, a corrupted
            // state file, or a source/state mismatch; a still-ingesting
            // stream legitimately trails (last_batch_id is in the
            // envelope for that call).
            val wantVerify = qp.contains("verify=true")
            if (wantVerify && sampleSourceDir.isEmpty)
              (403, err("sample verify not configured on this server: " +
                "the recount is a Spark job over the stream's source " +
                "corpus — pass sampleSourceDir to RestServer (client-" +
                "supplied paths are not accepted, same posture as " +
                "histogram verify)"))
            else if (wantVerify && st.lastBatchId < 0L && gst.isEmpty)
              (409, err(s"no folded sample state under $sd — start the " +
                "ingest (or point the server at its state dir) before " +
                "asking for a recount verify"))
            else {
            // shared by both shapes: 422 when the configured recount
            // columns are missing from the source schema (the histogram
            // verify rule — configuration-naming, never an opaque 500)
            def verifyCorpus(needGroup: Boolean)
                : Either[(Int, ObjectNode), org.apache.spark.sql.DataFrame] = {
              val corpus = store.spark.read.parquet(sampleSourceDir.get)
              val needed = (if (needGroup) Seq(sampleGroupCol)
                else Seq.empty[String]) ++ Seq(sampleIdCol) ++
                sampleValueCol.toSeq
              val missing = needed.filterNot(corpus.columns.toSet.contains)
              if (missing.nonEmpty)
                Left((422, err("sample verify: configured column(s) " +
                  missing.mkString("'", "', '", "'") +
                  " not present in the source corpus schema (" +
                  corpus.columns.mkString(", ") + ") — the server's " +
                  "sampleGroupCol/sampleIdCol/sampleValueCol must name " +
                  "the columns the ingest folded")))
              else Right(corpus)
            }
            val n = obj()
            gst match {
              case Some(g0) =>
                wantGroup match {
                  case Some(g) if !g0.groups.contains(g) =>
                    (404, err(s"group '$g' not in the folded grouped " +
                      s"sample state (${g0.groups.size} groups folded)"))
                  case _ =>
                    n.put("folded", true)
                    n.put("grouped", true)
                    n.put("k", g0.k)
                    n.put("salt", g0.salt)
                    n.put("checkpoint", g0.checkpoint)
                    n.put("last_batch_id", g0.lastBatchId)
                    n.put("n_seen",
                      g0.groups.valuesIterator.map(_.nSeen).sum)
                    n.put("group_count", g0.groups.size)
                    n.put("excluded_null_rows", g0.excludedNullRows)
                    n.put("entries_are_exact", true)
                    val selected = wantGroup match {
                      case Some(g) => Seq(g -> g0.groups(g))
                      case None => g0.groups.toSeq.sortBy(_._1)
                    }
                    val gs = n.putObject("groups")
                    selected.foreach { case (g, s0) =>
                      val gn = gs.putObject(g)
                      gn.put("n_seen", s0.nSeen)
                      gn.put("sample_size", s0.entries.size)
                      writeEntries(gn, s0.entries)
                    }
                    if (!wantVerify) (200, n)
                    else verifyCorpus(needGroup = true) match {
                      case Left(resp) => resp
                      case Right(corpus) =>
                        val v = n.putObject("verify")
                        // bounded collect: the recount twin yields ≤ k
                        // rows per source group — a group column drifted
                        // toward per-row cardinality would make that
                        // groups × k; cap at (stateGroups + 16) × k and
                        // refuse loudly past it (the histogram verify
                        // bound rule)
                        val rowCap = (g0.groups.size + 16) * g0.k
                        val rows = graft.streaming.StreamingGroupedSample
                          .batchBottomKPerGroup(corpus, g0.k, g0.salt,
                            sampleGroupCol, sampleIdCol, sampleValueCol)
                          .head(rowCap + 1)
                        if (rows.length > rowCap) {
                          v.put("matched", false)
                          v.put("error", "source group cardinality " +
                            s"exceeds the verify bound: the folded state " +
                            s"holds ${g0.groups.size} groups but the " +
                            s"recount produced more than $rowCap rows — " +
                            "the group column has drifted; the compare " +
                            "was skipped rather than collecting an " +
                            "unbounded relation into the serving driver")
                        } else {
                          val recount = rows.groupBy(_.getString(0)).map {
                            case (g, rs) => g -> rs.map(r =>
                              graft.streaming.StreamingSample.SampleEntry(
                                r.getLong(1), r.getLong(2),
                                if (r.isNullAt(3)) None
                                else Some(r.getDouble(3))))
                              .sortBy(e => (e.key, e.id)).toSeq
                          }
                          val allGroups = (g0.groups.keySet ++
                            recount.keySet).toSeq.sorted
                          val bad = allGroups.filter(g =>
                            g0.groups.get(g).map(_.entries)
                              .getOrElse(Seq.empty) !=
                              recount.getOrElse(g, Seq.empty))
                          v.put("matched", bad.isEmpty)
                          v.put("state_group_count", g0.groups.size)
                          v.put("recount_group_count", recount.size)
                          v.put("mismatched_group_count", bad.size)
                          val bl = v.putArray("mismatched_groups")
                          bad.take(10).foreach(bl.add)
                        }
                        v.put("entries_are_exact", true)
                        (200, n)
                    }
                }
              // a ?group ask can only be answered from a GROUPED fold —
              // silently serving the flat (or empty) envelope would let a
              // monitor parse the whole sample as one stratum's
              case None if wantGroup.isDefined =>
                (404, err(s"group '${wantGroup.get}' not available: the " +
                  (if (st.lastBatchId < 0L) "state dir holds no folded sample"
                   else "folded sample is flat (no groups)") +
                  " — group selection needs a StreamingGroupedSample fold"))
              case None if st.lastBatchId < 0L =>
                // nothing folded in either shape: the family's
                // well-formed empty envelope
                n.put("folded", false)
                n.put("last_batch_id", -1L)
                n.put("n_seen", 0L)
                (200, n)
              case None =>
                n.put("folded", true)
                n.put("grouped", false)
                n.put("k", st.k)
                n.put("salt", st.salt)
                n.put("checkpoint", st.checkpoint)
                n.put("last_batch_id", st.lastBatchId)
                n.put("n_seen", st.nSeen)
                n.put("sample_size", st.entries.size)
                n.put("entries_are_exact", true)
                writeEntries(n, st.entries)
                if (!wantVerify) (200, n)
                else verifyCorpus(needGroup = false) match {
                  case Left(resp) => resp
                  case Right(corpus) =>
                    val v = n.putObject("verify")
                    // bounded by construction: batchBottomK collects ≤ k
                    val recount = graft.streaming.StreamingSample
                      .batchBottomK(corpus, st.k, st.salt, sampleIdCol,
                        sampleValueCol)
                    // split the verdict so an operator can tell skipped
                    // data (ids differ) from a value-column misconfig
                    // (ids equal, carried values differ — e.g. the
                    // server's sampleValueCol names a different column
                    // than the ingest folded)
                    val idsMatch = recount.map(e => (e.key, e.id)) ==
                      st.entries.map(e => (e.key, e.id))
                    val valuesMatch = recount.map(_.value) ==
                      st.entries.map(_.value)
                    v.put("matched", idsMatch && valuesMatch)
                    v.put("ids_matched", idsMatch)
                    v.put("values_matched", valuesMatch)
                    v.put("state_size", st.entries.size)
                    v.put("recount_size", recount.size)
                    val bl = v.putArray("mismatched_ids")
                    (recount.map(_.id).toSet -- st.entries.map(_.id).toSet)
                      .toSeq.sorted.take(10).foreach(bl.add)
                    v.put("entries_are_exact", true)
                    (200, n)
                }
            }
            }
        }
      case ("GET", "/api/v1/admin/moments") =>
        momentsStateDir match {
          case None => (404, err(
            "moments state not configured on this server " +
              "(pass momentsStateDir to RestServer)"))
          case Some(sd) =>
            import graft.streaming.StreamingMoments.Moments
            // the ONE state-field contract (putMoments — n_rows/n_null +
            // the n>0-gated min/max/string-sums rule, shared with both
            // fold writers) plus the envelope-only extras: n and the
            // derived FP views a monitor actually plots
            def writeMoments(into: ObjectNode, m: Moments): Unit = {
              graft.streaming.StreamingMoments.putMoments(into, m)
              into.put("n", m.n)
              if (m.n > 0L) {
                m.mean.foreach(v => into.put("mean", v))
                m.stddevPop.foreach(v => into.put("stddev_pop", v))
              }
            }
            // the family's flat-vs-grouped selection rule (one state dir,
            // flat wins ties), extended one rung for this face's TIME
            // dimension: flat → grouped → windowed. All reads
            // linearizable
            val st = graft.streaming.StreamingMoments
              .readStateLocked(store.spark, sd)
            val gst =
              if (st.lastBatchId < 0L)
                Some(graft.streaming.StreamingGroupedMoments
                  .readStateLocked(store.spark, sd))
                  .filter(_.lastBatchId >= 0L)
              else None
            val wst =
              if (st.lastBatchId < 0L && gst.isEmpty)
                Some(graft.streaming.StreamingWindowedMoments
                  .readStateLocked(store.spark, sd))
                  .filter(_.lastBatchId >= 0L)
              else None
            // RAW query, decoded per VALUE after the '&' split: getQuery
            // pre-decodes percent-escapes, so a group name containing '&'
            // or '=' (sent correctly encoded, e.g. group=r%26d) would be
            // truncated at the decoded separator and 404 as 'r'
            val qp = Option(ex.getRequestURI.getRawQuery)
              .map(_.split("&").toSeq).getOrElse(Seq.empty)
            val wantGroup = qp.collectFirst {
              case s if s.startsWith("group=") => java.net.URLDecoder
                .decode(s.drop("group=".length), "UTF-8")
            }
            // ?verify=true — the moments face's recount twin: recompute
            // the (per-group) exact moments ONE-SHOT over the operator-
            // configured source corpus and compare number-for-number
            // against the SAME locked snapshot the envelope serves. The
            // fold is exact, so on a drained stream any mismatch is a
            // real defect; a still-ingesting stream legitimately trails
            // (last_batch_id is in the envelope for that call).
            val wantVerify = qp.contains("verify=true")
            // the windowed 409 is checked BEFORE the unconfigured-source
            // 403 (the histogram route's order): a windowed fold can
            // never be recount-verified, so a 403 telling the operator
            // to configure momentsSourceDir would send them on an
            // errand that cannot end in a working verify
            if (wantVerify && wst.isDefined)
              (409, err("windowed moments cannot be recount-verified " +
                "against the source corpus: the corpus does not record " +
                "which rows arrived in the newest " +
                s"${wst.get.window} micro-batches, so an all-time " +
                "recount cannot reproduce the window. The ring's " +
                "exactness is pinned by the fold's own oracle row and " +
                "spec"))
            else if (wantVerify && momentsSourceDir.isEmpty)
              (403, err("moments verify not configured on this server: " +
                "the recount is a Spark job over the stream's source " +
                "corpus — pass momentsSourceDir to RestServer (client-" +
                "supplied paths are not accepted, same posture as the " +
                "other profiling verifies)"))
            else if (wantVerify && st.lastBatchId < 0L && gst.isEmpty &&
                wst.isEmpty)
              (409, err(s"no folded moments state under $sd — start the " +
                "ingest (or point the server at its state dir) before " +
                "asking for a recount verify"))
            else {
            // 422 when the configured recount columns are missing from
            // the source schema (configuration-naming, never an opaque
            // 500) — the histogram/sample verify rule
            def verifyCorpus(needGroup: Boolean)
                : Either[(Int, ObjectNode), org.apache.spark.sql.DataFrame] = {
              val corpus = store.spark.read.parquet(momentsSourceDir.get)
              val needed = (if (needGroup) Seq(momentsGroupCol)
                else Seq.empty[String]) :+ momentsValueCol
              val missing = needed.filterNot(corpus.columns.toSet.contains)
              if (missing.nonEmpty)
                Left((422, err("moments verify: configured column(s) " +
                  missing.mkString("'", "', '", "'") +
                  " not present in the source corpus schema (" +
                  corpus.columns.mkString(", ") + ") — the server's " +
                  "momentsGroupCol/momentsValueCol must name the columns " +
                  "the ingest folded")))
              else Right(corpus)
            }
            val n = obj()
            gst match {
              case Some(g0) =>
                wantGroup match {
                  case Some(g) if !g0.groups.contains(g) =>
                    (404, err(s"group '$g' not in the folded grouped " +
                      s"moments state (${g0.groups.size} groups folded)"))
                  case _ =>
                    n.put("folded", true)
                    n.put("grouped", true)
                    n.put("value_col", g0.valueCol)
                    n.put("checkpoint", g0.checkpoint)
                    n.put("last_batch_id", g0.lastBatchId)
                    n.put("group_count", g0.groups.size)
                    n.put("excluded_null_rows", g0.excludedNullRows)
                    n.put("moments_are_exact", true)
                    val selected = wantGroup match {
                      case Some(g) => Seq(g -> g0.groups(g))
                      case None => g0.groups.toSeq.sortBy(_._1)
                    }
                    val gs = n.putObject("groups")
                    selected.foreach { case (g, m) =>
                      writeMoments(gs.putObject(g), m)
                    }
                    if (!wantVerify) (200, n)
                    else verifyCorpus(needGroup = true) match {
                      case Left(resp) => resp
                      case Right(corpus) =>
                        val v = n.putObject("verify")
                        // bounded collect: one row per source group — a
                        // group column drifted toward per-row cardinality
                        // would make that unbounded; cap at stateGroups +
                        // 16 and refuse loudly past it (the family's
                        // verify bound rule)
                        val rowCap = g0.groups.size + 16
                        // group cast to string — the comoments face's
                        // rule: a non-string source group column reads
                        // as named mismatches, never a getString 500
                        val rows = graft.operators.Profile
                          .momentsPerGroup(corpus, momentsGroupCol,
                            momentsValueCol)
                          .withColumn("group", col("group").cast("string"))
                          .head(rowCap + 1)
                        if (rows.length > rowCap) {
                          v.put("matched", false)
                          v.put("error", "source group cardinality " +
                            s"exceeds the verify bound: the folded state " +
                            s"holds ${g0.groups.size} groups but the " +
                            s"recount produced more than $rowCap rows — " +
                            "the group column has drifted; the compare " +
                            "was skipped rather than collecting an " +
                            "unbounded relation into the serving driver")
                        } else {
                          val recount = rows.map(r => r.getString(0) ->
                            graft.streaming.StreamingMoments.momentsFromRow(
                              r, 1, "moments verify recount")).toMap
                          val allGroups = (g0.groups.keySet ++
                            recount.keySet).toSeq.sorted
                          val bad = allGroups.filter(g =>
                            !g0.groups.get(g).zip(recount.get(g))
                              .exists { case (a, b) => a == b })
                          v.put("matched", bad.isEmpty)
                          v.put("state_group_count", g0.groups.size)
                          v.put("recount_group_count", recount.size)
                          v.put("mismatched_group_count", bad.size)
                          val bl = v.putArray("mismatched_groups")
                          bad.take(10).foreach(bl.add)
                        }
                        v.put("moments_are_exact", true)
                        (200, n)
                    }
                }
              case None if wst.isDefined =>
                val w = wst.get
                // wantVerify cannot reach here: the windowed 409 is the
                // FIRST verify pre-check above (before the 403)
                if (wantGroup.isDefined)
                  (404, err(s"group '${wantGroup.get}' not available: " +
                    "the folded moments are a sliding WINDOW (no " +
                    "groups) — group selection needs a " +
                    "StreamingGroupedMoments fold"))
                else {
                  n.put("folded", true)
                  n.put("grouped", false)
                  n.put("windowed", true)
                  n.put("value_col", w.valueCol)
                  n.put("checkpoint", w.checkpoint)
                  n.put("last_batch_id", w.lastBatchId)
                  n.put("window", w.window)
                  n.put("ring_depth", w.ring.size)
                  n.put("moments_are_exact", true)
                  writeMoments(n, w.aggregate)
                  (200, n)
                }
              case None if wantGroup.isDefined =>
                (404, err(s"group '${wantGroup.get}' not available: the " +
                  (if (st.lastBatchId < 0L) "state dir holds no folded moments"
                   else "folded moments are flat (no groups)") +
                  " — group selection needs a StreamingGroupedMoments fold"))
              case None if st.lastBatchId < 0L =>
                n.put("folded", false)
                n.put("last_batch_id", -1L)
                n.put("n_rows", 0L)
                (200, n)
              case None =>
                n.put("folded", true)
                n.put("grouped", false)
                n.put("value_col", st.valueCol)
                n.put("checkpoint", st.checkpoint)
                n.put("last_batch_id", st.lastBatchId)
                n.put("moments_are_exact", true)
                writeMoments(n, st.moments)
                if (!wantVerify) (200, n)
                else verifyCorpus(needGroup = false) match {
                  case Left(resp) => resp
                  case Right(corpus) =>
                    val v = n.putObject("verify")
                    // bounded by construction: the recount is ONE row
                    val recount = graft.streaming.StreamingMoments
                      .batchMoments(corpus, momentsValueCol)
                    v.put("matched", recount == st.moments)
                    v.put("state_n_rows", st.moments.nRows)
                    v.put("recount_n_rows", recount.nRows)
                    v.put("moments_are_exact", true)
                    (200, n)
                }
            }
            }
        }
      case ("GET", "/api/v1/admin/profile") =>
        // the ONE-POLL monitor face: every CONFIGURED profiling face's
        // headline envelope in a single response — liveness
        // (last_batch_id per face) plus the number a drift dashboard
        // plots (mass / n / estimate / mean / correlation), with the
        // full per-face routes for drill-down. Reads are per-face
        // LINEARIZABLE (each face's own locked read) but NOT atomic
        // across faces — the faces are independent streams with
        // independent folds, so there is no cross-face snapshot to
        // serve; each face carries its own last_batch_id so a consumer
        // can see exactly what it is looking at. A face whose state
        // read fails (e.g. the locked read's contention path) reports a
        // NAMED per-face error instead of failing the whole envelope —
        // a combined monitor poll must not go dark because one of six
        // streams is mid-swap.
        val n = obj()
        val faces = n.putObject("faces")
        var configured = 0
        def face(name: String)(fill: ObjectNode => Unit): Unit = {
          configured += 1
          val f = faces.putObject(name)
          try fill(f)
          catch { case scala.util.control.NonFatal(e) =>
            f.put("error", s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(300))
          }
        }
        frequentItemsStateDir.foreach(sd => face("frequent_items") { f =>
          val st = graft.streaming.StreamingHeavyHitters
            .readStateLocked(store.spark, sd)
          if (st.lastBatchId >= 0L) {
            f.put("folded", true); f.put("grouped", false)
            f.put("last_batch_id", st.lastBatchId)
            f.put("checkpoint", st.checkpoint)
            f.put("n", st.n)
            f.put("candidate_count", st.counts.size)
            f.put("k", st.k)
          } else {
            val g = graft.streaming.StreamingGroupedHeavyHitters
              .readStateLocked(store.spark, sd)
            if (g.lastBatchId >= 0L) {
              f.put("folded", true); f.put("grouped", true)
              f.put("last_batch_id", g.lastBatchId)
              f.put("checkpoint", g.checkpoint)
              f.put("group_count", g.groups.size)
              f.put("total_entries", g.totalEntries)
              f.put("excluded_null_rows", g.excludedNullRows)
              f.put("k", g.k)
            } else {
              val w = graft.streaming.StreamingWindowedHeavyHitters
                .readStateLocked(store.spark, sd)
              if (w.lastBatchId >= 0L) {
                f.put("folded", true); f.put("grouped", false)
                f.put("windowed", true)
                f.put("last_batch_id", w.lastBatchId)
                f.put("checkpoint", w.checkpoint)
                f.put("window", w.window)
                f.put("ring_depth", w.ring.size)
                f.put("n", w.n)
                f.put("candidate_count", w.aggregateCounts.size)
                f.put("k", w.k)
              } else f.put("folded", false)
            }
          }
        })
        histogramStateDir.foreach(sd => face("histogram") { f =>
          val st = graft.streaming.StreamingHistogram
            .readStateLocked(store.spark, sd)
          if (st.lastBatchId >= 0L) {
            f.put("folded", true); f.put("grouped", false)
            f.put("last_batch_id", st.lastBatchId)
            f.put("checkpoint", st.checkpoint)
            f.put("n", st.n)
            f.put("lo", st.spec.lo); f.put("hi", st.spec.hi)
            f.put("n_bins", st.spec.nBins)
            f.put("underflow", st.underflow); f.put("overflow", st.overflow)
          } else {
            val g = graft.streaming.StreamingGroupedHistogram
              .readStateLocked(store.spark, sd)
            if (g.lastBatchId >= 0L) {
              f.put("folded", true); f.put("grouped", true)
              f.put("last_batch_id", g.lastBatchId)
              f.put("checkpoint", g.checkpoint)
              f.put("group_count", g.groups.size)
              f.put("total_cells", g.totalCells)
              f.put("excluded_null_rows", g.excludedNullRows)
            } else {
              val w = graft.streaming.StreamingWindowedHistogram
                .readStateLocked(store.spark, sd)
              if (w.lastBatchId >= 0L) {
                val agg = w.aggregate
                f.put("folded", true); f.put("grouped", false)
                f.put("windowed", true)
                f.put("last_batch_id", w.lastBatchId)
                f.put("checkpoint", w.checkpoint)
                f.put("window", w.window)
                f.put("ring_depth", w.ring.size)
                f.put("n", agg.n)
                f.put("underflow", agg.underflow)
                f.put("overflow", agg.overflow)
              } else f.put("folded", false)
            }
          }
        })
        sampleStateDir.foreach(sd => face("sample") { f =>
          val st = graft.streaming.StreamingSample
            .readStateLocked(store.spark, sd)
          if (st.lastBatchId >= 0L) {
            f.put("folded", true); f.put("grouped", false)
            f.put("last_batch_id", st.lastBatchId)
            f.put("checkpoint", st.checkpoint)
            f.put("k", st.k)
            f.put("n_seen", st.nSeen)
            f.put("entry_count", st.entries.size)
          } else {
            val g = graft.streaming.StreamingGroupedSample
              .readStateLocked(store.spark, sd)
            if (g.lastBatchId >= 0L) {
              f.put("folded", true); f.put("grouped", true)
              f.put("last_batch_id", g.lastBatchId)
              f.put("checkpoint", g.checkpoint)
              f.put("k", g.k)
              f.put("group_count", g.groups.size)
              f.put("total_entries", g.totalEntries)
              f.put("excluded_null_rows", g.excludedNullRows)
            } else f.put("folded", false)
          }
        })
        momentsStateDir.foreach(sd => face("moments") { f =>
          val st = graft.streaming.StreamingMoments
            .readStateLocked(store.spark, sd)
          if (st.lastBatchId >= 0L) {
            f.put("folded", true); f.put("grouped", false)
            f.put("last_batch_id", st.lastBatchId)
            f.put("checkpoint", st.checkpoint)
            f.put("value_col", st.valueCol)
            f.put("n_rows", st.moments.nRows)
            f.put("n_null", st.moments.nNull)
            st.moments.mean.foreach(v => f.put("mean", v))
            st.moments.stddevPop.foreach(v => f.put("stddev_pop", v))
          } else {
            val g = graft.streaming.StreamingGroupedMoments
              .readStateLocked(store.spark, sd)
            if (g.lastBatchId >= 0L) {
              f.put("folded", true); f.put("grouped", true)
              f.put("last_batch_id", g.lastBatchId)
              f.put("checkpoint", g.checkpoint)
              f.put("value_col", g.valueCol)
              f.put("group_count", g.groups.size)
              f.put("excluded_null_rows", g.excludedNullRows)
            } else {
              val w = graft.streaming.StreamingWindowedMoments
                .readStateLocked(store.spark, sd)
              if (w.lastBatchId >= 0L) {
                f.put("folded", true); f.put("grouped", false)
                f.put("windowed", true)
                f.put("last_batch_id", w.lastBatchId)
                f.put("checkpoint", w.checkpoint)
                f.put("value_col", w.valueCol)
                f.put("window", w.window)
                f.put("ring_depth", w.ring.size)
                val agg = w.aggregate
                f.put("n_rows", agg.nRows)
                f.put("n_null", agg.nNull)
                agg.mean.foreach(v => f.put("mean", v))
                agg.stddevPop.foreach(v => f.put("stddev_pop", v))
              } else f.put("folded", false)
            }
          }
        })
        distinctStateDir.foreach(sd => face("distinct") { f =>
          val st = graft.streaming.StreamingDistinct
            .readStateLocked(store.spark, sd)
          if (st.lastBatchId >= 0L) {
            f.put("folded", true); f.put("grouped", false)
            f.put("last_batch_id", st.lastBatchId)
            f.put("checkpoint", st.checkpoint)
            f.put("value_col", st.valueCol)
            f.put("n_rows", st.nRows)
            f.put("n_null", st.nNull)
            st.estimate.foreach(v => f.put("estimate", v))
          } else {
            val g = graft.streaming.StreamingGroupedDistinct
              .readStateLocked(store.spark, sd)
            if (g.lastBatchId >= 0L) {
              f.put("folded", true); f.put("grouped", true)
              f.put("last_batch_id", g.lastBatchId)
              f.put("checkpoint", g.checkpoint)
              f.put("value_col", g.valueCol)
              f.put("group_count", g.groups.size)
              f.put("excluded_null_rows", g.excludedNullRows)
            } else {
              val w = graft.streaming.StreamingWindowedDistinct
                .readStateLocked(store.spark, sd)
              if (w.lastBatchId >= 0L) {
                f.put("folded", true); f.put("grouped", false)
                f.put("windowed", true)
                f.put("last_batch_id", w.lastBatchId)
                f.put("checkpoint", w.checkpoint)
                f.put("value_col", w.valueCol)
                f.put("window", w.window)
                f.put("ring_depth", w.ring.size)
                f.put("n_rows", w.nRows)
                f.put("n_null", w.nNull)
                w.estimate.foreach(v => f.put("estimate", v))
              } else f.put("folded", false)
            }
          }
        })
        comomentsStateDir.foreach(sd => face("comoments") { f =>
          val st = graft.streaming.StreamingComoments
            .readStateLocked(store.spark, sd)
          if (st.lastBatchId >= 0L) {
            f.put("folded", true); f.put("grouped", false)
            f.put("last_batch_id", st.lastBatchId)
            f.put("checkpoint", st.checkpoint)
            f.put("x_col", st.xCol); f.put("y_col", st.yCol)
            f.put("n_rows", st.comoments.nRows)
            f.put("n", st.comoments.n)
            st.comoments.covariancePop.foreach(v =>
              f.put("covariance_pop", v))
            st.comoments.correlation.foreach(v => f.put("correlation", v))
          } else {
            val g = graft.streaming.StreamingGroupedComoments
              .readStateLocked(store.spark, sd)
            if (g.lastBatchId >= 0L) {
              f.put("folded", true); f.put("grouped", true)
              f.put("last_batch_id", g.lastBatchId)
              f.put("checkpoint", g.checkpoint)
              f.put("x_col", g.xCol); f.put("y_col", g.yCol)
              f.put("group_count", g.groups.size)
              f.put("excluded_null_rows", g.excludedNullRows)
            } else f.put("folded", false)
          }
        })
        if (configured == 0)
          (404, err("no profiling faces configured on this server — " +
            "pass at least one of frequentItemsStateDir/" +
            "histogramStateDir/sampleStateDir/momentsStateDir/" +
            "distinctStateDir/comomentsStateDir to RestServer"))
        else {
          n.put("face_count", configured)
          (200, n)
        }

      case ("GET", "/api/v1/admin/comoments") =>
        comomentsStateDir match {
          case None => (404, err(
            "comoments state not configured on this server " +
              "(pass comomentsStateDir to RestServer)"))
          case Some(sd) =>
            import graft.streaming.StreamingComoments.Comoments
            // the ONE state-field contract (putComoments — the counts +
            // the n>0-gated min/max/string-sums rule, shared with both
            // fold writers) plus the envelope-only extras: the derived
            // FP views a ratio-drift monitor actually plots
            def writeComoments(into: ObjectNode, m: Comoments): Unit = {
              graft.streaming.StreamingComoments.putComoments(into, m)
              if (m.n > 0L) {
                m.meanX.foreach(v => into.put("mean_x", v))
                m.meanY.foreach(v => into.put("mean_y", v))
                m.covariancePop.foreach(v => into.put("covariance_pop", v))
                // None when either side is constant (zero variance):
                // the field is simply absent, never NaN
                m.correlation.foreach(v => into.put("correlation", v))
              }
            }
            // the family's flat-vs-grouped selection rule (one state dir,
            // flat wins ties), both reads linearizable
            val st = graft.streaming.StreamingComoments
              .readStateLocked(store.spark, sd)
            val gst =
              if (st.lastBatchId < 0L)
                Some(graft.streaming.StreamingGroupedComoments
                  .readStateLocked(store.spark, sd))
                  .filter(_.lastBatchId >= 0L)
              else None
            // RAW query, decoded per VALUE after the '&' split (the
            // family's encoded-group rule)
            val qp = Option(ex.getRequestURI.getRawQuery)
              .map(_.split("&").toSeq).getOrElse(Seq.empty)
            val wantGroup = qp.collectFirst {
              case s if s.startsWith("group=") => java.net.URLDecoder
                .decode(s.drop("group=".length), "UTF-8")
            }
            // ?verify=true — the bivariate face's recount twin: recompute
            // the (per-group) exact co-moments ONE-SHOT over the operator-
            // configured source corpus and compare number-for-number
            // against the SAME locked snapshot the envelope serves
            val wantVerify = qp.contains("verify=true")
            if (wantVerify && comomentsSourceDir.isEmpty)
              (403, err("comoments verify not configured on this server: " +
                "the recount is a Spark job over the stream's source " +
                "corpus — pass comomentsSourceDir to RestServer (client-" +
                "supplied paths are not accepted, same posture as the " +
                "other profiling verifies)"))
            else if (wantVerify && st.lastBatchId < 0L && gst.isEmpty)
              (409, err(s"no folded comoments state under $sd — start " +
                "the ingest (or point the server at its state dir) " +
                "before asking for a recount verify"))
            else {
            // 422 when the configured recount columns are missing from
            // the source schema (configuration-naming, never an opaque
            // 500) — the profiling-family verify rule
            def verifyCorpus(needGroup: Boolean)
                : Either[(Int, ObjectNode), org.apache.spark.sql.DataFrame] = {
              val corpus = store.spark.read.parquet(comomentsSourceDir.get)
              val needed = (if (needGroup) Seq(comomentsGroupCol)
                else Seq.empty[String]) ++ Seq(comomentsXCol, comomentsYCol)
              val missing = needed.filterNot(corpus.columns.toSet.contains)
              if (missing.nonEmpty)
                Left((422, err("comoments verify: configured column(s) " +
                  missing.mkString("'", "', '", "'") +
                  " not present in the source corpus schema (" +
                  corpus.columns.mkString(", ") + ") — the server's " +
                  "comomentsGroupCol/comomentsXCol/comomentsYCol must " +
                  "name the columns the ingest folded")))
              else Right(corpus)
            }
            val n = obj()
            gst match {
              case Some(g0) =>
                wantGroup match {
                  case Some(g) if !g0.groups.contains(g) =>
                    (404, err(s"group '$g' not in the folded grouped " +
                      s"comoments state (${g0.groups.size} groups folded)"))
                  case _ =>
                    n.put("folded", true)
                    n.put("grouped", true)
                    n.put("x_col", g0.xCol)
                    n.put("y_col", g0.yCol)
                    n.put("checkpoint", g0.checkpoint)
                    n.put("last_batch_id", g0.lastBatchId)
                    n.put("group_count", g0.groups.size)
                    n.put("excluded_null_rows", g0.excludedNullRows)
                    n.put("comoments_are_exact", true)
                    val selected = wantGroup match {
                      case Some(g) => Seq(g -> g0.groups(g))
                      case None => g0.groups.toSeq.sortBy(_._1)
                    }
                    val gs = n.putObject("groups")
                    selected.foreach { case (g, m) =>
                      writeComoments(gs.putObject(g), m)
                    }
                    if (!wantVerify) (200, n)
                    else verifyCorpus(needGroup = true) match {
                      case Left(resp) => resp
                      case Right(corpus) =>
                        val v = n.putObject("verify")
                        // bounded collect: one row per source group — cap
                        // at stateGroups + 16 and refuse loudly past it
                        // (the family's verify bound rule)
                        val rowCap = g0.groups.size + 16
                        // group cast to string: the folded state's keys
                        // are strings by the ingest schema, and a
                        // non-string source group column must surface
                        // as NAMED group mismatches, never as a
                        // ClassCastException-shaped 500 off getString
                        val rows = graft.operators.Profile
                          .comomentsPerGroup(corpus, comomentsGroupCol,
                            comomentsXCol, comomentsYCol)
                          .withColumn("group", col("group").cast("string"))
                          .head(rowCap + 1)
                        if (rows.length > rowCap) {
                          v.put("matched", false)
                          v.put("error", "source group cardinality " +
                            s"exceeds the verify bound: the folded state " +
                            s"holds ${g0.groups.size} groups but the " +
                            s"recount produced more than $rowCap rows — " +
                            "the group column has drifted; the compare " +
                            "was skipped rather than collecting an " +
                            "unbounded relation into the serving driver")
                        } else {
                          val recount = rows.map(r => r.getString(0) ->
                            graft.streaming.StreamingComoments
                              .comomentsFromRow(r, 1,
                                "comoments verify recount")).toMap
                          val allGroups = (g0.groups.keySet ++
                            recount.keySet).toSeq.sorted
                          val bad = allGroups.filter(g =>
                            !g0.groups.get(g).zip(recount.get(g))
                              .exists { case (a, b) => a == b })
                          v.put("matched", bad.isEmpty)
                          v.put("state_group_count", g0.groups.size)
                          v.put("recount_group_count", recount.size)
                          v.put("mismatched_group_count", bad.size)
                          val bl = v.putArray("mismatched_groups")
                          bad.take(10).foreach(bl.add)
                        }
                        v.put("comoments_are_exact", true)
                        (200, n)
                    }
                }
              case None if wantGroup.isDefined =>
                (404, err(s"group '${wantGroup.get}' not available: the " +
                  (if (st.lastBatchId < 0L)
                    "state dir holds no folded comoments"
                   else "folded comoments are flat (no groups)") +
                  " — group selection needs a StreamingGroupedComoments " +
                  "fold"))
              case None if st.lastBatchId < 0L =>
                n.put("folded", false)
                n.put("last_batch_id", -1L)
                n.put("n_rows", 0L)
                (200, n)
              case None =>
                n.put("folded", true)
                n.put("grouped", false)
                n.put("x_col", st.xCol)
                n.put("y_col", st.yCol)
                n.put("checkpoint", st.checkpoint)
                n.put("last_batch_id", st.lastBatchId)
                n.put("comoments_are_exact", true)
                writeComoments(n, st.comoments)
                if (!wantVerify) (200, n)
                else verifyCorpus(needGroup = false) match {
                  case Left(resp) => resp
                  case Right(corpus) =>
                    val v = n.putObject("verify")
                    // bounded by construction: the recount is ONE row
                    val recount = graft.streaming.StreamingComoments
                      .batchComoments(corpus, comomentsXCol, comomentsYCol)
                    v.put("matched", recount == st.comoments)
                    v.put("state_n_rows", st.comoments.nRows)
                    v.put("recount_n_rows", recount.nRows)
                    v.put("comoments_are_exact", true)
                    (200, n)
                }
            }
            }
        }
      case ("GET", "/api/v1/admin/distinct") =>
        distinctStateDir match {
          case None => (404, err(
            "distinct state not configured on this server " +
              "(pass distinctStateDir to RestServer)"))
          case Some(sd) =>
            def writeDistinct(into: ObjectNode, nRows: Long, nNull: Long,
                est: Option[Double]): Unit = {
              into.put("n_rows", nRows)
              into.put("n_null", nNull)
              est.foreach(e => into.put("estimate", e))
            }
            // the family's selection ladder (one state dir, earlier
            // rungs win ties): flat → grouped → windowed. All reads
            // linearizable
            val st = graft.streaming.StreamingDistinct
              .readStateLocked(store.spark, sd)
            val gst =
              if (st.lastBatchId < 0L)
                Some(graft.streaming.StreamingGroupedDistinct
                  .readStateLocked(store.spark, sd))
                  .filter(_.lastBatchId >= 0L)
              else None
            val wst =
              if (st.lastBatchId < 0L && gst.isEmpty)
                Some(graft.streaming.StreamingWindowedDistinct
                  .readStateLocked(store.spark, sd))
                  .filter(_.lastBatchId >= 0L)
              else None
            // RAW query, decoded per VALUE after the '&' split: getQuery
            // pre-decodes percent-escapes, so a group name containing '&'
            // or '=' (sent correctly encoded, e.g. group=r%26d) would be
            // truncated at the decoded separator and 404 as 'r'
            val qp = Option(ex.getRequestURI.getRawQuery)
              .map(_.split("&").toSeq).getOrElse(Seq.empty)
            val wantGroup = qp.collectFirst {
              case s if s.startsWith("group=") => java.net.URLDecoder
                .decode(s.drop("group=".length), "UTF-8")
            }
            // ?verify=true — the cardinality face's recount twin: build
            // the one-shot sketch over the operator-configured source
            // corpus and compare CANONICAL estimates (union-composite on
            // both sides — the HLL semilattice makes them equal on a
            // drained stream) plus the exact row counters.
            val wantVerify = qp.contains("verify=true")
            // the windowed 409 before the unconfigured-source 403 — the
            // moments route's ordering: a windowed fold can never be
            // recount-verified, so a 403 would send the operator on an
            // errand that cannot end in a working verify
            if (wantVerify && wst.isDefined)
              (409, err("windowed distinct cannot be recount-verified " +
                "against the source corpus: the corpus does not record " +
                "which rows arrived in the newest " +
                s"${wst.get.window} micro-batches, so an all-time " +
                "recount cannot reproduce the window. The ring's " +
                "semilattice equality is pinned by the fold's own " +
                "oracle row and spec"))
            else if (wantVerify && distinctSourceDir.isEmpty)
              (403, err("distinct verify not configured on this server: " +
                "the recount is a Spark job over the stream's source " +
                "corpus — pass distinctSourceDir to RestServer (client-" +
                "supplied paths are not accepted, same posture as the " +
                "other profiling verifies)"))
            else if (wantVerify && st.lastBatchId < 0L && gst.isEmpty &&
                wst.isEmpty)
              (409, err(s"no folded distinct state under $sd — start the " +
                "ingest (or point the server at its state dir) before " +
                "asking for a recount verify"))
            else {
            def verifyCorpus(needGroup: Boolean)
                : Either[(Int, ObjectNode), org.apache.spark.sql.DataFrame] = {
              val corpus = store.spark.read.parquet(distinctSourceDir.get)
              val needed = (if (needGroup) Seq(distinctGroupCol)
                else Seq.empty[String]) :+ distinctValueCol
              val missing = needed.filterNot(corpus.columns.toSet.contains)
              if (missing.nonEmpty)
                Left((422, err("distinct verify: configured column(s) " +
                  missing.mkString("'", "', '", "'") +
                  " not present in the source corpus schema (" +
                  corpus.columns.mkString(", ") + ") — the server's " +
                  "distinctGroupCol/distinctValueCol must name the " +
                  "columns the ingest folded")))
              else Right(corpus)
            }
            def cEst(bytes: Array[Byte], lgK: Int): Option[Double] =
              graft.streaming.StreamingDistinct.canonicalEstimate(lgK, bytes)
            val n = obj()
            gst match {
              case Some(g0) =>
                wantGroup match {
                  case Some(g) if !g0.groups.contains(g) =>
                    (404, err(s"group '$g' not in the folded grouped " +
                      s"distinct state (${g0.groups.size} groups folded)"))
                  case _ =>
                    n.put("folded", true)
                    n.put("grouped", true)
                    n.put("lg_k", g0.lgK)
                    n.put("value_col", g0.valueCol)
                    n.put("checkpoint", g0.checkpoint)
                    n.put("last_batch_id", g0.lastBatchId)
                    n.put("group_count", g0.groups.size)
                    n.put("excluded_null_rows", g0.excludedNullRows)
                    n.put("counters_are_exact", true)
                    val selected = wantGroup match {
                      case Some(g) => Seq(g -> g0.groups(g))
                      case None => g0.groups.toSeq.sortBy(_._1)
                    }
                    val gs = n.putObject("groups")
                    selected.foreach { case (g, d) =>
                      writeDistinct(gs.putObject(g), d.nRows, d.nNull,
                        d.estimate)
                    }
                    if (!wantVerify) (200, n)
                    else verifyCorpus(needGroup = true) match {
                      case Left(resp) => resp
                      case Right(corpus) =>
                        val v = n.putObject("verify")
                        // bounded collect: one sketch row per source
                        // group, capped like the other grouped verifies
                        val rowCap = g0.groups.size + 16
                        val gcol = col("`" + distinctGroupCol
                          .replace("`", "``") + "`")
                        val vcol = col("`" + distinctValueCol
                          .replace("`", "``") + "`")
                        val rows = corpus.filter(gcol.isNotNull)
                          .groupBy(gcol.as("g"))
                          .agg(count(lit(1)).as("n_rows"),
                            count(vcol).as("n"),
                            hll_sketch_agg(vcol, lit(g0.lgK)).as("sk"))
                          .head(rowCap + 1)
                        if (rows.length > rowCap) {
                          v.put("matched", false)
                          v.put("error", "source group cardinality " +
                            s"exceeds the verify bound: the folded state " +
                            s"holds ${g0.groups.size} groups but the " +
                            s"recount produced more than $rowCap rows — " +
                            "the group column has drifted; the compare " +
                            "was skipped rather than collecting an " +
                            "unbounded relation into the serving driver")
                        } else {
                          val recount = rows.map { r =>
                            val bytes = if (r.getLong(2) == 0L ||
                                r.isNullAt(3)) Array.empty[Byte]
                              else r.getAs[Array[Byte]](3)
                            r.getString(0) -> ((r.getLong(1),
                              r.getLong(1) - r.getLong(2), bytes))
                          }.toMap
                          val allGroups = (g0.groups.keySet ++
                            recount.keySet).toSeq.sorted
                          val bad = allGroups.filter { g =>
                            (g0.groups.get(g), recount.get(g)) match {
                              case (Some(a), Some((bn, bnull, bsk))) =>
                                a.nRows != bn || a.nNull != bnull ||
                                  cEst(a.sketch, g0.lgK) != cEst(bsk, g0.lgK)
                              case _ => true
                            }
                          }
                          v.put("matched", bad.isEmpty)
                          v.put("state_group_count", g0.groups.size)
                          v.put("recount_group_count", recount.size)
                          v.put("mismatched_group_count", bad.size)
                          val bl = v.putArray("mismatched_groups")
                          bad.take(10).foreach(bl.add)
                        }
                        (200, n)
                    }
                }
              case None if wst.isDefined =>
                val w = wst.get
                // wantVerify cannot reach here: the windowed 409 is the
                // FIRST verify pre-check above (before the 403)
                if (wantGroup.isDefined)
                  (404, err(s"group '${wantGroup.get}' not available: " +
                    "the folded distinct state is a sliding WINDOW (no " +
                    "groups) — group selection needs a " +
                    "StreamingGroupedDistinct fold"))
                else {
                  n.put("folded", true)
                  n.put("grouped", false)
                  n.put("windowed", true)
                  n.put("lg_k", w.lgK)
                  n.put("value_col", w.valueCol)
                  n.put("checkpoint", w.checkpoint)
                  n.put("last_batch_id", w.lastBatchId)
                  n.put("window", w.window)
                  n.put("ring_depth", w.ring.size)
                  n.put("counters_are_exact", true)
                  writeDistinct(n, w.nRows, w.nNull, w.estimate)
                  (200, n)
                }
              case None if wantGroup.isDefined =>
                (404, err(s"group '${wantGroup.get}' not available: the " +
                  (if (st.lastBatchId < 0L) "state dir holds no folded distinct state"
                   else "folded distinct state is flat (no groups)") +
                  " — group selection needs a StreamingGroupedDistinct fold"))
              case None if st.lastBatchId < 0L =>
                n.put("folded", false)
                n.put("last_batch_id", -1L)
                n.put("n_rows", 0L)
                (200, n)
              case None =>
                n.put("folded", true)
                n.put("grouped", false)
                n.put("lg_k", st.lgK)
                n.put("value_col", st.valueCol)
                n.put("checkpoint", st.checkpoint)
                n.put("last_batch_id", st.lastBatchId)
                n.put("counters_are_exact", true)
                writeDistinct(n, st.nRows, st.nNull, st.estimate)
                if (!wantVerify) (200, n)
                else verifyCorpus(needGroup = false) match {
                  case Left(resp) => resp
                  case Right(corpus) =>
                    val v = n.putObject("verify")
                    val (tn, tnull, tsk) = graft.streaming.StreamingDistinct
                      .batchSketch(corpus, distinctValueCol, st.lgK)
                    val countersMatch =
                      tn == st.nRows && tnull == st.nNull
                    val estMatch =
                      cEst(st.sketch, st.lgK) == cEst(tsk, st.lgK)
                    v.put("matched", countersMatch && estMatch)
                    v.put("counters_matched", countersMatch)
                    v.put("estimate_matched", estMatch)
                    v.put("state_n_rows", st.nRows)
                    v.put("recount_n_rows", tn)
                    (200, n)
                }
            }
            }
        }
      case ("POST", "/api/v1/admin/frequent-items/recount") =>
        (frequentItemsStateDir, frequentItemsSourceDir) match {
          case (Some(sd), Some(srcDir)) =>
            val req = body(ex)
            if (req == null || !req.hasNonNull("denominator"))
              (400, err("'denominator' required (items at >= 1/denominator " +
                "of the (group's) token mass are returned, with EXACT counts)"))
            else {
              val denom = req.get("denominator").asLong()
              // validated HERE as well as in the operators: Jackson's
              // asLong() coerces non-numeric JSON to 0, and a zero or
              // negative denominator inverts the threshold arithmetic —
              // a 200 "exact" answer for a garbage request
              if (denom <= 0)
                (400, err(s"'denominator' must be a positive integer, " +
                  s"got ${req.get("denominator").asText()}"))
              else {
                // ONE locked snapshot drives the flat-vs-grouped decision
                // AND the recount (heavyHittersFromSnapshot, no internal
                // lock-free re-read): under a hot writer the route can
                // neither hit the lock-free read's contention error nor
                // serve totals from a different batch than the counts
                val (st, gstOpt, wstOpt) = foldedFrequentItems(sd)
                if (wstOpt.isDefined)
                  // the family's windowed-verify rule: the corpus does
                  // not record which rows arrived in the newest N
                  // batches, so an all-time recount cannot reproduce
                  // the window — a named 409, checked BEFORE the
                  // no-state one (the windowed state IS folded)
                  (409, err("windowed frequent-items cannot be exactly " +
                    "recounted against the source corpus: the corpus " +
                    "does not record which rows arrived in the newest " +
                    s"${wstOpt.get.window} micro-batches. The window's " +
                    "coverage guarantee is pinned by the fold's own " +
                    "oracle row and spec; serve the envelope's MG " +
                    "lower bounds instead"))
                else if (st.lastBatchId < 0L && gstOpt.isEmpty)
                  // nothing folded: recounting is a category error, not an
                  // empty answer — 409 so a misconfigured monitor can't
                  // read "no state" as "no heavy hitters"
                  (409, err(s"no folded frequent-items state under $sd — " +
                    "start the ingest (or point the server at its state " +
                    "dir) before asking for an exact recount"))
                else {
                  val corpus = store.spark.read.parquet(srcDir)
                  val n = obj()
                  n.put("denominator", denom)
                  gstOpt match {
                    case None =>
                      val toks = corpus.select(explode(
                        graft.functions.TextFunctions.tokens(col("text"))).as("token"))
                      val rows = graft.streaming.StreamingHeavyHitters
                        .heavyHittersFromSnapshot(st, sd, toks, "token", denom)
                        .collect() // bounded: <= denominator heavy hitters
                      n.put("grouped", false)
                      n.put("n", st.n)
                      val c = n.putObject("counts")
                      rows.foreach(r => c.put(r.getString(0), r.getLong(1)))
                    case Some(gst) =>
                      val toks = corpus.select(col("source"), explode(
                        graft.functions.TextFunctions.tokens(col("text"))).as("token"))
                      val rows = graft.streaming.StreamingGroupedHeavyHitters
                        .heavyHittersFromSnapshot(gst, sd, store.spark, toks,
                          "source", "token", denom)
                        .collect() // bounded: <= groups x denominator rows
                      n.put("grouped", true)
                      n.put("n", gst.groups.valuesIterator.map(_.n).sum)
                      n.put("excluded_null_rows", gst.excludedNullRows)
                      val gs = n.putObject("groups")
                      rows.foreach { r =>
                        val gn =
                          if (gs.has(r.getString(0))) gs.get(r.getString(0))
                            .asInstanceOf[ObjectNode]
                          else gs.putObject(r.getString(0))
                        gn.put(r.getString(1), r.getLong(2))
                      }
                  }
                  // the point of this route vs the GET envelope's estimates
                  n.put("counts_are_exact", true)
                  (200, n)
                }
              }
            }
          case (Some(_), None) => (403, err(
            "frequent-items recount not configured on this server: the " +
              "recount is a Spark job over the stream's source corpus — " +
              "pass frequentItemsSourceDir to RestServer (client-supplied " +
              "paths are not accepted, same posture as admin/backup)"))
          case _ => (404, err(
            "frequent-items state not configured on this server " +
              "(pass frequentItemsStateDir to RestServer)"))
        }
      case ("POST", "/api/v1/admin/migrate") =>
        val tm0 = System.nanoTime()
        val migrated = store.migrate()
        if (migrated > 0) mutated("migrate", Seq(migrated.toString))
        val n = obj(); n.put("migrated", migrated)
        // reference MigrationResponse field names (rest.rs:178-181)
        n.put("vectors_migrated", migrated)
        n.put("duration_ms", (System.nanoTime() - tm0) / 1e6)
        (200, n)
      case ("POST", "/api/v1/admin/vacuum") =>
        val res = store.vacuum()
        mutated("vacuum", Seq((res.recentRemoved + res.historicalRemoved).toString))
        val n = obj()
        n.put("recent_removed", res.recentRemoved)
        n.put("historical_removed", res.historicalRemoved)
        (200, n)
      case ("POST", "/api/v1/admin/rebalance") =>
        val moved = store.rebalance(optInt(body(ex), "max_cluster_size", 10000))
        if (moved > 0) mutated("rebalance", Seq(moved.toString))
        val n = obj(); n.put("moved", moved)
        // reference RebalanceResponse field names (rest.rs:184-187; its
        // own handler is a TODO stub returning zeros — ours reports the
        // measured counts)
        n.put("vectors_moved", moved)
        n.put("clusters_modified",
          if (moved > 0) store.maintenanceStats.lastClustersModified else 0L)
        (200, n)
      // serving-index lifecycle (the reference builds its indexes inside
      // the engine on insert; here index builds are explicit admin actions
      // so the store stays zero-maintenance by default). A rebuilt artifact
      // changes what the affected modes would return (and even which
      // requests they accept — e.g. the recent index's metric), so the
      // query memo must not outlive it.
      case ("POST", "/api/v1/admin/index/recent") =>
        val req = body(ex)
        store.buildRecentIndex(
          efConstruction = optInt(req, "ef_construction", 100),
          m = optInt(req, "m", 16),
          metric = if (req != null && req.hasNonNull("metric"))
            req.get("metric").asText() else "l2")
        queryCache.clear()
        val n = obj(); n.put("built", true); (200, n)
      case ("POST", "/api/v1/admin/index/pq") =>
        val req = body(ex)
        if (req != null && req.hasNonNull("refresh") && req.get("refresh").asBoolean()) {
          val encoded = store.refreshPq()
          queryCache.clear()
          val n = obj(); n.put("refreshed", true); n.put("encoded", encoded); (200, n)
        } else {
          // residual: the FAISS formulation (codebooks on v - centroid);
          // serves l2 and cosine like the plain tier
          val residual = req != null && req.hasNonNull("residual") &&
            req.get("residual").asBoolean()
          store.enablePq(m = optInt(req, "m", 8),
            kCodes = optInt(req, "k_codes", 64),
            trainSize = optInt(req, "train_size", 10000),
            retrain = req == null || !req.hasNonNull("retrain") ||
              req.get("retrain").asBoolean(),
            residual = residual)
          queryCache.clear()
          val n = obj(); n.put("enabled", true)
          n.put("residual", residual); (200, n)
        }
      case ("POST", "/api/v1/admin/index/opq") =>
        val req = body(ex)
        if (req != null && req.hasNonNull("refresh") && req.get("refresh").asBoolean()) {
          val encoded = store.refreshOpq()
          queryCache.clear()
          val n = obj(); n.put("refreshed", true); n.put("encoded", encoded); (200, n)
        } else if ((req == null || !req.hasNonNull("retrain") ||
            req.get("retrain").asBoolean()) &&
            (req == null || (!req.hasNonNull("m") &&
              !req.hasNonNull("k_codes"))) && store.hasOpqModel) {
          // an existing tier retrained WITHOUT explicit shape params must
          // keep the shape it was built with (the drift-gate remediation
          // the integrity warning points at) — the enableOpq defaults
          // (m=8, 64 codes) would otherwise silently change the tier's
          // code geometry on a bare {"retrain": true}
          store.retrainOpq(
            trainSize = Option(req).flatMap(r =>
              Option(r.get("train_size"))).filter(_.isInt).map(_.asInt()),
            iters = Option(req).flatMap(r =>
              Option(r.get("iters"))).filter(_.isInt).map(_.asInt()))
          queryCache.clear()
          val n = obj(); n.put("enabled", true)
          n.put("shape_preserved", true); (200, n)
        } else {
          store.enableOpq(m = optInt(req, "m", 8),
            kCodes = optInt(req, "k_codes", 64),
            trainSize = optInt(req, "train_size", 10000),
            retrain = req == null || !req.hasNonNull("retrain") ||
              req.get("retrain").asBoolean(),
            iters = optInt(req, "iters", 5))
          queryCache.clear()
          val n = obj(); n.put("enabled", true); (200, n)
        }
      case ("POST", "/api/v1/admin/index/sq") =>
        val req = body(ex)
        if (req != null && req.hasNonNull("refresh") && req.get("refresh").asBoolean()) {
          val encoded = store.refreshSq()
          queryCache.clear()
          val n = obj(); n.put("refreshed", true); n.put("encoded", encoded); (200, n)
        } else {
          store.enableSq()
          queryCache.clear()
          val n = obj(); n.put("enabled", true); (200, n)
        }
      case ("POST", "/api/v1/admin/index/bq") =>
        val req = body(ex)
        if (req != null && req.hasNonNull("refresh") && req.get("refresh").asBoolean()) {
          val encoded = store.refreshBq()
          queryCache.clear()
          val n = obj(); n.put("refreshed", true); n.put("encoded", encoded); (200, n)
        } else {
          store.enableBq()
          queryCache.clear()
          val n = obj(); n.put("enabled", true); (200, n)
        }
      case ("POST", "/api/v1/admin/backup") =>
        val req = body(ex)
        if (req == null || !req.hasNonNull("target"))
          (400, err("'target' path required"))
        else backupBase match {
          case None =>
            (403, err("backup disabled: no backupBase configured on this server"))
          case Some(base) =>
            val target = req.get("target").asText()
            val baseNorm = java.nio.file.Paths.get(base).toAbsolutePath.normalize
            val targetNorm =
              baseNorm.resolve(target.stripPrefix("/")).normalize
            if (!targetNorm.startsWith(baseNorm))
              (403, err("backup target escapes the configured backup base"))
            else {
              val n = obj()
              n.put("target", targetNorm.toString)
              val bytes = store.backup(targetNorm.toString)
              n.put("bytes", bytes)
              // reference BackupResponse field names (rest.rs:196-200; its
              // handler is a TODO stub — ours reports the real copy)
              val st = store.stats()
              n.put("backup_size", bytes)
              n.put("vectors_backed_up", st.recentCount + st.historicalCount)
              n.put("compression_ratio", 1.0) // byte-identical clone
              (200, n)
            }
        }
      case _ => (404, err("unknown admin route"))
    })
    server.setExecutor(null) // serial: one Spark driver, one request at a time
    ssePusher.start()
    wsAcceptor.start()
    server.start()
    this
  }

  def stop(): Unit = {
    ssePusher.interrupt()
    sseWatchdog.shutdownNow()
    try wsServer.close() catch { case NonFatal(_) => }
    wsSubs.forEach(c => c.close())
    wsSubs.clear()
    sseSubs.forEach(sub => try sub.close() catch { case NonFatal(_) => })
    sseSubs.clear()
    server.stop(0)
  }

  private object IdPath {
    def unapply(path: String): Option[String] = {
      val prefix = "/api/v1/vectors/"
      if (path.startsWith(prefix) && path.length > prefix.length)
        Some(java.net.URLDecoder.decode(path.drop(prefix.length), UTF_8))
      else None
    }
  }

  private def obj(): ObjectNode = mapper.createObjectNode()

  private def err(msg: String): ObjectNode = {
    val n = obj(); n.put("error", msg); n
  }

  private def body(ex: HttpExchange): JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))

  private def optInt(req: JsonNode, name: String, dflt: Int): Int =
    if (req != null && req.hasNonNull(name)) req.get(name).asInt() else dflt

  /** The ONE encoding of the frequent-items flat-vs-grouped selection
    * rule, shared by the GET envelope and the recount route so the two
    * surfaces cannot drift: the dir may hold the FLAT fold's state
    * (mg_state.json) or the GROUPED fold's (mg_grouped_state.json) —
    * serve whichever is folded, flat winning ties. Returns the flat
    * snapshot plus the grouped one ONLY when it should be served
    * (grouped folded, flat not); neither folded = (empty flat, None) —
    * the GET serializes that through its flat branch (no hand-written
    * empty envelope), the recount treats it as a 409 category error.
    * Both reads are LINEARIZABLE (the writer's swap lock), so a hot
    * stream yields a consistent snapshot, and every field the caller
    * serves — totals, counts, thresholds — must come from THIS snapshot,
    * never a second read behind it. */
  private def foldedFrequentItems(sd: String)
      : (graft.streaming.StreamingHeavyHitters.MgSnapshot,
         Option[graft.streaming.StreamingGroupedHeavyHitters.GroupedMgSnapshot],
         Option[graft.streaming.StreamingWindowedHeavyHitters.WindowedMgSnapshot]) = {
    val st = graft.streaming.StreamingHeavyHitters
      .readStateLocked(store.spark, sd)
    val gst =
      if (st.lastBatchId < 0L)
        Some(graft.streaming.StreamingGroupedHeavyHitters
          .readStateLocked(store.spark, sd))
          .filter(_.lastBatchId >= 0L)
      else None
    val wst =
      if (st.lastBatchId < 0L && gst.isEmpty)
        Some(graft.streaming.StreamingWindowedHeavyHitters
          .readStateLocked(store.spark, sd))
          .filter(_.lastBatchId >= 0L)
      else None
    (st, gst, wst)
  }

  /** The histogram instantiation of the frequent-items flat-vs-grouped
    * selection rule (see [[foldedFrequentItems]] — same contract: one
    * encoding per state family, both reads linearizable, flat wins
    * ties, neither-folded serializes through the flat branch's empty
    * envelope): the dir may hold the FLAT fold's state
    * (hist_state.json) or the GROUPED fold's (hist_grouped_state.json). */
  private def foldedHistograms(sd: String)
      : (graft.streaming.StreamingHistogram.HistSnapshot,
         Option[graft.streaming.StreamingGroupedHistogram.GroupedHistSnapshot],
         Option[graft.streaming.StreamingWindowedHistogram.WindowedHistSnapshot]) = {
    val st = graft.streaming.StreamingHistogram
      .readStateLocked(store.spark, sd)
    val gst =
      if (st.lastBatchId < 0L)
        Some(graft.streaming.StreamingGroupedHistogram
          .readStateLocked(store.spark, sd))
          .filter(_.lastBatchId >= 0L)
      else None
    // the face's TIME-dimension rung: flat → grouped → windowed
    val wst =
      if (st.lastBatchId < 0L && gst.isEmpty)
        Some(graft.streaming.StreamingWindowedHistogram
          .readStateLocked(store.spark, sd))
          .filter(_.lastBatchId >= 0L)
      else None
    (st, gst, wst)
  }

  private def floats(n: JsonNode): Array[Float] =
    if (n == null || !n.isArray) Array.empty
    else n.elements().asScala.map(_.floatValue()).toArray

  private def record(n: JsonNode): VectorStore.VectorRecord = {
    val id = Option(n.get("id")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException("'id' required"))
    val vec = floats(n.get("vector"))
    if (vec.isEmpty) throw new IllegalArgumentException("Vector cannot be empty")
    VectorStore.VectorRecord(id, vec,
      Option(n.get("metadata")).filter(!_.isNull).map(mapper.writeValueAsString))
  }

  /** Route + JSON-error envelope: IllegalArgument -> 400 (the reference's
    * bad_request), anything else -> 500 {"error": ...}. */
  private def handle(ex: HttpExchange)(
      route: PartialFunction[(String, String), (Int, ObjectNode)]): Unit = {
    val key = (ex.getRequestMethod, ex.getRequestURI.getPath)
    val (status, node) =
      try route.applyOrElse(key,
        (_: (String, String)) => (404, err(s"no route: $key")))
      catch {
        case e: IllegalArgumentException => (400, err(e.getMessage))
        case NonFatal(e) => (500, err(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    val bytes = mapper.writeValueAsBytes(node)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}

/** `runMain graft.serve.ServeMain <storePath> [port] [wsPort]` — standalone
  * server (wsPort: the RFC 6455 `/api/v1/updates/ws` companion listener;
  * 0/omitted = ephemeral). */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_store")
    val port = args.lift(1).map(_.toInt).getOrElse(8080)
    val wsPort = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // env-wired optional surfaces (the operator-config posture: routes
    // stay disabled-404 unless explicitly pointed at a path) — without
    // these the standalone entrypoint could never enable the backup
    // route or the streaming-profile monitors (frequent-items r13,
    // histogram r14-15, sample r15-16) at all
    val backupBase = sys.env.get("SPARK_GRAFT_BACKUP_BASE")
    val fiStateDir = sys.env.get("SPARK_GRAFT_FREQUENT_ITEMS_STATE")
    val fiSourceDir = sys.env.get("SPARK_GRAFT_FREQUENT_ITEMS_SOURCE")
    val histStateDir = sys.env.get("SPARK_GRAFT_HISTOGRAM_STATE")
    val histSourceDir = sys.env.get("SPARK_GRAFT_HISTOGRAM_SOURCE")
    val sampleStateDir = sys.env.get("SPARK_GRAFT_SAMPLE_STATE")
    val sampleSourceDir = sys.env.get("SPARK_GRAFT_SAMPLE_SOURCE")
    val momentsStateDir = sys.env.get("SPARK_GRAFT_MOMENTS_STATE")
    val momentsSourceDir = sys.env.get("SPARK_GRAFT_MOMENTS_SOURCE")
    val distinctStateDir = sys.env.get("SPARK_GRAFT_DISTINCT_STATE")
    val distinctSourceDir = sys.env.get("SPARK_GRAFT_DISTINCT_SOURCE")
    val comomentsStateDir = sys.env.get("SPARK_GRAFT_COMOMENTS_STATE")
    val comomentsSourceDir = sys.env.get("SPARK_GRAFT_COMOMENTS_SOURCE")
    // the recount/verify faces read the COLUMNS the ingests folded —
    // without these the standalone server could never verify a fold
    // ingested with non-default column names (or a value-carrying
    // sample at all: values_matched would false-alarm forever)
    val srv = new RestServer(new VectorStore(spark, path), port,
      backupBase = backupBase, wsPort = wsPort,
      frequentItemsStateDir = fiStateDir,
      frequentItemsSourceDir = fiSourceDir,
      histogramStateDir = histStateDir,
      histogramSourceDir = histSourceDir,
      histogramGroupCol =
        sys.env.getOrElse("SPARK_GRAFT_HISTOGRAM_GROUP_COL", "event_type"),
      histogramValueCol =
        sys.env.getOrElse("SPARK_GRAFT_HISTOGRAM_VALUE_COL", "value"),
      sampleStateDir = sampleStateDir,
      sampleSourceDir = sampleSourceDir,
      sampleGroupCol =
        sys.env.getOrElse("SPARK_GRAFT_SAMPLE_GROUP_COL", "source"),
      sampleIdCol =
        sys.env.getOrElse("SPARK_GRAFT_SAMPLE_ID_COL", "doc_id"),
      sampleValueCol =
        sys.env.get("SPARK_GRAFT_SAMPLE_VALUE_COL"),
      momentsStateDir = momentsStateDir,
      momentsSourceDir = momentsSourceDir,
      momentsGroupCol =
        sys.env.getOrElse("SPARK_GRAFT_MOMENTS_GROUP_COL", "source"),
      momentsValueCol =
        sys.env.getOrElse("SPARK_GRAFT_MOMENTS_VALUE_COL", "value"),
      distinctStateDir = distinctStateDir,
      distinctSourceDir = distinctSourceDir,
      distinctGroupCol =
        sys.env.getOrElse("SPARK_GRAFT_DISTINCT_GROUP_COL", "source"),
      distinctValueCol =
        sys.env.getOrElse("SPARK_GRAFT_DISTINCT_VALUE_COL", "value"),
      comomentsStateDir = comomentsStateDir,
      comomentsSourceDir = comomentsSourceDir,
      comomentsGroupCol =
        sys.env.getOrElse("SPARK_GRAFT_COMOMENTS_GROUP_COL", "source"),
      comomentsXCol =
        sys.env.getOrElse("SPARK_GRAFT_COMOMENTS_X_COL", "x"),
      comomentsYCol =
        sys.env.getOrElse("SPARK_GRAFT_COMOMENTS_Y_COL", "y")).start()
    println(s"graft serving on :${srv.boundPort} " +
      s"(ws :${srv.boundWsPort}, store: $path" +
      fiStateDir.map(d => s", frequent-items: $d").getOrElse("") +
      histStateDir.map(d => s", histogram: $d").getOrElse("") +
      sampleStateDir.map(d => s", sample: $d").getOrElse("") +
      momentsStateDir.map(d => s", moments: $d").getOrElse("") +
      distinctStateDir.map(d => s", distinct: $d").getOrElse("") +
      comomentsStateDir.map(d => s", comoments: $d").getOrElse("") +
      backupBase.map(b => s", backups under: $b").getOrElse("") + ")")
    Thread.currentThread().join()
  }
}
