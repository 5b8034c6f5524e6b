package graft.serving

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{Executors, TimeUnit}

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.engine.TopicStore

/** REST serving shim over [[TopicStore]] — the reference's HTTP surface
  * (`docs/rest_api/README.md`) on one port:
  *
  *  - `GET /status`, `GET /v1/brokers` — discovery (C6,
  *    `internal/discovery/discoverer_client_service.go:30-124`); a single
  *    engine address replaces the broker list.
  *  - `POST /v1/topic/{topic}/messages?partitionKey=&timestamp=` — produce
  *    (S1 `internal/producing/server.go:126-190`); `application/x-ndjson`
  *    splits the body into per-line records (S2 `models.go:44-87`);
  *    `timestamp` is client-supplied micros, else server ingest time.
  *  - `PUT /v1/consumer/register?consumerId=&group=&topic=&onNewGroup=`,
  *    `POST /v1/consumer/{poll|commit|goodbye}?consumerId=` — the consumer
  *    flow (R1/R3/R4, `internal/consuming/server.go:203-488`): poll answers
  *    200 with the JSON delivery shape (S9 `models.go:136-199`), 204 +
  *    `Retry-After: 5` when empty (`utils.go:158-165`), 409 when the
  *    consumer is unknown or evicted after 2 min idle (R11,
  *    `server.go:191-201`).
  *
  * Produce requests funnel through a W1-style coalescer
  * (`internal/producing/coalescer.go:81-172`): handlers enqueue and block
  * on an ack future; a single drain loop groups up to `maxGroupBytes` or
  * whatever arrived in one `coalesceMs` window into ONE `TopicStore
  * .produce` micro-batch per topic, and acks only after the durable write
  * returns — at-least-once, per-key ordered (request order is threaded
  * through as the `__seq` tiebreak). The bounded queue is the backpressure
  * analog of the fixed producer buffer pool (W7).
  *
  * Delivery bookkeeping matches the reference's at-least-once flow: a poll
  * response's end position is only *staged*; it commits on the consumer's
  * NEXT poll/commit/goodbye (`docs/rest_api/README.md` Consumer API — "the
  * brokers will automatically commit the previous position when new data
  * is requested"), so a consumer that dies mid-processing re-reads.
  */
class RestServer(
    val store: TopicStore,
    port: Int = 0,
    readTimeoutMs: Long = 2 * 60 * 1000L,
    coalesceMs: Long = 50L,
    maxGroupBytes: Long = 2L * 1024 * 1024,
    maxMessageBytes: Int = 1024 * 1024, // POLAR_MAX_MESSAGE_SIZE default
    // ConsumerReadThreshold analog (`internal/conf/config.go:278-280`): a
    // poll serves at most this many bytes/records per partition and pages
    // across polls via the deferred-commit staging — a first poll of an
    // `earliest` group on a huge topic returns one bounded page, never the
    // whole backlog into the driver heap
    maxPollBytes: Long = 2L * 1024 * 1024,
    maxPollRecords: Long = 8192L,
    // advertised alongside the consumer/producer HTTP port when the binary
    // producer server runs (discovery parity: the reference returns
    // `producerBinaryPort`, `discoverer_client_service.go:30-124`)
    producerBinaryPort: Int = 0) {

  // ------------------------------------------------------ produce pipeline

  val metrics = new EngineMetrics
  metrics.maintenance = Some(store.maintenanceStats)
  metrics.planeLeaseEpoch = () => store.planeLeaseEpoch.getOrElse(0L)

  /** The shared produce batcher. PUBLIC so a co-hosted binary producer
    * server shares it: one coalescer means one Spark produce job per
    * window across ALL channels instead of one per request. (Correctness
    * no longer depends on this sharing — `TopicStore.produce` serializes
    * internally — but unbatched concurrent producers would each pay a
    * full job and queue on the store's lock.)
    */
  val coalescer = new ProduceCoalescer(
    store, coalesceMs = coalesceMs, maxGroupBytes = maxGroupBytes, metrics = metrics)

  // where handleProduce submits: the local coalescer by default; a
  // BrokerGroup re-points it at the group's ShardRouter so any broker
  // accepts any produce and in-process routing replaces the reference's
  // broker-to-broker forward (S4)
  @volatile private var produceChannel: ProduceChannel = coalescer

  def routeProduceVia(c: ProduceChannel): Unit = produceChannel = c

  // cluster discovery listing override (BrokerGroup advertises the whole
  // group through every member); None keeps the single-engine response
  @volatile private var clusterListing: Option[String] = None

  def advertiseCluster(json: String): Unit = clusterListing = Some(json)

  // settable after construction: the binary server usually binds after the
  // REST server exists (it needs the shared coalescer above)
  @volatile private var advertisedBinaryPort: Int = producerBinaryPort

  def advertiseProducerBinaryPort(p: Int): Unit = advertisedBinaryPort = p

  // ------------------------------------------------------- consumer state

  private class Session(val consumerId: String, val group: String, val topics: Seq[String]) {
    @volatile var lastSeen: Long = System.currentTimeMillis()
    // staged next-read positions from the LAST poll, commit deferred;
    // stamped with the generation version the records were read under so
    // a commit flushed after a rescale is rejected instead of silently
    // skipping unread new-generation records
    val pendingCommit: mutable.Map[String, (Int, Map[Int, Long])] = mutable.Map.empty
  }

  private val sessions = new java.util.concurrent.ConcurrentHashMap[String, Session]()

  // commits carry the consumer as origin, so a reassigned partition's
  // stale deferred commit is rejected instead of rewinding the offset
  private def commitPending(s: Session): Unit = s.synchronized {
    s.pendingCommit.foreach { case (topic, (ver, next)) =>
      if (next.nonEmpty) store.commit(s.group, topic, next, origin = s.consumerId, version = ver)
    }
    s.pendingCommit.clear()
  }

  /** R11: unregister consumers idle beyond the read timeout (activity =
    * any consumer-API request). Their next poll answers 409.
    */
  private def evictIdle(): Unit = {
    val now = System.currentTimeMillis()
    sessions.forEach { (id, s) =>
      if (now - s.lastSeen > readTimeoutMs) {
        // DROP the staged positions, never flush them: the staged page was
        // delivered but the consumer vanished without acknowledging it via
        // a next poll/commit/goodbye. Eviction is the failure path of the
        // at-least-once contract — committing here would mark the unacked
        // page consumed and the group would silently skip it. The group
        // re-reads from the last durable commit instead.
        s.synchronized { s.pendingCommit.clear() }
        store.registry.goodbye(s.group, id)
        sessions.remove(id)
        metrics.activeConsumers.set(sessions.size.toLong)
      }
    }
  }

  // --------------------------------------------------------- http plumbing

  private val http = HttpServer.create(new InetSocketAddress(port), 0)
  // produce handlers BLOCK on the flush ack (ack-after-durable), so the
  // pool size is the server's concurrent-producer ceiling — 16 threads
  // capped the wire bench at ~145K msgs/s with the flush itself idle
  private val pool = Executors.newFixedThreadPool(32)
  http.setExecutor(pool)

  def boundPort: Int = http.getAddress.getPort

  def start(): RestServer = { coalescer.start(); http.start(); this }

  def stop(): Unit = {
    http.stop(0)
    pool.shutdownNow() // non-daemon workers would otherwise pin the JVM
    coalescer.stop()
  }

  private def params(ex: HttpExchange): Map[String, Seq[String]] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").filter(_.nonEmpty).toSeq
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (URLDecoder.decode(kv, UTF_8), "")
        else (URLDecoder.decode(kv.take(i), UTF_8), URLDecoder.decode(kv.drop(i + 1), UTF_8))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private def respond(
      ex: HttpExchange, code: Int, body: String = "",
      headers: Map[String, String] = Map.empty): Unit =
    respondBytes(ex, code, body.getBytes(UTF_8), headers)

  private def respondBytes(
      ex: HttpExchange, code: Int, bytes: Array[Byte],
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    if (bytes.isEmpty) ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      os.write(bytes); os.close()
    }
    ex.close()
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  http.createContext("/", (ex: HttpExchange) => {
    // every REST-triggered Spark job (poll collect, commit write) runs in
    // the FAIR serving pool so analytics jobs can't starve it
    try store.inServingPool { route(ex) }
    catch {
      case d: graft.engine.PlaneDrainingException =>
        // RETRYABLE on every endpoint: a coordinated rescale window is in
        // progress (register/commit/poll on a draining consumer member
        // land here) — clients back off briefly instead of treating a
        // routine maintenance window as fatal
        try respond(ex, 503, s"""{"error":${jstr(String.valueOf(d.getMessage))}}""",
          Map("Retry-After" -> "1", "Content-Type" -> "application/json"))
        catch { case _: Throwable => () }
      case n: NoLiveOwnerException =>
        // RETRYABLE: the record's ring partition has no live advertised
        // owner right now (the owning member crashed and its successor
        // has not claimed yet) — a restart/takeover fixes it, so clients
        // back off instead of treating it as fatal
        try respond(ex, 503, s"""{"error":${jstr(String.valueOf(n.getMessage))}}""",
          Map("Retry-After" -> "2", "Content-Type" -> "application/json"))
        catch { case _: Throwable => () }
      case e: Throwable =>
        try respond(ex, 500, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""",
          Map("Content-Type" -> "application/json"))
        catch { case _: Throwable => () }
    }
  })

  private val TopicPath = "^/v1/topic/([^/]+)/messages$".r
  private val PurgePath = "^/v1/topic/([^/]+)/purge$".r

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    (method, path) match {
      case ("GET", "/status") =>
        // R11 fidelity: the reference's consumer /status marks the tracked
        // consumer as read (SetAsRead, consuming/server.go:149-151), so a
        // status probe keeps a consumer alive; the stateless-HTTP analog
        // takes the id as a param
        params(ex).get("consumerId").flatMap(_.headOption)
          .flatMap(cid => Option(sessions.get(cid)))
          .foreach(_.lastSeen = System.currentTimeMillis())
        respond(ex, 200, "OK")
      case ("GET", "/metrics") => // C10: Prometheus exposition endpoint
        respond(ex, 200, metrics.render,
          Map("Content-Type" -> "text/plain; version=0.0.4"))
      case ("GET", "/v1/brokers") =>
        // single engine address by default (Spark schedules internally,
        // C6 mapping); a BrokerGroup advertises the whole group; a Serve
        // deployment member lists the whole member directory with each
        // member's role and range claim — the reference's discovery
        // endpoint returns enough to reach every broker
        // (discoverer_client_service.go:30-124); ours returns enough to
        // reach every RANGE, so a client builds its produce and poll
        // sets from one call instead of reading `_meta/_serve/` itself
        respond(ex, 200,
          memberDirectory.map(memberListing)
            .orElse(clusterListing).getOrElse(
              s"""{"length":1,"names":["localhost"],"producerPort":$boundPort""" +
                s""","producerBinaryPort":$advertisedBinaryPort,"consumerPort":$boundPort}"""),
          Map("Content-Type" -> "application/json"))
      case ("POST", TopicPath(topic)) => handleProduce(ex, topic)
      // beyond parity (no reference analog): GDPR key erasure —
      // `POST /v1/topic/{t}/purge?key=a&key=b` → {"purged":N}. Admin
      // surface: the engine rewrite preserves survivors' offsets and the
      // watermark (TopicStore.purgeKeys), so registered consumers keep
      // their committed positions. purgeKeys holds the topic's maintenance
      // (write) lock and every poll collects under the read lock, so the
      // rename-then-delete swap window is invisible to consumers — no
      // double delivery, no FileNotFound on a just-planned file list.
      case ("POST", PurgePath(topic)) =>
        val keys = params(ex).getOrElse("key", Seq.empty).filter(_.nonEmpty)
        if (keys.isEmpty)
          respond(ex, 400, """{"error":"at least one key parameter required"}""",
            Map("Content-Type" -> "application/json"))
        else {
          val n = store.purgeKeys(topic, keys)
          respond(ex, 200, s"""{"purged":$n}""",
            Map("Content-Type" -> "application/json"))
        }
      case ("PUT" | "POST", "/v1/consumer/register") =>
        if (redirectConsumer(ex)) () else handleRegister(ex)
      case ("POST", "/v1/consumer/poll") =>
        if (redirectConsumer(ex)) () else handlePoll(ex)
      case ("POST", "/v1/consumer/commit") =>
        if (redirectConsumer(ex)) () else handleCommit(ex)
      case ("POST", "/v1/consumer/seek") =>
        if (redirectConsumer(ex)) () else handleSeek(ex)
      case ("POST", "/v1/consumer/goodbye") =>
        if (redirectConsumer(ex)) () else handleGoodbye(ex)
      case _ => respond(ex, 404, """{"error":"not found"}""",
        Map("Content-Type" -> "application/json"))
    }
  }

  // set by a Serve deployment member: used to point consumer-API callers
  // at a consumer-capable member when THIS member has no consumer
  // authority (a partition-scoped produce broker)
  @volatile private var memberDirectory: Option[MemberDirectory] = None

  // this member's advertised base URL (set by a Serve deployment member):
  // the legacy single-broker discovery fields describe THIS member
  @volatile private var advertisedBase: Option[String] = None

  def discoverMembersVia(d: MemberDirectory, selfBase: String = ""): Unit = {
    memberDirectory = Some(d)
    if (selfBase.nonEmpty) advertisedBase = Some(selfBase)
  }

  /** The member-deployment discovery payload: every live member with its
    * role (`root` / `parts` / `consumer`) and range claim in `members`,
    * plus the legacy single-broker fields describing THIS member ONLY
    * for clients of the single-process shape. The legacy `names` array
    * deliberately lists just this member: its companion `producerPort`/
    * `consumerPort` scalars can describe one member's ports, so pairing
    * them with OTHER members' hosts would send a legacy client to ports
    * where nothing listens — deployment-aware clients read `members`,
    * where every row carries its own base URL and binary port.
    */
  private def memberListing(d: MemberDirectory): String = {
    val ms = d.members()
    val rows = ms.map { m =>
      s"""{"base":${jstr(m.base)},"binaryPort":${m.binaryPort},""" +
        s""""mode":${jstr(m.mode)},"parts":""" +
        m.parts.map(ps => jstr(graft.engine.PlaneLease.specOf(ps))).getOrElse("null") +
        "}"
    }
    s"""{"length":1,"names":[${jstr(hostOf(advertisedBase.getOrElse("localhost")))}],""" +
      s""""producerPort":$boundPort,"producerBinaryPort":$advertisedBinaryPort,""" +
      s""""consumerPort":$boundPort,"members":[${rows.mkString(",")}]}"""
  }

  private def hostOf(base: String): String =
    // URI.create("host:port") parses with scheme "host" and a NULL host —
    // fall back to the raw base rather than NPE-ing the whole listing
    try Option(java.net.URI.create(base).getHost).getOrElse(base)
    catch { case _: Exception => base }

  /** A consumer-API request on a member WITHOUT consumer authority (a
    * partition-scoped produce broker) answers 307 with the freshest
    * consumer-capable member's address — HTTP-native rerouting (307
    * preserves method + body), the discovery counterpart of the produce
    * forward: clients that follow redirects need no deployment map. With
    * RANGE-SCOPED consumer members the redirect targets one of them;
    * full-coverage clients still subscribe to every consumer member, as
    * reference clients poll every broker for its ranges.
    */
  private def redirectConsumer(ex: HttpExchange): Boolean =
    memberDirectory match {
      case Some(d) if store.configuredPartitionClaim.isDefined =>
        d.consumerMembers match {
          case all @ (m +: _) =>
            val q = Option(ex.getRequestURI.getRawQuery).fold("")("?" + _)
            // with RANGE-SCOPED consumer members the Location is one of
            // them — a redirect-following client would silently see only
            // that member's ranges, so the header carries the COMPLETE
            // consumer-member set for clients that need full coverage
            respond(ex, 307, "",
              Map("Location" -> s"${m.base}${ex.getRequestURI.getPath}$q",
                "X-Graft-Consumer-Members" -> all.map(_.base).mkString(",")))
            true
          case _ =>
            respond(ex, 503,
              """{"error":"this member serves produce only and no live consumer-plane member is advertised"}""",
              Map("Content-Type" -> "application/json"))
            true
        }
      case _ => false
    }

  // ------------------------------------------------------------- handlers

  private def handleProduce(ex: HttpExchange, topic: String): Unit = {
    val qs = params(ex)
    // the binary poll response encodes the topic length as u8, so names
    // beyond 255 UTF-8 bytes would corrupt every binary delivery of them
    if (topic.getBytes(UTF_8).length > 255) {
      respond(ex, 400, """{"error":"topic name exceeds 255 bytes"}"""); return
    }
    // bounded read: readAllBytes() would buffer an arbitrarily large body
    // on the heap BEFORE the size check — 16 pool threads x a multi-GB
    // body is a driver OOM. readNBytes caps the buffering at limit+1;
    // one extra byte distinguishes exactly-at-limit from over it.
    val body = ex.getRequestBody.readNBytes(maxMessageBytes + 1)
    if (body.isEmpty) { respond(ex, 400, """{"error":"empty body"}"""); return }
    if (body.length > maxMessageBytes) { // reference: 400 over MaxMessageSize
      respond(ex, 400,
        s"""{"error":"content length must be greater than 0 and less than $maxMessageBytes bytes"}""")
      return
    }
    val key = qs.get("partitionKey").flatMap(_.headOption).orNull
    val tsMicros = qs.get("timestamp").flatMap(_.headOption)
      .flatMap(t => scala.util.Try(t.toLong).toOption)
      .getOrElse(System.currentTimeMillis() * 1000L)
    val ctype = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("application/json")
    val lines: Seq[Array[Byte]] =
      if (ctype.startsWith("application/x-ndjson"))
        new String(body, UTF_8).split("\n").toSeq
          .filter(_.trim.nonEmpty).map(_.getBytes(UTF_8))
      else Seq(body)

    // loop guard for broker-to-broker forwarding: a request another member
    // already routed here is submitted to the LOCAL coalescer without
    // re-consulting the forwarding channel — one hop, like the reference's
    // SendToLeader; a misdirected forward (stale member directory) fails
    // loudly at this member's partition lease instead of bouncing
    val forwarded =
      Option(ex.getRequestHeaders.getFirst(ForwardingChannel.ForwardedHeader)).isDefined
    val channel = if (forwarded) coalescer else produceChannel
    val ack = channel.submit(topic, key, tsMicros, lines)
    try { ack.get(120, TimeUnit.SECONDS); respond(ex, 200, "OK") }
    catch {
      case e: java.util.concurrent.ExecutionException =>
        e.getCause match {
          // the top-level handler owns the retryable-503 shape — rethrow
          // so every endpoint answers a drain window identically
          case d: graft.engine.PlaneDrainingException => throw d
          case n: NoLiveOwnerException => throw n
          case c =>
            respond(ex, 500, s"""{"error":${jstr(String.valueOf(c.getMessage))}}""")
        }
    }
  }

  private def handleRegister(ex: HttpExchange): Unit = {
    evictIdle()
    val qs = params(ex)
    val cid = qs.get("consumerId").flatMap(_.headOption).getOrElse {
      respond(ex, 400, """{"error":"consumerId required"}"""); return
    }
    val group = qs.get("group").flatMap(_.headOption).getOrElse("default")
    val topics = qs.getOrElse("topic", Seq.empty).distinct
    if (topics.isEmpty) { respond(ex, 400, """{"error":"topic required"}"""); return }
    if (topics.exists(_.getBytes(UTF_8).length > 255)) {
      respond(ex, 400, """{"error":"topic name exceeds 255 bytes"}"""); return
    }
    val policy = qs.get("onNewGroup").flatMap(_.headOption) match {
      case Some("startFromEarliest") => store.StartFrom.Earliest
      case _ => store.StartFrom.Latest
    }
    // a re-register under a DIFFERENT group must leave the old group, or
    // its round-robin assignment keeps routing partitions to this id
    // forever and no surviving member ever serves them
    Option(sessions.get(cid)).filter(_.group != group)
      .foreach(old => store.registry.goodbye(old.group, cid))
    store.registry.register(group, cid, topics, policy)
    sessions.put(cid, new Session(cid, group, topics))
    metrics.activeConsumers.set(sessions.size.toLong)
    respond(ex, 200, "OK")
  }

  /** Consumer lookup shared by poll/commit/goodbye: touch activity, evict
    * idlers, answer None (and 409) for unknown ids.
    */
  private def consumer(ex: HttpExchange): Option[(String, Session)] = {
    evictIdle()
    val cid = params(ex).get("consumerId").flatMap(_.headOption).getOrElse("")
    Option(sessions.get(cid)) match {
      case Some(s) => s.lastSeen = System.currentTimeMillis(); Some((cid, s))
      case None => respond(ex, 409, """{"error":"consumer not registered"}"""); None
    }
  }

  /** One poll response item: a contiguous run of records for one
    * (topic, token, range) partition.
    */
  private case class PollItem(
      topic: String, token: Long, range: Int, version: Int, startOffset: Long,
      records: Seq[(Long, Array[Byte])]) // (timestamp micros, body)

  private def handlePoll(ex: HttpExchange): Unit = consumer(ex).foreach { case (cid, s) =>
    s.synchronized {
      commitPending(s) // the previous poll's position becomes durable now

      val items = mutable.ArrayBuffer.empty[PollItem]
      s.topics.foreach { topic =>
        // bounded page: the offset cap prunes the scan, the byte cap trims
        // the response; the rest of the backlog ships on later polls.
        // The read lock pins the topic's files across plan + collect, so a
        // concurrent purge/compact swap can neither yank a planned file
        // (FileNotFound) nor double-deliver survivors mid-rewrite.
        val rows = store.withTopicReads(topic) {
          store.poll(s.group, topic, cid,
            maxRecords = maxPollRecords, maxBytes = maxPollBytes,
            autoCommit = false).collect()
        }
        if (rows.nonEmpty) {
          // ONE grouping feeds both the response items and the staged
          // next-offsets — two groupBys would be duplicate work and two
          // code paths that must agree on the per-part max
          val byPart = rows.groupBy(_.getAs[Int]("part")).view
            .mapValues(_.sortBy(_.getAs[Long]("offset"))).toMap
          byPart.toSeq.sortBy(_._1).foreach { case (_, sorted) =>
            val head = sorted.head
            items += PollItem(
              topic, head.getAs[Long]("token"), head.getAs[Int]("range"),
              head.getAs[Int]("version"),
              head.getAs[Long]("offset"),
              sorted.toIndexedSeq.map { r =>
                val ts = r.getAs[java.sql.Timestamp]("timestamp")
                val micros = ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
                (micros, r.getAs[Array[Byte]]("value"))
              })
          }
          val next = byPart.view
            .mapValues(_.last.getAs[Long]("offset") + 1L).toMap
          // all rows of one BOUNDED poll share one generation (the
          // earliest live one where the group has lag — poll's lineage
          // walk); commitPending above cleared any prior stage, so this
          // is a plain put — never a cross-poll merge
          s.pendingCommit(topic) = (rows.head.getAs[Int]("version"), next)
        } else {
          // empty page: if the group still has lag, the bounded window
          // was erased by purgeKeys — advance past it (metadata-only
          // fast path when there is simply no lag), or the consumer
          // would page over the same gap forever
          store.withTopicReads(topic) {
            store.skipPurgedPage(s.group, topic, cid, maxPollRecords)
          }
          ()
        }
      }

      metrics.pollsServed.incrementAndGet()
      metrics.recordsDelivered.addAndGet(items.iterator.map(_.records.size.toLong).sum)

      if (items.isEmpty)
        respond(ex, 204, headers = Map("Retry-After" -> "5", "Cache-Control" -> "no-store"))
      else {
        // format by Accept, like the reference (`consuming/server.go:412-415`):
        // binary unless the client asks for application/json
        val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
        if (accept.contains("application/json")) {
          val body = items.iterator.map { i =>
            // record bodies are embedded VERBATIM — the reference's JSON
            // marshal is the same pass-through (`MarshalJson`,
            // `consuming/models.go:136-199`): the producer API's contract
            // is JSON bodies, and the consumer sees exactly what was
            // produced. Non-JSON bytes (possible via the binary producer)
            // yield a response only the producing client can parse — parity
            // with the reference, not a serving-side escape bug.
            val values = i.records.iterator
              .map(r => new String(r._2, UTF_8)).mkString(",")
            s"""{"topic":${jstr(i.topic)},"token":"${i.token}"""" +
              s""","rangeIndex":${i.range},"version":${i.version}""" +
              s""","startOffset":"${i.startOffset}","values":[$values]}"""
          }.mkString("[", ",", "]")
          respond(ex, 200, body, Map("Content-Type" -> "application/json"))
        } else
          respondBytes(ex, 200, marshalBinary(items.toSeq),
            Map("Content-Type" -> "application/octet-stream"))
      }
    }
  }

  /** The reference's binary poll response (`consuming/models.go:101-134` +
    * `NETWORK_FORMATS.md:5-32`): uint16 item count, then per item
    * token i64, rangeIndex u8, version u32, topicLen u8 + topic,
    * startOffset i64, payloadLen i32, zstd payload. The payload is the
    * chunk record framing (`FILE_FORMATS.md`): per record
    * timestamp-micros i64, length u32, body — all big-endian.
    */
  private def marshalBinary(items: Seq[PollItem]): Array[Byte] = {
    // the wire field is u16: writeShort past 65535 wraps silently and
    // desynchronizes the client's frame parse — fail the response loudly
    // instead (reachable only with thousands of subscribed topics in one
    // unbounded poll; byte-capped pages stay far below it)
    require(items.length <= 0xFFFF,
      s"binary poll response has ${items.length} items, past the u16 wire field — " +
        "page the poll (maxBytes/maxRecords) or split the subscription")
    val buf = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(buf)
    d.writeShort(items.length)
    items.foreach { i =>
      val raw = new java.io.ByteArrayOutputStream()
      val rd = new java.io.DataOutputStream(raw)
      i.records.foreach { case (tsMicros, body) =>
        rd.writeLong(tsMicros); rd.writeInt(body.length); rd.write(body)
      }
      val payload = com.github.luben.zstd.Zstd.compress(raw.toByteArray)
      d.writeLong(i.token)
      d.writeByte(i.range)
      d.writeInt(i.version) // generation version
      val t = i.topic.getBytes(UTF_8)
      d.writeByte(t.length); d.write(t)
      d.writeLong(i.startOffset)
      d.writeInt(payload.length)
      d.write(payload)
    }
    buf.toByteArray
  }

  private def handleCommit(ex: HttpExchange): Unit = consumer(ex).foreach { case (_, s) =>
    commitPending(s)
    respond(ex, 204)
  }

  /** Beyond parity: reposition the consumer's group at a timestamp —
    * `POST /v1/consumer/seek?consumerId=&topic=&timestamp=<micros>` →
    * the accepted per-partition positions. Forward-only (the engine's
    * monotonic commit); any staged page is dropped first, or the next
    * poll's deferred commit could land the group BEHIND the seek.
    */
  private def handleSeek(ex: HttpExchange): Unit = consumer(ex).foreach { case (_, s) =>
    val qs = params(ex)
    (qs.get("topic").flatMap(_.headOption).filter(s.topics.contains),
      qs.get("timestamp").flatMap(_.headOption).flatMap(_.toLongOption)) match {
      case (Some(topic), Some(micros)) =>
        // full microsecond precision: Timestamp(millis) would truncate
        // sub-millisecond produce timestamps and move the cut backwards
        val t = new java.sql.Timestamp(math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((math.floorMod(micros, 1000000L) * 1000L).toInt)
        // drop-stage + seek under ONE lock acquisition: handlePoll holds
        // s.synchronized for its whole body, so a poll can no longer
        // interleave between the stage drop and the seek's commit and
        // re-stage a pre-seek page (seek and poll serialize per consumer)
        val accepted = s.synchronized {
          s.pendingCommit.remove(topic)
          store.seekToTime(s.group, topic, t)
        }
        val body = accepted.toSeq.sortBy(_._1)
          .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
        respond(ex, 200, body, Map("Content-Type" -> "application/json"))
      case _ =>
        respond(ex, 400,
          """{"error":"topic (subscribed) and timestamp (micros) parameters required"}""",
          Map("Content-Type" -> "application/json"))
    }
  }

  private def handleGoodbye(ex: HttpExchange): Unit = consumer(ex).foreach { case (cid, s) =>
    commitPending(s)
    store.registry.goodbye(s.group, cid)
    sessions.remove(cid)
    metrics.activeConsumers.set(sessions.size.toLong)
    respond(ex, 200, "OK")
  }
}
