package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CompletableFuture, Executors, TimeUnit}

import scala.collection.immutable.SortedSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.engine.TopicStore

/** One serving member's advertisement in the shared-root member
  * directory: where it listens and which slice of the write plane it
  * claims. `mode` is `root` (owns everything), `parts` (disjoint ring
  * partitions, `parts` set), or `consumer` (registry/group commits only,
  * no produce).
  */
final case class MemberAd(
    base: String,
    binaryPort: Int,
    mode: String,
    parts: Option[SortedSet[Int]],
    mtimeMs: Long,
    ttlMs: Long) {
  def live(nowMs: Long): Boolean = nowMs - mtimeMs < ttlMs
  /** PRODUCE ownership: a consumer member never receives produce
    * forwards, even when range-scoped (its `parts` bound what it SERVES
    * to consumers, not what it writes).
    */
  def ownsPartition(p: Int): Boolean =
    mode == "root" || (mode == "parts" && parts.exists(_.contains(p)))
}

/** The serving deployment's DISCOVERY directory over the shared root —
  * the shared-storage collapse of the reference's gossip-fed topology
  * view that lets a broker forward a produce to the range leader
  * (`internal/discovery/topology_info.go` + `internal/producing/
  * server.go:163-167` `gossiper.SendToLeader`). Each `tools.Serve`
  * member writes ONE advertisement file under `<root>/_meta/_serve/`
  * (host/port/claim, liveness = mtime refreshed on the lease-heartbeat
  * cadence, clean exits delete); peers list the tiny directory — cached
  * for `cacheMs`, so steady-state forwarding costs no FS round-trips —
  * to find the live owner of a ring partition or the consumer-plane
  * member.
  *
  * The directory is ADVISORY, like the reference's topology view: a
  * stale entry only misdirects a forward, which the receiving member's
  * partition lease then rejects loudly at flush — authority always
  * stays with the lease plane ([[graft.engine.PlaneLease]]).
  */
class MemberDirectory(root: String, conf: Configuration, cacheMs: Long = 2000L) {
  private val dir = new Path(new Path(root, "_meta"), "_serve")
  private val fs: FileSystem = dir.getFileSystem(conf)

  @volatile private var cached: (Long, Seq[MemberAd]) = (0L, Seq.empty)

  /** Live members, refreshed from the directory when the cache is older
    * than `cacheMs` (or on `force`).
    */
  def members(force: Boolean = false): Seq[MemberAd] = {
    val now = System.currentTimeMillis()
    val (at, ads) = cached
    if (!force && now - at < cacheMs) ads.filter(_.live(now))
    else {
      val fresh = list()
      cached = (now, fresh)
      fresh.filter(_.live(now))
    }
  }

  /** The live member owning ring partition `p` — retried once with a
    * forced refresh on a cache miss (a member that registered after the
    * last listing). Ties (never expected: the lease plane keeps claims
    * disjoint) break to the freshest advertisement.
    */
  def ownerOf(p: Int): Option[MemberAd] =
    pick(members().filter(_.ownsPartition(p)))
      .orElse(pick(members(force = true).filter(_.ownsPartition(p))))

  /** The live consumer-plane member (a root-mode member also serves the
    * consumer flow).
    */
  def consumerMember: Option[MemberAd] =
    pick(members().filter(m => m.mode == "consumer" || m.mode == "root"))
      .orElse(pick(members(force = true)
        .filter(m => m.mode == "consumer" || m.mode == "root")))

  private def pick(ms: Seq[MemberAd]): Option[MemberAd] =
    ms.sortBy(-_.mtimeMs).headOption

  private def list(): Seq[MemberAd] =
    (try fs.listStatus(dir).toSeq
     catch { case _: java.io.FileNotFoundException => Seq.empty })
      .filter(st => st.isFile && st.getPath.getName.startsWith("member-"))
      .flatMap { st =>
        try {
          val in = fs.open(st.getPath)
          val text = try new String(in.readAllBytes(), UTF_8) finally in.close()
          val kv = text.split('\n').iterator.map(_.trim).filter(_.contains('='))
            .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }
            .toMap
          for {
            base <- kv.get("base")
            mode <- kv.get("mode")
          } yield MemberAd(
            base = base,
            binaryPort = kv.get("binaryPort").flatMap(_.toIntOption).getOrElse(0),
            mode = mode,
            parts = kv.get("parts").map(TopicStore.parsePartitionSpec),
            mtimeMs = st.getModificationTime,
            ttlMs = kv.get("ttl").flatMap(_.toLongOption)
              .getOrElse(graft.engine.PlaneLease.DefaultTtlMs))
        } catch { case _: Exception => None } // torn read: skip this listing
      }
}

object MemberDirectory {
  private lazy val refresher = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-member-ad")
    t.setDaemon(true)
    t
  })

  /** Publish this process's advertisement and keep it live: one file
    * under `<root>/_meta/_serve/`, mtime refreshed at TTL/4 (failures
    * retried next tick), deleted on clean exit so peers stop forwarding
    * here immediately instead of waiting out the TTL.
    */
  def advertise(
      root: String,
      conf: Configuration,
      base: String,
      binaryPort: Int,
      mode: String,
      parts: Option[SortedSet[Int]],
      ttlMs: Long = graft.engine.PlaneLease.DefaultTtlMs): Unit = {
    val dir = new Path(new Path(root, "_meta"), "_serve")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val p = new Path(dir, s"member-${java.util.UUID.randomUUID().toString.take(12)}")
    val content = (Seq(s"base=$base", s"binaryPort=$binaryPort", s"mode=$mode") ++
      parts.map(ps => s"parts=${graft.engine.PlaneLease.specOf(ps)}") ++
      Seq(s"ttl=$ttlMs")).mkString("\n")
    val out = fs.create(p, true)
    try out.write(content.getBytes(UTF_8)) finally out.close()
    refresher.scheduleWithFixedDelay(() => {
      try { fs.setTimes(p, System.currentTimeMillis(), -1) }
      catch { case _: Exception => () } // retried next tick; TTL judges us
    }, ttlMs / 4, ttlMs / 4, TimeUnit.MILLISECONDS)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try { fs.delete(p, false); () } catch { case _: Exception => () }
    }, "graft-member-ad-release"))
    ()
  }
}

/** Broker-to-broker produce forwarding — the reference's
  * `gossiper.SendToLeader` (`internal/producing/server.go:163-167`;
  * receiving side `internal/interbroker/server.go:101`): a member that
  * receives a produce whose key hashes OUTSIDE its partition claim
  * forwards the raw body to the live owning member (discovered via the
  * shared-root [[MemberDirectory]]) and relays the ack, so clients may
  * post to ANY member without implementing ring routing. Records inside
  * the claim take the local coalescer untouched; keyless NDJSON bodies
  * split per line by value hash, exactly like the in-process
  * [[ShardRouter]], and the request acks when every sub-batch is
  * durable.
  *
  * The forward is marked with `X-Graft-Forwarded: 1`; the receiver
  * submits it LOCALLY without re-forwarding (one hop, like the
  * reference), so a stale directory entry fails loudly at the
  * receiver's lease instead of looping.
  */
class ForwardingChannel(
    store: TopicStore,
    local: ProduceChannel,
    directory: MemberDirectory,
    metrics: Option[EngineMetrics] = None) extends ProduceChannel {

  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  private def ordinalOf(topic: String, key: String, value: Array[Byte]): Int =
    ShardRouter.ringOrdinal(store, topic, key, value)

  private def ownedLocally(p: Int): Boolean =
    !store.isConsumerPlaneRole &&
      store.configuredPartitionClaim.forall(_.contains(p))

  override def submit(
      topic: String,
      key: String,
      tsMicros: Long,
      lines: Seq[Array[Byte]]): CompletableFuture[java.lang.Boolean] = {
    if (key != null && key.nonEmpty) {
      val p = ordinalOf(topic, key, null)
      if (ownedLocally(p)) local.submit(topic, key, tsMicros, lines)
      else forward(topic, key, tsMicros, lines, p)
    } else {
      val byPart = lines.groupBy(l => ordinalOf(topic, null, l))
      val subs = byPart.toSeq.map { case (p, ls) =>
        if (ownedLocally(p)) local.submit(topic, key, tsMicros, ls)
        else forward(topic, key, tsMicros, ls, p)
      }
      if (subs.size == 1) subs.head
      else CompletableFuture.allOf(subs: _*).thenApply(_ => java.lang.Boolean.TRUE)
    }
  }

  private def forward(
      topic: String,
      key: String,
      tsMicros: Long,
      lines: Seq[Array[Byte]],
      part: Int): CompletableFuture[java.lang.Boolean] =
    directory.ownerOf(part) match {
      case None =>
        CompletableFuture.failedFuture(new IllegalStateException(
          s"no live serving member owns ring partition $part — this member's " +
            s"claim is ${claimDesc()}; start (or restart) the owning partition " +
            "member, or produce through a root-mode member"))
      case Some(m) =>
        // single-record bodies forward verbatim as JSON (they may contain
        // newlines); multi-line requests only ever come from NDJSON, whose
        // lines are newline-free by construction
        val (body, ctype) =
          if (lines.size == 1) (lines.head, "application/json")
          else {
            val joined = new java.io.ByteArrayOutputStream()
            lines.zipWithIndex.foreach { case (l, i) =>
              if (i > 0) joined.write('\n')
              joined.write(l)
            }
            (joined.toByteArray, "application/x-ndjson")
          }
        val qs = new StringBuilder(s"timestamp=$tsMicros")
        if (key != null && key.nonEmpty)
          qs ++= s"&partitionKey=${java.net.URLEncoder.encode(key, UTF_8)}"
        val uri = URI.create(
          s"${m.base}/v1/topic/${java.net.URLEncoder.encode(topic, UTF_8)}/messages?$qs")
        val req = HttpRequest.newBuilder(uri)
          .POST(BodyPublishers.ofByteArray(body))
          .header("Content-Type", ctype)
          .header(ForwardingChannel.ForwardedHeader, "1")
          .timeout(java.time.Duration.ofSeconds(120))
          .build()
        metrics.foreach(_.producesForwarded.incrementAndGet())
        client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
          .thenCompose { resp =>
            if (resp.statusCode() == 200)
              CompletableFuture.completedFuture(java.lang.Boolean.TRUE)
            else if (resp.statusCode() == 503)
              // relay the RETRYABLE contract: the owner is in a drain
              // window (it answered 503 Retry-After) — surface the same
              // exception type so the origin member's handler answers 503
              // too, instead of downgrading to a fatal 500
              CompletableFuture.failedFuture[java.lang.Boolean](
                new graft.engine.PlaneDrainingException(
                  s"forwarded produce for ring partition $part: the owning " +
                    s"member ${m.base} is draining — retry: ${resp.body()}"))
            else
              CompletableFuture.failedFuture[java.lang.Boolean](
                new IllegalStateException(
                  s"forwarded produce for ring partition $part to ${m.base} " +
                    s"answered ${resp.statusCode()}: ${resp.body()}"))
          }
    }

  private def claimDesc(): String =
    if (store.isConsumerPlaneRole) "consumer-plane (no produce)"
    else store.configuredPartitionClaim
      .map(ps => s"partitions ${graft.engine.PlaneLease.specOf(ps)}")
      .getOrElse("root")
}

object ForwardingChannel {
  /** Loop guard: a request carrying this header is submitted locally and
    * never re-forwarded — a misdirected forward (stale directory) fails
    * at the receiver's partition lease instead of bouncing between
    * members.
    */
  val ForwardedHeader = "X-Graft-Forwarded"
}
