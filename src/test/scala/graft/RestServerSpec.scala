package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TopicStore
import graft.serving.RestServer

/** Drives the REST surface end-to-end over real HTTP, mirroring the
  * request flows in the reference's `docs/rest_api/README.md` and
  * `docs/rest_api/consumer_flow/`: produce (JSON + NDJSON), register,
  * poll (200/204/409 + Retry-After), deferred auto-commit, manual commit,
  * goodbye, and R11 idle eviction.
  */
class RestServerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("rest-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val client = HttpClient.newHttpClient()

  private def startServer(readTimeoutMs: Long = 120000L): RestServer = {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-rest").toString)
    new RestServer(store, port = 0, readTimeoutMs = readTimeoutMs, coalesceMs = 20L).start()
  }

  private def get(base: String, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      BodyHandlers.ofString())

  private def send(base: String, method: String, path: String, body: String = "",
      ctype: String = "application/json"): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    val req = (method match {
      case "PUT" => b.PUT(BodyPublishers.ofString(body))
      case _ => b.POST(BodyPublishers.ofString(body))
    }).header("Content-Type", ctype)
      .header("Accept", "application/json") // binary is the default otherwise
      .build()
    client.send(req, BodyHandlers.ofString())
  }

  test("discovery, produce/poll flow, deferred commit, goodbye") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      assert(get(base, "/status").statusCode() == 200)
      val brokers = get(base, "/v1/brokers")
      assert(brokers.statusCode() == 200)
      assert(brokers.body().contains("\"length\":1"))
      assert(brokers.body().contains("\"producerPort\""))

      // poll before register -> 409 (consumer_flow docs)
      assert(send(base, "POST", "/v1/consumer/poll?consumerId=c1").statusCode() == 409)

      // produce 3 JSON events on one partition key + 2 on another;
      // explicit timestamps (micros) fix the per-key order
      for (i <- 0 until 3)
        assert(send(base, "POST",
          s"/v1/topic/stock/messages?partitionKey=123&timestamp=${1700000000000000L + i}",
          s"""{"productId":123,"units":$i}""").statusCode() == 200)
      for (i <- 0 until 2)
        assert(send(base, "POST",
          s"/v1/topic/stock/messages?partitionKey=567&timestamp=${1700000000000000L + i}",
          s"""{"productId":567,"units":$i}""").statusCode() == 200)

      // register from earliest, poll everything
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c1&group=g1&topic=stock&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      val poll1 = send(base, "POST", "/v1/consumer/poll?consumerId=c1")
      assert(poll1.statusCode() == 200)
      // values embedded raw, in produce order per key; startOffset from 0
      assert(poll1.body().contains("""{"productId":123,"units":0},{"productId":123,"units":1},{"productId":123,"units":2}"""))
      assert(poll1.body().contains("""{"productId":567,"units":0},{"productId":567,"units":1}"""))
      assert(poll1.body().contains(""""startOffset":"0""""))
      assert(poll1.body().contains(""""version":1"""))

      // nothing new: 204 + Retry-After (this poll also commits poll1's position)
      val poll2 = send(base, "POST", "/v1/consumer/poll?consumerId=c1")
      assert(poll2.statusCode() == 204)
      assert(poll2.headers().firstValue("Retry-After").orElse("") == "5")

      // produce one more; the next poll returns ONLY the new record
      assert(send(base, "POST",
        s"/v1/topic/stock/messages?partitionKey=123&timestamp=${1700000000000010L}",
        """{"productId":123,"units":99}""").statusCode() == 200)
      val poll3 = send(base, "POST", "/v1/consumer/poll?consumerId=c1")
      assert(poll3.statusCode() == 200)
      assert(poll3.body().contains(""""units":99"""))
      assert(!poll3.body().contains(""""units":1"""))
      assert(poll3.body().contains(""""startOffset":"3"""")) // continues after 0..2

      // C10 metrics reflect the traffic so far
      val m = get(base, "/metrics")
      assert(m.statusCode() == 200)
      assert("graft_messages_received_total (\\d+)".r.findFirstMatchIn(m.body())
        .exists(_.group(1).toLong >= 6L), m.body())
      assert(m.body().contains("graft_active_consumers 1"))
      assert("graft_polls_served_total (\\d+)".r.findFirstMatchIn(m.body())
        .exists(_.group(1).toLong >= 3L))
      // the two reference histograms (`metrics.go:28,54`): proper
      // Prometheus histogram exposition — TYPE line, cumulative buckets
      // with le labels incl. +Inf, _sum and _count agreeing with the
      // counter traffic
      assert(m.body().contains("# TYPE graft_coalescer_messages_per_group histogram"))
      assert(m.body().contains("# TYPE graft_produce_flush_bytes histogram"))
      assert(m.body().contains("""graft_coalescer_messages_per_group_bucket{le="1"}"""))
      assert(m.body().contains("""graft_produce_flush_bytes_bucket{le="+Inf"}"""))
      val hCount = "graft_coalescer_messages_per_group_count (\\d+)".r
        .findFirstMatchIn(m.body()).map(_.group(1).toLong)
      val hSum = "graft_coalescer_messages_per_group_sum (\\d+)".r
        .findFirstMatchIn(m.body()).map(_.group(1).toLong)
      val groups = "graft_coalescer_groups_total (\\d+)".r
        .findFirstMatchIn(m.body()).map(_.group(1).toLong)
      assert(hCount == groups, s"histogram count $hCount != groups counter $groups")
      assert(hSum.exists(_ >= 6L), s"histogram sum must cover the messages: $hSum")
      // cumulative: the +Inf bucket equals _count
      val inf = """graft_coalescer_messages_per_group_bucket\{le="\+Inf"\} (\d+)""".r
        .findFirstMatchIn(m.body()).map(_.group(1).toLong)
      assert(inf == hCount, s"+Inf bucket $inf != count $hCount")

      // manual commit -> 204; goodbye -> 200; post-goodbye poll -> 409
      assert(send(base, "POST", "/v1/consumer/commit?consumerId=c1").statusCode() == 204)
      assert(send(base, "POST", "/v1/consumer/goodbye?consumerId=c1").statusCode() == 200)
      assert(send(base, "POST", "/v1/consumer/poll?consumerId=c1").statusCode() == 409)
    } finally server.stop()
  }

  test("/v1/brokers on a deployment member lists every member with role and range claim") {
    val root = Files.createTempDirectory("graft-rest-disc").toString
    val store = new TopicStore(spark, root)
    val server = new RestServer(store, port = 0, coalesceMs = 20L).start()
    val base = s"http://localhost:${server.boundPort}"
    try {
      // fabricated member directory: two partition brokers + one
      // range-scoped consumer member
      val dir = new java.io.File(s"$root/_meta/_serve")
      assert(dir.mkdirs())
      def ad(name: String, content: String): Unit =
        Files.write(new java.io.File(dir, name).toPath, content.getBytes("UTF-8"))
      ad("member-aa", "base=http://hosta:9251\nbinaryPort=9252\nmode=parts\nparts=0-5\nttl=60000")
      ad("member-bb", "base=http://hostb:9261\nbinaryPort=9262\nmode=parts\nparts=6-11\nttl=60000")
      ad("member-cc", "base=http://hostc:9271\nbinaryPort=0\nmode=consumer\nparts=0-11\nttl=60000")
      // a schemeless base (URI.getHost == null) must not 500 the listing
      ad("member-dd", "base=hostd:9281\nbinaryPort=0\nmode=consumer\nparts=0-11\nttl=60000")
      server.discoverMembersVia(new graft.serving.MemberDirectory(
        root, spark.sparkContext.hadoopConfiguration, cacheMs = 0L),
        selfBase = s"http://localhost:${server.boundPort}")
      val resp = get(base, "/v1/brokers")
      assert(resp.statusCode() == 200, resp.body())
      val body = resp.body()
      // the legacy scalar fields can only describe ONE member's ports, so
      // the legacy names array lists only THIS member — pairing other
      // members' hosts with this member's ports would misroute old
      // clients; deployment-aware clients read `members`
      assert(body.contains("\"length\":1"), body)
      assert(body.contains("\"names\":[\"localhost\"]"), body)
      assert(body.contains(
        """{"base":"http://hosta:9251","binaryPort":9252,"mode":"parts","parts":"0-5"}"""), body)
      assert(body.contains(
        """{"base":"http://hostb:9261","binaryPort":9262,"mode":"parts","parts":"6-11"}"""), body)
      assert(body.contains(
        """{"base":"http://hostc:9271","binaryPort":0,"mode":"consumer","parts":"0-11"}"""), body)
      // the legacy single-broker fields survive for old clients
      assert(body.contains("\"producerPort\":"), body)
    } finally server.stop()
  }

  test("forward failover on a persistent 500 surfaces the receiver's diagnosis, not a retryable no-owner 503") {
    import java.util.concurrent.ExecutionException
    // a fake sole owner answering a deterministic 500 to every produce:
    // the one-failover retry finds no successor, and the client must see
    // the receiver's diagnosis — not an indefinitely-retryable "no live
    // owner" 503 that hides the real failure forever
    val fakeStatus = new java.util.concurrent.atomic.AtomicInteger(500)
    val fake = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    fake.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val b = "deterministic handler failure".getBytes("UTF-8")
      ex.sendResponseHeaders(fakeStatus.get(), b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    fake.start()
    val root = Files.createTempDirectory("graft-fwd500").toString
    spark.conf.set("spark.graft.planeLeasePartitions", "0")
    try {
      val store = new TopicStore(spark, root)
      // a key routed OUTSIDE this member's claim {0}; the fake ad owns
      // exactly that partition
      val key = (1 to 64).map(i => s"k$i").find(k =>
        graft.serving.ShardRouter.ringOrdinal(store, "t", k, null) != 0).get
      val p = graft.serving.ShardRouter.ringOrdinal(store, "t", key, null)
      val dir = new java.io.File(s"$root/_meta/_serve")
      assert(dir.mkdirs())
      Files.write(new java.io.File(dir, "member-fake").toPath,
        (s"base=http://localhost:${fake.getAddress.getPort}\nbinaryPort=0\n" +
          s"mode=parts\nparts=$p\nttl=60000").getBytes("UTF-8"))
      val d = new graft.serving.MemberDirectory(
        root, spark.sparkContext.hadoopConfiguration, cacheMs = 0L)
      val never = new graft.serving.ProduceChannel {
        override def submit(t: String, k: String, ts: Long,
            ls: Seq[Array[Byte]]) =
          throw new IllegalStateException("local channel must not be used")
      }
      val fwd = new graft.serving.ForwardingChannel(store, never, d, None)
      val exn = intercept[ExecutionException] {
        fwd.submit("t", key, 1700000000000000L,
          Seq("""{"x":1}""".getBytes("UTF-8"))).get()
      }
      val cause = exn.getCause
      assert(!cause.isInstanceOf[graft.serving.NoLiveOwnerException],
        s"must not downgrade a persistent 500 to a retryable no-owner: $cause")
      assert(cause.getMessage.contains("answered 500"), cause.getMessage)
      assert(cause.getMessage.contains("deterministic handler failure"),
        cause.getMessage)
      assert(cause.getSuppressed
        .exists(_.isInstanceOf[graft.serving.NoLiveOwnerException]),
        "the exhausted-failover cause rides along as suppressed")
      // a GATEWAY 502 is a proxy in front of a DYING member whose
      // successor may not have advertised yet: the retryable no-owner
      // contract must stand so clients ride out the takeover window
      fakeStatus.set(502)
      val exn2 = intercept[ExecutionException] {
        fwd.submit("t", key, 1700000000000001L,
          Seq("""{"x":2}""".getBytes("UTF-8"))).get()
      }
      assert(exn2.getCause.isInstanceOf[graft.serving.NoLiveOwnerException],
        s"a 502 with no successor must stay retryable: ${exn2.getCause}")
    } finally {
      spark.conf.unset("spark.graft.planeLeasePartitions")
      fake.stop(0)
    }
  }

  test("ndjson produce splits lines and preserves order; goodbye commits") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      val body = """{"n":1}
{"n":2}
{"n":3}"""
      assert(send(base, "POST",
        s"/v1/topic/nd/messages?partitionKey=k&timestamp=1700000000000000",
        body, ctype = "application/x-ndjson").statusCode() == 200)

      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c2&group=g2&topic=nd&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      val poll = send(base, "POST", "/v1/consumer/poll?consumerId=c2")
      assert(poll.statusCode() == 200)
      assert(poll.body().contains("""[{"n":1},{"n":2},{"n":3}]"""))

      // goodbye commits the staged position: a new consumer in the SAME
      // group starts after it (no redelivery)
      assert(send(base, "POST", "/v1/consumer/goodbye?consumerId=c2").statusCode() == 200)
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c3&group=g2&topic=nd").statusCode() == 200)
      assert(send(base, "POST", "/v1/consumer/poll?consumerId=c3").statusCode() == 204)
    } finally server.stop()
  }

  test("at-least-once: un-committed poll position is redelivered") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      assert(send(base, "POST",
        s"/v1/topic/alo/messages?partitionKey=k&timestamp=1700000000000000",
        """{"v":1}""").statusCode() == 200)
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c4&group=g4&topic=alo&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      // first poll delivers; consumer "dies" (no second poll/commit/goodbye)
      assert(send(base, "POST", "/v1/consumer/poll?consumerId=c4").statusCode() == 200)
      // same consumer id re-registers (idempotent) and re-reads the record:
      // re-register drops the staged (uncommitted) position, so the group's
      // durable offset still points at it
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c4&group=g4&topic=alo").statusCode() == 200)
      val poll = send(base, "POST", "/v1/consumer/poll?consumerId=c4")
      assert(poll.statusCode() == 200)
      assert(poll.body().contains("""{"v":1}"""))
    } finally server.stop()
  }

  test("binary poll response carries the documented item + chunk framing") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      assert(send(base, "POST",
        s"/v1/topic/bt/messages?partitionKey=k&timestamp=1700000000000000",
        """{"p":1}""").statusCode() == 200)
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cb&group=gb&topic=bt&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      // no Accept header -> binary (the reference's default)
      val req = HttpRequest.newBuilder(URI.create(base + "/v1/consumer/poll?consumerId=cb"))
        .POST(BodyPublishers.noBody()).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      assert(resp.statusCode() == 200)
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(resp.body()))
      assert(in.readShort() == 1) // item count
      in.readLong() // token
      assert((in.readByte() & 0xff) >= 0) // rangeIndex
      assert(in.readInt() == 1) // version
      val topic = new Array[Byte](in.readByte() & 0xff)
      in.readFully(topic)
      assert(new String(topic, java.nio.charset.StandardCharsets.UTF_8) == "bt")
      assert(in.readLong() == 0L) // startOffset
      val payload = new Array[Byte](in.readInt())
      in.readFully(payload)
      val records = new java.io.DataInputStream(
        new com.github.luben.zstd.ZstdInputStream(new java.io.ByteArrayInputStream(payload)))
      assert(records.readLong() == 1700000000000000L) // timestamp micros
      val body = new Array[Byte](records.readInt())
      records.readFully(body)
      assert(new String(body, java.nio.charset.StandardCharsets.UTF_8) == """{"p":1}""")
    } finally server.stop()
  }

  test("oversized bodies answer 400; concurrent producers coalesce losslessly") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      // > 1 MiB body rejected like the reference's MaxMessageSize check
      val big = "x" * (1024 * 1024 + 1)
      assert(send(base, "POST", "/v1/topic/cc/messages?partitionKey=k", big)
        .statusCode() == 400)

      // 8 threads x 5 requests, 3 keys — all coalesced, none lost,
      // per-key arrival order preserved within each sender's key lane
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val results = (0 until 40).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = send(base, "POST",
            s"/v1/topic/cc/messages?partitionKey=k${i % 3}&timestamp=${1700000000000000L + i}",
            s"""{"i":$i}""").statusCode()
        })
      }
      assert(results.map(_.get()).forall(_ == 200))
      pool.shutdown()

      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cc&group=gc&topic=cc&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      val poll = send(base, "POST", "/v1/consumer/poll?consumerId=cc")
      assert(poll.statusCode() == 200)
      val seen = """\{"i":(\d+)\}""".r.findAllMatchIn(poll.body()).map(_.group(1).toInt).toSet
      assert(seen == (0 until 40).toSet, s"lost: ${(0 until 40).toSet -- seen}")
    } finally server.stop()
  }

  test("two consumers in one group drain disjoint partitions covering everything") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      for (i <- 0 until 12)
        assert(send(base, "POST",
          s"/v1/topic/fo/messages?partitionKey=k$i&timestamp=${1700000000000000L + i}",
          s"""{"i":$i}""").statusCode() == 200)
      for (c <- Seq("f1", "f2"))
        assert(send(base, "PUT",
          s"/v1/consumer/register?consumerId=$c&group=gf&topic=fo&onNewGroup=startFromEarliest")
          .statusCode() == 200)
      def drain(cid: String): Set[Int] = {
        val r = send(base, "POST", s"/v1/consumer/poll?consumerId=$cid")
        if (r.statusCode() == 204) Set.empty
        else """\{"i":(\d+)\}""".r.findAllMatchIn(r.body()).map(_.group(1).toInt).toSet
      }
      val a = drain("f1"); val b = drain("f2")
      assert((a intersect b).isEmpty, s"overlap: ${a intersect b}")
      assert((a union b) == (0 until 12).toSet, s"missing: ${(0 until 12).toSet -- a -- b}")
    } finally server.stop()
  }

  test("poll pages the backlog under the read threshold with continuity") {
    // ConsumerReadThreshold behavior: backlog >> page size, so the first
    // poll returns a bounded page and successive polls drain the rest in
    // offset order via the deferred-commit staging
    val store = new TopicStore(spark, Files.createTempDirectory("graft-rest-page").toString)
    val server = new RestServer(store, port = 0, coalesceMs = 20L,
      maxPollRecords = 4L).start()
    val base = s"http://localhost:${server.boundPort}"
    try {
      // 20 records on ONE key = one partition, offsets 0..19
      for (i <- 0 until 20)
        assert(send(base, "POST",
          s"/v1/topic/pg/messages?partitionKey=k&timestamp=${1700000000000000L + i}",
          s"""{"i":$i}""").statusCode() == 200)
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cp&group=gp&topic=pg&onNewGroup=startFromEarliest")
        .statusCode() == 200)

      var all = Vector.empty[Int]
      var starts = Vector.empty[Long]
      var code = 200
      var guard = 0
      while (code == 200 && guard < 10) {
        val r = send(base, "POST", "/v1/consumer/poll?consumerId=cp")
        code = r.statusCode()
        if (code == 200) {
          val page = """\{"i":(\d+)\}""".r.findAllMatchIn(r.body()).map(_.group(1).toInt).toVector
          assert(page.length <= 4, s"page over threshold: $page")
          starts :+= """"startOffset":"(\d+)"""".r.findFirstMatchIn(r.body()).get.group(1).toLong
          all ++= page
        }
        guard += 1
      }
      assert(code == 204) // drained
      assert(all == (0 until 20).toVector, s"lost or reordered: $all")
      assert(starts == Vector(0L, 4L, 8L, 12L, 16L)) // contiguous pages
    } finally server.stop()
  }

  test("R11: idle consumers are evicted; next poll answers 409") {
    val server = startServer(readTimeoutMs = 150L)
    val base = s"http://localhost:${server.boundPort}"
    try {
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c5&group=g5&topic=t").statusCode() == 200)
      Thread.sleep(400L)
      assert(send(base, "POST", "/v1/consumer/poll?consumerId=c5").statusCode() == 409)
    } finally server.stop()
  }

  test("R11: /status probes count as activity and stave off eviction") {
    // reference: consumer /status calls SetAsRead (consuming/server.go:149)
    val server = startServer(readTimeoutMs = 400L)
    val base = s"http://localhost:${server.boundPort}"
    try {
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c5s&group=g5s&topic=t").statusCode() == 200)
      // keep probing status under the timeout for > timeout total
      (1 to 4).foreach { _ =>
        Thread.sleep(150L)
        assert(get(base, "/status?consumerId=c5s").statusCode() == 200)
      }
      val code = send(base, "POST", "/v1/consumer/poll?consumerId=c5s").statusCode()
      assert(code == 200 || code == 204, s"status-refreshed consumer was evicted: $code")
    } finally server.stop()
  }

  test("eviction drops the staged page: the group re-reads it, never skips it") {
    val server = startServer(readTimeoutMs = 250L)
    val base = s"http://localhost:${server.boundPort}"
    try {
      assert(send(base, "POST",
        s"/v1/topic/t6/messages?partitionKey=k&timestamp=1700000000000000",
        """{"n":1}""").statusCode() == 200)
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c6&group=g6&topic=t6&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      // first poll delivers the page and STAGES its end position
      val first = send(base, "POST", "/v1/consumer/poll?consumerId=c6")
      assert(first.statusCode() == 200 && first.body().contains("\"n\":1"))
      // consumer dies mid-processing: idle past the timeout, then evicted.
      // The staged position must be DROPPED (not flushed) — a re-registered
      // consumer of the same group re-reads the unacknowledged page.
      Thread.sleep(600L)
      assert(send(base, "POST", "/v1/consumer/poll?consumerId=c6").statusCode() == 409)
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=c6b&group=g6&topic=t6").statusCode() == 200)
      val again = send(base, "POST", "/v1/consumer/poll?consumerId=c6b")
      assert(again.statusCode() == 200 && again.body().contains("\"n\":1"),
        s"unacked page was skipped after eviction: ${again.statusCode()} ${again.body()}")
    } finally server.stop()
  }

  test("submit to a stopped coalescer fails fast instead of hanging") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-coal").toString)
    val c = new graft.serving.ProduceCoalescer(store, coalesceMs = 20L).start()
    c.stop()
    // without the running-gate re-check, this submit would enqueue after
    // stop()'s drain and block its caller forever on an un-completed ack
    val ack = c.submit("t", "k", 1700000000000000L, Seq("x".getBytes))
    val ex = intercept[java.util.concurrent.ExecutionException] {
      ack.get(5, java.util.concurrent.TimeUnit.SECONDS)
    }
    assert(ex.getCause.isInstanceOf[IllegalStateException])
  }

  test("purge endpoint erases keys; consumers keep reading survivors") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      for (i <- 0 until 6)
        assert(send(base, "POST",
          s"/v1/topic/gdpr/messages?partitionKey=k${i % 3}&timestamp=${1700000000000000L + i}",
          s"""{"i":$i}""").statusCode() == 200)
      // missing key parameter -> 400
      assert(send(base, "POST", "/v1/topic/gdpr/purge").statusCode() == 400)
      val r = send(base, "POST", "/v1/topic/gdpr/purge?key=k1")
      assert(r.statusCode() == 200)
      assert(r.body() == """{"purged":2}""")
      // a fresh consumer never sees the erased key
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cp&group=gp&topic=gdpr&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      val polled = send(base, "POST", "/v1/consumer/poll?consumerId=cp")
      assert(polled.statusCode() == 200)
      assert(!polled.body().contains("\"i\":1") && !polled.body().contains("\"i\":4"))
    } finally server.stop()
  }

  test("concurrent purge and poll: no duplicate delivery, no silent loss, no errors") {
    // the advisor's race: purge rewrites leaf dirs (rename-in, then
    // delete) while a poll scans them — without the per-topic RW lock a
    // poll could observe BOTH files (double delivery at identical
    // (part, offset)) or fail on a just-deleted one. This drives real
    // HTTP polls against live purges and asserts the at-least-once
    // contract end-to-end: every offset delivered at most once, every
    // produced record either delivered or covered by a purged key, and
    // no poll errors.
    import scala.collection.mutable
    val store = new TopicStore(spark, Files.createTempDirectory("graft-rest").toString)
    val server = new RestServer(store, port = 0, coalesceMs = 20L,
      maxPollBytes = 1024L, maxPollRecords = 40L).start() // small pages -> many polls
    val base = s"http://localhost:${server.boundPort}"
    try {
      val keys = 24; val per = 15
      for (k <- 0 until keys) {
        val body = (0 until per).map(j => s"""{"k":$k,"j":$j}""").mkString("\n")
        assert(send(base, "POST",
          s"/v1/topic/cc/messages?partitionKey=k$k&timestamp=${1700000000000000L + k}",
          body, "application/x-ndjson").statusCode() == 200)
      }
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cpp&group=gpp&topic=cc&onNewGroup=startFromEarliest")
        .statusCode() == 200)

      val pages = mutable.ArrayBuffer.empty[String]
      @volatile var pollError: Option[String] = None
      val poller = new Thread(() => {
        var empty = 0
        while (empty < 3 && pollError.isEmpty) {
          val r = send(base, "POST", "/v1/consumer/poll?consumerId=cpp")
          r.statusCode() match {
            case 200 => pages.synchronized { pages += r.body(); () }; empty = 0
            case 204 => empty += 1; Thread.sleep(50)
            case other => pollError = Some(s"poll -> $other: ${r.body()}")
          }
        }
      })
      poller.start()
      // purges fire WHILE the poller drains its pages
      val purgedKeys = Seq(3, 7, 11).map { k =>
        val r = send(base, "POST", s"/v1/topic/cc/purge?key=k$k")
        assert(r.statusCode() == 200, s"purge k$k -> ${r.statusCode()} ${r.body()}")
        Thread.sleep(30)
        k
      }
      poller.join(180000)
      assert(!poller.isAlive, "poller wedged")
      assert(pollError.isEmpty, pollError.toString)

      // every (token, range, version, offset) delivered AT MOST once
      val itemRe = ("\"token\":\"(-?\\d+)\",\"rangeIndex\":(\\d+),\"version\":(\\d+)," +
        "\"startOffset\":\"(\\d+)\",\"values\":\\[(.*?)\\]").r
      val seen = mutable.Set.empty[(String, Long)]
      val delivered = mutable.Set.empty[String]
      pages.foreach { p =>
        itemRe.findAllMatchIn(p).foreach { m =>
          val part = s"${m.group(1)}/${m.group(2)}/${m.group(3)}"
          val start = m.group(4).toLong
          val bodies = m.group(5).split("(?<=\\}),(?=\\{)").filter(_.nonEmpty)
          bodies.zipWithIndex.foreach { case (b, i) =>
            assert(seen.add((part, start + i)),
              s"duplicate delivery at $part offset ${start + i}")
            delivered += b
          }
        }
      }
      // every produced record was delivered, or its key was purged
      for (k <- 0 until keys; j <- 0 until per) {
        val body = s"""{"k":$k,"j":$j}"""
        assert(delivered.contains(body) || purgedKeys.contains(k),
          s"record silently lost: $body")
      }
      // sanity: the survivors really were the bulk of the corpus
      assert(delivered.size >= (keys - purgedKeys.size) * per)
    } finally server.stop()
  }

  test("seek endpoint repositions the group at a timestamp; polls resume there") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      for (i <- 0 until 8)
        assert(send(base, "POST",
          s"/v1/topic/sk/messages?partitionKey=k${i % 2}&timestamp=${1700000000000000L + i}",
          s"""{"i":$i}""").statusCode() == 200)
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cs&group=gs&topic=sk&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      // seek before consuming anything: position at the i>=4 cut
      val r = send(base, "POST",
        s"/v1/consumer/seek?consumerId=cs&topic=sk&timestamp=${1700000000000000L + 4}")
      assert(r.statusCode() == 200)
      val polled = send(base, "POST", "/v1/consumer/poll?consumerId=cs")
      assert(polled.statusCode() == 200)
      (0 until 4).foreach(i => assert(!polled.body().contains(s""""i":$i""")))
      (4 until 8).foreach(i => assert(polled.body().contains(s""""i":$i""")))
      // missing/unsubscribed topic -> 400
      assert(send(base, "POST",
        s"/v1/consumer/seek?consumerId=cs&topic=nope&timestamp=1").statusCode() == 400)
    } finally server.stop()
  }

  test("re-register under a new group leaves the old group's assignment") {
    val server = startServer()
    val base = s"http://localhost:${server.boundPort}"
    try {
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cm&group=gOld&topic=t7&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      // same consumer id moves to another group
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cm&group=gNew&topic=t7&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      // a surviving member of the OLD group must now own ALL partitions —
      // if cm leaked in gOld's membership, half the partitions would stay
      // assigned to it and never be served
      assert(send(base, "PUT",
        "/v1/consumer/register?consumerId=cs&group=gOld&topic=t7&onNewGroup=startFromEarliest")
        .statusCode() == 200)
      val parts = server.store.registry.assignment("gOld", "cs", "t7")
      val g = server.store.generation("t7")
      assert(parts.size == g.clusterSize * server.store.rangesPerToken,
        s"old group still routes partitions to the moved consumer: ${parts.size}")
    } finally server.stop()
  }

  test("/metrics exports the maintenance sweep counters and chain-depth gauge") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-rest").toString)
    val server = new RestServer(store, port = 0, coalesceMs = 20L).start()
    val base = s"http://localhost:${server.boundPort}"
    val sweeper = store.startRetentionSweeper(
      intervalMs = 150L, retentionMs = 1000L * 3600 * 24 * 365 * 10)
    try {
      store.produceStrings("t", (0 until 6).map(i =>
        ("k", s"m$i", new java.sql.Timestamp(1700000000000L + i))))
      store.registry.register("g", "c", Seq("t"), store.StartFrom.Earliest)
      store.poll("g", "t", "c").collect()
      store.rescale("t", 6)
      // wait on the RECLAIM itself (a pre-rescale tick can already set
      // the depth gauge to 1), then on the gauge settling post-reclaim
      var waited = 0
      while (store.maintenanceStats.staleFilesReclaimed.get() == 0L && waited < 30000) {
        Thread.sleep(250); waited += 250
      }
      waited = 0
      while (store.maintenanceStats.chainDepth.get() != 1L && waited < 30000) {
        Thread.sleep(250); waited += 250
      }
      val m = get(base, "/metrics")
      assert(m.statusCode() == 200)
      assert(m.body().contains("graft_maintenance_sweep_failures_total 0"), m.body())
      assert("graft_stale_generation_files_reclaimed_total (\\d+)".r
        .findFirstMatchIn(m.body()).exists(_.group(1).toLong >= 1L), m.body())
      assert(m.body().contains("graft_topic_chain_depth 1"), m.body())
      // fresh root: first acquisition is epoch 1
      assert(m.body().contains("graft_plane_lease_epoch 1"), m.body())
    } finally { sweeper.close(); server.stop() }
  }
}
