package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.file.Files

import graft.Graft
import graft.engine.TopicStore
import graft.serving
import graft.serving.{BinaryProducerServer, RestServer}

/** Boots the REST serving shim on an ephemeral port and drives the
  * reference's documented client flow against it over real HTTP:
  * produce JSON + NDJSON, register, poll, commit, goodbye
  * (`docs/rest_api/README.md`). Exits non-zero on any mismatch.
  *
  * With an argument, serves on that fixed port and blocks (manual use:
  * `sbt "runMain graft.tools.Serve 9251"`).
  *
  * Flag mode launches ONE member of a multi-process deployment over a
  * SHARED root (the plane-lease split: N partition-scoped producer
  * brokers + 1 consumer-plane broker + an optional root-authority
  * maintenance owner):
  * {{{
  * runMain graft.tools.Serve --root /shared/store --port 9251 --partitions 0-5
  * runMain graft.tools.Serve --root /shared/store --port 9261 --partitions 6-11
  * runMain graft.tools.Serve --root /shared/store --port 9271 --role consumer
  * runMain graft.tools.Serve --root /shared/store --port 9281            # root owner
  * }}}
  * A partition broker serves produce (records must hash inside its
  * claim — clients route via each broker's discovery listing); the
  * consumer broker serves register/poll/commit; only the root owner
  * runs the retention sweeper and topology watcher.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    if (args.exists(_.startsWith("--"))) { serveMember(args); return }
    val spark = Graft.session("graft-serve")
    val store = new TopicStore(spark, Files.createTempDirectory("graft-serve").toString)
    val port = args.headOption.map(_.toInt).getOrElse(0)
    // fixed-port mode pins the binary port next to the HTTP one, like the
    // reference's 9251/9252/9253 port block; the REST discovery payload
    // advertises it (the reference's producerBinaryPort field). Both
    // channels funnel through the REST server's coalescer — the one
    // produce serialization point per store.
    val server = new RestServer(store, port = port, coalesceMs = 20L).start()
    val binServer = new BinaryProducerServer(server.coalescer,
      port = if (port == 0) 0 else port + 1).start()
    server.advertiseProducerBinaryPort(binServer.boundPort)
    val base = s"http://localhost:${server.boundPort}"
    println(s"serving $base (binary producer on :${binServer.boundPort})")
    if (args.nonEmpty) {
      // manual-serve mode runs the maintenance loops a long-lived broker
      // would: retention sweeping (S10) and, when a topology file is
      // given as the second argument, fixed-topology discovery (C5) —
      // edit the file's broker-names list to trigger a live rescale
      store.startRetentionSweeper()
      args.lift(1).foreach { topoFile =>
        // requireDrained: an automated topology edit must not silently
        // force partially-drained groups to re-read rewritten history —
        // the watcher retries (and now logs) until consumers catch up,
        // matching the documented drain discipline
        graft.engine.TopologyWatcher.forFile(store, topoFile, requireDrained = true).start()
        println(s"watching topology file $topoFile")
      }
      Thread.currentThread().join(); return
    }

    val client = HttpClient.newHttpClient()
    def post(path: String, body: String, ctype: String = "application/json") =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
        .POST(BodyPublishers.ofString(body)).header("Content-Type", ctype)
        .header("Accept", "application/json").build(),
        BodyHandlers.ofString())
    def put(path: String) =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
        .PUT(BodyPublishers.noBody()).build(), BodyHandlers.ofString())

    try {
      val brokers = client.send(HttpRequest.newBuilder(URI.create(base + "/v1/brokers"))
        .GET().build(), BodyHandlers.ofString())
      require(brokers.body().contains(s""""producerBinaryPort":${binServer.boundPort}"""),
        s"discovery missing binary port: ${brokers.body()}")
      require(post(s"/v1/topic/demo/messages?partitionKey=123&timestamp=1700000000000000",
        """{"stock":5}""").statusCode() == 200, "produce json")
      require(post(s"/v1/topic/demo/messages?partitionKey=123&timestamp=1700000000000001",
        "{\"stock\":6}\n{\"stock\":7}", "application/x-ndjson").statusCode() == 200,
        "produce ndjson")

      // binary framed produce on the same key, later timestamp
      binaryProduce(binServer.boundPort, 1700000000000002L, "123", "demo", "{\"stock\":8}")

      require(put("/v1/consumer/register?consumerId=d&group=demo&topic=demo&onNewGroup=startFromEarliest")
        .statusCode() == 200, "register")
      val poll = post("/v1/consumer/poll?consumerId=d", "")
      require(poll.statusCode() == 200, s"poll ${poll.statusCode()}")
      require(poll.body().contains("""[{"stock":5},{"stock":6},{"stock":7},{"stock":8}]"""),
        s"poll body: ${poll.body()}")
      require(post("/v1/consumer/poll?consumerId=d", "").statusCode() == 204, "empty poll")
      require(post("/v1/consumer/goodbye?consumerId=d", "").statusCode() == 200, "goodbye")

      // binary delivery: no Accept header -> framed items (uint16 count first)
      require(put("/v1/consumer/register?consumerId=b&group=bdemo&topic=demo&onNewGroup=startFromEarliest")
        .statusCode() == 200, "register binary consumer")
      val bin = client.send(HttpRequest.newBuilder(URI.create(base + "/v1/consumer/poll?consumerId=b"))
        .POST(BodyPublishers.noBody()).build(),
        BodyHandlers.ofByteArray())
      require(bin.statusCode() == 200, s"binary poll ${bin.statusCode()}")
      val itemCount = ((bin.body()(0) & 0xff) << 8) | (bin.body()(1) & 0xff)
      require(itemCount >= 1, s"binary items: $itemCount")
      println("SERVE OK")
    } finally {
      binServer.stop()
      server.stop()
      spark.stop()
    }
  }

  /** Flag-mode launcher: one member process of a shared-root deployment.
    * The claim shape comes from the flags (session conf read by
    * TopicStore at first mutating touch); root-authority-only loops
    * (retention sweeper, topology watcher) start only without a scoped
    * claim, and the binary produce port only where produce is served.
    *
    * Every member registers itself in the shared-root member directory
    * (`_meta/_serve/`) and fronts produce with a [[ForwardingChannel]]:
    * a record hashing outside this member's claim is forwarded to the
    * owning member and the ack relayed — clients may post to ANY member
    * (the reference's broker-to-broker `SendToLeader` forward,
    * `internal/producing/server.go:163-167`).
    */
  private def serveMember(args: Array[String]): Unit = {
    val known = Set("--root", "--port", "--partitions", "--role",
      "--topology", "--advertise", "--ttl")
    // explicit key/value walk: args.grouped(2) silently dropped a trailing
    // or misaligned flag (e.g. '--role' with no value started the member
    // as a ROOT owner with the sweeper) — every flag must have a value
    // that is not itself a flag, and every token must be a known flag
    val flags = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val k = args(i)
      require(k.startsWith("--"), s"expected a --flag at position $i, got '$k'")
      require(known.contains(k),
        s"unknown flag '$k' (known: ${known.toSeq.sorted.mkString(", ")})")
      require(i + 1 < args.length && !args(i + 1).startsWith("--"),
        s"flag $k is missing its value")
      require(!flags.contains(k), s"flag $k given twice")
      flags(k) = args(i + 1)
      i += 2
    }
    val spark = Graft.session("graft-serve")
    flags.get("--partitions").foreach(spark.conf.set("spark.graft.planeLeasePartitions", _))
    flags.get("--role").foreach(spark.conf.set("spark.graft.planeLeaseRole", _))
    // test/dev knob: short lease + member-ad TTLs so a killed member's
    // stale claims and stale ad expire inside a test window (production
    // keeps the 60 s default)
    flags.get("--ttl").foreach(spark.conf.set("spark.graft.planeLeaseTtlMs", _))
    val adTtlMs = flags.get("--ttl").map(_.toLong)
      .getOrElse(graft.engine.PlaneLease.DefaultTtlMs)
    val root = flags.getOrElse("--root",
      Files.createTempDirectory("graft-serve").toString)
    val port = flags.get("--port").map(_.toInt).getOrElse(0)
    val store = new TopicStore(spark, root)
    val server = new RestServer(store, port = port, coalesceMs = 20L).start()
    // "--role consumer" = the full consumer plane; "--role consumer:0-5"
    // = a range-scoped consumer member (serves polls/commits for those
    // ring partitions only — N such members fan the consumer plane out)
    val consumerRole = flags.get("--role").exists(_.startsWith("consumer"))
    val mode =
      if (consumerRole) flags("--role").stripPrefix("consumer") match {
        case "" => "consumer-plane"
        case spec => s"consumer-plane ranges ${spec.stripPrefix(":")}"
      }
      else flags.get("--partitions").map(s => s"partitions $s").getOrElse("root")
    val host = flags.getOrElse("--advertise", "localhost")
    val base = s"http://$host:${server.boundPort}"
    val hconf = spark.sparkContext.hadoopConfiguration
    val directory = new serving.MemberDirectory(root, hconf)
    val forwarding = new serving.ForwardingChannel(
      store, server.coalescer, directory, Some(server.metrics))
    server.routeProduceVia(forwarding)
    server.discoverMembersVia(directory, selfBase = base)
    val binPort =
      if (consumerRole) 0
      else {
        // binary-framed produce routes through the same forwarding front
        val bin = new BinaryProducerServer(forwarding,
          port = if (port == 0) 0 else port + 1).start()
        server.advertiseProducerBinaryPort(bin.boundPort)
        bin.boundPort
      }
    serving.MemberDirectory.advertise(root, hconf, base, binPort,
      mode = if (consumerRole) "consumer"
        else if (flags.contains("--partitions")) "parts" else "root",
      parts = flags.get("--partitions").map(TopicStore.parsePartitionSpec)
        .orElse(flags.get("--role").filter(_.startsWith("consumer:"))
          .map(r => TopicStore.parsePartitionSpec(r.stripPrefix("consumer:")))),
      ttlMs = adTtlMs)
    if (!consumerRole)
      println(s"serving $base (binary producer on :$binPort) root=$root mode=$mode")
    else println(s"serving $base root=$root mode=$mode")
    if (mode == "root") {
      store.startRetentionSweeper()
      flags.get("--topology").foreach { topoFile =>
        graft.engine.TopologyWatcher.forFile(store, topoFile, requireDrained = true).start()
        println(s"watching topology file $topoFile")
      }
      ()
    } else require(!flags.contains("--topology"),
      "--topology needs root authority (rescale) — run it on the root-owner member")
    Thread.currentThread().join()
  }

  /** Minimal binary-protocol client: startup handshake + one framed
    * produce (withTimestamp), blocking on the produceResponse ack.
    */
  private def binaryProduce(
      port: Int, tsMicros: Long, key: String, topic: String, msg: String): Unit = {
    import java.io.{DataInputStream, DataOutputStream}
    import java.nio.charset.StandardCharsets.UTF_8
    def frame(streamId: Int, op: Int, flags: Int, body: Array[Byte]): Array[Byte] =
      BenchData.frameHeader(streamId, op, flags, body.length) ++ body
    val sock = new java.net.Socket("localhost", port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      def readOp(): Int = {
        val (op, len) = BenchData.readFrameHeader(in)
        in.skipBytes(len); op
      }
      out.write(frame(1, 1, 0, Array.emptyByteArray)); out.flush()
      require(readOp() == 2, "expected ready")
      val buf = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      d.writeLong(tsMicros)
      val k = key.getBytes(UTF_8); d.writeByte(k.length); d.write(k)
      val t = topic.getBytes(UTF_8); d.writeByte(t.length); d.write(t)
      val m = msg.getBytes(UTF_8); d.writeInt(m.length); d.write(m)
      out.write(frame(2, 4, 1, buf.toByteArray)); out.flush()
      require(readOp() == 5, "expected produceResponse")
    } finally sock.close()
  }
}
