package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Murmur3x64, TokenRing}

/** The full multi-process SERVING deployment over real HTTP: three forked
  * `tools.Serve` member JVMs over ONE shared root — two partition-scoped
  * produce brokers (disjoint ring halves) and one consumer-plane broker —
  * driven end-to-end by an HTTP client that routes produce by the same
  * ring math the brokers apply (the reference's client-side routing via
  * discovery). Proves the plane-lease split is not just an engine
  * property: the reference's documented REST flow works against it.
  */
class ServeClusterSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  private def post(base: String, path: String, body: String = ""): Int =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
      .header("Accept", "application/json").build(),
      BodyHandlers.ofString()).statusCode()

  private def postBody(base: String, path: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(BodyPublishers.ofString(""))
      .header("Accept", "application/json").build(), BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def put(base: String, path: String): Int =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .PUT(BodyPublishers.noBody()).build(), BodyHandlers.ofString()).statusCode()

  test("three Serve members over one root: routed HTTP produce to two partition brokers, consume via the consumer broker") {
    val root = Files.createTempDirectory("graft-servecluster").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def forkServe(flags: String*): (Process, String) = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.tools.Serve", "--root", root) ++ flags
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_CPUS", "2") // light member sessions
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      var line = rd.readLine()
      while (line != null && !line.startsWith("serving http")) line = rd.readLine()
      assert(line != null, s"Serve member ${flags.mkString(" ")} died before serving")
      (proc, line.split(' ')(1)) // "serving <base> ..."
    }
    // all three members start concurrently (the claims are compatible)
    val (pa, fa) = {
      val p = forkServe("--partitions", "0-5"); p
    }
    val (pb2, fb) = forkServe("--partitions", "6-11")
    val (pc, fc) = forkServe("--role", "consumer")
    try {
      // the ring math the brokers apply — used here only to PICK the wrong
      // broker: clients no longer need it (broker-to-broker forwarding)
      def partitionOf(k: String): Int =
        TokenRing.partitionOrdinal(Murmur3x64.hashString(k), 3, 4)
      def rightBroker(k: String): String = if (partitionOf(k) <= 5) fa else fb
      def wrongBroker(k: String): String = if (partitionOf(k) <= 5) fb else fa
      val keys = Iterator.from(0).map(i => s"sk$i").take(24).toSeq
      assert(keys.exists(partitionOf(_) <= 5) && keys.exists(partitionOf(_) > 5),
        "fixture keys must span both brokers")
      // even records post to the owning broker (local coalescer path);
      // ODD records post to the WRONG broker: the member must forward to
      // the owner over HTTP and relay the ack — the reference's
      // SendToLeader (producing/server.go:163-167) — so clients need no
      // ring routing at all
      keys.zipWithIndex.foreach { case (k, i) =>
        val b = if (i % 2 == 0) rightBroker(k) else wrongBroker(k)
        assert(post(b,
          s"/v1/topic/t/messages?partitionKey=$k&timestamp=${1700000000000000L + i}",
          s"""{"i":$i}""") == 200, s"produce $k via $b (${if (i % 2 == 0) "local" else "forwarded"})")
      }
      // the forwarding member counted its relays
      val metricsBody = client.send(HttpRequest.newBuilder(
        URI.create(fa + "/metrics")).GET().build(), BodyHandlers.ofString()).body() +
        client.send(HttpRequest.newBuilder(
          URI.create(fb + "/metrics")).GET().build(), BodyHandlers.ofString()).body()
      val fwd = "graft_produces_forwarded_total (\\d+)".r
        .findAllMatchIn(metricsBody).map(_.group(1).toLong).sum
      assert(fwd == 12L, s"expected 12 forwarded produces across the brokers, got $fwd")
      // an ALREADY-FORWARDED arrival outside the claim (stale member
      // directory) is refused loudly instead of bouncing between members
      val stray = Iterator.from(0).map(i => s"x$i").find(partitionOf(_) > 5).get
      val refused = client.send(HttpRequest.newBuilder(URI.create(fa +
          s"/v1/topic/t/messages?partitionKey=$stray&timestamp=1700000000000099"))
        .POST(BodyPublishers.ofString("""{"i":99}"""))
        .header("Content-Type", "application/json")
        .header("X-Graft-Forwarded", "1").build(), BodyHandlers.ofString())
      assert(refused.statusCode() >= 400, "a forwarded misroute must be refused, not re-forwarded")
      // the consumer-plane broker serves the whole consume flow
      assert(put(fc,
        "/v1/consumer/register?consumerId=c&group=g&topic=t&onNewGroup=startFromEarliest") == 200)
      val (st, body) = postBody(fc, "/v1/consumer/poll?consumerId=c")
      assert(st == 200, s"poll $st")
      val got = "\"i\":(\\d+)".r.findAllMatchIn(body).map(_.group(1).toInt).toSet
      assert(got == (0 until 24).toSet, s"delivered set: $got")
      assert(postBody(fc, "/v1/consumer/poll?consumerId=c")._1 == 204,
        "deferred commit must persist under the consumer-plane lease")
      assert(post(fc, "/v1/consumer/goodbye?consumerId=c") == 200)
      // a consumer-API call on a PRODUCE member redirects (307 + Location)
      // to the consumer-capable member — HTTP-native discovery
      val redir = client.send(HttpRequest.newBuilder(URI.create(fa +
          "/v1/consumer/register?consumerId=r&group=gr&topic=t"))
        .PUT(BodyPublishers.noBody()).build(), BodyHandlers.ofString())
      assert(redir.statusCode() == 307, s"expected 307, got ${redir.statusCode()}")
      assert(redir.headers().firstValue("Location").orElse("")
        .startsWith(fc), s"Location: ${redir.headers().firstValue("Location")}")
    } finally {
      Seq(pa, pb2, pc).foreach { p => p.destroyForcibly(); () }
    }
  }

  /** Minimal binary-protocol producer: startup handshake + one framed
    * produce, asserting the produceResponse ack (opcode 5).
    */
  private def binaryProduce(
      port: Int, tsMicros: Long, key: String, topic: String, msg: String): Unit = {
    import java.io.{DataInputStream, DataOutputStream}
    val sock = new java.net.Socket("localhost", port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      def readFrame(): (Int, Array[Byte]) = {
        val (op, len) = graft.tools.BenchData.readFrameHeader(in)
        val b = new Array[Byte](len); in.readFully(b); (op, b)
      }
      out.write(graft.tools.BenchData.frameHeader(1, 1, 0, 0)); out.flush()
      assert(readFrame()._1 == 2, "expected ready")
      val buf = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      d.writeLong(tsMicros)
      val k = key.getBytes("UTF-8"); d.writeByte(k.length); d.write(k)
      val t = topic.getBytes("UTF-8"); d.writeByte(t.length); d.write(t)
      val m = msg.getBytes("UTF-8"); d.writeInt(m.length); d.write(m)
      val body = buf.toByteArray
      out.write(graft.tools.BenchData.frameHeader(2, 4, 1, body.length))
      out.write(body); out.flush()
      val (op, rb) = readFrame()
      assert(op == 5, s"expected produceResponse, got op $op: ${new String(rb, "UTF-8")}")
    } finally sock.close()
  }

  test("discovery carries roles+ranges; binary frames forward from the wrong member; a killed owner answers retryably then a successor takes over") {
    val root = Files.createTempDirectory("graft-servefail").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    // short TTL: a killed member's stale ad, lease files, and claim all
    // expire inside the test window (production default is 60 s)
    def forkServe(flags: String*): (Process, String, Int) = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.tools.Serve", "--root", root, "--ttl", "3000") ++ flags
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_CPUS", "2")
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      var line = rd.readLine()
      while (line != null && !line.startsWith("serving http")) line = rd.readLine()
      assert(line != null, s"Serve member ${flags.mkString(" ")} died before serving")
      val binPort = "binary producer on :(\\d+)".r
        .findFirstMatchIn(line).map(_.group(1).toInt).getOrElse(0)
      (proc, line.split(' ')(1), binPort)
    }
    def get(base: String, path: String): String =
      client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
        BodyHandlers.ofString()).body()
    val (pa, fa, binA) = forkServe("--partitions", "0-5")
    val (pb2, fb, _) = forkServe("--partitions", "6-11")
    val (pc, fc, _) = forkServe("--role", "consumer")
    var pb3: Process = null
    try {
      def partitionOf(k: String): Int =
        TokenRing.partitionOrdinal(Murmur3x64.hashString(k), 3, 4)
      val aKey = Iterator.from(0).map(i => s"fo$i").find(partitionOf(_) <= 5).get
      val bKeys = Iterator.from(0).map(i => s"fo$i").filter(partitionOf(_) > 5).take(2).toSeq

      // 1. discovery: /v1/brokers on ANY member lists every member with
      // role + range claim — a client builds produce AND poll sets from
      // one call, without reading _meta/_serve/ itself
      val deadline = System.currentTimeMillis() + 20000
      var brokers = get(fa, "/v1/brokers")
      while (!("\"mode\":\"consumer\"".r.findFirstIn(brokers).isDefined &&
               "\"parts\":\"0-5\"".r.findFirstIn(brokers).isDefined &&
               "\"parts\":\"6-11\"".r.findFirstIn(brokers).isDefined) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(300); brokers = get(fa, "/v1/brokers")
      }
      assert(brokers.contains("\"parts\":\"0-5\"") &&
        brokers.contains("\"parts\":\"6-11\"") &&
        brokers.contains("\"mode\":\"consumer\""), s"discovery payload: $brokers")
      // the consumer poll set comes from the discovery rows, not from a
      // hand-built member list
      val consumerBases =
        "\\{\"base\":\"([^\"]+)\",\"binaryPort\":-?\\d+,\"mode\":\"consumer\"".r
          .findAllMatchIn(brokers).map(_.group(1)).toSeq
      assert(consumerBases == Seq(fc), s"consumer rows: $consumerBases vs $fc")

      // 2. binary frames posted to the WRONG member forward like HTTP:
      // a B-owned key through A's binary port (relayed over HTTP to B)
      // and an A-owned key through the same port (local coalescer)
      binaryProduce(binA, 1700000000000001L, bKeys.head, "t", """{"i":1}""")
      binaryProduce(binA, 1700000000000002L, aKey, "t", """{"i":2}""")
      val fwd = "graft_produces_forwarded_total (\\d+)".r
        .findFirstMatchIn(get(fa, "/metrics")).map(_.group(1).toLong).getOrElse(0L)
      assert(fwd >= 1L, s"the binary wrong-member frame must count as a forward, got $fwd")

      // 3. the 307 on a produce member carries the COMPLETE consumer set
      val redir = client.send(HttpRequest.newBuilder(URI.create(fa +
          "/v1/consumer/poll?consumerId=x")).POST(BodyPublishers.ofString(""))
        .build(), BodyHandlers.ofString())
      assert(redir.statusCode() == 307)
      assert(redir.headers().firstValue("X-Graft-Consumer-Members").orElse("")
        .contains(fc), "the redirect must enumerate every consumer member")

      // 4. kill the owner of partitions 6-11 mid-deployment: a produce
      // needing it answers RETRYABLY (503 + Retry-After), never a bare
      // 500 — the forward fails over against a refreshed listing that
      // excludes the dead member and finds no owner
      pb2.destroyForcibly(); pb2.waitFor()
      val dead = client.send(HttpRequest.newBuilder(URI.create(fa +
          s"/v1/topic/t/messages?partitionKey=${bKeys(1)}&timestamp=1700000000000003"))
        .POST(BodyPublishers.ofString("""{"i":3}"""))
        .header("Content-Type", "application/json").build(), BodyHandlers.ofString())
      assert(dead.statusCode() == 503,
        s"expected retryable 503, got ${dead.statusCode()}: ${dead.body()}")
      assert(dead.headers().firstValue("Retry-After").isPresent,
        "the no-live-owner answer must carry Retry-After")
      val failovers = "graft_forward_failovers_total (\\d+)".r
        .findFirstMatchIn(get(fa, "/metrics")).map(_.group(1).toLong).getOrElse(0L)
      assert(failovers >= 1L, s"the dead-owner attempt must count a failover, got $failovers")

      // 5. a successor claims the dead member's ranges after its TTL:
      // the SAME produce (the client's retry) now succeeds via the
      // successor — at-least-once end to end, no client reconfiguration
      Thread.sleep(4500) // > --ttl 3000: stale ad + stale leases expire
      val (p3, _, _) = forkServe("--partitions", "6-11"); pb3 = p3
      val retryDeadline = System.currentTimeMillis() + 60000
      var st = 0
      while (st != 200 && System.currentTimeMillis() < retryDeadline) {
        st = post(fa,
          s"/v1/topic/t/messages?partitionKey=${bKeys(1)}&timestamp=1700000000000003",
          """{"i":3}""")
        if (st != 200) Thread.sleep(500)
      }
      assert(st == 200, s"produce via the successor never succeeded (last $st)")

      // 6. exactly-once delivery of every ACKED record (the 503'd attempt
      // never acked and its retry is the one delivery)
      assert(put(fc,
        "/v1/consumer/register?consumerId=f&group=gf&topic=t&onNewGroup=startFromEarliest") == 200)
      val got = scala.collection.mutable.ArrayBuffer.empty[Int]
      var pst = 200
      while (pst == 200) {
        val (s2, body) = postBody(fc, "/v1/consumer/poll?consumerId=f")
        pst = s2
        if (s2 == 200)
          "\"i\":(\\d+)".r.findAllMatchIn(body).foreach(m => got += m.group(1).toInt)
      }
      assert(pst == 204, s"drain ended with $pst")
      assert(got.sorted == Seq(1, 2, 3), s"delivered: $got")
    } finally {
      Seq(pa, pb2, pc).foreach { p => p.destroyForcibly(); () }
      if (pb3 != null) { pb3.destroyForcibly(); () }
    }
  }

  test("four Serve members: two partition brokers + two RANGE-SCOPED consumer members over one root") {
    val root = Files.createTempDirectory("graft-servecluster4").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def forkServe(flags: String*): (Process, String) = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.tools.Serve", "--root", root) ++ flags
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_CPUS", "2")
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      var line = rd.readLine()
      while (line != null && !line.startsWith("serving http")) line = rd.readLine()
      assert(line != null, s"Serve member ${flags.mkString(" ")} died before serving")
      (proc, line.split(' ')(1))
    }
    val (pa, fa) = forkServe("--partitions", "0-5")
    val (pb2, fb) = forkServe("--partitions", "6-11")
    val (pc1, fc1) = forkServe("--role", "consumer:0-5")
    val (pc2, fc2) = forkServe("--role", "consumer:6-11")
    try {
      // produce 24 records, ALL posted to broker A — forwarding re-homes
      // the other half to broker B (clients need no ring math at all)
      (0 until 24).foreach { i =>
        assert(post(fa,
          s"/v1/topic/t/messages?partitionKey=fk$i&timestamp=${1700000000000000L + i}",
          s"""{"i":$i}""") == 200, s"produce fk$i via A")
      }
      // the reference's consumer shape: one group, one consumer id PER
      // consumer member, each serving its claimed ranges; together they
      // deliver everything exactly once
      assert(put(fc1,
        "/v1/consumer/register?consumerId=c1&group=g&topic=t&onNewGroup=startFromEarliest") == 200)
      assert(put(fc2,
        "/v1/consumer/register?consumerId=c2&group=g&topic=t&onNewGroup=startFromEarliest") == 200)
      def drain(base: String, cid: String): Set[Int] = {
        val got = scala.collection.mutable.Set.empty[Int]
        var st = 200
        while (st == 200) {
          val (s2, body) = postBody(base, s"/v1/consumer/poll?consumerId=$cid")
          st = s2
          if (s2 == 200)
            "\"i\":(\\d+)".r.findAllMatchIn(body).foreach(m => got += m.group(1).toInt)
        }
        assert(st == 204, s"drain($cid) ended with $st")
        got.toSet
      }
      val g1 = drain(fc1, "c1")
      val g2 = drain(fc2, "c2")
      assert(g1.nonEmpty && g2.nonEmpty, s"both members must serve: $g1 / $g2")
      assert((g1 & g2).isEmpty, s"ranges must be disjoint: ${g1 & g2}")
      assert((g1 ++ g2) == (0 until 24).toSet, s"union must cover: ${g1 ++ g2}")
      // commits are lane-durable per member: both see empty on re-poll
      assert(postBody(fc1, "/v1/consumer/poll?consumerId=c1")._1 == 204)
      assert(postBody(fc2, "/v1/consumer/poll?consumerId=c2")._1 == 204)
    } finally {
      Seq(pa, pb2, pc1, pc2).foreach { p => p.destroyForcibly(); () }
    }
  }
}
