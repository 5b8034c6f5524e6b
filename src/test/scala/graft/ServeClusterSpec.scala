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
