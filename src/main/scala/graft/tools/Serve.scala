package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.file.Files

import graft.Graft
import graft.engine.TopicStore
import graft.serving.RestServer

/** Boots the REST serving shim on an ephemeral port and drives the
  * reference's documented client flow against it over real HTTP:
  * produce JSON + NDJSON, register, poll, commit, goodbye
  * (`docs/rest_api/README.md`). Exits non-zero on any mismatch.
  *
  * With an argument, serves on that fixed port and blocks (manual use:
  * `sbt "runMain graft.tools.Serve 9251"`).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("graft-serve")
    val store = new TopicStore(spark, Files.createTempDirectory("graft-serve").toString)
    val port = args.headOption.map(_.toInt).getOrElse(0)
    val server = new RestServer(store, port = port, coalesceMs = 20L).start()
    val base = s"http://localhost:${server.boundPort}"
    println(s"serving $base")
    if (args.nonEmpty) { Thread.currentThread().join(); return }

    val client = HttpClient.newHttpClient()
    def post(path: String, body: String, ctype: String = "application/json") =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
        .POST(BodyPublishers.ofString(body)).header("Content-Type", ctype).build(),
        BodyHandlers.ofString())
    def put(path: String) =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
        .PUT(BodyPublishers.noBody()).build(), BodyHandlers.ofString())

    try {
      require(post(s"/v1/topic/demo/messages?partitionKey=123&timestamp=1700000000000000",
        """{"stock":5}""").statusCode() == 200, "produce json")
      require(post(s"/v1/topic/demo/messages?partitionKey=123&timestamp=1700000000000001",
        "{\"stock\":6}\n{\"stock\":7}", "application/x-ndjson").statusCode() == 200,
        "produce ndjson")
      require(put("/v1/consumer/register?consumerId=d&group=demo&topic=demo&onNewGroup=startFromEarliest")
        .statusCode() == 200, "register")
      val poll = post("/v1/consumer/poll?consumerId=d", "")
      require(poll.statusCode() == 200, s"poll ${poll.statusCode()}")
      require(poll.body().contains("""[{"stock":5},{"stock":6},{"stock":7}]"""),
        s"poll body: ${poll.body()}")
      require(post("/v1/consumer/poll?consumerId=d", "").statusCode() == 204, "empty poll")
      require(post("/v1/consumer/goodbye?consumerId=d", "").statusCode() == 200, "goodbye")
      println("SERVE OK")
    } finally {
      server.stop()
      spark.stop()
    }
  }
}
