package graft.engine

import graft.core.TokenRing

/** Fixed-topology discovery (C5, the reference's non-Kubernetes mode):
  * poll a topology file for the desired broker list and rescale topics
  * when the (normalized) broker count changes — the Spark expression of
  * `internal/discovery/discoverer.go:252-296` (`loadFixedTopology`):
  * the reference reads `POLAR_BROKER_NAMES`-style comma/whitespace-
  * separated names from `topology.txt` on a poll delay (default 10 s,
  * `config.go:388-391`), normalizes the count to a valid ring size
  * (1 or 3·2ⁿ, `utils.go:198-208`), and swaps the topology only when the
  * normalized broker COUNT changes, emitting the change event that
  * drives the generation dance. Here the "brokers" are ring partitions
  * of the single-driver engine, and the change event IS the rescale:
  * each watched topic opens its next generation under the new ring.
  *
  * Faithful details: an empty or unreadable file is skipped (the
  * reference `continue`s), a malformed count is normalized down rather
  * than rejected, and no action fires when normalization maps the new
  * count onto the current size (e.g. 6 -> 7 names stays a 6-ring).
  * Rescale is the engine's crash-safe copy-then-flip, so a poll-loop
  * death mid-rescale leaves the old generation current.
  */
class TopologyWatcher(
    store: TopicStore,
    topologyFile: String,
    pollDelayMs: Long = 10000L,
    // drain discipline forwarded to rescale: refuse a topology change
    // while registered groups lag (the reference waits for consumers to
    // drain old generations before joining ranges)
    requireDrained: Boolean = false,
    onRescale: (String, Generation) => Unit = (_, _) => ()) {

  @volatile private var lastError: Option[String] = None

  /** Most recent poll-loop failure (rescale errors surface here — the
    * loop keeps polling, like the reference's warn-and-continue).
    */
  def lastFailure: Option[String] = lastError

  /** Parse the topology file content: comma/whitespace-separated broker
    * names (the `POLAR_BROKER_NAMES` shape); the broker COUNT is the
    * ring input, names are opaque. Returns None for empty content.
    */
  private[engine] def desiredRingSize(contents: String): Option[Int] = {
    val names = contents.split("[,\\s]+").filter(_.nonEmpty)
    if (names.isEmpty) None else Some(TokenRing.validRingLength(names.length))
  }

  private def pollOnce(): Unit = {
    val p = java.nio.file.Path.of(topologyFile)
    if (!java.nio.file.Files.exists(p)) return
    val contents =
      try java.nio.file.Files.readString(p)
      catch { case _: java.io.IOException => return } // transient: next tick
    desiredRingSize(contents).foreach { size =>
      store.listTopics().foreach { case (topic, _, clusterSize) =>
        if (clusterSize != size) {
          try {
            val g = store.rescale(topic, size, requireDrained)
            onRescale(topic, g)
          } catch {
            case e: Exception =>
              lastError = Some(s"$topic: ${e.getMessage}")
          }
        }
      }
    }
  }

  /** Start the poll loop; `close()` stops it. One check runs immediately
    * (the reference applies the env-var topology at startup before the
    * file loop takes over).
    */
  def start(): AutoCloseable = {
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-topology"); t.setDaemon(true); t
    })
    exec.scheduleWithFixedDelay(() => {
      try pollOnce()
      catch { case e: Throwable => lastError = Some(String.valueOf(e.getMessage)) }
    }, 0L, pollDelayMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    () => { exec.shutdownNow(); () }
  }
}
