package graft.engine

import graft.core.TokenRing

/** Topology discovery (C5): poll a pluggable desired-replicas supplier
  * and rescale topics when the (normalized) broker count changes — the
  * Spark expression of `internal/discovery/discoverer.go:99-164`, where
  * the generic loop consumes a replica-count feed and the concrete feeds
  * are (a) a fixed-topology file (`loadFixedTopology`,
  * `discoverer.go:252-296`: `POLAR_BROKER_NAMES`-style comma/whitespace-
  * separated names re-read on a poll delay, default 10 s,
  * `config.go:388-391`) and (b) a Kubernetes StatefulSet watch
  * (`k8s_client.go` — a deploy-layer concern here; any cluster manager
  * can feed the same supplier seam). The count is normalized to a valid
  * ring size (1 or 3·2ⁿ, `utils.go:198-208`) and the topology swaps only
  * when the NORMALIZED count changes, emitting the change event that
  * drives the generation dance. Here the "brokers" are ring partitions
  * of the single-driver engine, and the change event IS the rescale:
  * each watched topic opens its next generation under the new ring.
  *
  * Faithful details: a supplier returning None (empty/unreadable file,
  * watch gap) is skipped (the reference `continue`s), a malformed count
  * is normalized down rather than rejected, and no action fires when
  * normalization maps the new count onto the current size (e.g. 6 -> 7
  * replicas stays a 6-ring). Rescale is the engine's crash-safe
  * copy-then-flip, so a poll-loop death mid-rescale leaves the old
  * generation current.
  */
class TopologyWatcher(
    store: TopicStore,
    // raw desired replica count (file poller, K8s watch, test fake);
    // None = no signal this tick. Normalization happens HERE, not in the
    // supplier, so every feed gets the same 3·2ⁿ discipline.
    desiredReplicas: () => Option[Int],
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

  private[graft] def pollOnce(): Unit =
    desiredReplicas().foreach { raw =>
      val size = TokenRing.validRingLength(raw)
      store.listTopics().foreach { case (topic, _, clusterSize) =>
        if (clusterSize != size) {
          try {
            val g = store.rescale(topic, size, requireDrained)
            onRescale(topic, g)
          } catch {
            case e: Exception =>
              lastError = Some(s"$topic: ${e.getMessage}")
              // operator-visible, like the reference's warn-and-continue:
              // a persistent refusal (e.g. requireDrained with lagging
              // groups) retries every tick and must not fail silently
              System.err.println(
                s"[topology] rescale $topic -> $size failed: ${e.getMessage}")
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

object TopologyWatcher {

  /** Parse topology-file content: comma/whitespace-separated broker names
    * (the `POLAR_BROKER_NAMES` shape); the broker COUNT is the ring
    * input, names are opaque. None for empty content.
    */
  private[engine] def parseBrokerNames(contents: String): Option[Int] = {
    val names = contents.split("[,\\s]+").filter(_.nonEmpty)
    if (names.isEmpty) None else Some(names.length)
  }

  /** The fixed-topology file feed (`loadFixedTopology`): re-read the file
    * each tick; a missing file or transient read error is no-signal.
    */
  private[engine] def fileReplicas(topologyFile: String): () => Option[Int] = () => {
    val p = java.nio.file.Path.of(topologyFile)
    if (!java.nio.file.Files.exists(p)) None
    else
      try parseBrokerNames(java.nio.file.Files.readString(p))
      catch { case _: java.io.IOException => None } // transient: next tick
  }

  /** Fixed-topology (file-poll) watcher — the non-Kubernetes mode. */
  def forFile(
      store: TopicStore,
      topologyFile: String,
      pollDelayMs: Long = 10000L,
      requireDrained: Boolean = false,
      onRescale: (String, Generation) => Unit = (_, _) => ()): TopologyWatcher =
    new TopologyWatcher(store, fileReplicas(topologyFile), pollDelayMs,
      requireDrained, onRescale)
}
