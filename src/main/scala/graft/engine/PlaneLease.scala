package graft.engine

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Another live process holds the produce/maintenance plane for this root. */
final class PlaneLeaseHeldException(msg: String) extends IllegalStateException(msg)

/** This process's plane lease was superseded by a higher epoch — every
  * subsequent mutating operation on the root must fail instead of racing
  * the successor's watermark/commit plane.
  */
final class PlaneFencedException(msg: String) extends IllegalStateException(msg)

/** Cross-JVM single-writer lease for a store root's produce/maintenance
  * plane — the shared-storage collapse of the reference's generation
  * transaction (`internal/ownership/process_local.go:16-209`: propose →
  * accept → commit an ownership epoch among live processes; here the
  * "cluster" is ONE writer per root over shared storage, so the protocol
  * collapses to an epoch-fenced lease file).
  *
  * Within one JVM the store already serializes every mutating path through
  * the JVM-global produce/maintenance locks; this object extends the
  * single-writer view ACROSS processes: the first mutating operation on a
  * root acquires `<root>/_meta/_plane/lease-<epoch>` (owner identity as
  * content), a background daemon heartbeats it (mtime refresh) at TTL/4,
  * and a second JVM's acquisition fails LOUDLY while the lease is live —
  * instead of silently racing the watermark read-modify-write (two JVMs
  * interleaving produce over one root would reissue offsets: lost acked
  * records).
  *
  * Mutual exclusion is CREATE-EXCLUSIVE on the fixed per-epoch name: the
  * epoch number itself is the mutex, so an acquisition race has exactly
  * one winner (O_CREAT|O_EXCL via NIO on the local filesystem — Hadoop's
  * local `create(overwrite=false)` is check-then-create and local
  * `rename` overwrites, so neither is exclusive there; HDFS `create`
  * IS atomic create-exclusive). HONEST caveat: object stores whose
  * Hadoop connector lacks atomic create-exclusive (classic S3A does a
  * HEAD-then-PUT) get a narrow check-then-create window on simultaneous
  * first acquisition — still a vast improvement over no guard (steady-
  * state rejection and fencing are unaffected), and closable by a
  * connector with conditional writes (S3 If-None-Match, GCS
  * generation-match) without touching callers.
  *
  * Epoch fencing: a CLEAN exit releases the lease (JVM shutdown hook —
  * the reference's goodbye gossip), so a restarted driver contends
  * immediately; a crashed owner's lease goes stale after TTL and a
  * successor claims epoch+1. If a paused owner (GC pause, VM migration)
  * resumes after takeover, its next heartbeat observes the higher epoch
  * and marks the root FENCED: every subsequent mutating call throws
  * [[PlaneFencedException]] rather than writing with stale authority.
  * Fencing is heartbeat-granular, not per-write — the hot produce path
  * pays one map lookup; the window between takeover and the old owner's
  * next heartbeat is bounded by the heartbeat period (TTL/4), during
  * which both processes' meta writes remain individually atomic
  * (rename-first swaps with durable-monotonic stamps), so the exposure
  * is bounded-duration dual-writer contention, not corruption — the same
  * trade the reference makes between gossip rounds.
  *
  * Read-only observers (the DSv2 source/observer pattern) never call
  * [[ensureOwned]] and need no lease.
  */
object PlaneLease {

  /** Stable identity of this process for lease ownership: pid@host plus a
    * random component (two processes can share pid@host across container
    * namespaces; the random suffix keeps identities distinct).
    */
  val ownerId: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    val safe = rt.replaceAll("[^A-Za-z0-9@.]", "_")
    f"$safe-${java.util.UUID.randomUUID().toString.take(8)}"
  }

  val DefaultTtlMs: Long = 60000L

  private final case class Held(root: String, epoch: Long, path: Path, ttlMs: Long)

  // rootKey -> lease this JVM holds; append-mostly (one entry per root a
  // JVM ever writes — operationally small, like the store's lock tables)
  private val held = new ConcurrentHashMap[String, Held]()
  private val fencedRoots = ConcurrentHashMap.newKeySet[String]()
  @volatile private var beater: java.util.concurrent.ScheduledExecutorService = _

  /** Fast-path guard for every mutating store operation: no-op when this
    * JVM already holds the root's lease (one map lookup), acquisition on
    * first touch, loud [[PlaneLeaseHeldException]] if another live process
    * holds it, loud [[PlaneFencedException]] forever after a takeover.
    */
  def ensureOwned(
      rootKey: String,
      root: String,
      conf: Configuration,
      ttlMs: Long = DefaultTtlMs): Unit = {
    if (fencedRoots.contains(rootKey))
      throw new PlaneFencedException(
        s"this process's plane lease for $root was superseded by a higher epoch " +
          "(another process took over after a missed heartbeat) — refusing to " +
          "write with stale authority; restart the store against the root to " +
          "contend for a fresh lease")
    if (held.containsKey(rootKey)) return
    this.synchronized {
      if (held.containsKey(rootKey)) return
      val h = acquire(root, conf, ttlMs)
      held.put(rootKey, h)
      startBeater()
    }
  }

  /** Acquire (or take over) the root's lease. Loud on a live foreign
    * lease; a stale one (mtime older than the TTL) is fenced by claiming
    * epoch+1 exclusively.
    */
  private def acquire(root: String, conf: Configuration, ttlMs: Long): Held = {
    val dir = new Path(new Path(root, "_meta"), "_plane")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val newest = listLeases(fs, dir).lastOption
    val claim = newest match {
      case Some((e, st)) =>
        val owner = readOwner(fs, st.getPath)
        if (owner != ownerId) {
          val age = System.currentTimeMillis() - st.getModificationTime
          if (age < ttlMs)
            throw new PlaneLeaseHeldException(
              s"the produce/maintenance plane for $root is leased by " +
                s"${if (owner.isEmpty) "an in-flight claimant" else owner} " +
                s"(epoch $e, heartbeat ${age}ms ago, TTL ${ttlMs}ms) — a second " +
                "writer process would race the watermark/commit plane; point " +
                "this store at its own root, or wait for the lease to expire " +
                "if the owner is dead")
        }
        e + 1L // stale foreign owner, or our own prior incarnation's leftover
      case None => 1L
    }
    val fin = new Path(dir, f"lease-$claim%020d")
    if (!createExclusive(fs, fin, ownerId)) {
      val winner = readOwner(fs, fin)
      throw new PlaneLeaseHeldException(
        s"lost the plane-lease acquisition race for $root at epoch $claim " +
          s"to ${if (winner.isEmpty) "another claimant" else winner}")
    }
    // fold superseded epochs (best-effort: a failure just leaves tiny
    // stale files below the winning epoch)
    listLeases(fs, dir).filter(_._1 < claim)
      .foreach { case (_, st) => fs.delete(st.getPath, false) }
    Held(root, claim, fin, ttlMs)
  }

  /** Atomic create-exclusive of `p` with `owner` as content: exactly one
    * claimant of a name succeeds. The content write happens after the
    * exclusive create — a reader in that window sees an empty owner and
    * treats the lease as live-but-unknown (still loud).
    */
  private def createExclusive(fs: FileSystem, p: Path, owner: String): Boolean =
    try {
      fs match {
        case _: org.apache.hadoop.fs.LocalFileSystem |
             _: org.apache.hadoop.fs.RawLocalFileSystem =>
          val local = java.nio.file.Paths.get(p.toUri.getPath)
          java.nio.file.Files.createFile(local) // O_CREAT|O_EXCL
          java.nio.file.Files.write(local,
            owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          true
        case _ =>
          val out = fs.create(p, false) // atomic create-exclusive on HDFS
          try out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          true
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException => if (fs.exists(p)) false else throw e
    }

  private def readOwner(fs: FileSystem, p: Path): String =
    try {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    } catch { case _: Exception => "" }

  /** Visible lease files ascending by epoch: (epoch, status). */
  private def listLeases(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.startsWith("lease-"))
      .flatMap { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("lease-").toLong).toOption
          .map(e => (e, st))
      }
      .sortBy(_._1)

  private def startBeater(): Unit = {
    if (beater == null) {
      // clean exits RELEASE (the reference's goodbye gossip): a restarted
      // driver contends immediately instead of waiting out the TTL; a
      // crash skips the hook and leaves the lease to expire — exactly the
      // takeover path. Best-effort: a failed delete just means TTL expiry.
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        val it = held.values().iterator()
        while (it.hasNext) {
          val h = it.next()
          try { h.path.getFileSystem(new Configuration()).delete(h.path, false); () }
          catch { case _: Exception => () }
        }
      }, "graft-plane-lease-release"))
      beater = Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-plane-lease")
        t.setDaemon(true)
        t
      })
      // one global beat at DefaultTtl/4: a per-root ttl OVERRIDE shorter
      // than that is honored for acquisition/takeover decisions but is
      // not kept alive between beats — short TTLs are a test/dev knob,
      // not a production cadence
      beater.scheduleWithFixedDelay(() => heartbeatTick(),
        DefaultTtlMs / 4, DefaultTtlMs / 4, TimeUnit.MILLISECONDS)
      ()
    }
  }

  /** One heartbeat pass over every held lease: refresh mtime, detect
    * takeover (higher epoch visible -> FENCE this root), and drop leases
    * whose root no longer exists (a torn-down test/dev store).
    * Package-visible so the fencing test can drive it deterministically.
    */
  private[graft] def heartbeatTick(): Unit = {
    val it = held.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getValue
      try {
        val dir = h.path.getParent
        val fs = dir.getFileSystem(new Configuration())
        if (!fs.exists(new Path(h.root))) {
          it.remove() // the store is gone; nothing left to guard
        } else if (listLeases(fs, dir).lastOption.exists(_._1 > h.epoch)) {
          // superseded: fence, and do NOT touch the successor's file
          fencedRoots.add(e.getKey)
          it.remove()
        } else if (!fs.exists(h.path)) {
          // self-heal a swept lease file (e.g. an overzealous cleaner);
          // exclusive create again — if a claimant beat us to the SAME
          // epoch name, treat it as a takeover
          if (!createExclusive(fs, h.path, ownerId)) {
            fencedRoots.add(e.getKey)
            it.remove()
          }
        } else {
          fs.setTimes(h.path, System.currentTimeMillis(), -1)
        }
      } catch { case _: Exception => () } // transient FS hiccup: next tick
    }
  }

  /** The epoch this JVM holds for a root, if any — the `/metrics`
    * gauge's source (an epoch INCREASE across scrapes means a takeover
    * happened somewhere: alert-worthy).
    */
  private[graft] def heldEpoch(rootKey: String): Option[Long] =
    Option(held.get(rootKey)).map(_.epoch)

  /** Test aid: forget (and delete) this JVM's lease for a root so a new
    * acquisition contends from scratch; clears any fenced mark.
    */
  private[graft] def dropForTests(rootKey: String, conf: Configuration): Unit = {
    val h = held.remove(rootKey)
    fencedRoots.remove(rootKey)
    if (h != null) {
      try {
        val fs = h.path.getFileSystem(conf)
        fs.delete(h.path, false)
        ()
      } catch { case _: Exception => () }
    }
  }
}
