package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.MemberDirectory

/** Object-store `setTimes` semantics (S3A throws UnsupportedOperation):
  * the member-ad refresh must fall back to rewriting the ad file instead
  * of letting a healthy member's ad silently expire at TTL.
  */
class SetTimesLessFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockst:///")
  override def setTimes(p: org.apache.hadoop.fs.Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException(
      "setTimes is not supported (object-store semantics)")
}

/** Fails exactly the next create() — the transient-startup-error shape
  * for the advertise-rollback test.
  */
class FailNextCreateFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfc:///")
  override def create(p: org.apache.hadoop.fs.Path, overwrite: Boolean)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (FailNextCreateFs.failNext.compareAndSet(true, false))
      throw new java.io.IOException("injected create failure")
    super.create(p, overwrite)
  }
}
object FailNextCreateFs {
  val failNext = new java.util.concurrent.atomic.AtomicBoolean(false)
}

/** The shared-root serving member directory (`_meta/_serve/`): discovery
  * input for broker-to-broker produce forwarding. Liveness is the ad
  * file's mtime against its recorded TTL; lookups are cached; garbage
  * files are skipped, never fatal.
  */
class MemberDirectorySpec extends AnyFunSuite {

  private def writeAd(root: String, name: String, content: String,
      ageMs: Long = 0L): java.io.File = {
    val dir = new java.io.File(s"$root/_meta/_serve")
    dir.mkdirs()
    val f = new java.io.File(dir, name)
    Files.write(f.toPath, content.getBytes("UTF-8"))
    if (ageMs > 0L) { f.setLastModified(System.currentTimeMillis() - ageMs); () }
    f
  }

  test("partition and consumer lookups resolve live members; mode=root owns everything") {
    val root = Files.createTempDirectory("graft-memdir").toString
    writeAd(root, "member-aa",
      "base=http://hosta:9251\nbinaryPort=9252\nmode=parts\nparts=0-5\nttl=60000")
    writeAd(root, "member-bb",
      "base=http://hostb:9261\nbinaryPort=9262\nmode=parts\nparts=6-11\nttl=60000")
    writeAd(root, "member-cc",
      "base=http://hostc:9271\nbinaryPort=0\nmode=consumer\nttl=60000")
    val d = new MemberDirectory(root, new Configuration(), cacheMs = 0L)
    assert(d.ownerOf(3).map(_.base).contains("http://hosta:9251"))
    assert(d.ownerOf(9).map(_.base).contains("http://hostb:9261"))
    assert(d.ownerOf(12).isEmpty, "no member owns partition 12")
    assert(d.consumerMember.map(_.base).contains("http://hostc:9271"))
    // a consumer member never serves produce lookups
    assert(!d.ownerOf(3).exists(_.mode == "consumer"))
    // a root-mode member owns every partition and the consumer flow
    val root2 = Files.createTempDirectory("graft-memdir").toString
    writeAd(root2, "member-rr", "base=http://r:9281\nbinaryPort=9282\nmode=root\nttl=60000")
    val d2 = new MemberDirectory(root2, new Configuration(), cacheMs = 0L)
    assert(d2.ownerOf(11).map(_.base).contains("http://r:9281"))
    assert(d2.consumerMember.map(_.base).contains("http://r:9281"))
  }

  test("stale advertisements (mtime past the recorded TTL) are ignored; garbage files are skipped") {
    val root = Files.createTempDirectory("graft-memdir").toString
    writeAd(root, "member-dead",
      "base=http://dead:9251\nbinaryPort=0\nmode=parts\nparts=0-5\nttl=60000",
      ageMs = 3600 * 1000L)
    writeAd(root, "member-junk", "not an advertisement at all")
    val d = new MemberDirectory(root, new Configuration(), cacheMs = 0L)
    assert(d.ownerOf(2).isEmpty, "a stale ad must not receive forwards")
    // a fresh replacement over the same claim wins
    writeAd(root, "member-live",
      "base=http://live:9261\nbinaryPort=0\nmode=parts\nparts=0-5\nttl=60000")
    assert(d.ownerOf(2).map(_.base).contains("http://live:9261"))
  }

  test("advertise() publishes a parseable ad that lookups resolve") {
    val root = Files.createTempDirectory("graft-memdir").toString
    MemberDirectory.advertise(root, new Configuration(),
      base = "http://me:9251", binaryPort = 9252, mode = "parts",
      parts = Some(graft.engine.TopicStore.parsePartitionSpec("0-3_8")))
    val d = new MemberDirectory(root, new Configuration(), cacheMs = 0L)
    assert(d.ownerOf(8).map(_.base).contains("http://me:9251"))
    assert(d.ownerOf(8).map(_.binaryPort).contains(9252))
    assert(d.ownerOf(4).isEmpty)
  }

  test("one advertisement per root per process: a second advertise throws") {
    val root = Files.createTempDirectory("graft-memdir").toString
    MemberDirectory.advertise(root, new Configuration(),
      base = "http://one:9251", binaryPort = 0, mode = "root", parts = None)
    val e = intercept[IllegalArgumentException] {
      MemberDirectory.advertise(root, new Configuration(),
        base = "http://two:9261", binaryPort = 0, mode = "root", parts = None)
    }
    assert(e.getMessage.contains("already advertises"))
  }

  test("ownerOf(excluding) skips a just-failed member: the forward's one-retry failover pick") {
    val root = Files.createTempDirectory("graft-memdir").toString
    writeAd(root, "member-old",
      "base=http://older:9251\nbinaryPort=0\nmode=parts\nparts=0-5\nttl=60000",
      ageMs = 5000L)
    writeAd(root, "member-new",
      "base=http://fresher:9261\nbinaryPort=0\nmode=parts\nparts=0-5\nttl=60000")
    val d = new MemberDirectory(root, new Configuration(), cacheMs = 0L)
    assert(d.ownerOf(2).map(_.base).contains("http://fresher:9261"),
      "ties break to the freshest ad")
    assert(d.ownerOf(2, excluding = Set("http://fresher:9261")).map(_.base)
      .contains("http://older:9251"),
      "the failover retry must skip the failed member even though its ad reads live")
    assert(d.ownerOf(2,
      excluding = Set("http://fresher:9261", "http://older:9251")).isEmpty)
  }

  test("ad liveness survives an FS without setTimes: the refresh rewrites the ad file") {
    val conf = new Configuration()
    conf.set("fs.mockst.impl", classOf[SetTimesLessFs].getName)
    conf.setBoolean("fs.mockst.impl.disable.cache", true)
    val local = Files.createTempDirectory("graft-memdir").toString
    val root = s"mockst://$local"
    val before = MemberDirectory.adRefreshRewrites.get
    MemberDirectory.advertise(root, conf,
      base = "http://objstore:9251", binaryPort = 0, mode = "parts",
      parts = Some(graft.engine.TopicStore.parsePartitionSpec("0-5")),
      ttlMs = 400L)
    // sleep past several TTLs: with setTimes throwing, only the rewrite
    // fallback can keep the ad's mtime fresh
    Thread.sleep(1200L)
    val d = new MemberDirectory(root, conf, cacheMs = 0L)
    assert(d.ownerOf(2).map(_.base).contains("http://objstore:9251"),
      "the ad must stay live past its TTL via the rewrite fallback")
    assert(MemberDirectory.adRefreshRewrites.get > before,
      "the refresh must have taken the rewrite path")
  }

  test("a failed first advertise rolls back the one-ad-per-process guard so a retry can land") {
    val conf = new Configuration()
    conf.set("fs.mockfc.impl", classOf[FailNextCreateFs].getName)
    conf.setBoolean("fs.mockfc.impl.disable.cache", true)
    val local = Files.createTempDirectory("graft-memdir").toString
    val root = s"mockfc://$local"
    FailNextCreateFs.failNext.set(true)
    intercept[java.io.IOException] {
      MemberDirectory.advertise(root, conf,
        base = "http://one:9251", binaryPort = 0, mode = "root", parts = None)
    }
    // the transient startup failure must not poison the guard forever
    MemberDirectory.advertise(root, conf,
      base = "http://one:9251", binaryPort = 0, mode = "root", parts = None)
    val d = new MemberDirectory(root, conf, cacheMs = 0L)
    assert(d.ownerOf(3).map(_.base).contains("http://one:9251"),
      "the retried advertise must publish a resolvable ad")
  }
}
