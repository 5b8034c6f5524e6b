package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.MemberDirectory

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
}
