package graft.tools
import graft.Graft
/** Dev aid: refresh /tmp/graft_fixtures at a given scale without running
  * every query — fixtures are scale-specific, so a OneQuery +
  * verify_local gate at sf X needs them dumped at sf X (a full Verify at
  * another scale overwrites them).
  */
object Fixtures {
  def main(args: Array[String]): Unit = {
    val s = Graft.session("fixtures")
    graft.Verify.dumpFixtures(s, args(0))
    s.stop()
  }
}
