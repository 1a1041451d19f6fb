package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Config

class ConfigSpec extends AnyFunSuite {

  // Same SHAPE as the reference config, own content.
  private val yaml =
    """fetch:
      |  nightly:
      |    example-bucket:
      |      include:
      |        - 'Snapshots/Snap_\d+\.zip$'
      |        - '_Wide\.zip$'
      |# a comment line
      |compress:
      |  pack_a:
      |    include:
      |      - '^snap'
      |    components:
      |      c_id: 1
      |      c_person:
      |        subst:
      |          middle: midl
      |          phone: area||num
      |      c_when:
      |        subst:
      |          cancelled: "'NA'"
      |components:
      |  c_id:
      |    - region_id
      |    - reg_num
      |  c_person:
      |    - first
      |    - middle
      |    - phone
      |  c_when:
      |    - registered
      |    - cancelled
      |""".stripMargin

  test("fetch groups, buckets and include regexes") {
    val spec = Config.parse(yaml)
    val inc = spec.fetch("nightly")("example-bucket").include
    assert(inc == Seq("Snapshots/Snap_\\d+\\.zip$", "_Wide\\.zip$"))
  }

  test("compressors: include patterns, component order, subst maps") {
    val spec = Config.parse(yaml)
    val c = spec.compress("pack_a")
    assert(c.include == Seq("^snap"))
    assert(c.componentOrder == Seq("c_id", "c_person", "c_when"))
    assert(c.components("c_id") == Map.empty)
    assert(c.components("c_person") == Map("middle" -> "midl", "phone" -> "area||num"))
    assert(c.components("c_when") == Map("cancelled" -> "'NA'"))
  }

  test("component column lists preserve declared order") {
    val spec = Config.parse(yaml)
    assert(spec.components("c_person") == Seq("first", "middle", "phone"))
  }
}
