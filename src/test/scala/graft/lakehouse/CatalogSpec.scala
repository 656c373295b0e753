package graft.lakehouse

import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  test("cleanString strips non-alphanumerics") {
    assert(Catalog.cleanString("a b-c.d_e!") == "abcd_e")
  }

  test("escapeName: quoting rules + idempotence") {
    assert(Catalog.escapeName("plain") == "plain")
    assert(Catalog.escapeName("has space") == "`has space`")
    assert(Catalog.escapeName("has-dash") == "`has-dash`")
    assert(Catalog.escapeName("db.has space") == "db.`has space`")
    assert(Catalog.escapeName("`already`") == "`already`")
    Seq("plain", "has space", "a-b", "x.y z", "`q`", "a.b-c.d e").foreach { n =>
      assert(Catalog.escapeName(Catalog.escapeName(n)) == Catalog.escapeName(n), n)
    }
  }

  test("getTempTableName: prefix handling, numeric guard, uniqueness") {
    val fixed = () => "deadbeef"
    assert(Catalog.getTempTableName("tbl", fixed) == "tbl_deadbeef")
    assert(Catalog.getTempTableName("tbl___", fixed) == "tbl_deadbeef")
    assert(Catalog.getTempTableName(null, fixed) == "tmp_deadbeef")
    assert(Catalog.getTempTableName("___", fixed) == "tmp_deadbeef")
    assert(Catalog.getTempTableName("9tbl", fixed) == "_9tbl_deadbeef")
    assert(Catalog.getTempTableName("a b!c", fixed) == "abc_deadbeef")
    assert(Catalog.getTempTableName("t") != Catalog.getTempTableName("t"))
  }

  test("firstCharIsNumeric") {
    assert(Catalog.firstCharIsNumeric("9a"))
    assert(!Catalog.firstCharIsNumeric("a9"))
    assert(!Catalog.firstCharIsNumeric(""))
    assert(!Catalog.firstCharIsNumeric(null))
  }

  test("workspace/lakehouse registry + paths") {
    val dir = java.nio.file.Files.createTempDirectory("lh_test").toString
    val ws = Catalog.registerLocalWorkspace(dir, "wsA", "lakeA")
    val lh = ws.lakehouses.head
    assert(Catalog.getWorkspace(Some("wsA")).head.name == "wsA")
    assert(Catalog.getLakehouseId("lakeA", Some("wsA")) == lh.lakehouseId)
    assert(Catalog.tablePath(lh, "t1").endsWith("lakeA/Tables/t1"))
    assert(Catalog.viewPath(lh, "v1").endsWith("lakeA/Views/v1"))
    assert(Catalog.mountItUp(lh, "m") == lh)
    assert(Catalog.getTables(lh).isEmpty)
    intercept[IllegalArgumentException](Catalog.getWorkspace(Some("nope")))
  }
}
