package graft.lakehouse

class RelationshipsSpec extends SparkSuite {
  import spark.implicits._

  lazy val star: Seq[(String, org.apache.spark.sql.DataFrame)] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .map(n => n -> spark.read.parquet(s"$sf0001/$n.parquet"))

  test("star schema m:1 edges == known FK graph") {
    val rels = Relationships.findRelationships(star, includeManyToMany = false)
    val edges = rels.map(r => (r.fromTable, r.fromColumn, r.toTable, r.toColumn)).toSet
    val expected = Set(
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"))
    assert(edges == expected, s"got: $edges")
    assert(rels.forall(_.coverage == 1.0))
    assert(rels.forall(_.multiplicity == "m:1"))
  }

  test("coverage threshold filters partial overlaps") {
    val from = Seq(1, 2, 3, 4).toDF("key_id")
    val to = Seq(1, 2, 3).toDF("key_id")
    val full = Relationships.findRelationships(
      Seq("a" -> from, "b" -> to), coverageThreshold = 1.0)
    assert(!full.exists(r => r.fromTable == "a" && r.toTable == "b"))
    val loose = Relationships.findRelationships(
      Seq("a" -> from, "b" -> to), coverageThreshold = 0.7)
    val ab = loose.find(r => r.fromTable == "a" && r.toTable == "b")
    assert(ab.exists(r => math.abs(r.coverage - 0.75) < 1e-12 && r.multiplicity == "m:1"))
    // b -> a is fully covered
    assert(full.exists(r => r.fromTable == "b" && r.toTable == "a"))
  }

  test("bigint keys above 2^53 stay exact (no double collapse)") {
    val big = 9007199254740992L // 2^53; big and big+1 collide as doubles
    val from = Seq(big, big + 1).toDF("key_id")
    val to = Seq(big).toDF("key_id")
    // only 1 of from's 2 distinct keys is covered: full-coverage discovery
    // must NOT propose a->b (a lossy double canonicalization would see one
    // collapsed key and report coverage 1.0)
    val full = Relationships.findRelationships(
      Seq("a" -> from, "b" -> to), coverageThreshold = 1.0)
    assert(!full.exists(r => r.fromTable == "a" && r.toTable == "b"), full)
    val half = Relationships.findRelationships(
      Seq("a" -> from, "b" -> to), coverageThreshold = 0.5)
    assert(half.exists(r => r.fromTable == "a" && r.toTable == "b" &&
      r.coverage == 0.5), half)
    // and 'a' is genuinely unique -> m:1 (lossy distinct would say m:m)
    assert(half.exists(r => r.fromTable == "b" && r.toTable == "a" &&
      r.multiplicity == "m:1" && r.coverage == 1.0), half)
  }

  test("name similarity threshold gates candidates") {
    val a = Seq(1).toDF("completely_different")
    val b = Seq(1).toDF("nothing_alike")
    assert(Relationships.findRelationships(Seq("a" -> a, "b" -> b)).isEmpty)
  }

  test("m:m emitted only when includeManyToMany") {
    val a = Seq(1, 2).toDF("gkey")
    val b = Seq(1, 1, 2).toDF("gkey")
    val withMM = Relationships.findRelationships(Seq("a" -> a, "b" -> b))
    assert(withMM.exists(r => r.fromTable == "a" && r.multiplicity == "m:m"))
    val without = Relationships.findRelationships(
      Seq("a" -> a, "b" -> b), includeManyToMany = false)
    assert(!without.exists(r => r.fromTable == "a" && r.toTable == "b"))
  }

  test("toDot emits parseable digraph text") {
    val rels = Seq(Relationships.Relationship("a", "x", "b", "y", "m:1", 1.0))
    val dot = Relationships.toDot(rels, "test")
    assert(dot.startsWith("digraph"))
    assert(dot.contains("\"a\" -> \"b\""))
    assert(dot.contains("m:1"))
  }
}
