package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself — a malformed registry would zero
  * the round's correctness gate regardless of engine quality. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query; names are unique and shell-safe") {
    val qNames = SparkEntry.defs.map(_.name)
    assert(qNames.distinct.size == qNames.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(qNames.forall(_.matches("[a-z0-9_]+")), "names must be [a-z0-9_]+")
  }

  test("oracle SQL references only corpus tables or is self-contained") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      val usesFrom = "from\\s+([a-z_]+)".r.findAllMatchIn(lower)
        .map(_.group(1)).toSet
        .filterNot(t => t.startsWith("(") || t == "values")
      val known = usesFrom.filter(tables.contains)
      val selfContained = lower.contains("values")
      assert(known.nonEmpty || selfContained,
        s"$name oracle references neither corpus tables nor VALUES: $usesFrom")
    }
  }

  test("registry size matches the declared coverage; every query is oracled") {
    // the count itself lives beside the registry (SparkEntry.DeclaredCoverage,
    // enforced by a require at object init) so it cannot drift silently; this
    // spec re-states it and additionally pins the all-oracled invariant
    assert(SparkEntry.queries.size == SparkEntry.DeclaredCoverage,
      s"got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == SparkEntry.queries.size,
      "every registered query must carry a DuckDB oracle — " +
        s"${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet} have none")
  }
}
