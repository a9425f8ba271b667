package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants the driver contract depends on. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length === names.length)
  }

  test("every oracle key has a matching query") {
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("bench set excludes exactly the declared exclusions") {
    assert(Registry.queries.keySet -- Registry.benchQueries.keySet ===
      Registry.benchExcluded)
  }

  test("excluded names reference real queries") {
    assert(Registry.benchExcluded.subsetOf(Registry.queries.keySet))
  }
}
