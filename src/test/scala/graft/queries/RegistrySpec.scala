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

  test("bench set excludes exactly the quadratic verifiers") {
    assert(Registry.queries.keySet -- Registry.benchQueries.keySet ===
      Registry.quadraticVerifiers)
  }

  test("quadratic verifiers name real queries") {
    assert(Registry.quadraticVerifiers.subsetOf(Registry.queries.keySet))
  }
}
