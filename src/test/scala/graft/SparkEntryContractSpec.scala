package graft

/** Guards the driver contract itself: every oracle entry must reference an
  * implemented query (a typo here silently zeroes the round's correctness
  * gate), and the flagship entry must produce rows.
  */
class SparkEntryContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("query names are unique and well-formed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001; only the known set-difference pair is empty") {
    // q06/q32 are except/anti-join shapes whose result is legitimately
    // empty at the smallest SF (the oracle agrees); q85's nation-blocked
    // fuzzy join has no within-block supplier pairs among sf0.001's 10
    // suppliers. Anything else going empty is a regression.
    val expectEmpty = Set("q06_except", "q32_anti_join", "q85_fuzzy_join")
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (_, fn) =>
      fn(spark, "/root/testdata/sf0.001").count() == 0
    }.map(_._1).toSet
    assert(empty == expectEmpty, s"unexpected empty queries: ${empty -- expectEmpty}")
  }
}
