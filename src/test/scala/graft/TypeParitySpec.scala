package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** CI-shape enforcement of the oracle physical-type parity sweep.
  *
  * Background: DuckDB types integer `sum()` as HUGEINT (int128). Python
  * fetch canonicalizes HUGEINT and BIGINT to the same value, so a
  * value-level local compare passes while the driver's type-sensitive
  * compare hash-fails the query — the divergence class that kept
  * `ev_ab_test` / `pipeline_split` red for driver rounds 6-10. The rule:
  * every integer aggregate in oracle SQL is CAST to the Spark result's
  * physical type (`CAST(sum(x) AS BIGINT)`).
  *
  * `tools/check_oracle.py --types <sfDir> <verifyOut>` runs a
  * DESCRIBE-based sweep of every oracle (planning only — no query
  * execution) and writes `TYPEPARITY.json`. This spec asserts that
  * committed artifact is (a) present, (b) clean, and (c) covers exactly
  * the CURRENT `SparkEntry.oracleSql` key set — so adding or renaming an
  * oracle without a clean re-sweep fails `sbt test` the day it is
  * written, instead of burning a driver round.
  */
class TypeParitySpec extends AnyFunSuite {

  private val artifact = new java.io.File("TYPEPARITY.json")
  private lazy val root = new ObjectMapper().readTree(artifact)

  test("TYPEPARITY.json artifact exists (regenerate: python3 tools/check_oracle.py --types <sfDir> <verifyOut>)") {
    assert(artifact.isFile,
      "TYPEPARITY.json missing at repo root — run the --types sweep and commit it")
  }

  test("type-parity sweep is clean: n_fail == 0 and every query status ok") {
    assert(artifact.isFile)
    assert(root.get("n_fail").asInt == 0,
      s"TYPEPARITY.json records ${root.get("n_fail").asInt} type-parity failures — " +
        "fix the oracle SQL (CAST integer aggregates to the Spark physical type) and re-sweep")
    val queries = root.get("queries")
    val bad = scala.collection.mutable.ListBuffer[String]()
    queries.fieldNames.forEachRemaining { name =>
      if (queries.get(name).get("status").asText != "ok") bad += name
    }
    assert(bad.isEmpty, s"non-ok queries in TYPEPARITY.json: ${bad.mkString(", ")}")
  }

  test("sweep covers exactly the current oracleSql key set (stale artifact fails)") {
    assert(artifact.isFile)
    val swept = {
      val it = root.get("queries").fieldNames
      val b = Set.newBuilder[String]
      it.forEachRemaining(b += _)
      b.result()
    }
    val current = SparkEntry.oracleSql.keySet
    val unswept = current -- swept
    val stale = swept -- current
    assert(unswept.isEmpty,
      s"oracles added since the last --types sweep (re-run it and commit): ${unswept.mkString(", ")}")
    assert(stale.isEmpty,
      s"TYPEPARITY.json lists oracles that no longer exist (re-sweep): ${stale.mkString(", ")}")
    assert(root.get("n_queries").asInt == current.size)
  }
}
