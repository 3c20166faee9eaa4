package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstrCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def coverage(rows: (Long, String)*): Map[Long, (Long, Long, Double)] =
    Dedup.substringCoverage(rows.toDF("doc_id", "text"), "text", "doc_id", n = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, nt, nd, f) => id -> (nt, nd, f) }.toMap

  test("cross-document shared span marks exactly its token interval") {
    val m = coverage(
      1L -> "a b c d e f g",       // span "a b c d e" at pos 0 covers 0..4
      2L -> "x y a b c d e z",     // same span at pos 2 covers 2..6
      3L -> "q r s t u v w")       // unique: untouched
    assert(m(1L) === ((7L, 5L, 0.714286)))
    assert(m(2L) === ((8L, 5L, 0.625)))
    assert(m(3L) === ((7L, 0L, 0.0)))
  }

  test("within-document repetition counts: a doc repeating itself is covered") {
    // p..u repeated: spans at 0 and 6 (and 1/7) duplicate within the doc,
    // and their intervals union to all 12 positions
    val m = coverage(1L -> "p q r s t u p q r s t u")
    assert(m(1L) === ((12L, 12L, 1.0)))
  }

  test("short docs participate via their whole-string shingle") {
    val m = coverage(
      1L -> "hi there",            // exact dup of doc 2 -> full coverage
      2L -> "hi there",
      3L -> "only one")            // unique short doc -> untouched
    assert(m(1L) === ((2L, 2L, 1.0)))
    assert(m(2L) === ((2L, 2L, 1.0)))
    assert(m(3L) === ((2L, 0L, 0.0)))
  }

  test("empty docs report (0, 0, 0.0) and never pair with each other") {
    val m = coverage(1L -> "", 2L -> "", 3L -> "a b c d e f")
    assert(m(1L) === ((0L, 0L, 0.0)))
    assert(m(2L) === ((0L, 0L, 0.0)))
    assert(m(3L) === ((6L, 0L, 0.0)))
  }

  test("overlapping duplicated spans union, not double-count") {
    // docs 1 and 2 share the 6-token run "a b c d e f": spans at pos 0 and
    // pos 1 both duplicate; union covers 6 positions (not 10)
    val m = coverage(
      1L -> "a b c d e f x y z w",
      2L -> "a b c d e f q r s t")
    assert(m(1L) === ((10L, 6L, 0.6)))
    assert(m(2L) === ((10L, 6L, 0.6)))
  }
}
