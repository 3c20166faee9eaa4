package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Bpe.BpeTable

/** Hand-pinned BPE merge-loop behavior (Sennrich et al. greedy best-rank
  * merges) + the codegen expression path. */
class BpeSpec extends SparkSpec {

  test("greedy merge order follows rank, not position") {
    val t = Bpe.fixtureTable
    // (a,t) rank 2 beats (d,a) rank 13: "data" never forms one token
    assert(Bpe.encode("data", t).toSeq === Seq("d", "at", "a"))
    assert(Bpe.encode("the", t).toSeq === Seq("the"))
    assert(Bpe.encode("value ", t).toSeq === Seq("value "))
    assert(Bpe.encode("", t).toSeq === Seq.empty)
    assert(Bpe.encode("zzz", t).toSeq === Seq("z", "z", "z")) // nothing ranked
  }

  test("overlapping occurrences merge left-to-right") {
    val t = BpeTable(Seq("a" -> "a"))
    assert(Bpe.encode("aaa", t).toSeq === Seq("aa", "a"))
    assert(Bpe.encode("aaaa", t).toSeq === Seq("aa", "aa"))
  }

  test("creation-order chains compose") {
    val t = BpeTable(Seq("a" -> "b", "ab" -> "c", "abc" -> "d"))
    assert(Bpe.encode("abcd", t).toSeq === Seq("abcd"))
    assert(Bpe.encode("abab", t).toSeq === Seq("ab", "ab"))
  }

  test("sqlValues escapes apostrophe merges (r13 review)") {
    val t = BpeTable(Seq("'" -> "s", "a" -> "'s"))
    assert(t.sqlValues === "('''','s',0), ('a','''s',1)")
  }

  test("expression path: codegen over a DataFrame column") {
    import spark.implicits._
    val got = Seq("data value", "batch").toDF("text")
      .select(concat_ws("|", Bpe.bpe_encode(col("text"), Bpe.fixtureTable)).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq(Bpe.encode("data value", Bpe.fixtureTable).mkString("|"),
      Bpe.encode("batch", Bpe.fixtureTable).mkString("|")))
  }
}
