package graft

import org.apache.spark.sql.functions._

import graft.functions.AhoCorasick

/** The multi-pattern matcher behind q_decontaminate_exact must agree
  * exactly with the per-snippet `instr` cross join it replaced. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  test("classic overlapping patterns: all and only the contained ids") {
    val ac = AhoCorasick(Seq((1L, "he"), (2L, "she"), (3L, "his"), (4L, "hers")))
    assert(ac.matchedIds("ushers").toSet === Set(1L, 2L, 4L))
    assert(ac.matchedIds("this").toSet === Set(3L))
    assert(ac.matchedIds("xyz").isEmpty)
    assert(ac.matchedIds("").isEmpty)
    assert(ac.matchedIds(null).isEmpty)
  }

  test("duplicate patterns carry every id; repeats count once") {
    val ac = AhoCorasick(Seq((10L, "abc"), (20L, "abc"), (30L, "bcd")))
    assert(ac.matchedIds("xxabcdxx").sorted === Seq(10L, 20L, 30L))
    // the same pattern occurring twice still reports each id once
    assert(ac.matchedIds("abc abc").sorted === Seq(10L, 20L))
  }

  test("chars outside the pattern alphabet reset cleanly") {
    val ac = AhoCorasick(Seq((1L, "ab")))
    assert(ac.matchedIds("a€ab").toSet === Set(1L)) // euro sign mid-text
    assert(ac.matchedIds("a€b").isEmpty)
  }

  test("empty patterns are rejected loudly") {
    intercept[IllegalArgumentException](AhoCorasick(Seq((1L, ""))))
  }

  test("matches exactly the per-snippet instr cross join on real docs") {
    val docs = Tables(spark, sf001, "documents")
    val ev = docs.filter($"doc_id" % 20 === 0 && $"doc_id" < 5000
        && length($"text") >= 24)
      .select($"doc_id".as("eid"), substring($"text", 1, 24).as("snip"))
    val brute = docs.filter($"doc_id" % 20 =!= 0)
      .select($"doc_id", $"text")
      .crossJoin(broadcast(ev))
      .filter(instr($"text", $"snip") > 0)
      .select($"doc_id", $"eid").as[(Long, Long)].collect().toSet
    val snips = ev.as[(Long, String)].collect().toSeq
    val ac = spark.sparkContext.broadcast(AhoCorasick(snips))
    val hitIds = udf((text: String) => ac.value.matchedIds(text))
    val mine = docs.filter($"doc_id" % 20 =!= 0)
      .select($"doc_id", explode(hitIds($"text")).as("eid"))
      .as[(Long, Long)].collect().toSet
    assert(mine === brute)
    assert(brute.nonEmpty) // the check must actually exercise hits
  }
}
