package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the plan-audit artifact: EXPLAINS.md must carry one
  * heading per registered query — exactly the `SparkEntry.queries`
  * surface, no more, no less — so the document backing the repo's scale
  * claims can never silently go stale when queries are added or
  * renamed. Pure file check, no Spark session. */
class ExplainsDriftSpec extends AnyFunSuite {

  test("EXPLAINS.md headings == SparkEntry.queries keys") {
    val src = scala.io.Source.fromFile("EXPLAINS.md", "UTF-8")
    val headings =
      try src.getLines().collect {
        case l if l.startsWith("## ") => l.stripPrefix("## ").trim
      }.toSet
      finally src.close()
    val queries = SparkEntry.queries.keySet
    val missing = (queries -- headings).toSeq.sorted
    val stale = (headings -- queries).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"EXPLAINS.md drifted from the query surface — missing: $missing, " +
        s"stale: $stale. Regenerate: sbt \"runMain graft.Explain\"")
  }
}
