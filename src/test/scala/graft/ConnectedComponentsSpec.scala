package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.functions.ConnectedComponents

/** [[graft.functions.ConnectedComponents]] vs a driver-side BFS reference:
  * same components, min labels, on graphs engineered to stress the
  * contraction loop (cross-partition chains, multiple rounds via tiny
  * maxEdgesPerTask, duplicate and self-referential edges). */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference labels: BFS from every node, label = component min. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val label = mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!label.contains(start)) {
        val comp = mutable.Set(start)
        val q = mutable.Queue(start)
        while (q.nonEmpty) {
          val u = q.dequeue()
          adj(u).foreach(v => if (comp.add(v)) q.enqueue(v))
        }
        val m = comp.min
        comp.foreach(n => label(n) = m)
      }
    }
    label.toMap
  }

  private def run(edges: Seq[(Long, Long)], maxEdgesPerTask: Long = 4L << 20): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("a", "b").repartition(7), maxEdgesPerTask)
      .as[(Long, Long)].collect().toMap

  test("random graph with collisions matches BFS reference") {
    val edges = (1 to 400).map { i =>
      val a = (i * 2654435761L) % 97
      val b = (i * 40503L + 13) % 97
      (a, b)
    }.filter { case (a, b) => a != b }
    assert(run(edges) === reference(edges))
  }

  test("a 500-node chain spanning partitions resolves to one min label") {
    val edges = (0L until 499L).map(i => (i + 1, i)) // descending pointers
    val got = run(edges)
    assert(got.size == 500)
    assert(got.values.forall(_ == 0L), "chain must collapse to node 0")
  }

  test("multi-round contraction (tiny task budget) agrees with single-pass") {
    val edges = (1 to 300).map { i =>
      val a = (i * 7919L) % 120
      val b = (i * 104729L + 7) % 120
      (a, b)
    }.filter { case (a, b) => a != b }
    val multi = run(edges, maxEdgesPerTask = 16) // forces many tasks + rounds
    assert(multi === reference(edges))
    assert(multi === run(edges)) // and agrees with the one-task path
  }

  test("duplicate and self-loop edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L))
    val got = run(edges)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 3L)
    assert(got(4L) == 4L && got(5L) == 4L)
  }

  test("empty edge list yields an empty, well-typed label frame") {
    val empty = Seq.empty[(Long, Long)]
    val out = ConnectedComponents.labels(empty.toDF("a", "b"))
    assert(out.columns.toSeq == Seq("node", "lbl"))
    assert(out.count() == 0)
  }
}
