package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deflate-compression quality signal — the Gopher/MassiveText-style
  * "compression ratio" corpus filter: highly repetitive or templated
  * documents compress far below natural prose, near-random noise barely
  * compresses at all, and both tails are what a curation pipeline
  * removes. (See the Gopher dataset analysis: repetition filters and
  * compression-based quality proxies over web text.)
  *
  * Determinism contract: `java.util.zip.Deflater` level 6, default
  * strategy, raw UTF-8 input — the same JVM zlib build maps the same
  * bytes to the same stream, so the column is reproducible within a
  * deployment. The DEFLATE byte stream is NOT specified across zlib
  * builds, which is exactly why the gated query is a rows-only check
  * plus an invariant spec (bounds, repetition ordering, determinism),
  * not a DuckDB oracle.
  *
  * Scale shape: one narrow `mapPartitions` over (id, text) — imperative
  * byte work, the one place the repo reaches for mapPartitions by
  * policy — with a per-partition reused Deflater; output is one small
  * row per document and nothing shuffles until the caller aggregates. */
object Compression {

  case class CompressStats(doc_id: Long, raw_bytes: Long, deflate_bytes: Long,
                           ratio: Double)

  def deflateStats(df: DataFrame, idCol: String, textCol: String,
                   level: Int = 6): Dataset[CompressStats] = {
    require(level >= 1 && level <= 9, s"deflate level $level outside 1..9")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(level, false)
        // a Deflater holds NATIVE zlib buffers outside the heap: without
        // an explicit end() each task leaks them until finalization,
        // which on large-heap executors lands long after the container's
        // overhead limit — release at task completion, not GC's leisure
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](16 * 1024)
        rows.map { case (id, text) =>
          val in = (if (text == null) "" else text).getBytes("UTF-8")
          if (in.isEmpty)
            // pinned semantics for the empty document: (0, 0, 0.0) — the
            // zlib header bytes of deflating "" would otherwise report an
            // empty doc as ratio ≈ 8, i.e. maximally incompressible noise
            CompressStats(id, 0L, 0L, 0.0)
          else {
            deflater.reset()
            deflater.setInput(in)
            deflater.finish()
            var n = 0L
            while (!deflater.finished()) n += deflater.deflate(buf)
            CompressStats(id, in.length.toLong, n, n.toDouble / in.length)
          }
        }
      }
  }
}
