package graft

import org.apache.spark.sql.functions._

/** Proof of the IVF storage claim in `q_knn_ivf`'s comment: with the
  * corpus laid out partitioned BY CELL, probing a cell list becomes
  * Hive partition pruning — the scan never touches unprobed cells'
  * files. This is the 100 TB contract that makes nprobe a COST knob,
  * not just a recall knob. */
class AnnStorageSpec extends SparkSpec {

  test("cell-partitioned layout prunes unprobed cells at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_lake").toString + "/embeddings"
    Tables(spark, sf001, "embeddings")
      .select(col("vec_id"), col("label").as("cell"), col("embedding"))
      .write.partitionBy("cell").parquet(dir)
    val probed = Seq(2, 5) // the cells an IVF probe list would name
    val df = spark.read.parquet(dir).filter(col("cell").isin(probed: _*))
    // 1. plan carries the partition filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter at the scan:\n$plan")
    // 2. the scan's PRUNED partition listing holds exactly the probed
    // cells (relation.location.inputFiles would show the pre-pruning
    // universe — selectedPartitions is what the scan will actually read)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, plan)
    assert(scans.head.selectedPartitions.partitionCount == probed.length,
      s"expected ${probed.length} selected partitions, got " +
        s"${scans.head.selectedPartitions.partitionCount}")
    // 3. values still correct: the probed subset equals a full-scan filter
    val full = Tables(spark, sf001, "embeddings")
      .filter(col("label").isin(probed: _*)).count()
    assert(df.count() == full)
  }
}
