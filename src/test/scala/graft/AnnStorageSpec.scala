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

  test("fitted-cell layout (trained quantizer) prunes unprobed cells at the scan") {
    // the q_knn_ivf_fitted layout: corpus partitioned by the TRAINED
    // Lloyd assignment (KMeans.fit from the label init, 3 rounds — same
    // as the query), not the raw label slices; probing a fitted-cell
    // list must prune the same way the label layout does
    import graft.functions.{KMeans, VectorFunctions}
    val e = Tables(spark, sf001, "embeddings")
      .repartition(8, col("vec_id"))
      .select(col("vec_id"), col("label"), VectorFunctions.quantize("embedding").as("q"))
    val fit = KMeans.fit(e, maxIter = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_fitted").toString + "/embeddings"
    e.join(fit.assignments.select(col("vec_id"), col("cl").as("cell")), "vec_id")
      .select(col("vec_id"), col("cell"), col("q"))
      .write.partitionBy("cell").parquet(dir)
    // a probe list over the trained cells — the 2 most populous (any 2
    // distinct fitted cells exercise the identical pruning contract)
    val probed = fit.assignments.groupBy(col("cl")).count()
      .orderBy(col("count").desc, col("cl").asc).limit(2)
      .collect().map(_.get(0)).toSeq
    val nCells = fit.assignments.select(col("cl")).distinct().count()
    assert(nCells > probed.length, "need unprobed cells for pruning to be observable")
    val df = spark.read.parquet(dir).filter(col("cell").isin(probed: _*))
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(scans.head.selectedPartitions.partitionCount == probed.length,
      s"expected ${probed.length} selected partitions, got " +
        s"${scans.head.selectedPartitions.partitionCount}")
    // values: the probed subset equals filtering the fitted assignment
    val want = fit.assignments.filter(col("cl").isin(probed: _*)).count()
    assert(df.count() == want)
  }
}
