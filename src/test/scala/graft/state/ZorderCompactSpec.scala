package graft.state

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ZorderCompactSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits; zCell is its coarse prefix") {
    val df = Seq((5L, 3L)).toDF("x", "y") // 101, 011 → interleave
    val z = df.select(Layout.zValue(col("x"), col("y"), 3)).head().getLong(0)
    // x bits at even positions: 1,0,1 → 1 + 16 ; y at odd: 1,1,0 → 2 + 8
    assert(z === (1L | 16L | 2L | 8L))
    assert(z === Layout.zValueLocal(5L, 3L, 3))
    val c = df.select(Layout.zCell(col("x"), col("y"), 3, 1))
      .head().getLong(0)
    assert(c === Layout.zValueLocal(5L >> 2, 3L >> 2, 1))
  }

  test("z-ordered layout: a filter on EITHER dimension prunes partitions") {
    // 16×16 grid (bits=4), coarse cells p=2 → 16 partitions of a
    // 4×4 cell grid; 2 rows per grid point
    val df = spark.range(0, 512).select(
      (col("id") % 16).as("x"), (expr("id div 16") % 16).as("y"),
      col("id").as("payload"))
    val dir = Files.createTempDirectory("graft-zorder").toString
    Layout.writeZOrdered(df, dir, col("x"), col("y"), bits = 4, p = 2)
    val table = spark.read.parquet(dir)
    assert(table.select("z_cell").distinct().count() === 16)

    def partsRead(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numPartitions").value
    }

    // x ∈ [0,3] (one cell column) — and NO y constraint
    val cellsX = Layout.zCellsFor(0, 3, 0, 15, bits = 4, p = 2)
    assert(cellsX.size === 4)
    val qx = table.filter(col("z_cell").isin(cellsX: _*) &&
      col("x") >= 0 && col("x") <= 3)
    assert(partsRead(qx) === 4) // 4 of 16 partitions
    assert(qx.count() ===
      df.filter(col("x") >= 0 && col("x") <= 3).count())

    // y ∈ [8,11] — the dimension a single-key sort could NOT prune
    val cellsY = Layout.zCellsFor(0, 15, 8, 11, bits = 4, p = 2)
    assert(cellsY.size === 4)
    val qy = table.filter(col("z_cell").isin(cellsY: _*) &&
      col("y") >= 8 && col("y") <= 11)
    assert(partsRead(qy) === 4)
    assert(qy.count() ===
      df.filter(col("y") >= 8 && col("y") <= 11).count())

    // both dims → a single cell
    val cellsXY = Layout.zCellsFor(4, 7, 4, 7, bits = 4, p = 2)
    assert(cellsXY.size === 1)
    val qxy = table.filter(col("z_cell").isin(cellsXY: _*) &&
      col("x").between(4, 7) && col("y").between(4, 7))
    assert(partsRead(qxy) === 1)
    assert(qxy.count() === 32)
  }

  test("compact: per-dir bin-pack shrinks files, preserves content + partitions") {
    val dir = Files.createTempDirectory("graft-compact").toString
    // 8 writer tasks per partition → many small files
    val df = spark.range(0, 2000).select(
      (col("id") % 2).cast("int").as("part"), col("id").as("v"))
    df.repartition(8).write.mode("overwrite")
      .partitionBy("part").parquet(dir)
    // order-independent content fingerprint: sum of row hashes
    def fp(path: String) = spark.read.parquet(path)
      .agg(sum(xxhash64(col("v"), col("part")).cast("decimal(38,0)")),
        count(lit(1))).head()
    val fpBefore = fp(dir)

    val (before, after) = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(before === 16) // 8 files × 2 partitions
    assert(after === 2)   // 1 per partition dir
    val t = spark.read.parquet(dir)
    assert(t.select("part").distinct().count() === 2)
    assert(fp(dir) === fpBefore)

    // idempotent: already-healthy dirs untouched
    val (b2, a2) = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(b2 === 2 && a2 === 2)
  }

  test("crash recovery reaches NESTED partition dirs (two-level " +
    "layout): a level-2 .__old is restored, stale staging discarded") {
    val dir = Files.createTempDirectory("graft-compact-l2").toString
    // two-level layout: month=/bucket=
    val df = spark.range(0, 200).select(
      lit("2024-05").as("month"), (col("id") % 2).cast("int").as("bucket"),
      col("id").as("v"))
    df.repartition(4).write.mode("overwrite")
      .partitionBy("month", "bucket").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two swap renames: the partition
    // dir is gone, its data sits in the hidden .__old sibling
    val part = new org.apache.hadoop.fs.Path(
      s"$dir/month=2024-05/bucket=1")
    val bak = new org.apache.hadoop.fs.Path(
      s"$dir/month=2024-05/.bucket=1__old")
    assert(fs.rename(part, bak))
    // plus a stale staging dir that must be discarded, not compacted
    val stale = new org.apache.hadoop.fs.Path(
      s"$dir/month=2024-05/.bucket=0__compact")
    fs.mkdirs(stale)
    val (before, _) = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(fs.exists(part) && !fs.exists(bak) && !fs.exists(stale))
    // all 200 rows visible again
    assert(spark.read.parquet(dir).count() === 200)
    // the recovered partition's files were counted as data
    assert(before >= 4)
  }
}
