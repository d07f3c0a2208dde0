package graft

import graft.engine.{Layout, Scratch}
import org.apache.spark.sql.functions._

/** Z-order layout must (a) interleave bits correctly and (b) actually earn
  * its keep: for a selective predicate on the NON-leading dimension, a
  * min/max file index over the Z-ordered layout must touch far fewer files
  * than the same index over a linear single-column sort. The overlap count
  * below is exactly what parquet row-group stats / a Delta-Iceberg manifest
  * would prune on. */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton key interleaves x into even bits, y into odd bits") {
    val df = Seq((3L, 0L), (0L, 3L), (5L, 6L), (0L, 0L)).toDF("x", "y")
    val keys = df.select(Layout.mortonKey(col("x"), col("y"), 8))
      .as[Long].collect().toSeq
    // x=0b11,y=0 → 0b0101; x=0,y=0b11 → 0b1010
    // x=0b101,y=0b110: evens 1,0,1 at bits 0,2,4; odds 0,1,1 at bits 1,3,5
    //   → 1 + 0 + 16 + 0 + 8 + 32 = 57
    assert(keys === Seq(5L, 10L, 57L, 0L))
  }

  test("incremental manifest update equals a full rebuild after add/rewrite/remove") {
    val base = Scratch.dir(spark, "manifest_incr")
    def write(name: String, lo: Long, hi: Long): String = {
      val p = s"$base/$name"
      (lo to hi).map(v => (v, v * 2)).toDF("x", "y").coalesce(1).write.mode("overwrite").parquet(p)
      // the single data file's absolute path, as input_file_name reports it
      spark.read.parquet(p).select(input_file_name()).distinct().as[String].head()
    }
    val f1 = write("f1", 0L, 9L)
    val f2 = write("f2", 10L, 19L)
    // a real manifest is PERSISTED state — materialize it before the commit
    // mutates the files underneath (a lazy plan would re-read them)
    val m0 = Layout.statsManifest(spark, s"$base/f{1,2}", Seq("x", "y"))
      .localCheckpoint(true)
    // commit: f2 rewritten (shifted range), f3 added, f1 removed
    val f2b = write("f2", 100L, 109L)
    val f3 = write("f3", 20L, 29L)
    val incr = Layout.updateManifest(spark, m0, Seq("x", "y"),
      changed = Seq(f2b, f3), removed = Seq(f1, f2))
    val full = Layout.statsManifest(spark, s"$base/f{2,3}", Seq("x", "y"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("file").collect().map(_.toSeq).toSeq
    assert(rows(incr) === rows(full))
    // and the updated manifest still drives pruning correctly
    val pruned = Layout.readPruned(spark, incr, "x", 100L, 105L)
      .select("x").as[Long].collect().sorted
    assert(pruned.toSeq === (100L to 105L))
    // a rewritten file staled by ITS OWN recomputed spelling never
    // duplicates, and a mismatched `removed` spelling raises instead of
    // silently removing nothing
    assert(Layout.updateManifest(spark, incr, Seq("x", "y"), changed = Seq(f3))
      .groupBy("file").count().filter(col("count") > 1).count() === 0L)
    val ex = intercept[IllegalArgumentException] {
      Layout.updateManifest(spark, incr, Seq("x", "y"),
        changed = Nil, removed = Seq("/not/in/manifest.parquet"))
    }
    assert(ex.getMessage.contains("not found in the manifest"))
  }

  test("compaction sizes partitioned (subdirectory) inputs correctly") {
    val base = Scratch.dir(spark, "compaction_part")
    val in = s"$base/in"
    val out = s"$base/out"
    (0L until 1000L).map(v => (v, s"d${v % 3}")).toDF("x", "dt")
      .repartition(8).write.partitionBy("dt").mode("overwrite").parquet(in)
    // a non-recursive listing would see only dt= directories → 0 bytes →
    // one output file regardless of target; tiny target must yield several
    Layout.compact(spark, in, out, targetFileBytes = 4096)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(n > 1, s"expected multiple output files from a partitioned input, got $n")
    assert(spark.read.parquet(out).count() === 1000L)
  }

  test("compaction hits the target file count and preserves rows + clustering") {
    val base = Scratch.dir(spark, "compaction")
    val in = s"$base/in"
    val out = s"$base/out"
    // 32 tiny files
    (0L until 3200L).map(v => (v, v % 7)).toDF("x", "m")
      .repartition(32).write.mode("overwrite").parquet(in)
    def dataFiles(p: String): Seq[String] = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).toSeq
    }
    val inFiles = dataFiles(in)
    assert(inFiles.size === 32)
    val totalBytes = {
      val fs = new org.apache.hadoop.fs.Path(in)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      inFiles.map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    }
    Layout.compact(spark, in, out, targetFileBytes = totalBytes / 4 + 1, sortCol = Some("x"))
    val outFiles = dataFiles(out)
    assert(outFiles.size <= 4 && outFiles.nonEmpty, s"got ${outFiles.size} files")
    // same rows
    assert(spark.read.parquet(out).count() === 3200L)
    // clustering preserved: per-file x-ranges are disjoint (range partitioning)
    val ranges = Layout.statsManifest(spark, out, Seq("x"))
      .select("x_min", "x_max").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file ranges overlap")
      case _ => ()
    }
  }

  test("schema evolution: mergeSchema unions old and new file schemas, null-filling old rows") {
    // The schema-drift case every long-lived table hits: a crawl adds a
    // column mid-stream. Old files must stay readable (new column NULL),
    // new files must not be truncated to the old schema.
    val base = Scratch.dir(spark, "schema_evo")
    Seq((1L, "a")).toDF("id", "text").write.mode("overwrite").parquet(s"$base/p1")
    Seq((2L, "b", "en")).toDF("id", "text", "lang").write.mode("overwrite").parquet(s"$base/p2")
    val df = spark.read.option("mergeSchema", "true").parquet(s"$base/p1", s"$base/p2")
    assert(df.columns.sorted.toSeq === Seq("id", "lang", "text"))
    val rows = df.select("id", "text", "lang").as[(Long, String, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "b", Some("en"))))
  }

  test("morton key raises on out-of-domain inputs instead of silently aliasing") {
    // 2^bits would alias onto key 0's neighborhood; negatives would
    // interleave sign bits — both must fail loudly, not degrade clustering
    def key(x: Long, y: Long, bits: Int): Long =
      Seq((x, y)).toDF("x", "y")
        .select(Layout.mortonKey(col("x"), col("y"), bits)).as[Long].head()
    assert(key(255L, 255L, 8) === 65535L) // top of the domain is fine
    val tooBig = intercept[Exception] { key(256L, 0L, 8) }
    assert(tooBig.getMessage.contains("mortonKey"))
    val negative = intercept[Exception] { key(0L, -1L, 8) }
    assert(negative.getMessage.contains("mortonKey"))
  }

  test("pruned-path handoff is bounded by the predicate, not the manifest") {
    // 40 one-file writes → a 40-row manifest. A range covering 2 files must
    // collect exactly those 2 paths — the driver-side handoff scales with
    // what the PREDICATE touches, never with table/manifest size (the
    // million-file posture: readPruned's only collect is this one).
    val base = Scratch.dir(spark, "prune_bound")
    (0 until 40).foreach { i =>
      Seq((i.toLong * 10, i.toLong)).toDF("x", "y")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/f$i")
    }
    val manifest = Layout.statsManifest(spark, s"$base/f*", Seq("x"))
      .localCheckpoint(true)
    assert(manifest.count() === 40L)
    val hit = Layout.prunedFiles(manifest, "x", 100L, 115L)
    assert(hit.length === 2, s"expected the 2 intersecting files, got ${hit.length}")
    val rows = Layout.readPruned(spark, manifest, "x", 100L, 115L)
      .select("x").as[Long].collect().sorted
    assert(rows.toSeq === Seq(100L, 110L))
  }

  test("z-order clusters both dimensions: y-predicate touches fewer files than an x-sort") {
    // 64×64 grid, one row per cell — every (x, y) equally likely.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val files = 16
    val zPath = Scratch.dir(spark, "zorder")
    val linPath = Scratch.dir(spark, "linear")
    Layout.writeZOrdered(grid, zPath, "x", "y", files, bits = 6)
    grid.repartitionByRange(files, col("x")) // the linear baseline: sort by x
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)

    // The file-skipping measurement: how many files' [min(y), max(y)] range
    // intersects a selective y-band? (= files a stats index must read)
    def overlapping(path: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("y")).as("mn"), max(col("y")).as("mx"))
        .filter(col("mx") >= lo && col("mn") <= hi)
        .count()

    val zTouched = overlapping(zPath, 8, 15)   // one 8-row band of 64
    val linTouched = overlapping(linPath, 8, 15)
    // linear x-sort spreads every y value across ALL files; z-order confines
    // the band to the files owning those quadrants
    assert(linTouched === files.toLong)
    assert(zTouched * 2 <= linTouched,
      s"z-order should touch at most half the files (z=$zTouched, linear=$linTouched)")
    // and the layout loses no rows
    assert(spark.read.parquet(zPath).count() === 64L * 64L)

    // manifest-pruned read: same rows as full scan + filter, reading only
    // the overlapping files the measurement above counted
    val manifest = Layout.statsManifest(spark, zPath, Seq("x", "y"))
    assert(manifest.count() === files.toLong)
    val pruned = Layout.readPruned(spark, manifest, "y", 8, 15)
    assert(pruned.count() === 64L * 8L)
    assert(pruned.agg(min(col("y")), max(col("y"))).as[(Long, Long)].head() === ((8L, 15L)))
    // an out-of-domain band prunes every file but keeps the schema
    assert(Layout.readPruned(spark, manifest, "y", 1000, 2000).count() === 0L)
  }
}
