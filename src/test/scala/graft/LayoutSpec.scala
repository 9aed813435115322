package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Layout

class LayoutSpec extends SparkSpec {

  test("zvalue interleaves bits (column i at bit positions j*n + i)") {
    import spark.implicits._
    val d = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (5L, 9L), (123456L, 654321L)).toDF("x", "y")
    val got = d.select(col("x"), col("y"),
      Layout.zvalue(Seq(col("x"), col("y"))).alias("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def ref(x: Long, y: Long): Long = {
      var out = 0L
      for (i <- 0 until 32) {
        out |= ((x >>> i) & 1L) << (2 * i)
        out |= ((y >>> i) & 1L) << (2 * i + 1)
      }
      out
    }
    got.foreach { case ((x, y), z) => assert(z == ref(x, y), s"z($x,$y)") }
    // adjacent cells differ in low bits: curve locality sanity
    assert(got((1L, 1L)) == 3L && got((2L, 3L)) == 14L)
  }

  test("quantileBuckets rank-normalizes skewed data to near-uniform buckets") {
    import spark.implicits._
    // heavily skewed: 1000 values of x^3 — raw high bits would be wasted
    val d = (1 to 1000).map(i => i.toLong * i * i).toDF("v")
    val ranked = Layout.quantileBuckets(d, Seq("v"), bits = 4)
    val counts = ranked.groupBy("__rank_v").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keys.min >= 0L && counts.keys.max <= 15L)
    // every bucket within 2x of the uniform share (62.5): distribution-free
    assert(counts.size == 16 && counts.values.forall(c => c > 30 && c < 125),
      s"buckets not near-uniform: $counts")
  }

  test("z-ordered write shrinks per-file min/max spans on BOTH columns") {
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // baseline: same file count, hash-scattered layout (no locality)
    li.repartition(8, col("l_quantity"))
      .write.mode("overwrite").parquet(s"$tmp/plain")
    Layout.writeZOrdered(li, Seq("l_orderkey", "l_partkey"),
      s"$tmp/zorder", numFiles = 8)
    def meanSpan(path: String, c: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
        r.getDouble(1) - r.getDouble(0)
      }
      spans.sum / spans.length
    }
    // the z-order layout must tighten BOTH dimensions at once vs the
    // scattered baseline (single-column sort could only tighten one);
    // 0.7 bound = the q_zorder_gate contract — at this tiny scale the
    // 8-file curve split leaves ratios near 0.6 with quantization noise
    val ordShrink = meanSpan(s"$tmp/zorder", "l_orderkey") /
      meanSpan(s"$tmp/plain", "l_orderkey")
    val partShrink = meanSpan(s"$tmp/zorder", "l_partkey") /
      meanSpan(s"$tmp/plain", "l_partkey")
    assert(ordShrink < 0.7, s"l_orderkey span ratio $ordShrink")
    assert(partShrink < 0.7, s"l_partkey span ratio $partShrink")
    // row content is unchanged — only layout moved
    assert(spark.read.parquet(s"$tmp/zorder").count() == li.count())
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  test("hilbert index is a bijection and the curve is CONTINUOUS (Morton is not)") {
    import spark.implicits._
    val bits = 3
    val side = 1 << bits
    val cells = for { x <- 0 until side; y <- 0 until side }
      yield (x.toLong, y.toLong)
    // through the DataFrame (whole-stage codegen path)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        org.apache.spark.sql.graft.sketch.hilbert_index(
          Seq(col("x"), col("y")), bits).alias("h"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .toMap
    // bijection: 64 cells ↔ positions 0..63
    assert(got.keySet == (0L until 64L).toSet)
    // continuity: consecutive curve positions are ADJACENT cells
    // (Manhattan distance exactly 1) — the locality property that
    // tightens per-file bounding boxes; Morton fails this at every
    // quadrant crossing (e.g. z=3→4 jumps (1,1)→(2,0))
    (0L until 63L).foreach { h =>
      val (x1, y1) = got(h); val (x2, y2) = got(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at h=$h: ($x1,$y1)→($x2,$y2)")
    }
    // interpreted eval agrees with codegen
    val arr = Array(3L, 5L)
    val direct = org.apache.spark.sql.graft.GraftHashOps
      .hilbertIndex(arr.clone(), bits)
    assert(got(direct) == ((3L, 5L)))
    // 3-D: still a bijection (2 bits → 64 cells)
    val cells3 = for { x <- 0L until 4L; y <- 0L until 4L; z <- 0L until 4L }
      yield (x, y, z)
    val got3 = cells3.toDF("x", "y", "z")
      .select(org.apache.spark.sql.graft.sketch.hilbert_index(
        Seq(col("x"), col("y"), col("z")), 2).alias("h"))
      .collect().map(_.getLong(0)).toSet
    assert(got3 == (0L until 64L).toSet)
    // null coordinate → null position
    val nulls = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(org.apache.spark.sql.graft.sketch.hilbert_index(
        Seq(col("x"), col("y")), bits).alias("h")).head()
    assert(nulls.isNullAt(0))
  }

  test("hilbert-ordered write shrinks per-file spans on BOTH columns") {
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val tmp = java.nio.file.Files.createTempDirectory("graft_hil").toString
    li.repartition(8, col("l_quantity"))
      .write.mode("overwrite").parquet(s"$tmp/plain")
    Layout.writeHilbertOrdered(li, Seq("l_orderkey", "l_partkey"),
      s"$tmp/hilbert", numFiles = 8)
    def meanSpan(path: String, c: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
        r.getDouble(1) - r.getDouble(0)
      }
      spans.sum / spans.length
    }
    Seq("l_orderkey", "l_partkey").foreach { c =>
      val ratio = meanSpan(s"$tmp/hilbert", c) / meanSpan(s"$tmp/plain", c)
      assert(ratio < 0.7, s"$c span ratio $ratio")
    }
    assert(spark.read.parquet(s"$tmp/hilbert").count() == li.count())
    rmTree(tmp)
  }

  test("hilbert file boxes are at least as tight as Morton's (aggregate)") {
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val cols = Seq("l_orderkey", "l_partkey")
    val tmp = java.nio.file.Files.createTempDirectory("graft_hm").toString
    Layout.writeZOrdered(li, cols, s"$tmp/z", numFiles = 8)
    Layout.writeHilbertOrdered(li, cols, s"$tmp/h", numFiles = 8)
    def meanSpanSum(path: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      cols.map { c =>
        val spans = files.map { f =>
          val r = spark.read.parquet(f)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
            .head()
          r.getDouble(1) - r.getDouble(0)
        }
        spans.sum / spans.length
      }.sum
    }
    val (z, h) = (meanSpanSum(s"$tmp/z"), meanSpanSum(s"$tmp/h"))
    // the continuity property (no quadrant jumps) should show up as
    // tighter-or-equal aggregate bounding boxes; allow 10% quantization
    // noise at this tiny file count — the claim is "not worse", the
    // exhaustive continuity proof lives in the property test
    assert(h <= z * 1.10, s"hilbert span sum $h vs morton $z")
    rmTree(tmp)
  }

  private def rmTree(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  private def parquetFiles(p: String): Seq[java.io.File] =
    new java.io.File(p).listFiles().toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compact merges small files to the byte target, preserving the row multiset") {
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    try {
      li.repartition(32).write.mode("overwrite").parquet(s"$tmp/small")
      val bytes = parquetFiles(s"$tmp/small").map(_.length).sum
      // target = half the footprint → exactly 2 output files
      val n = Layout.compact(spark, s"$tmp/small", s"$tmp/out",
        targetFileBytes = (bytes + 1) / 2)
      assert(n == 2, s"expected 2 files, compact returned $n")
      assert(parquetFiles(s"$tmp/out").size == 2)
      // multiset equality via count + order-insensitive xor of row hashes
      def sig(p: String) = spark.read.parquet(p)
        .agg(count(lit(1)),
          expr("bit_xor(xxhash64(l_orderkey, l_partkey, l_quantity))")).head()
      assert(sig(s"$tmp/small") == sig(s"$tmp/out"))
    } finally rmTree(tmp)
  }

  test("compact with partitionBy keeps the hive layout and partition pruning") {
    val li = sf("lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmp2").toString
    try {
      li.repartition(16).write.mode("overwrite").parquet(s"$tmp/small")
      Layout.compact(spark, s"$tmp/small", s"$tmp/out",
        targetFileBytes = 256L << 20, partitionBy = Seq("l_returnflag"))
      val back = spark.read.parquet(s"$tmp/out")
      assert(back.count() == li.count())
      // one directory per flag value, each compacted to a single file
      val dirs = new java.io.File(s"$tmp/out").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.forall(_.startsWith("l_returnflag=")), dirs.toString)
      dirs.foreach { d =>
        val files = parquetFiles(s"$tmp/out/$d")
        assert(files.size == 1, s"$d has ${files.size} files")
      }
      // the partition filter prunes to that directory's files only
      val pruned = back.filter(col("l_returnflag") === "R")
        .select(input_file_name()).distinct().count()
      assert(pruned == 1, s"expected 1 pruned file, got $pruned")
    } finally rmTree(tmp)
  }

  test("compact validates its inputs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmp3").toString
    try {
      intercept[IllegalArgumentException] {
        Layout.compact(spark, tmp, s"$tmp/out") // no parquet files
      }
      intercept[IllegalArgumentException] {
        Layout.compact(spark, tmp, s"$tmp/out", targetFileBytes = 0)
      }
    } finally rmTree(tmp)
  }
}
