package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan pruning.
  *
  * Parquet scans prune files/row-groups by per-column min/max footers;
  * a sort on ONE column gives tight spans on that column only. Mapping
  * rows onto a Z-order curve over several columns and range-partitioning
  * on the curve position gives every output file a compact
  * hyper-rectangle of the key space — small min/max spans on EVERY
  * curve column at once, so predicates on any subset of them prune
  * (the layout Delta/Iceberg expose as OPTIMIZE ZORDER BY; Morton 1966).
  *
  * Scale shape: one approx-percentile aggregate to learn per-column
  * bucket boundaries (bounded sketch state), a map-side bucket+interleave
  * projection, and exactly ONE range-exchange on the z-value — the same
  * shuffle a single-column sorted write already pays. Nothing is
  * collected beyond the boundary row.
  */
object Layout {

  /** Morton z-value: interleave the low ⌊64/n⌋ bits of each of n
    * columns (column i's bit j lands at output bit j·n + i). A static
    * bitwise expression tree — codegen'd, shuffle-free, no UDF.
    * Caller contract: non-negative inputs that roughly fill
    * [0, 2^(64/n)) — raw ids qualify; arbitrary distributions should go
    * through [[quantileBuckets]] first so every interleaved bit carries
    * information. */
  def zvalue(cols: Seq[Column]): Column = {
    require(cols.nonEmpty && cols.size <= 8, "1 to 8 z-order columns")
    val n = cols.size
    val bitsPer = 64 / n
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bitsPer).map { j =>
        shiftleft(shiftrightunsigned(c.cast("long"), j).bitwiseAND(lit(1L)),
          j * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Rank-normalize columns to 2^bits quantile buckets (`__rank_<col>`,
    * 0-based): ONE approx-percentile aggregate learns all boundaries,
    * then per-row assignment is a codegen'd BINARY SEARCH against the
    * boundary literals (`graft_bucket_index`) — O(log B) per row,
    * map-side. (The composable higher-order-function formulation is
    * CodegenFallback and scans all B boundaries interpreted per row: at
    * 255 boundaries it dominated the whole z-order write.) Makes
    * z-values distribution-free: every interleaved bit splits the data
    * ~in half regardless of the raw value distribution (a skewed raw
    * column would otherwise waste its high bits). Nulls rank as
    * bucket 0. */
  def quantileBuckets(df: DataFrame, cols: Seq[String],
      bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, "1 to 16 rank bits")
    val nb = 1 << bits
    val ps = (1 until nb).map(_.toDouble / nb)
    // timestamp/date layout columns rank by their epoch-nanos view
    // (ANSI forbids cast(timestamp_ntz as double), and rank order is
    // identical either way — epochNanos is monotone)
    def asD(c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType =>
        Temporal.epochNanos(df, c).cast("double")
      case _ => col(c).cast("double")
    }
    val aggs = cols.map(c => approx_percentile(asD(c),
      array(ps.map(lit): _*), lit(10000)).alias(s"__b_$c"))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val bl = Option(bounds.getSeq[Double](i)).getOrElse(Seq.empty)
      d.withColumn(s"__rank_$c",
        coalesce(org.apache.spark.sql.graft.sketch.bucket_index(
          asD(c), bl).cast("long"), lit(0L)))
    }
  }

  /** Z-order write: quantile-bucketize the layout columns, interleave to
    * a z-value, RANGE partition on it (sampled boundaries — balanced
    * files), sort within partitions, write parquet. `numFiles` ≤ 0 uses
    * the session shuffle parallelism. The z columns themselves are
    * written unchanged; only the ORDER of rows across files changes. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int = 0, bits: Int = 8): Unit = {
    val ranked = quantileBuckets(df, cols, bits)
    val z = ranked.withColumn("__z", zvalue(cols.map(c => col(s"__rank_$c"))))
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    z.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop(cols.map(c => s"__rank_$c") :+ "__z": _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-curve position over rank-bucketized columns — the
    * alternative space-filling curve to [[zvalue]]. Morton interleave
    * jumps a long diagonal every time it crosses a quadrant boundary;
    * the Hilbert curve is continuous (consecutive positions are always
    * ADJACENT cells), so range-partitioning its positions yields
    * tighter per-file bounding boxes on the same data at the same file
    * count — strictly better footer pruning, at the cost of ~bits·n
    * integer ops per row instead of a pure bit-interleave (both
    * codegen'd, both shuffle-free). Same caller contract as [[zvalue]]:
    * non-negative inputs filling [0, 2^bits) — go through
    * [[quantileBuckets]] first for arbitrary distributions. */
  def hvalue(cols: Seq[Column], bits: Int = 8): Column =
    org.apache.spark.sql.graft.sketch.hilbert_index(cols, bits)

  /** Hilbert-ordered write: [[writeZOrdered]] with the Morton curve
    * swapped for the Hilbert curve — identical plan shape (ONE
    * approx-percentile aggregate, map-side bucket+curve projection,
    * ONE range exchange), tighter file bounding boxes. */
  def writeHilbertOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int = 0, bits: Int = 8): Unit = {
    val ranked = quantileBuckets(df, cols, bits)
    val h = ranked.withColumn("__h",
      hvalue(cols.map(c => col(s"__rank_$c")), bits))
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    h.repartitionByRange(parts, col("__h"))
      .sortWithinPartitions("__h")
      .drop(cols.map(c => s"__rank_$c") :+ "__h": _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes` output files. The small-files problem is the
    * quiet killer of 100 TB scans — a corpus appended in thousands of
    * streaming/incremental batches ends up as millions of KB-scale
    * files, and the scan pays a NameNode/listing round-trip plus a
    * reader open per file while row-group pruning has nothing to prune.
    *
    * File count = ceil(on-disk bytes / target) from the REAL footprint
    * (filesystem listing — estimating from row counts would bake in a
    * compression-ratio guess). The rewrite is one round-robin
    * repartition: no key, so no skew, and every output file lands
    * within one row-group of the target. Returns the file count
    * written. Content is preserved, ORDER IS NOT (parquet directories
    * are unordered row bags; a layout-sensitive caller compacts with
    * [[writeZOrdered]] instead, which re-sorts anyway).
    *
    * Hive-partitioned inputs: pass the partition columns in
    * `partitionBy` — output keeps the directory structure, each
    * partition compacted independently (`maxRecordsPerFile` bounds the
    * per-directory file size via the global rows/bytes ratio) with
    * partition pruning preserved for downstream scans. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long = 128L << 20,
      partitionBy: Seq[String] = Nil): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath match {
        case p if p.contains("://") => p
        case p => s"file://$p"
      }),
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(inPath), true)
    var bytes = 0L
    var rowsFiles = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        bytes += f.getLen; rowsFiles += 1
      }
    }
    require(rowsFiles > 0, s"no parquet files under $inPath")
    val df = spark.read.parquet(inPath)
    if (partitionBy.isEmpty) {
      val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      df.repartition(nFiles.toInt)
        .write.mode("overwrite").parquet(outPath)
      nFiles
    } else {
      // per-partition compaction: cluster rows by the partition key (one
      // file per partition directory unless maxRecordsPerFile splits it),
      // bound file size by the corpus-wide rows-per-byte ratio
      val totalRows = df.count()
      val rowsPerFile = math.max(1L,
        (totalRows.toDouble * targetFileBytes / math.max(bytes, 1L)).toLong)
      df.repartition(partitionBy.map(col): _*)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rowsPerFile)
        .partitionBy(partitionBy: _*)
        .parquet(outPath)
      val out = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(outPath match {
          case p if p.contains("://") => p
          case p => s"file://$p"
        }), spark.sparkContext.hadoopConfiguration)
      val oit = out.listFiles(new org.apache.hadoop.fs.Path(outPath), true)
      var n = 0L
      while (oit.hasNext) {
        if (oit.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
  }
}
