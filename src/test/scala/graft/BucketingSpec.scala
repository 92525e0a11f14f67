package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4, "graft-bucketing-test")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join strategy question
    s
  }

  test("joining two tables bucketed on the key needs no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", buckets = 4, bucketCols = Seq("o_orderkey"), sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_b", buckets = 4, bucketCols = Seq("l_orderkey"), sortCols = Seq("l_orderkey"))

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))

    // the join itself is co-located: no exchange below the join
    val joinOnly = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.hasShuffle(joinOnly), joinOnly.queryExecution.executedPlan.toString)

    // and it still computes the right thing
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() > 0 && joinOnly.count() == expected)
  }

  test("compaction rewrites a shattered directory into size-targeted files") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    try {
      val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      docs.repartition(64).write.mode("overwrite").parquet(s"$dir/shattered")

      // target ~1/4 of the total bytes per file -> expect ~4 output files
      val fs = new org.apache.hadoop.fs.Path(s"$dir/shattered")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val total = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/shattered"))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(_.getLen).sum

      val (before, after, bytes) = Layout.compactFiles(
        spark, s"$dir/shattered", s"$dir/compact", targetBytes = total / 4 + 1)
      assert(before == 64 && bytes == total)
      assert(after >= 3 && after <= 5, s"after=$after")
      // nothing lost, file count actually shrank on disk
      val out = spark.read.parquet(s"$dir/compact")
      assert(out.count() == docs.count())
      val outFiles = out.select(input_file_name()).distinct().count()
      assert(outFiles == after, s"outFiles=$outFiles after=$after")

      // sorted compaction restores per-file min/max locality
      Layout.compactFiles(spark, s"$dir/shattered", s"$dir/sorted",
        targetBytes = total / 4 + 1, sortCols = Seq("doc_id"))
      val rects = spark.read.parquet(s"$dir/sorted")
        .groupBy(input_file_name())
        .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      rects.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, rects.mkString(", "))
        case _ => ()
      }

      // hive-partitioned input: the data files live in p=K subdirs, so
      // only a RECURSIVE listing sizes the rewrite from real bytes (a
      // top-level listing sees zero data files and refuses)
      docs.withColumn("p", pmod(col("doc_id"), lit(4L)))
        .write.partitionBy("p").mode("overwrite").parquet(s"$dir/parts")
      val (pb, pa, pbytes) = Layout.compactFiles(
        spark, s"$dir/parts", s"$dir/parts_compact", targetBytes = Long.MaxValue)
      assert(pb >= 4 && pbytes > 0L && pa == 1, s"pb=$pb pa=$pa bytes=$pbytes")
      val pc = spark.read.parquet(s"$dir/parts_compact")
      assert(pc.count() == docs.count())
      // the flattened rewrite keeps the partition column as a data column
      assert(pc.groupBy("p").count().count() == 4L)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("layout degenerate inputs: constant z-key still writes, empty dir refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-degenerate").toString
    try {
      // all rows share one z-value -> the range partitioner has a single
      // split point; the write must still land every row
      val const = spark.range(1000).select(lit(7L).as("a"), lit(9L).as("b"))
      Layout.zorderWrite(const, Seq("a", "b"), bits = 10, s"$dir/z", files = 8)
      assert(spark.read.parquet(s"$dir/z").count() == 1000L)

      val err = intercept[IllegalArgumentException] {
        java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir, "empty"))
        Layout.compactFiles(spark, s"$dir/empty", s"$dir/out", targetBytes = 1024)
      }
      assert(err.getMessage.contains("no data files"))
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("z-order write: a selective filter prunes files on EITHER dimension") {
    // deterministic 2-d uniform data (hash-derived, no rand()): both
    // dimensions span [0, 1024)
    val rows = spark.range(20000).select(
      pmod(xxhash64(col("id")), lit(1024L)).as("a"),
      pmod(xxhash64(col("id"), lit(1L)), lit(1024L)).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      Layout.zorderWrite(rows, Seq("a", "b"), bits = 10, s"$dir/z", files = 16)
      // the 1-d baseline: range-sorted on `a` alone
      rows.repartitionByRange(16, col("a")).sortWithinPartitions("a")
        .write.mode("overwrite").parquet(s"$dir/lin")

      // per-file min/max rectangles — what parquet footers / table-format
      // manifests expose to a file-skipping scan planner
      def rects(path: String): Array[(Long, Long, Long, Long)] =
        spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg(min("a").as("amin"), max("a").as("amax"),
            min("b").as("bmin"), max("b").as("bmax"))
          .collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

      // a filter selecting the middle quarter of one dimension touches a
      // file only if its [min,max] range overlaps [384, 640)
      def overlap(rs: Array[(Long, Long, Long, Long)], onB: Boolean): Int =
        rs.count { case (amin, amax, bmin, bmax) =>
          val (lo, hi) = if (onB) (bmin, bmax) else (amin, amax)
          lo < 640L && hi >= 384L
        }

      val z = rects(s"$dir/z")
      val lin = rects(s"$dir/lin")
      assert(z.length == 16 && lin.length == 16)
      // linear layout: sorted on a, so b is uniform within every file —
      // a b-filter reads ALL files
      assert(overlap(lin, onB = true) == 16)
      // z-order: each file covers a small rectangle (~256x512 at 16 files
      // over a 1024^2 domain), so BOTH dimensions prune. The exact
      // overlap count jitters with the range partitioner's boundary
      // SAMPLING (9-12 observed across suite orders), so assert the
      // guarantee, not one sampled layout: meaningfully fewer files than
      // the 16/16 the linear layout reads on its unsorted dimension
      assert(overlap(z, onB = true) <= 14, z.mkString(", "))
      assert(overlap(z, onB = false) <= 14, z.mkString(", "))
      // and the a-dimension pruning the linear layout had is not lost
      // entirely: the z layout still skips for a-filters (checked above)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
