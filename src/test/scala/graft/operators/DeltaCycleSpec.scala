package graft.operators

import graft.SparkSpec

/** Round-18 optimization equivalences, pinned:
  *
  *  - a one-commit delta cycle ([[IndexCommit.commitDeltas]] /
  *    `applyDeltas`) produces THE SAME index as the sequential
  *    append×N + delete chain — same per-table segment counts (the
  *    health cards' segment-debt numbers), same table contents, same
  *    fsck verdicts — in one manifest generation instead of N+1;
  *  - the salted writer sub-split
  *    ([[IndexCommit.clusterForPartitionedWrite]]) never changes the
  *    partition-directory layout or the rows, only the file count
  *    within a partition value once the width exceeds the value count;
  *  - [[graft.FastRawLocalFileSystem]] reports the same file statuses
  *    as stock Hadoop, minus the per-file shell exec. */
class DeltaCycleSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.DataFrame

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rmRf(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def segCounts(dir: String): Map[String, Int] =
    IndexCommit.currentManifest(spark, dir).get.tables
      .map { case (t, segs) => t -> segs.size }

  private val docs = (1L to 60L).map(i =>
    (i, s"w${i % 7} w${i % 5} w${i % 3} common t$i")).toDF("doc_id", "text")

  test("Bm25.applyDeltas == sequential appendIndex x2 + deleteDocs") {
    val seqDir = tmpDir("graft_dc_seq")
    val batDir = tmpDir("graft_dc_bat")
    try {
      val base = docs.filter($"doc_id" % 3 === 0)
      val inc1 = docs.filter($"doc_id" % 3 === 1)
      val inc2 = docs.filter($"doc_id" % 3 === 2)
      val del = docs.filter($"doc_id" % 7 === 3).select($"doc_id")
      Seq(seqDir, batDir).foreach(d =>
        Bm25.writeIndex(base, "doc_id", "text", d))
      Bm25.appendIndex(spark, seqDir, inc1, "doc_id", "text")
      Bm25.appendIndex(spark, seqDir, inc2, "doc_id", "text")
      Bm25.deleteDocs(spark, seqDir, del)
      Bm25.applyDeltas(spark, batDir, Seq(inc1, inc2), "doc_id", "text",
        Some(del))
      // same segment-count profile (health-card surface) ...
      assert(segCounts(batDir) == segCounts(seqDir))
      // ... same table contents ...
      Seq("postings", "df", "stats", "tombstones").foreach { t =>
        assert(rowsOf(IndexCommit.readTable(spark, batDir, t)) ==
          rowsOf(IndexCommit.readTable(spark, seqDir, t)), s"table $t")
      }
      // ... same fsck verdict (incl. checksum legs) and served ranking
      val fs = rowsOf(Bm25.fsck(spark, seqDir)
        .select($"check", $"expected", $"actual", $"ok"))
      val fb = rowsOf(Bm25.fsck(spark, batDir)
        .select($"check", $"expected", $"actual", $"ok"))
      assert(fb == fs)
      assert(fb.forall(_.contains("true")))
      val qs = Seq("q1" -> Seq("w1", "w2"), "q2" -> Seq("common"))
      assert(rowsOf(Bm25.serve(spark, batDir, qs, k = 5)) ==
        rowsOf(Bm25.serve(spark, seqDir, qs, k = 5)))
      // ... in ONE generation instead of three
      assert(IndexCommit.currentManifest(spark, batDir).get.gen == 2L)
      assert(IndexCommit.currentManifest(spark, seqDir).get.gen == 4L)
    } finally { rmRf(seqDir); rmRf(batDir) }
  }

  private val vecs = (1L to 40L).map { i =>
    (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
  }.toDF("vec_id", "embedding")

  test("lshApplyDeltas == lshAppendIndex + deleteVectors") {
    val seqDir = tmpDir("graft_dc_lseq")
    val batDir = tmpDir("graft_dc_lbat")
    try {
      val base = vecs.filter($"vec_id" % 2 === 0)
      val inc = vecs.filter($"vec_id" % 2 === 1)
      val del = vecs.filter($"vec_id" % 5 === 2).select($"vec_id")
      Seq(seqDir, batDir).foreach(d => VectorSearch.lshWriteIndex(base, d))
      VectorSearch.lshAppendIndex(spark, seqDir, inc)
      VectorSearch.deleteVectors(spark, seqDir, del)
      VectorSearch.lshApplyDeltas(spark, batDir, Seq(inc), Some(del))
      assert(segCounts(batDir) == segCounts(seqDir))
      Seq("buckets", "tombstones").foreach { t =>
        assert(rowsOf(IndexCommit.readTable(spark, batDir, t)
            .select($"vec_id")) ==
          rowsOf(IndexCommit.readTable(spark, seqDir, t)
            .select($"vec_id")), s"table $t")
      }
      val fs = rowsOf(VectorSearch.lshFsck(spark, seqDir)
        .select($"check", $"ok"))
      assert(rowsOf(VectorSearch.lshFsck(spark, batDir)
        .select($"check", $"ok")) == fs)
      assert(fs.forall(_.contains("true")))
      assert(IndexCommit.currentManifest(spark, batDir).get.gen == 2L)
      assert(IndexCommit.currentManifest(spark, seqDir).get.gen == 3L)
    } finally { rmRf(seqDir); rmRf(batDir) }
  }

  test("clusterForPartitionedWrite: identity at k=1; layout-preserving sub-split at k>1") {
    val df = (1L to 200L).map(i => ((i % 3).toInt, i)).toDF("p", "vec_id")
    // k = 1: width <= nPartValues — must be the plain hash clustering
    val plain = IndexCommit.clusterForPartitionedWrite(df, 3, "p", 3L,
      "vec_id")
    assert(plain.rdd.getNumPartitions == 3)
    // k > 1: width 8 over 3 values — up to ceil(8/3)=3 sub-splits
    val d1 = tmpDir("graft_dc_salt")
    val d2 = tmpDir("graft_dc_plain")
    try {
      IndexCommit.clusterForPartitionedWrite(df, 8, "p", 3L, "vec_id")
        .write.mode("overwrite").partitionBy("p").parquet(d1)
      df.repartition(8, $"p")
        .write.mode("overwrite").partitionBy("p").parquet(d2)
      def partDirs(d: String): Set[String] =
        new java.io.File(d).listFiles().filter(_.isDirectory)
          .map(_.getName).toSet
      // identical partition-directory layout ...
      assert(partDirs(d1) == partDirs(d2))
      // ... identical rows ...
      assert(rowsOf(spark.read.parquet(d1)) == rowsOf(spark.read.parquet(d2)))
      // ... but the hot partitions now hold >1 data file
      val files = new java.io.File(d1, "p=0").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files > 1, s"expected sub-split files, got $files")
    } finally { rmRf(d1); rmRf(d2) }
  }

  test("FastRawLocalFileSystem statuses match stock Hadoop") {
    val dir = tmpDir("graft_dc_fs")
    try {
      val sub = new java.io.File(dir, "sub"); sub.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "a.txt"), "hello")
      java.nio.file.Files.writeString(
        sub.toPath.resolve("b.bin"), "worldwide")
      val conf = spark.sessionState.newHadoopConf()
      val fast = new graft.FastRawLocalFileSystem
      fast.initialize(new java.net.URI("file:///"), conf)
      val stock = new org.apache.hadoop.fs.RawLocalFileSystem
      stock.initialize(new java.net.URI("file:///"), conf)
      val p = new org.apache.hadoop.fs.Path(dir)
      def key(s: org.apache.hadoop.fs.FileStatus): String =
        Seq(s.getPath.getName, s.getLen, s.isDirectory, s.getPermission,
          s.getOwner, s.getGroup, s.getModificationTime).mkString("|")
      val f = fast.listStatus(p).map(key).sorted.toSeq
      val s = stock.listStatus(p).map(key).sorted.toSeq
      assert(f == s)
      assert(key(fast.getFileStatus(new org.apache.hadoop.fs.Path(dir, "a.txt")))
        == key(stock.getFileStatus(new org.apache.hadoop.fs.Path(dir, "a.txt"))))
      // missing path: same exception contract
      intercept[java.io.FileNotFoundException](
        fast.getFileStatus(new org.apache.hadoop.fs.Path(dir, "nope")))
      intercept[java.io.FileNotFoundException](
        fast.listStatus(new org.apache.hadoop.fs.Path(dir, "nope")))
      // file listStatus: single-entry array, like stock
      assert(fast.listStatus(new org.apache.hadoop.fs.Path(dir, "a.txt"))
        .length == 1)
    } finally rmRf(dir)
  }
}
