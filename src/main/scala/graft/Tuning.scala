package graft

import org.apache.spark.sql.SparkSession

/** Session-level engine tuning shared by every main (Bench, Verify,
  * profiling tools) so measured and verified runs execute identically.
  * Each setting is scale-justified, not a local[32] fit — see
  * OPTIMIZATION_r18.md for the measurements:
  *
  *  - committer algorithm v2: task commits move files to their final
  *    location directly; v1's job commit is a DRIVER-SIDE serial merge
  *    of every task's `_temporary` attempt dir — measured as the
  *    dominant non-job wall time of every partitioned index-segment
  *    write (a 252-bucket LSH segment is ~252 directory merges per
  *    write, serial on the driver; at production scale the same merge
  *    is one driver-side round-trip per partition-dir against an
  *    object store). SAFE HERE BY CONSTRUCTION: the index layer's
  *    atomicity comes from the manifest flip ([[operators.IndexCommit]]
  *    — segments are staged dirs invisible until the rename), never
  *    from job-commit atomicity; a crashed write leaves orphan files
  *    in an uncommitted segment dir that the retry's
  *    `mode("overwrite")` replaces. The known v2 caveat (concurrent
  *    task-commit visibility on non-atomic-rename stores) is exactly
  *    the window the manifest protocol already tolerates.
  *
  *  - parallel partition discovery threshold 1024 (default 32): below
  *    the threshold the driver lists partition dirs with its own
  *    thread pool; above it Spark launches a distributed listing JOB.
  *    A few hundred local directory listings cost ~10 ms of I/O behind
  *    ~0.4 s of job scheduling (measured on the bucket/cell segment
  *    reads, 2 such jobs per serve) — the job only pays off when
  *    per-path listing latency is object-store-sized AND path counts
  *    are thousands. 1024 keeps the distributed path for genuinely
  *    huge partitioned tables.
  */
object Tuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.hadoop.fs.file.impl",
      classOf[FastLocalFileSystem].getName)
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
      "2")
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
      "1024")
}
