package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-lived
  * partitioned store needs: streaming/micro-batch appends accumulate
  * thousands of KB-sized files per partition, and at 100 TB the resulting
  * file-listing and task-scheduling overhead (one task per tiny file)
  * dominates scan cost. Compaction rewrites a directory into
  * ⌈bytes / targetBytes⌉ files and swaps it in.
  *
  * Crash-safety contract (directory-rename stores: HDFS, file://):
  * the swap is write-to-sibling + two renames
  * (`dir → dir.compact-old`, `dir.compact-tmp → dir`). A crash *between*
  * the renames leaves the data parked at `.compact-old`; `compact` (and
  * [[recover]]) detects that state on entry and restores it before doing
  * anything else, so re-running after any crash converges. A crash at any
  * other point leaves either the original in place or a fully swapped-in
  * result plus at most a stale sibling that the next run deletes.
  *
  * On S3-like object stores `rename` is copy+delete and NOT atomic — this
  * in-place swap must not be used there. The object-storage path is
  * compact-to-NEW-prefix + pointer flip:
  * [[graft.sources.VersionedStore.compactCurrent]] (see SCALE.md
  * "Object-storage commit semantics"); this class is the HDFS/file://
  * implementation.
  *
  * Hive-partitioned inputs (subdirectories named `key=value`) are
  * compacted leaf-by-leaf, preserving the partition layout — which is
  * also the scale-correct shape: each leaf is an independent job, so a
  * 100 TB table compacts partition-parallel with no global rewrite.
  */
object Compaction {

  case class Result(filesBefore: Int, filesAfter: Int, bytes: Long) {
    def +(o: Result): Result =
      Result(filesBefore + o.filesBefore, filesAfter + o.filesAfter, bytes + o.bytes)
  }

  private def bakPath(p: Path) = new Path(p.getParent, p.getName + ".compact-old")
  private def tmpPath(p: Path) = new Path(p.getParent, p.getName + ".compact-tmp")

  private def isHidden(p: Path) =
    p.getName.startsWith("_") || p.getName.startsWith(".")

  /** Restore a directory from a crashed previous compaction, if needed.
    * Idempotent; called automatically by [[compact]] on entry.
    */
  def recover(fs: FileSystem, p: Path): Unit = {
    val bak = bakPath(p)
    if (fs.exists(bak)) {
      if (!fs.exists(p)) {
        // crashed between the two swap renames: the original is intact at bak
        require(fs.rename(bak, p), s"could not restore $bak to $p")
      } else {
        // crashed after the swap completed but before cleanup: bak is stale
        fs.delete(bak, true)
      }
    }
    fs.delete(tmpPath(p), true) // stale half-written output, if any
  }

  /** Compact one parquet directory in place. Returns file counts summed
    * over all leaves. `targetBytes` defaults to 128 MB — one HDFS/S3
    * block per file, matching `spark.sql.files.maxPartitionBytes` so a
    * compacted file is one scan task.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): Result = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, p)

    val entries = fs.listStatus(p).filterNot(e => isHidden(e.getPath))
    val subdirs = entries.filter(_.isDirectory)
    if (subdirs.nonEmpty) {
      // Hive-partitioned layout: compact each leaf independently so the
      // key=value directory structure (and thus partition pruning) survives.
      require(subdirs.forall(_.getPath.getName.contains("=")),
        s"$dir contains non-partition subdirectories " +
          s"(${subdirs.map(_.getPath.getName).mkString(", ")}); " +
          "compact leaf directories individually")
      require(entries.forall(_.isDirectory),
        s"$dir mixes data files and partition subdirectories")
      subdirs.map(d => compact(spark, d.getPath.toString, targetBytes))
        .reduce(_ + _)
    } else {
      compactLeaf(spark, fs, p, targetBytes)
    }
  }

  private def compactLeaf(spark: SparkSession, fs: FileSystem, p: Path,
                          targetBytes: Long): Result = {
    val files = fs.listStatus(p).filter(f => f.isFile && !isHidden(f.getPath))
    require(files.nonEmpty, s"$p has no data files to compact")
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val tmp = tmpPath(p)
    spark.read.parquet(p.toString)
      .repartition(nOut)
      .write.parquet(tmp.toString)

    val bak = bakPath(p)
    require(fs.rename(p, bak), s"could not move $p aside")
    require(fs.rename(tmp, p), s"could not swap compacted dir into $p")
    fs.delete(bak, true)

    val after = fs.listStatus(p).count(f => f.isFile && !isHidden(f.getPath))
    Result(files.length, after, bytes)
  }
}
