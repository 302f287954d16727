package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-lived
  * partitioned store needs: streaming/micro-batch appends accumulate
  * thousands of KB-sized files per partition, and at 100 TB the resulting
  * file-listing and task-scheduling overhead (one task per tiny file)
  * dominates scan cost. Compaction rewrites a directory into
  * ⌈bytes / targetBytes⌉ files and atomically swaps it in.
  *
  * The swap is write-to-sibling + rename (the same directory-level
  * atomicity the cooling pipeline's dynamic partition overwrite relies
  * on); a crash before the final rename leaves the original intact.
  */
object Compaction {

  case class Result(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Compact one parquet directory in place. Returns file counts.
    * `targetBytes` defaults to 128 MB — one HDFS/S3-friendly block per
    * file, matching `spark.sql.files.maxPartitionBytes` so a compacted
    * file is one scan task.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): Result = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val tmp = new Path(dir + ".compact-tmp")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .repartition(nOut)
      .write.parquet(tmp.toString)

    val bak = new Path(dir + ".compact-old")
    fs.delete(bak, true)
    require(fs.rename(p, bak), s"could not move $dir aside")
    require(fs.rename(tmp, p), s"could not swap compacted dir into $dir")
    fs.delete(bak, true)

    val after = fs.listStatus(p).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    Result(files.length, after, bytes)
  }
}
