package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Compaction for partitioned parquet directories that accumulate small
  * files under incremental appends (the disk-index maintenance gap: N daily
  * deltas = N files per partition directory, and probe listing cost grows
  * per append).
  *
  * Rewrites `dir` so every partition directory holds exactly ONE data file:
  * one `repartition(n, partCol)` shuffle routes each partition value to a
  * single task, `partitionBy` restores the identical directory layout, and
  * the finished rewrite is swapped in with two directory renames. Rows only
  * move between files — content, schema, and the partition layout (so any
  * static-pruning read path) are unchanged.
  *
  * The swap is NOT atomic (rename-out then rename-in): a crash between the
  * renames leaves the data at `<dir>__pre_compact` — recover by renaming it
  * back. Production serving should compact a COPY and flip a generation
  * pointer (immutable index generations), the same contract the append
  * paths document.
  */
object PartitionCompaction {

  /** @param nPartitions expected number of distinct `partCol` values — one
    *                    rewrite task per value (a bounded, known quantity
    *                    for both disk indexes: `n_buckets` / `nLists`).
    * @return data-file count (before, after) for observability; `after` is
    *         at most the number of non-empty partition directories.
    */
  def compact(spark: SparkSession, dir: String, partCol: String,
              nPartitions: Int): (Long, Long) = {
    require(nPartitions > 0, s"nPartitions must be positive, got $nPartitions")
    val dest = new Path(dir)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(dest), s"compact: $dir does not exist")
    val before = dataFileCount(fs, dest)

    val tmp = new Path(dir + "__compact_tmp")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .repartition(nPartitions, col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    swapIntoPlace(fs, dest, tmp, new Path(dir + "__pre_compact"))
    (before, dataFileCount(fs, dest))
  }

  /** The shared generation-swap protocol (used by compaction AND the IVF
    * refit): move `dest` to `bak`, move `newDir` into place, drop `bak`.
    * NOT atomic — a crash between the renames leaves the original at `bak`;
    * recover by renaming it back. Production serving should swap a COPY and
    * flip a generation pointer instead.
    */
  def swapIntoPlace(fs: org.apache.hadoop.fs.FileSystem, dest: Path,
                    newDir: Path, bak: Path): Unit = {
    fs.delete(bak, true)
    require(fs.rename(dest, bak), s"swap: could not move $dest aside")
    require(fs.rename(newDir, dest),
      s"swap: could not move $newDir into place (original preserved at $bak)")
    fs.delete(bak, true); ()
  }

  private[graft] def dataFileCount(fs: org.apache.hadoop.fs.FileSystem, p: Path): Long = {
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }
}
