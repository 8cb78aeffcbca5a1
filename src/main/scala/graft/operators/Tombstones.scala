package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone side-table machinery behind index deletion
  * (IncrementalDedup.deleteDocs / Ivf.deleteFromIndex) — one
  * implementation of the takedown lifecycle, parameterized on the id
  * column, so the two stores cannot drift:
  *
  *   - [[add]]: ids land as ONE parquet file under `tombstones/`
  *     (O(ids), no base rewrite), stored under the canonical column
  *     name `id`;
  *   - [[minus]]: read-time masking — broadcast anti-join of a frame
  *     against the pending ids (no-op without tombstones; the set is
  *     takedown-sized by nature);
  *   - [[drop]]: compact's fold-then-delete step (delete LAST, after
  *     the layout swaps — a crash re-applies inert tombstones, never
  *     resurrects a row); returns whether tombstones existed, which
  *     drives e.g. the bucket-Bloom sidecar rebuild;
  *   - [[clearStale]]: rebuild-in-place sweep — a NEW corpus must not
  *     inherit the previous corpus's pending deletions.
  */
private[operators] object Tombstones {

  def dir(path: String): String = s"$path/tombstones"

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The pending tombstoned ids (column `id`), if any. Distinct across
    * FILES, not just within one: [[add]] dedups per call, but the same id
    * deleted in two calls lands in two tombstone files — without this,
    * the router's tombstone count overcounts, corpus estimates skew, and
    * the broadcast anti-join set carries duplicate rows until compact.
    * The set is takedown-sized, so the distinct is a few-row shuffle. */
  def ids(spark: SparkSession, path: String): Option[DataFrame] = {
    val t = new org.apache.hadoop.fs.Path(dir(path))
    if (fs(spark, path).exists(t)) Some(spark.read.parquet(dir(path)).distinct())
    else None
  }

  /** Append `newIds` (read from `idCol`) as one tombstone file. */
  def add(path: String, newIds: DataFrame, idCol: String): Unit =
    newIds.select(col(idCol).cast("long").as("id")).distinct()
      .coalesce(1).write.mode("append").parquet(dir(path))

  /** Suppress tombstoned ids in `rows` on its `idCol` column. */
  def minus(spark: SparkSession, path: String, rows: DataFrame,
      idCol: String): DataFrame =
    ids(spark, path).map { t =>
      rows.join(broadcast(t.select(col("id").as(idCol))), Seq(idCol),
        "left_anti")
    }.getOrElse(rows)

  /** Delete the tombstone dir (compact's LAST step); true iff it existed. */
  def drop(spark: SparkSession, path: String): Boolean = {
    val t = new org.apache.hadoop.fs.Path(dir(path))
    val f = fs(spark, path)
    val existed = f.exists(t)
    if (existed) f.delete(t, true)
    existed
  }

  /** Rebuild-in-place sweep: clear any previous corpus's tombstones. */
  def clearStale(spark: SparkSession, path: String): Unit = { drop(spark, path); () }
}
