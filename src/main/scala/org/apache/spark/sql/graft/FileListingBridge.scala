package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.FileStatusCache

/**
 * Bridge into Spark's `private[sql]` shared file-listing cache, for the
 * persisted-index stores that mutate paths IN PLACE (partition rewrites
 * on delete, rename-aside swaps on compact). A session's
 * `SharedInMemoryCache` keeps leaf-file listings per path with no TTL;
 * after an in-place rewrite a brand-new `spark.read.parquet(path)` can
 * otherwise resolve against the stale listing and fail with
 * FAILED_READ_FILE.FILE_NOT_EXIST (or silently read replaced files).
 * `spark.catalog.refreshByPath` recaches CACHED plans but does not
 * reach this listing cache — hence the bridge. Same visibility-only
 * pattern as [[SparkErrorBridge]]; nothing subclasses or patches Spark.
 */
object FileListingBridge {

  /** Drop the session's cached leaf-file listings (cheap: listings
    * rebuild lazily on next read). Called by the index maintenance ops
    * after any in-place store mutation. */
  def invalidateListings(spark: SparkSession): Unit =
    FileStatusCache.getOrCreate(spark).invalidateAll()
}
