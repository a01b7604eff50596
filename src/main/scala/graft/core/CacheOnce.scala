package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The repo's persist-once idiom, in one place. `Dataset.storageLevel`
  * consults the CacheManager BY CANONICALIZED PLAN, so two separately
  * built frames with the same plan share one cache entry — re-persisting
  * an already-cached plan is a no-op that logs a warning readers learn to
  * ignore, and an unpersist by a non-owner silently drops a cache its
  * caller still relies on. These helpers encode both rules.
  */
object CacheOnce {

  /** Persist unless an equivalent plan is already cached. Use when the
    * cache's lifetime is left to the ContextCleaner (registry queries,
    * per-batch frames inside a cleared-per-query harness).
    */
  def persistOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df

  /** Like [[persistOnce]], but returns whether THIS call pinned the frame
    * — only the pinning call owns the unpersist. Use inside operators
    * that clean up after themselves but must not drop a CALLER's pin
    * (the `buildIvfIndex` corpus-sharing contract).
    */
  def pinIfUnpinned(df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel == StorageLevel.NONE) (df.persist(), true)
    else (df, false)
}
