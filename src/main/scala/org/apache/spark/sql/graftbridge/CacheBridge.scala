package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Bridge into the session's `private[sql]` cache manager, used by specs to
  * assert the CacheScope release contract: after a scoped operator returns,
  * NO plan may remain registered in the SQL cache (the scoped result lives
  * in checkpoint blocks outside the cache manager by design). */
object CacheBridge {
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
