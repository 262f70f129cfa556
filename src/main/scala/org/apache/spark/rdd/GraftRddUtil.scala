package org.apache.spark.rdd

/** Spark-private RDD state readable only from inside the
  * org.apache.spark.rdd package (isLocallyCheckpointed is
  * package-private in source). The engine's storage hygiene —
  * graft.Engine.releaseCheckpoints — needs it to free localCheckpoint
  * blocks without touching caller-managed persist caches.
  */
object GraftRddUtil {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean =
    rdd.isLocallyCheckpointed
}
