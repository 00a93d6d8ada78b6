package org.apache.spark

/** Access to `private[spark]` SparkContext internals this library needs.
  * Lives in the `org.apache.spark` package — the established pattern for
  * Spark extension libraries (mirrors `org.apache.spark.sql.GraftBridge`).
  */
object GraftSparkBridge {

  /** Block until the listener bus has delivered all queued events — lets a
    * benchmark attribute asynchronous task-metric events to the query that
    * produced them before reading an accumulated counter. */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
