/* Bridge into Spark's private[spark] listener bus: the shuffle tally
 * must drain pending task-end events before a snapshot, or an
 * asynchronous bus would attribute a query's tail events to the next
 * query. Same minimal-surface technique as sql.graftx.bridge. */
package org.apache.spark.graftx

import org.apache.spark.SparkContext

object listener {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
