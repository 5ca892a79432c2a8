package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Test-harness escape hatch: `SparkContext.listenerBus` is
  * `private[spark]`, but a plan-shape gate that counts jobs through a
  * `SparkListener` must drain the bus before reading its counter or the
  * assertion races event delivery. Same bridge technique as
  * [[ColumnBridge]]/[[StateBridge]]; not library surface — only specs
  * call it. */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
