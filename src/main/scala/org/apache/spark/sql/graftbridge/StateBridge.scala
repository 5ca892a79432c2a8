package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bench-harness escape hatch: Structured Streaming keeps every loaded
  * [[StateStore]] provider (and its full in-memory state map) in a
  * process-global registry until maintenance unloads it. Each drained
  * AvailableNow run uses a FRESH checkpoint dir, so a benchmark that
  * executes the streaming queries hundreds of times accumulates hundreds
  * of orphaned providers that nothing will ever re-attach to — the
  * round-8 cross-query poison. `unloadAll` is `private[sql]`, hence this
  * bridge in the sql package namespace (same technique as
  * [[ColumnBridge]]). Not library surface: only the bench sweep calls it.
  */
object StateBridge {
  def unloadAllStateStores(): Unit = StateStore.unloadAll()
}
