package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: lets specs
  * wait for ASYNC listener delivery deterministically instead of
  * sampling counters on a timer (RegistryPlanSpec's checkpoint audit —
  * r15 ADVICE flagged the fixed 3×200 ms stability heuristic as flaky
  * under host load). The QueryExecutionListener bus is an
  * ExecutionListenerBus riding the shared LiveListenerBus, so draining
  * that bus is exactly "every posted execution event has been
  * delivered". */
object GraftBusHook {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long)
      : Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
