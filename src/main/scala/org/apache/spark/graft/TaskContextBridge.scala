package org.apache.spark.graft

import org.apache.spark.TaskContext

/** Accessor for the `protected[spark]` `TaskContext.setTaskContext`.
  *
  * PipeTransform's writer/stderr threads pull the upstream Spark
  * iterator off the task thread; shuffle-reading and spilling
  * iterators call `TaskContext.get()` internally, so the task's
  * context must be installed on those threads — exactly what Spark's
  * own `PipedRDD` does from inside the spark package
  * (core/src/main/scala/org/apache/spark/rdd/PipedRDD.scala).
  */
object TaskContextBridge {
  def set(ctx: TaskContext): Unit = TaskContext.setTaskContext(ctx)
}
