package org.apache.spark.graft

import org.apache.spark.TaskContext
import org.apache.spark.memory.TaskMemoryManager

/** `TaskContext.taskMemoryManager()` is `private[spark]`; this one-line
  * bridge exposes it to [[graft.plans.TopKPerGroupExec]] so the operator can
  * register its retained heap bytes with the task's memory accounting (the
  * same doorway Spark's own external operators use, just from a user jar).
  */
object TaskMemoryBridge {
  def manager(ctx: TaskContext): TaskMemoryManager = ctx.taskMemoryManager()
}
