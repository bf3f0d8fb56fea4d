package graft

/** EAGER release of localCheckpointed frames. `Dataset.unpersist()`
  * consults only the CacheManager, which does not track checkpoint RDDs —
  * so "releasing" a localCheckpoint through it is a silent no-op and the
  * blocks actually wait for the ContextCleaner's reference-tracking GC
  * (caught by WalkServeSpec's persistent-RDD census on Handle.close).
  * The checkpoint's persisted RDD sits in the released frame's plan as a
  * [[org.apache.spark.sql.execution.LogicalRDD]] leaf; unpersisting THAT
  * is the eager release. Contract: the frame is unusable afterwards —
  * exactly the close()/finally call sites this exists for.
  */
private[graft] object Release {
  def checkpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
