package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator (SURVEY §2 custom-operator
  * ladder, rung (c): LogicalPlan + SparkStrategy + SparkPlan): keep the k
  * first rows per key under an ordering, WITHOUT materializing a rank for
  * every row.
  *
  * Why not `row_number().over(window) <= k`? The window form shuffles the
  * ENTIRE input on the key and then fully sorts every key group before it
  * can discard anything. This operator runs in two phases like an
  * aggregation:
  *
  *   partial (map side)  — one bounded size-k heap per key per input
  *                         partition; at most k·keys rows survive
  *   exchange            — hash on the keys (inserted by EnsureRequirements
  *                         from the final phase's required distribution)
  *   final (reduce side) — same heap pass over the k-bounded survivors
  *
  * At 100 TB the shuffle carries k rows per (key, map partition) instead of
  * the whole table — the same reason partial aggregation exists. Memory is
  * bounded by k · distinct-keys-per-partition heap entries.
  */
final case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "PartialTopKPerKey" else "FinalTopKPerKey"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions ({ it =>
      // generated comparator/projection built ON the executor — generated
      // classes don't serialize
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under the requested order: head = worst row kept, so a
      // better row replaces it in O(log k)
      val rowOrd = new Ordering[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = ord.compare(a, b)
      }
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(q) =>
            if (q.size < kk) q.enqueue(row.copy())
            else if (ord.compare(row, q.head) < 0) { q.dequeue(); q.enqueue(row.copy()) }
          case None =>
            val q = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
            q.enqueue(row.copy())
            heaps.put(key.copy(), q)
        }
      }
      heaps.iterator.flatMap(_._2.iterator)
    }, preservesPartitioning = true)
  }
}

/** Plans the logical node as partial-exec → (exchange) → final-exec. */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top-k rows per key. `orderCols` accepts `.desc`/`.asc` columns; bare
    * columns sort ascending. Include a unique tie-break column for
    * deterministic results.
    */
  def apply(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    ensureStrategy(df.sparkSession)
    import org.apache.spark.sql.graftbridge.Bridge
    val sortOrders = orderCols.map(c => Bridge.expr(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    Bridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keyCols.map(Bridge.expr), sortOrders, k, df.queryExecution.analyzed))
  }

  /** Idempotent runtime registration (tests / adhoc sessions); production
    * sessions get the strategy from GraftExtensions.
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.exists(_.isInstanceOf[TopKStrategy]))
      em.extraStrategies = em.extraStrategies :+ new TopKStrategy
  }
}
