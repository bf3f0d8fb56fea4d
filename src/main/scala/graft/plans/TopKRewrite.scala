package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the `row_number() OVER (PARTITION BY p ORDER BY o)
  * <= k` + drop-the-rank idiom — the way every SQL user writes per-key
  * top-k — becomes the two-phase [[TopKPerKeyPlan]] operator, eliminating
  * the Window entirely.
  *
  * Spark's own InferWindowGroupLimit (3.5+) only INSERTS a WindowGroupLimit
  * below the Window: the full-partition shuffle, per-key sort, and rank
  * materialization still run. When the rank is provably unused above the
  * filter, none of that work is needed — partial heaps bound the shuffle to
  * k rows per (key, map partition) and no sort or rank projection ever
  * happens. At 100 TB that is the difference between shuffling k·keys rows
  * and shuffling the table.
  *
  * Fires only when ALL of:
  *   - the window computes exactly one expression, a bare `row_number()`
  *     (rank()/dense_rank() admit >k ties — not heap-equivalent);
  *   - the filter is `rn <= k` / `rn < k+1` / `rn = 1` on that attribute
  *     with a literal k;
  *   - a Project above the filter drops the rank attribute (output is
  *     rank-free, so removing the Window is observationally safe);
  *   - the partition spec is non-empty (global top-k belongs to
  *     TakeOrderedAndProject, which Spark already plans well).
  *
  * Tie semantics match the window form: row_number breaks order-ties by
  * input arrival, the heap by eviction order — both deterministic only when
  * the ordering itself is total, exactly as with the window operator.
  *
  * Registered per-session via [[TopKRewrite.ensure]] (runs in the
  * "User Provided Optimizers" batch, after InferWindowGroupLimit — the
  * matcher sees through an already-inserted WindowGroupLimit) or through
  * `GraftExtensions.injectOptimizerRule` at session build.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, f @ Filter(cond, w: Window)) =>
      rewrite(projectList, cond, w).getOrElse(p)
  }

  private def rewrite(
      projectList: Seq[NamedExpression],
      cond: Expression,
      w: Window): Option[LogicalPlan] = {
    for {
      rankAttr <- rowNumberAttr(w)
      k <- limitFor(cond, rankAttr)
      if k > 0
      if w.partitionSpec.nonEmpty
      // the Project must not use the rank — its references all resolve
      // against the window's child
      childOut = w.child.outputSet
      if projectList.forall(_.references.subsetOf(childOut))
    } yield Project(
      projectList,
      TopKPerKeyPlan(w.partitionSpec, w.orderSpec, k, dropGroupLimit(w.child)))
  }

  /** The attribute of the single bare row_number() this window computes. */
  private def rowNumberAttr(w: Window): Option[Attribute] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a.toAttribute)
    case _ => None
  }

  private def limitFor(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    // k must stay > Int.MinValue: rn < MinValue would wrap k-1 to MaxValue
    // and keep every row where the un-rewritten plan returns none
    case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) && k > Int.MinValue => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  /** An InferWindowGroupLimit-inserted prefilter is subsumed by the heap. */
  private def dropGroupLimit(child: LogicalPlan): LogicalPlan = child match {
    case WindowGroupLimit(_, _, _, _, inner) => inner
    case other => other
  }

  /** Idempotent runtime registration (tests / adhoc sessions); production
    * sessions get the rule from GraftExtensions. Also ensures the strategy
    * that plans the node the rewrite produces.
    */
  def ensure(spark: SparkSession): Unit = {
    TopKPerKey.ensureStrategy(spark)
    val em = spark.experimental
    if (!em.extraOptimizations.contains(TopKRewrite))
      em.extraOptimizations = em.extraOptimizations :+ TopKRewrite
  }
}
