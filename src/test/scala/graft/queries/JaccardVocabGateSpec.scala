package graft.queries

import graft.SparkSpec

/** The Jaccard prefix dictionary gate (VERDICT r7 "What's wrong" #2).
  *
  * q_dedup_jaccard ships token document-frequencies into the TokenPrefix
  * kernel as a plan constant — valid only while the vocabulary is driver-
  * collectable. Above `spark.graft.jaccard.maxKernelVocab` it must fall
  * back to the distributed explode → df-join → window prefix derivation.
  * This suite drives BOTH paths on the real corpus and asserts:
  *   1. identical results (the gate is a plan choice, not a semantics
  *      choice), and
  *   2. the plans actually differ as designed — the kernel path carries
  *      the `token_prefix` expression; the fallback must not (its window
  *      derivation is materialized behind a localCheckpoint, so the
  *      kernel constant's absence is the discriminating plan evidence).
  */
class JaccardVocabGateSpec extends SparkSpec {

  private val ConfKey = "spark.graft.jaccard.maxKernelVocab"

  private def runJaccard(): (Seq[String], String) = {
    val df = graft.SparkEntry.queries("q_dedup_jaccard")(spark, sf001)
    val plan = df.queryExecution.optimizedPlan.toString
    val rows = df.collect().map(_.mkString("|")).toSeq
    (rows, plan)
  }

  test("fallback (large-vocab) path matches kernel path row for row") {
    spark.conf.unset(ConfKey)
    val (kernelRows, kernelPlan) = runJaccard()
    assert(kernelPlan.toLowerCase.contains("token_prefix"),
      "default path should use the TokenPrefix kernel-constant plan")

    // Force the fallback: a cap below the sf0.001 vocabulary size.
    spark.conf.set(ConfKey, "3")
    try {
      val (fallbackRows, fallbackPlan) = runJaccard()
      assert(!fallbackPlan.toLowerCase.contains("token_prefix"),
        "above the cap the kernel constant must not appear in the plan")
      assert(fallbackRows == kernelRows,
        "gate is a plan choice only: both paths must emit identical rows")
      assert(kernelRows.nonEmpty)
    } finally spark.conf.unset(ConfKey)
  }
}
