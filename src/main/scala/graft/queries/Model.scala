package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark DataFrame query over a testdata sf-dir plus
  * (when SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against. Determinism contract (SURVEY.md §2.B): results end
  * in a total-order ORDER BY, doubles round to 4, aggregation done in exact
  * decimal, timestamps emitted as strings.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

object Catalog {
  def all: Seq[GQuery] =
    RelationalQueries.qs ++
      AggQueries.qs ++
      WindowQueries.qs ++
      SetQueries.qs ++
      ScalarQueries.qs ++
      StreamBatchQueries.qs ++
      TextQueries.qs ++
      CorpusQueries.qs ++
      QualityQueries.qs ++
      VectorQueries.qs ++
      GraphQueries.qs ++
      SourceQueries.qs ++
      MatView.qs ++
      ZOrderLayout.qs
}
