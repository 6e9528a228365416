package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each entry proves. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.TpchQueries.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.TpchQueries.all ++
      operators.TpchVerbatim.all ++
      operators.PartsuppQueries.all ++
      operators.TpcdsShapedQueries.all ++
      operators.TpcdsRealQueries.all ++
      operators.SsbQueries.all ++
      operators.RelationalOps.all ++
      operators.MergeOps.all ++
      operators.TemporalOps.all ++
      operators.BloomJoin.all ++
      operators.AnalyticsOps.all ++
      operators.SpatialOps.all ++
      operators.TimeSeriesOps.all ++
      pipeline.FeatureStats.all ++
      operators.GraphOps.all ++
      operators.Resample.all ++
      functions.ExpressionQueries.all ++
      functions.EdgeCaseQueries.all ++
      operators.EventsQueries.all ++
      pipeline.Dedup.all ++
      pipeline.Similarity.all ++
      pipeline.TextAnalysis.all ++
      pipeline.Sampling.all ++
      pipeline.Multimodal.all ++
      pipeline.TextRetrieval.all ++
      pipeline.TextIndex.all ++
      pipeline.LanguageModel.all ++
      pipeline.Profiling.all ++
      pipeline.Packing.all ++
      pipeline.BpeTrainer.all ++
      pipeline.SemanticDedup.all ++
      pipeline.Clustering.all ++
      pipeline.Regression.all ++
      pipeline.HeavyHitters.all ++
      pipeline.Linkage.all

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same parquet
    * tables. Omitted keys get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.TpchQueries.oracles ++
      operators.TpchVerbatim.oracles ++
      operators.PartsuppQueries.oracles ++
      operators.TpcdsShapedQueries.oracles ++
      operators.TpcdsRealQueries.oracles ++
      operators.SsbQueries.oracles ++
      operators.RelationalOps.oracles ++
      operators.MergeOps.oracles ++
      operators.TemporalOps.oracles ++
      operators.BloomJoin.oracles ++
      operators.AnalyticsOps.oracles ++
      operators.SpatialOps.oracles ++
      operators.TimeSeriesOps.oracles ++
      pipeline.FeatureStats.oracles ++
      operators.GraphOps.oracles ++
      operators.Resample.oracles ++
      functions.ExpressionQueries.oracles ++
      functions.EdgeCaseQueries.oracles ++
      operators.EventsQueries.oracles ++
      pipeline.Dedup.oracles ++
      pipeline.Similarity.oracles ++
      pipeline.TextAnalysis.oracles ++
      pipeline.Sampling.oracles ++
      pipeline.Multimodal.oracles ++
      pipeline.TextRetrieval.oracles ++
      pipeline.TextIndex.oracles ++
      pipeline.LanguageModel.oracles ++
      pipeline.Profiling.oracles ++
      pipeline.Packing.oracles ++
      pipeline.BpeTrainer.oracles ++
      pipeline.SemanticDedup.oracles ++
      pipeline.Clustering.oracles ++
      pipeline.Regression.oracles ++
      pipeline.HeavyHitters.oracles ++
      pipeline.Linkage.oracles
}
