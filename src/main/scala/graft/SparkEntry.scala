package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, AuditOps, BasketOps, BizOps, BpeOps, CalibrationOps, CausalOps, ClassifierOps, CorpusStatsOps, Coverage, DistStatOps, DriftOps, CurationOps, DocOps, EmbedQualityOps, EmbeddingOps, EvalOps, EventOps, ExperimentOps, ForecastOps, FrontierOps, GraphOps, IndexOps, InferenceOps, InfoOps, LifecycleOps, ModalityOps, MonitorOps, Multimodal, OrderStatOps, OverlapOps, Pipeline, PrivacyOps, QualityGateOps, Relational, RankCorrOps, RetrievalOps, RobustOps, Scale, SequenceOps, SessionOps, SourcingOps, SpectralOps, StatsOps, StyleOps, TemporalOps, TradeOps, TrendOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator pack contributes (name, query, optional DuckDB oracle);
  * queries and oracles stay colocated in the pack so the parity contract
  * (column names, types, ordering) is reviewed in one place.
  */
object SparkEntry {

  private val packs: Seq[(String, Relational.Q, Option[String])] =
    Relational.all ++ EventOps.all ++ DocOps.all ++ EmbeddingOps.all ++ Coverage.all ++
      Advanced.all ++ Multimodal.all ++ Pipeline.all ++ CurationOps.all ++ RetrievalOps.all ++
      Scale.all ++ StatsOps.all ++ BpeOps.all ++ ClassifierOps.all ++ AuditOps.all ++
      CorpusStatsOps.all ++ IndexOps.all ++ MonitorOps.all ++ EvalOps.all ++ StyleOps.all ++
      InferenceOps.all ++ SequenceOps.all ++ GraphOps.all ++ TemporalOps.all ++ DistStatOps.all ++ DriftOps.all ++ RobustOps.all ++ PrivacyOps.all ++ ExperimentOps.all ++ EmbedQualityOps.all ++ ModalityOps.all ++ BizOps.all ++ TradeOps.all ++ RankCorrOps.all ++ LifecycleOps.all ++ ForecastOps.all ++ TrendOps.all ++ CalibrationOps.all ++ SpectralOps.all ++ BasketOps.all ++ QualityGateOps.all ++ OrderStatOps.all ++ CausalOps.all ++ InfoOps.all ++ SessionOps.all ++ OverlapOps.all ++ FrontierOps.all ++ SourcingOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    functions.registerAll(spark)
    Relational.q01(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { case (name, q, _) =>
      name -> ((s: SparkSession, d: String) => { functions.registerAll(s); q(s, d) })
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (murmur3 tokens, minhash/simhash signatures, LSH buckets) — those get
    * the driver's rows-only check plus unit-vector specs.
    */
  def oracleSql: Map[String, String] =
    packs.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
