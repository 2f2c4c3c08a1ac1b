package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All correctness-gated queries, in registration order. */
  def allQs: Seq[Q] =
    Relational.all ++ TextOps.all ++ Tokenize.all ++ HtmlOps.all ++ CleanOps.all ++
      Classify.all ++ ParaOps.all ++
      graft.llm.CorpusEtl.all ++ graft.llm.PipelineE2e.all ++
      VectorOps.all ++ Hybrid.all ++
      ScaleOps.all ++ WeatherGate.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
