package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver's testdata, paired (when ANSI-SQL-expressible) with a
  * DuckDB oracle on the same tables. Non-SQL-expressible operators get a
  * rows-only check and are additionally covered by ScalaTest specs.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    TemporalQueries.specs ++ Analytics.specs ++ PipelineQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * ReadTabletAt — "all rows of entity X as of height H" (read.go:35–178). */
  def entry(spark: SparkSession): DataFrame =
    graft.read.TemporalReads.readTabletAt(
      TemporalQueries.mutations(spark, "/root/testdata/sf0.001"), "click", 800)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.collect { case QuerySpec(n, _, Some(sql)) => n -> sql }.toMap
}
