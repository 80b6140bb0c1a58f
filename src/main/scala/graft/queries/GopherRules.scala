package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) as
  * pure scan-local column expressions over a `text` column — the SAME code
  * backs the batch report (`p_quality_gopher`, oracle-verified) and the
  * streaming gate ([[graft.streaming.StreamingAnalytics.qualityGate]]):
  * batch/stream parity by construction, not by parallel reimplementation.
  *
  * All rules are exact integer arithmetic (no float compares): word-count
  * bounds, mean word length in [3, 10] chars (3·n ≤ chars ≤ 10·n), ≥ 2
  * stopwords, most-frequent-word share ≤ 20% (5·top ≤ n). The top-word
  * count is a run-length fold over the SORTED word array — one HOF instead
  * of an explode + two groupBy shuffles, so a 100 TB (or unbounded
  * streaming) pass stays shuffle-free and needs no watermark.
  */
object GopherRules {

  /** Longest run in the sorted word array == max per-word frequency. */
  private val topWordExpr = expr(
    """aggregate(
      |  array_sort(split(text, ' ')),
      |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
      |  (acc, x) -> named_struct(
      |    'prev', x,
      |    'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
      |    'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))),
      |  acc -> acc.best)""".stripMargin)

  /** Appends the statistics (`n_words`, `n_word_chars`, `n_stop`,
    * `top_word_n`, `mean_wlen_micro`), the four rule flags (`r_*`, 0/1
    * bigint) and their conjunction `keep` to any frame with a `text`
    * column — static or streaming. */
  def withFlags(df: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    df
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("n_word_chars",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("n_stop",
        size(filter(ws, x => x.isin("the", "a"))).cast("long"))
      .withColumn("top_word_n", topWordExpr)
      .withColumn("mean_wlen_micro",
        expr("(n_word_chars * 1000000) div n_words"))
      .withColumn("r_wordcount",
        (col("n_words") >= 50 && col("n_words") <= 100000).cast("long"))
      .withColumn("r_wordlen",
        (lit(3) * col("n_words") <= col("n_word_chars") &&
          col("n_word_chars") <= lit(10) * col("n_words")).cast("long"))
      .withColumn("r_stopwords", (col("n_stop") >= 2).cast("long"))
      .withColumn("r_repetition",
        (lit(5) * col("top_word_n") <= col("n_words")).cast("long"))
      .withColumn("keep",
        (col("r_wordcount") === 1 && col("r_wordlen") === 1 &&
          col("r_stopwords") === 1 && col("r_repetition") === 1).cast("long"))
  }
}
