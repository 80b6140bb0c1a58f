package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents` and `embeddings`
  * tables: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine), similarity search (brute-force cosine top-k and an
  * LSH-bucketed variant), text analysis (language-ID, quality scoring, token
  * counting, fingerprinting) and multimodal binary-column plumbing.
  *
  * Every query is paired with a DuckDB oracle computing the *identical*
  * deterministic function, so the driver's hash-compare is exact:
  *   - All hashes are md5-derived integers: `conv(substr(md5(s),1,K),16,10)`
  *     in Spark ≡ `CAST(('0x' || substr(md5(s),1,K)) AS BIGINT)` in DuckDB.
  *   - Similarity thresholds are integer comparisons (`2*n_common >= n_union`
  *     for Jaccard ≥ 0.5), never float comparisons, except cosine where both
  *     engines provably produce bit-identical doubles (sequential
  *     left-to-right summation over 64 elements; verified in round 2).
  *
  * 100 TB posture (these run on 500–5,000 docs locally but are shaped for a
  * 1000-executor cluster):
  *   - Candidate generation is always an *equi-join on a compact blocking
  *     key* (LSH band hash, SimHash byte-band, shared shingle) — never an
  *     O(n²) cross join. The only cross join is ANN brute force, where the
  *     query side is a broadcast-able constant (top-k per probe).
  *   - Pairwise verification runs only on candidate pairs (LSH output),
  *     the standard MinHash→verify architecture for web-scale dedup.
  *   - At real scale the shingle inverted index would add a document-
  *     frequency cap on shingles (drop stop-shingles appearing in >X% of
  *     docs) — omitted here so the oracle stays textually small.
  *   - Aggregations are single-shuffle `groupBy` with map-side partial
  *     aggregation; signatures (16 minhashes, 32 simhash bit-sums) are
  *     computed as agg columns, not row explosion per bit.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Exact row count of a parquet file (or directory of parquet files)
    * read from the footers on the DRIVER — a metadata-only read, no Spark
    * job. Used by the size gates that must decide a plan shape at
    * DataFrame-construction time (GraphRank's broadcast gate, the
    * p_dedup_embed row ceiling): a `df.count()` there launches a full
    * Spark job just to build the query object, which breaks lazy
    * construction for every explain/plan-capture caller. The same number
    * a manifest-backed table serves from its stats — here the footer IS
    * the manifest. Memoized per path: the bench corpora are immutable by
    * contract (deterministic inputs, read-only mount). */
  private val parquetCountMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def parquetRowCount(s: SparkSession, path: String): Long =
    parquetCountMemo.computeIfAbsent(path, _ => {
      val conf = s.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      def leafFiles(st: org.apache.hadoop.fs.FileStatus)
          : Seq[org.apache.hadoop.fs.FileStatus] =
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(leafFiles)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Seq.empty
      leafFiles(fs.getFileStatus(root)).map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    })

  // ---------------------------------------------------------------- hashing

  /** 60-bit md5-derived hash, identical in Spark and DuckDB. (Shared with
    * the streaming weighted reservoir, which must key identically to
    * `p_sample_weighted` for the stream≡batch equality to hold.) */
  private[graft] def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit md5-derived hash (fits a positive INT range). */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def oH60(sqlExpr: String): String =
    s"CAST(('0x' || substr(md5($sqlExpr),1,15)) AS BIGINT)"
  private def oH32(sqlExpr: String): String =
    s"CAST(('0x' || substr(md5($sqlExpr),1,8)) AS BIGINT)"

  // ------------------------------------------------------------- shingling

  /** Distinct word 3-gram shingles of `text` (empty if < 3 words); one
    * compiled pass per row (see [[graft.functions.WordShingles]]). */
  private def shingles3(text: Column): Column =
    graft.functions.WordShingles.shingles(text, 3)

  /** Distinct word 4-gram shingles (for fingerprinting). */
  private def shingles4(text: Column): Column =
    graft.functions.WordShingles.shingles(text, 4)

  /** DuckDB CTE producing one row per (doc_id, sh): the same distinct word
    * 3-gram shingles. Kept textually in sync with [[shingles3]]. */
  /** One shingle-CTE builder so doc-level and source-level oracles can
    * never drift apart: `key` is the grouping column, `cte` the output
    * CTE name, `distinct` collapses cross-row repeats (needed when the
    * key is coarser than the document). */
  private def oShinglesCteFor(key: String, cte: String,
      distinct: Boolean): String =
    s"""WITH words AS (
       |  SELECT $key, string_split(text, ' ') AS ws FROM documents
       |), $cte AS (
       |  SELECT ${if (distinct) "DISTINCT " else ""}$key, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(ws) - 1, 1)),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
       |  FROM words
       |)""".stripMargin

  private val OShinglesCte: String =
    oShinglesCteFor("doc_id", "shingles", distinct = false)

  /** Exploded (doc_id, sh) shingle table. */
  private[queries] def shingleRows(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(shingles3(col("text"))).as("sh"))

  /** DuckDB CTE for the distinct (source, sh) relation — the per-SOURCE
    * shingle vocabulary (p_source_overlap). */
  private def OShinglesCteBySource: String =
    oShinglesCteFor("source", "ssh", distinct = true)

  // --------------------------------------------------------- topic lexicons

  /** Topic lexicons for p_topic_tag — tiny here, but the contract (lexicon
    * rides inside the scan; at real sizes, a broadcast trie) is the real
    * one. Names chosen alphabetical: relational < storage < streaming, so
    * the tie-break CASE reads in declaration order. */
  private def TopicRelational = Seq("join", "filter", "agg", "sort", "scan", "merge", "group")
  private def TopicStorage    = Seq("table", "key", "column", "row", "hash", "part")
  private def TopicStreaming  = Seq("stream", "window", "batch", "spark")

  private def oTopicList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")
  private def OTopicRelational = oTopicList(TopicRelational)
  private def OTopicStorage    = oTopicList(TopicStorage)
  private def OTopicStreaming  = oTopicList(TopicStreaming)

  // ------------------------------------------------------------ embeddings

  /** Codegen'd sequential left-to-right dot product in double precision —
    * the exact fold DuckDB's `list_dot_product` performs, so both engines
    * produce bit-identical doubles (see [[graft.functions.ArrayDotProduct]];
    * the interpreted `aggregate(zip_with(...))` HOF formulation measured
    * ~36µs/pair, this is a fused codegen loop). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct.dot(a, b)

  /** Embeddings extended with the precomputed L2 norm: O(n) norm
    * computations instead of recomputing both norms inside every one of the
    * O(n²)/O(candidates) pair evaluations. `a.norm * b.norm` performs the
    * identical float ops (`sqrt(dot(a,a)) * sqrt(dot(b,b))`) as the inline
    * form, so results are bit-equal. */
  private def embsN(s: SparkSession, dir: String): DataFrame =
    embs(s, dir).select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("norm"))

  /** Row ceiling for the exact O(n²) cosine yardstick `p_dedup_embed`.
    * Past it the quadratic candidate count is hopeless at any cluster
    * size (250k rows ≈ 3·10¹⁰ pairs), so the operator REFUSES and points
    * at the LSH-blocked scale path instead of launching a job that cannot
    * finish. Env-overridable (malformed values fall back). */
  def embedExactMaxRows: Long =
    parseEmbedExactMax(sys.env.get("GRAFT_EMBED_EXACT_MAX_ROWS"))

  private[graft] def parseEmbedExactMax(raw: Option[String]): Long =
    raw.flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ > 0).getOrElse(250000L)

  private[graft] def guardEmbedExact(s: SparkSession, dir: String,
      maxRows: Long = embedExactMaxRows): Unit = {
    // Footer row count, not a count() job: the guard runs at DataFrame
    // construction time (see [[parquetRowCount]]).
    val n = parquetRowCount(s, s"$dir/embeddings.parquet")
    require(n <= maxRows,
      s"p_dedup_embed is the exact O(n²) yardstick: $n vectors exceed the " +
        s"$maxRows-row guard (≈${n * n / 2} candidate pairs). Use " +
        "p_dedup_embed_lsh (sign-LSH blocking) at this scale, or raise " +
        "GRAFT_EMBED_EXACT_MAX_ROWS deliberately.")
  }

  /** Body of the norm-extended embeddings CTE (no WITH/name wrapper), so
    * oracles composing it after other CTEs share one rendering with
    * [[ONormCte]]. */
  private val ONormBody =
    """SELECT vec_id, embedding,
      |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings""".stripMargin

  /** Oracle CTE mirroring [[embsN]]. */
  private val ONormCte =
    s"""WITH e AS (
       |  $ONormBody
       |)""".stripMargin

  /** Pairwise cosine over the norm-extended tables `a`/`b`. */
  private val OCos =
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (a.norm * b.norm)"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The classifier's 64-entry weight map as VALUES rows — ONE rendering
    * shared by every oracle that scores with it, so a weight-formula or
    * bucket-count change cannot update one oracle and strand another. */
  private def oQcWeightRows: String =
    QualityClassifier.weights.zipWithIndex
      .map { case (w, b) => s"($b, $w)" }.mkString(",\n    ")

  /** Gopher per-doc statistics CTE bodies (`w` words, `top` top-word
    * count, `base` length/stopword stats) — shared by the gopher report
    * and the agreement-matrix oracle. No leading WITH. */
  private val OGopherStatsCtes: String =
    """w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), top AS (
      |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n
      |  FROM (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2)
      |  GROUP BY 1
      |), base AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |         CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_word_chars,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                              x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
      |  FROM documents
      |)""".stripMargin

  /** The gopher keep conjunction over base+top columns — the ONE
    * rendering of the rule thresholds (GopherRules.withFlags is the Spark
    * side of the same contract). */
  private val OGopherKeepCond: String =
    "n_words >= 50 AND n_words <= 100000 " +
      "AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words " +
      "AND n_stop >= 2 AND 5 * top_word_n <= n_words"

  /** Oracle mirroring p_quality_classifier: the weight map as a VALUES
    * table joined on the same md5 bucket hash. */
  private def qualityClassifierOracle: String =
    s"""WITH wt(b, w_micro) AS (VALUES
       |    $oQcWeightRows
       |), tok AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
       |  FROM documents
       |)
       |SELECT doc_id, any_value(source) AS source,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(w.w_micro) AS BIGINT) AS score_micro,
       |       CAST(CAST(sum(w.w_micro) AS BIGINT) >= 0 AS BIGINT) AS keep
       |FROM tok t
       |JOIN wt w ON w.b = ${oH32("t.word")} % 64
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle mirroring p_filter_agreement: built FROM the shared fragments
    * ([[OGopherStatsCtes]], [[OGopherKeepCond]], [[oQcWeightRows]]) that
    * also back the two single-filter oracles — the SQL-side analogue of
    * the Spark side sharing GopherRules/QualityClassifier expressions. */
  private def filterAgreementOracle: String = {
    s"""WITH wt(b, w_micro) AS (VALUES
       |    $oQcWeightRows
       |), $OGopherStatsCtes, cls AS (
       |  SELECT doc_id,
       |         CAST(CAST(sum(ww.w_micro) AS BIGINT) >= 0 AS BIGINT) AS cls_keep
       |  FROM w t JOIN wt ww ON ww.b = ${oH32("t.word")} % 64
       |  GROUP BY doc_id
       |), rules AS (
       |  SELECT doc_id, n_words,
       |         CAST($OGopherKeepCond AS BIGINT) AS rule_keep
       |  FROM base JOIN top USING (doc_id)
       |), cells AS (
       |  SELECT r.rule_keep, c.cls_keep,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(r.n_words) AS BIGINT) AS n_words
       |  FROM rules r JOIN cls c USING (doc_id) GROUP BY 1, 2
       |), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM cells)
       |SELECT rule_keep, cls_keep, n_docs, n_words,
       |       (n_docs * 1000000) // total_docs AS share_ppm
       |FROM cells, tot ORDER BY rule_keep, cls_keep""".stripMargin
  }

  /** Oracle mirroring p_tokenizer_fertility: the langid scoring CTE plus
    * the p_text_tokens subword counts, aggregated per predicted language. */
  private def tokenizerFertilityOracle: String = {
    def score(lang: String): String = {
      val lst = LangMarkers(lang).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), w -> w IN ($lst))) AS s_$lang"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, n_chars, ${score("de")}, ${score("en")}, ${score("es")},
       |         ${score("fr")}, ${score("zh")},
       |         len(string_split(text, ' ')) AS n_words,
       |         len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_subwords
       |  FROM documents
       |), tagged AS (
       |  SELECT CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
       |              WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
       |              ELSE 'zh' END AS pred_lang,
       |         n_words, n_subwords, n_chars
       |  FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
       |        FROM scored)
       |), agg AS (
       |  SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_words) AS BIGINT) AS sum_words,
       |         CAST(sum(n_subwords) AS BIGINT) AS sum_subwords,
       |         CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |  FROM tagged GROUP BY 1
       |)
       |SELECT pred_lang, n_docs, sum_words, sum_subwords,
       |       CAST(CASE WHEN sum_words > 0
       |            THEN (CAST(sum_subwords AS HUGEINT) * 1000000) // sum_words
       |            ELSE 0 END AS BIGINT) AS fertility_ppm,
       |       CAST(CASE WHEN sum_subwords > 0
       |            THEN (CAST(sum_chars AS HUGEINT) * 1000000) // sum_subwords
       |            ELSE 0 END AS BIGINT) AS chars_per_subword_ppm
       |FROM agg ORDER BY pred_lang""".stripMargin
  }

  /** Oracle mirroring p_sample_weighted: the same integer priority key
    * (`u div w`, u = md5-derived 60-bit uniform) and per-source top-k. */
  private def sampleWeightedOracle: String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
       |         ${oH60("CAST(doc_id AS VARCHAR)")} + 1 AS u
       |  FROM documents
       |), keyed AS (
       |  SELECT source, doc_id, weight,
       |         CAST(u // weight AS BIGINT) AS sample_key
       |  FROM d
       |)
       |SELECT source, doc_id, weight, sample_key, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY source ORDER BY sample_key, doc_id) AS BIGINT) AS rank
       |  FROM keyed
       |) WHERE rank <= 25 ORDER BY source, rank""".stripMargin

  /** Oracle mirroring p_cls_calibration — built from the same shared
    * fragments as [[filterAgreementOracle]]. The bucket expression floors
    * negatives explicitly (CASE on sign) because Spark's `div` truncates
    * toward zero while DuckDB's `//` floors: all divisions below run on
    * non-negative operands only, where the two agree. */
  private def clsCalibrationOracle: String =
    s"""WITH wt(b, w_micro) AS (VALUES
       |    $oQcWeightRows
       |), $OGopherStatsCtes, cls AS (
       |  SELECT doc_id, CAST(sum(ww.w_micro) AS BIGINT) AS score
       |  FROM w t JOIN wt ww ON ww.b = ${oH32("t.word")} % 64
       |  GROUP BY doc_id
       |), rules AS (
       |  SELECT doc_id, CAST($OGopherKeepCond AS BIGINT) AS rule_keep
       |  FROM base JOIN top USING (doc_id)
       |), joined AS (
       |  SELECT c.score, r.rule_keep,
       |         greatest(-4, least(3,
       |           CASE WHEN c.score >= 0 THEN c.score // 2000000
       |                ELSE -(((-c.score) + 1999999) // 2000000) END)) AS bucket
       |  FROM cls c JOIN rules r USING (doc_id)
       |)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(score) AS BIGINT) AS sum_score_micro,
       |       CAST(sum(rule_keep) AS BIGINT) AS n_rule_keep,
       |       CAST((sum(rule_keep) * 1000000) // count(*) AS BIGINT) AS rule_keep_ppm
       |FROM joined GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Random-hyperplane coefficients for LSH plane `p`: md5-derived uniform
    * doubles in [-1, 1). Each value is `h32 / 2^31 - 1` with h32 < 2^32 —
    * ≤33 significant bits, exactly representable, so the decimal literal
    * rendering round-trips bit-identically through both Spark and DuckDB. */
  private def planeCoefs(p: Int): Array[Double] =
    Array.tabulate(64) { i =>
      java.lang.Long.parseLong(md5hex(s"${p}_$i").substring(0, 8), 16)
        .toDouble / 2147483648.0 - 1.0
    }

  /** Embeddings with L2 norm and a 4-hyperplane sign bucket (16 buckets).
    * dot(vec, plane_p): plane coefficients are md5-derived but computed once
    * driver-side and shipped as array literals — the per-element md5-in-SQL
    * formulation evaluated 512k interpreted hashes per pass. */
  private def bucketedEmbs(s: SparkSession, dir: String): DataFrame = {
    val bucketExpr = (0 until 4).map { p =>
      when(dot(col("embedding"), typedlit(planeCoefs(p).toSeq)) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    embsN(s, dir).select(col("vec_id"), col("embedding"), col("norm"),
      bucketExpr.as("bucket"))
  }

  /** Oracle CTE mirroring [[bucketedEmbs]] (literals round-trip exactly —
    * see [[planeCoefs]]). */
  private def oBucketedCte: String = {
    def coefList(p: Int): String =
      planeCoefs(p).map(_.toString).mkString("[", ", ", "]")
    val bucketExpr = (0 until 4)
      .map(p => s"(CASE WHEN list_dot_product(embedding::DOUBLE[], " +
        s"${coefList(p)}::DOUBLE[]) >= 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("\n    + ")
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings
       |), e AS (
       |  SELECT vec_id, embedding, norm,
       |    $bucketExpr AS bucket
       |  FROM e0
       |)""".stripMargin
  }

  /** One integer-PageRank iteration as a CTE: scores from `prev`, damped
    * 0.85 in BIGINT (truncating //), teleport base 0.15·10⁹. Kept textually
    * identical across the three unrolled iterations by construction. */
  private def oPrIter(prev: String, name: String): String =
    s"""$name AS (
       |  SELECT n.vec_id,
       |         CAST(150000000 + (85 * COALESCE(f.inflow, 0)) // 100
       |              AS BIGINT) AS score
       |  FROM e n LEFT JOIN (
       |    SELECT k.dst, sum(p.score // od.outdeg) AS inflow
       |    FROM $prev p
       |    JOIN od ON od.src = p.vec_id
       |    JOIN knn k ON k.src = p.vec_id
       |    GROUP BY k.dst
       |  ) f ON f.dst = n.vec_id
       |)""".stripMargin

  /** PageRank iteration count — a RUNTIME parameter (`GRAFT_PAGERANK_ITERS`,
    * default 3, malformed/non-positive falls back) feeding BOTH the Spark
    * loop ([[GraphRank.pageRank]]) and the generated oracle CTE chain, so
    * the correctness gate stays green at any depth. */
  private[graft] val PrIters: Int =
    sys.env.get("GRAFT_PAGERANK_ITERS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0).getOrElse(3)

  /** Oracle mirroring p_graph_pagerank: the bucketed-embeddings CTE, the
    * p_knn_graph top-3 edge set, out/in-degrees, and [[PrIters]] chained
    * integer-PageRank iterations ([[oPrIter]] — textually identical CTEs
    * by construction). */
  private def pagerankOracle: String = {
    val iterChain = (1 to PrIters)
      .map(i => oPrIter(s"it${i - 1}", s"it$i")).mkString(",\n")
    s"""$oBucketedCte, knn AS (
       |  SELECT a_id AS src, b_id AS dst FROM (
       |    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |           row_number() OVER (PARTITION BY a.vec_id
       |             ORDER BY list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
       |                      / (a.norm * b.norm) DESC, b.vec_id) AS rank
       |    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |  ) WHERE rank <= 3
       |), od AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM knn GROUP BY src
       |), it0 AS (
       |  SELECT vec_id, CAST(1000000000 AS BIGINT) AS score FROM e
       |), $iterChain,
       |ind AS (
       |  SELECT dst, CAST(count(*) AS BIGINT) AS in_deg FROM knn GROUP BY dst
       |)
       |SELECT t.vec_id, t.score AS pr_score, COALESCE(i.in_deg, 0) AS in_deg
       |FROM it$PrIters t LEFT JOIN ind i ON i.dst = t.vec_id
       |ORDER BY pr_score DESC, vec_id LIMIT 30""".stripMargin
  }

  /** Oracle mirroring p_bitext_mine: the labeled bucket CTE + the same
    * integer margin pipeline (floor-to-micro before any sum, so every
    * aggregate is order-independent). */
  private def bitextMineOracle: String = {
    def coefList(p: Int): String =
      planeCoefs(p).map(_.toString).mkString("[", ", ", "]")
    val bucketExpr = (0 until 4)
      .map(p => s"(CASE WHEN list_dot_product(embedding::DOUBLE[], " +
        s"${coefList(p)}::DOUBLE[]) >= 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("\n    + ")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
       |    $bucketExpr AS bucket
       |  FROM embeddings
       |), cand AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |         CAST(floor(list_dot_product(a.emb, b.emb)
       |                    / (a.norm * b.norm) * 1000000) AS BIGINT) AS cos_micro
       |  FROM e a JOIN e b ON a.bucket = b.bucket
       |                   AND a.label = 0 AND b.label = 1
       |  WHERE floor(list_dot_product(a.emb, b.emb)
       |              / (a.norm * b.norm) * 1000000) > 0
       |), aa AS (
       |  SELECT a_id, CAST(sum(cos_micro) // count(*) AS BIGINT) AS avg_a
       |  FROM (SELECT *, row_number() OVER (PARTITION BY a_id
       |                                     ORDER BY cos_micro DESC, b_id) AS rn
       |        FROM cand) WHERE rn <= 4 GROUP BY 1
       |), bb AS (
       |  SELECT b_id, CAST(sum(cos_micro) // count(*) AS BIGINT) AS avg_b
       |  FROM (SELECT *, row_number() OVER (PARTITION BY b_id
       |                                     ORDER BY cos_micro DESC, a_id) AS rn
       |        FROM cand) WHERE rn <= 4 GROUP BY 1
       |), sc AS (
       |  SELECT c.a_id, c.b_id, c.cos_micro,
       |         CAST(c.cos_micro * 1000000 // ((avg_a + avg_b) // 2) AS BIGINT)
       |           AS margin_ppm
       |  FROM cand c JOIN aa USING (a_id) JOIN bb USING (b_id)
       |)
       |SELECT a_id, b_id, cos_micro, margin_ppm,
       |       CAST(margin_ppm >= 1200000 AS BIGINT) AS accepted
       |FROM (SELECT *, row_number() OVER (PARTITION BY a_id
       |                                   ORDER BY margin_ppm DESC, b_id) AS rn
       |      FROM sc)
       |WHERE rn = 1 ORDER BY a_id""".stripMargin
  }

  /** IVF coarse-quantizer centroids: `IvfK` md5-derived 64-dim vectors
    * (seed namespace disjoint from the LSH hyperplanes). Like
    * [[planeCoefs]], every coordinate is exactly representable, so the
    * literals round-trip bit-identically through both engines. A real
    * deployment trains these with k-means; the OPERATOR (assign → probe
    * nprobe lists → rank) is identical either way.
    *
    * `IvfK` is a RUNTIME parameter (`GRAFT_IVF_K`, default 8; malformed
    * or non-positive values fall back): both the Spark plans and the
    * generated DuckDB oracle SQL derive from the same value, so the
    * correctness gate stays green at any K. SemDeDup at corpus scale
    * wants K ~10⁵ — the centroid-TABLE formulation keeps plan size
    * constant as K grows; arbitrary (e.g. trained) quantizers flow
    * through [[Ivf.semanticDedup]] without recompiling anything. */
  private[graft] val IvfK: Int = parseIvfK(sys.env.get("GRAFT_IVF_K"))

  private[graft] def parseIvfK(raw: Option[String]): Int =
    raw.flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0).getOrElse(8)

  private def centroidCoefs(c: Int): Array[Double] = planeCoefs(100 + c)

  /** The first `n` md5-derived quantizer centroids (any `n` — the seed
    * family is unbounded), for specs exercising non-default K. */
  private[graft] def hashCentroidsOf(n: Int): Seq[Array[Double]] =
    (0 until n).map(centroidCoefs)

  /** The md5-derived quantizer, exposed for comparison against TRAINED
    * centroids (see [[Ivf.trainKMeans]] and the recall spec). */
  private[graft] def ivfHashCentroids: Seq[Array[Double]] =
    hashCentroidsOf(IvfK)

  /** L2 norms of the IVF centroids, computed ONCE driver-side with the
    * same sequential left-to-right fold as [[dot]] and shipped as double
    * literals — both engines consume the identical rendered value, so
    * centroid-cosine comparisons stay bit-exact. */
  private def centroidNorm(k: Int): Double = {
    val c = centroidCoefs(k)
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  /** Per-(vector, centroid) scores: 8 rows per vector from a broadcast of
    * the tiny centroid TABLE, with the dot as a codegen'd column-column
    * fold. A centroid TABLE (not K inline 64-literal expressions) is the
    * formulation that survives K = 4096: plan size stays constant as the
    * quantizer grows, and a trained-centroid refresh is a data swap, not a
    * recompile. (Cold-run cost measured identical to the literal variant —
    * the fixed cost is stage/plan overhead, not expression compilation.) */
  private def ivfScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val centroids =
      (0 until IvfK).map(k => (k, centroidCoefs(k).toSeq)).toDF("k", "cvec")
    embsN(s, dir).crossJoin(broadcast(centroids))
      .withColumn("dk", dot(col("embedding"), col("cvec")))
      .drop("cvec")
  }

  /** `vec_id → cluster`: argmax_k of the centroid dot, ties to the lowest
    * k — identical to the oracle's first-match CASE chain on bit-identical
    * doubles. */
  private def ivfAssigned(scored: DataFrame): DataFrame =
    scored.groupBy("vec_id")
      .agg(max_by(col("k"), struct(col("dk"), (-col("k")).as("nk"))).as("cluster"))

  /** MinHash permutation family: `m_j(h) = (A_j·h + B_j) mod P` over the
    * single 32-bit shingle hash. One md5 per shingle + 16 integer affine
    * maps, instead of 16 md5s per shingle. A_j ≤ 2^28 and h < 2^32 keep
    * `A·h + B < 2^61` — no 64-bit overflow on either engine (both compute
    * in BIGINT/LongType). P is the smallest prime > 2^32. Constants and
    * band construction live in [[MinHashLsh]] (shared with the streaming
    * stream-static probe). */
  private val MinhashP = MinHashLsh.P
  private val MinhashA: IndexedSeq[Long] = MinHashLsh.A
  private val MinhashB: IndexedSeq[Long] = MinHashLsh.B

  /** Verified minhash-LSH near-dup pairs `(da, db, n_common, n_union)` —
    * shared by the pair query and the clustering query. The exploded
    * shingle index is reused four times (signatures, both sides of the
    * verification join, set sizes) — persist it instead of recomputing
    * the explode+hash per consumer. Same at 100 TB: the shingle index is
    * the expensive intermediate you materialize. */
  /** Session-scoped memo for [[minhashVerifiedPairs]]: the pair query and
    * the clustering query both consume the same shingle→signature→band→
    * verify pipeline — at 100 TB that pipeline IS the job cost, so a
    * session that runs both must derive it once. The memo hands back the
    * same plan and re-persists it if an external `clearCache()` dropped
    * the blocks (storageLevel NONE ⇒ the next action would silently
    * recompute uncached). Keyed per (session, dir); weak session keys are
    * unnecessary here — sessions are process-lived in Verify/Bench. */
  private val verifiedPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[queries] def minhashVerifiedPairsShared(s: SparkSession, dir: String): DataFrame = {
    val df = verifiedPairsMemo.computeIfAbsent((s, dir),
      _ => minhashVerifiedPairs(s, dir))
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
    df
  }

  /** Session-scoped memo for the hashed shingle index `(doc_id, sh, h)` —
    * the intermediate every minhash consumer (full pair set, incremental
    * batch dedup) starts from. Same re-persist-after-clearCache contract
    * as [[minhashVerifiedPairsShared]]. */
  private val shingleIndexMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def shingleIndexShared(s: SparkSession, dir: String): DataFrame = {
    val df = shingleIndexMemo.computeIfAbsent((s, dir),
      _ => shingleRows(docs(s, dir)).withColumn("h", h32(col("sh"))))
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
    df
  }

  /** `(doc_id, band, bkey)` LSH band index over the hashed shingles: 16
    * affine minhashes folded into 4 band keys, one posexplode pass. */
  private def minhashBands(sh: DataFrame): DataFrame = MinHashLsh.bandsOf(sh)

  /** TRUE while the EXPLODED shingle index plausibly fits the session's
    * broadcast threshold. Catalyst sizes the index from the compressed
    * parquet scan it derives from, but shingling explodes a document into
    * ~one row per word — a ~50× expansion the estimate misses entirely,
    * so at corpus scale the planner happily picks a broadcast build side
    * that OOMs the driver (measured: the 6 MB 100×-probe corpus explodes
    * to a ~42M-row index; the static BroadcastHashJoin died in
    * `Not enough memory to build and broadcast`). Same driver-side
    * estimate discipline as the jaccard rep-array gate: ~12 bytes of
    * exploded index per corpus character (words ≈ chars/6; per row a
    * 3-word shingle string + doc_id + row overhead ≈ 70 B). One cheap
    * single-column scan, memoized per (session, corpus). */
  private val shingleBcMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long), java.lang.Boolean]()

  private[graft] def shingleIndexBroadcastable(s: SparkSession, dir: String): Boolean = {
    // The threshold is part of the memo key: a session that later lowers
    // autoBroadcastJoinThreshold (Probe's PROBE_BC_THRESHOLD override, a
    // service reconfiguring) must not inherit a verdict computed under
    // the old setting.
    val bcThreshold = s.sessionState.conf.autoBroadcastJoinThreshold
    shingleBcMemo.computeIfAbsent((s, dir, bcThreshold), _ =>
      bcThreshold > 0 && {
        // sum over zero rows is null — an empty corpus broadcasts trivially.
        val totalChars = Option(docs(s, dir).agg(sum(col("n_chars")))
          .collect()(0).get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
        totalChars * 12L <= bcThreshold
      })
  }

  /** Exact-Jaccard verification of candidate `(da, db)` pairs against the
    * shingle index: keeps pairs with J >= 0.5 (integer arithmetic), with
    * `n_common`/`n_union` attached. With `indexBroadcastable` false the
    * corpus-derived sides (shingle index, per-doc size table) carry a
    * `merge` hint — they grow with the corpus, so past the gate a
    * broadcast build side is never legitimate, only a misestimate. */
  private[graft] def verifyJaccard(sh: DataFrame, cands: DataFrame,
      indexBroadcastable: Boolean): DataFrame = {
    def gated(df: DataFrame): DataFrame =
      if (indexBroadcastable) df else df.hint("merge")
    val sa = gated(sh.select(col("doc_id").as("da"), col("sh")))
    val sb = gated(sh.select(col("doc_id").as("db"), col("sh")))
    val common = cands.join(sa, "da").join(sb, Seq("db", "sh"))
      .groupBy("da", "db").agg(count(lit(1)).as("n_common"))
    val sizes = gated(sh.groupBy("doc_id").agg(count(lit(1)).as("n")))
    common
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(lit(2) * col("n_common") >= col("na") + col("nb") - col("n_common"))
      .select(col("da"), col("db"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"))
  }

  private def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleIndexShared(s, dir)
    val bands = minhashBands(sh)
    val ba = bands.select(col("doc_id").as("da"), col("band"), col("bkey"))
    val bb = bands.select(col("doc_id").as("db"), col("band"), col("bkey"))
    val cands = ba.join(bb, Seq("band", "bkey")).filter(col("da") < col("db"))
      .select("da", "db").distinct()
    verifyJaccard(sh, cands, shingleIndexBroadcastable(s, dir))
  }

  // ---------------------------------------------------------------- queries

  /** Per-language marker lexicons (subset of the corpus vocabulary plus
    * canonical function words; arbitrary but fixed). Declared before `specs`
    * — the oracle builders below run during object initialization. */
  private val LangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "batch", "merge"),
    "en" -> Seq("the", "a", "data", "query", "table"),
    "es" -> Seq("el", "los", "una", "filter", "stream"),
    "fr" -> Seq("le", "les", "une", "vector", "window"),
    "zh" -> Seq("scan", "hash", "key"))

  val specs: Seq[QuerySpec] = Seq(

    // ---------------------------------------------------------------------
    // Exact dedup (hash-groupBy): per-source duplicate stats over the full
    // text hash. One shuffle; at 100 TB this is the first-pass dedup stage
    // (hash → groupBy → keep min doc_id per hash).
    QuerySpec.sql(
      "p_dedup_exact",
      """SELECT source, count(*) AS n_docs,
        |       count(DISTINCT md5(text)) AS n_distinct,
        |       count(*) - count(DISTINCT md5(text)) AS n_dupes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------------
    // Exact dedup, keeper selection: duplicate groups by 50-char text prefix
    // (the testdata has no full-text dupes at sf0.01 but does have shared
    // prefixes); keeper = min doc_id per group, as a dedup pipeline would
    // pick. Integer/string output only.
    QuerySpec.sql(
      "p_dedup_exact_keeper",
      """SELECT md5(substr(text, 1, 50)) AS grp, min(doc_id) AS keeper,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY grp""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .groupBy(md5(substring(col("text"), 1, 50)).as("grp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy("grp")
    },

    // ---------------------------------------------------------------------
    // N-gram Jaccard near-dup. Three compounding scale techniques, each
    // preserving the exact output:
    //   1. EXACT-DEDUP-FIRST: identical texts collapse to one representative
    //      (grp = md5(text)); the expensive pair join runs on reps only, and
    //      rep pairs expand back to member pairs afterwards (identical text
    //      ⇒ identical Jaccard). On a dup-heavy corpus (10× replicated
    //      sf0.1) this collapses 50k docs → 5k reps; the raw join timed out
    //      (>500 s), this runs in seconds.
    //   2. PREFIX FILTERING (AllPairs): the candidate inverted index holds
    //      only the first n − ⌈n/2⌉ + 1 shingles per doc under a global
    //      order — provably lossless at J ≥ 0.5, ~4× fewer index join rows.
    //   3. Verification = exact integer Jaccard over full shingle sets
    //      (2*common >= union ⇔ J >= 0.5) on candidates only.
    QuerySpec.sql("p_dedup_ngram_jaccard", jaccardOracle) { (s, dir) =>
      val raw = docs(s, dir)
      // Adaptive rep collapse: one cheap aggregate decides whether the
      // corpus has exact-dup texts (with no dups the collapse and the
      // expansion are identities — skip their five joins entirely) AND
      // sizes the verification join's build side, all in a single scan.
      // The gate is PURELY a performance choice — BOTH branches produce
      // the oracle result (identical texts have identical shingle sets,
      // so the un-collapsed candidate join finds the same pairs, and
      // identical empty-shingle texts pair in neither branch) — so the
      // distinct-text count can be a SKETCH: approx_count_distinct (HLL,
      // 2% rsd) ships fixed-size sketches through the exchange instead of
      // countDistinct's corpus-sized Expand + distinct shuffle (guide
      // §2.3 — at 100 TB that exchange carried every distinct digest).
      // Round 22 measured the exact form at ~0.5 s of this query's
      // ~2.3 s warm cost at sf0.1. hasDups triggers at ≥ 5% duplication
      // — comfortably past the sketch's error band; a sub-5%-dup corpus
      // runs the direct join, whose candidate cost the dup rate barely
      // inflates (the collapse exists for REPLICATED corpora, where
      // distinct/total is far below 1).
      val Array(nDocs, nGrps, totalChars) = raw
        .agg(count(lit(1)), approx_count_distinct(md5(col("text")), 0.02),
          coalesce(sum(length(col("text"))), lit(0L))).collect()
        .head.toSeq.map(_.asInstanceOf[Long]).toArray
      val hasDups = nGrps.toDouble < nDocs.toDouble * 0.95
      val d = raw.withColumn("grp", md5(col("text")))
      val members = if (hasDups) d.select(col("grp"), col("doc_id")).persist() else null
      val reps =
        if (hasDups) members.groupBy("grp").agg(min(col("doc_id")).as("doc_id"))
        else null
      val repDocs = if (hasDups) d.join(reps, Seq("grp", "doc_id")) else raw
      // Per-rep sorted 60-bit shingle-hash ARRAY (persisted): candidates
      // join on the 8-byte hash; verification is a codegen'd
      // array_intersect over the arrays (no row explosion — the
      // explode-based verification measured ~30M intermediate rows at
      // sf0.1), with the tiny rep-array table broadcast (at larger scale:
      // bucket both sides by doc_id instead). The PREFIX-FILTER index is a
      // slice of the sorted array — no window sort.
      val repArr = shingleRows(repDocs)
        .withColumn("h", h60(col("sh")))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("h"))).as("shs"), count(lit(1)).as("n"))
        .persist()
      // PPJoin candidate filters, both sound at J >= 0.5:
      //   length: J >= 0.5 forces max(|A|,|B|) <= 2*min(|A|,|B|);
      //   positional: overlap is bounded by 1 + min(|A|-posA, |B|-posB) at a
      //   shared prefix token, and J >= 0.5 needs overlap >= ceil((|A|+|B|)/3).
      val prefix = repArr
        .select(col("doc_id"), col("n"),
          posexplode(expr("slice(shs, 1, cast(n - (n + 1) div 2 + 1 as int))"))
            .as(Seq("pos0", "h")))
        .select(col("doc_id"), col("h"), (col("pos0") + 1).as("pos"), col("n"))
      val a = prefix.select(col("doc_id").as("da"), col("h"),
        col("pos").as("pa"), col("n").as("na"))
      val b = prefix.select(col("doc_id").as("db"), col("h"),
        col("pos").as("pb"), col("n").as("nb"))
      val cands = a.join(b, Seq("h")).filter(col("da") < col("db"))
        .filter(col("na") <= lit(2) * col("nb") && col("nb") <= lit(2) * col("na"))
        .filter(least(col("na") - col("pa"), col("nb") - col("pb")) + lit(1) >=
          expr("(na + nb + 2) div 3"))
        .select("da", "db").distinct()
      // SIZE-GATED verification side: the per-rep hash-array table is
      // broadcast only while its estimated bytes (~8 per shingle hash ≈
      // chars × 1.4, + per-row array overhead) fit the session's broadcast
      // threshold — one broadcast REUSED for both join sides (identical
      // exchange subtree → ReusedExchange). Past the gate — the 100 TB
      // case — the candidate pairs shuffle-join the persisted rep arrays
      // on doc_id instead: cost tracks candidates, never a driver-side
      // collect of the full corpus.
      val estArrBytes = (totalChars * 14L) / 10L + nGrps * 64L
      val bcThreshold = s.sessionState.conf.autoBroadcastJoinThreshold
      val arr =
        if (bcThreshold > 0 && estArrBytes <= bcThreshold) broadcast(repArr)
        else repArr
      val repPairs = cands
        .join(arr.as("va"), col("da") === col("va.doc_id"))
        .join(arr.as("vb"), col("db") === col("vb.doc_id"))
        // Two-pointer merge over the already-sorted hash arrays — exact
        // array_intersect count semantics without the per-pair hash-set
        // build and intersection-array materialization (the verify joins'
        // measured hot spot; see functions/SortedIntersectCount).
        .withColumn("n_common",
          graft.functions.SortedIntersectCount.count(col("va.shs"), col("vb.shs")))
        .filter(lit(2) * col("n_common") >=
          col("va.n") + col("vb.n") - col("n_common"))
        .select(col("da"), col("db"), col("n_common"),
          (col("va.n") + col("vb.n") - col("n_common")).as("n_union"))
      if (!hasDups) {
        repPairs.select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n_common"), col("n_union")).orderBy("doc_a", "doc_b")
      } else {
        // Expand rep pairs to member pairs (cross product of the groups).
        val repGrp = reps.select(col("doc_id").as("rep"), col("grp"))
        val cross = repPairs
          .join(repGrp.select(col("rep").as("da"), col("grp").as("ga")), "da")
          .join(repGrp.select(col("rep").as("db"), col("grp").as("gb")), "db")
          .join(members.select(col("grp").as("ga"), col("doc_id").as("ma")), "ga")
          .join(members.select(col("grp").as("gb"), col("doc_id").as("mb")), "gb")
          .select(least(col("ma"), col("mb")).as("doc_a"),
            greatest(col("ma"), col("mb")).as("doc_b"),
            col("n_common"), col("n_union"))
        // Within-group pairs: identical texts, J = 1 (excluded when the
        // text has no shingles — identical empty sets share nothing,
        // matching the candidate-join semantics).
        val within = members
          .join(members.select(col("grp"), col("doc_id").as("doc_b")), "grp")
          .filter(col("doc_id") < col("doc_b"))
          .join(repGrp.select(col("grp"), col("rep").as("szkey")), "grp")
          .join(repArr.select(col("doc_id").as("szkey"), col("n")), "szkey")
          .filter(col("n") >= 1)
          .select(col("doc_id").as("doc_a"), col("doc_b"),
            col("n").as("n_common"), col("n").as("n_union"))
        cross.unionByName(within).orderBy("doc_a", "doc_b")
      }
    },

    // ---------------------------------------------------------------------
    // MinHash + LSH near-dup: 16 md5-derived minhashes per doc, banded
    // 4×4; candidate pairs share a band bucket (equi-join on the band
    // hash); candidates verified by exact integer Jaccard >= 0.5. This is
    // the scale path: candidate generation cost is bounded by bucket
    // collisions, not by n².
    QuerySpec.sql("p_dedup_minhash_lsh", minhashOracle) { (s, dir) =>
      minhashVerifiedPairsShared(s, dir)
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n_common"), col("n_union"))
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------------
    // Near-dup CLUSTERING: connected components over the verified minhash
    // pairs — size-gated driver union-find with a distributed min-label-
    // propagation fallback; see DedupCluster for the full design. The
    // oracle IS the closure (DuckDB recursive CTE) — fine at oracle scale,
    // and the min-label fixpoint is unique so both agree exactly.
    QuerySpec.sql("p_dedup_cluster", dedupClusterOracle) { (s, dir) =>
      DedupCluster.clusters(s, minhashVerifiedPairsShared(s, dir).select("da", "db"))
    },

    // ---------------------------------------------------------------------
    // INCREMENTAL near-dup detection: dedup an incoming batch (the newest
    // 20% of doc_ids) against the already-ingested corpus and the batch
    // itself — the shape a continuously-fed pipeline actually runs, since
    // re-deduping 100 TB per arriving batch is not a plan. Candidate
    // generation joins the incoming docs' band keys against the FULL band
    // index, so the expensive joins are bounded by the batch: candidates =
    // batch-side band collisions, verification touches only candidate
    // pairs. At scale the existing corpus's shingle/band index is a
    // materialized table written at ingest (the store's manifest tables);
    // here both sides derive from one parquet scan because the bench
    // context ships no pre-built index — the JOIN SHAPE (small incoming ⋈
    // corpus index on the band key) is what carries to 100 TB, and the
    // incoming band side is broadcastable when the batch is small.
    // `vs_existing` classifies each hit: duplicate of the old corpus vs
    // intra-batch duplicate. Output ≡ the full pair set filtered to
    // incoming doc_b — driver-verified against exactly that oracle.
    QuerySpec.sql("p_dedup_incremental", minhashIncrementalOracle) { (s, dir) =>
      val sh = shingleIndexShared(s, dir)
      val bands = minhashBands(sh)
      val split = docs(s, dir)
        .agg(expr("(max(doc_id) * 4) div 5").as("split_id"))
      val ba = bands.select(col("doc_id").as("da"), col("band"), col("bkey"))
      val bb = bands.crossJoin(broadcast(split))
        .filter(col("doc_id") > col("split_id"))
        .select(col("doc_id").as("db"), col("band"), col("bkey"))
      val cands = ba.join(bb, Seq("band", "bkey")).filter(col("da") < col("db"))
        .select("da", "db").distinct()
      verifyJaccard(sh, cands, shingleIndexBroadcastable(s, dir))
        .crossJoin(broadcast(split))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n_common"), col("n_union"),
          (col("da") <= col("split_id")).as("vs_existing"))
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------------
    // Cross-source duplication matrix: which sources (domains) duplicate
    // into which — the report that decides which crawl feeds to cut. Pure
    // analytics over the ALREADY-verified minhash pairs (shared memo —
    // the corpus-wide candidate join is not re-paid): two doc_id→source
    // equi-joins + one map-side-combined count to #source-pairs rows.
    // Build-side choice stays with AQE on purpose: the source lookup is
    // corpus-sized and a dup-heavy corpus inflates the pair side, so
    // neither is universally broadcastable — forcing either hint is
    // wrong at some corpus shape. Pair sources are ordered
    // (src_a <= src_b) so the matrix is triangular and deterministic.
    QuerySpec.sql(
      "p_dedup_source_matrix",
      s"""$minhashVerifiedCtes
         |SELECT least(da_src, db_src) AS src_a,
         |       greatest(da_src, db_src) AS src_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM (
         |  SELECT a.source AS da_src, b.source AS db_src
         |  FROM verified v
         |  JOIN documents a ON a.doc_id = v.da
         |  JOIN documents b ON b.doc_id = v.db
         |)
         |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      minhashVerifiedPairsShared(s, dir)
        .join(src.select(col("doc_id").as("da"), col("source").as("da_src")), "da")
        .join(src.select(col("doc_id").as("db"), col("source").as("db_src")), "db")
        .select(least(col("da_src"), col("db_src")).as("src_a"),
          greatest(col("da_src"), col("db_src")).as("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("src_a", "src_b")
    },

    // ---------------------------------------------------------------------
    // SimHash near-dup: 32-bit simhash over shingle hashes (bit-majority),
    // byte-banded for blocking (hamming <= 3 ⇒ at least one of 4 bytes
    // equal, by pigeonhole), verified with bit_count(xor) <= 3.
    QuerySpec.sql("p_dedup_simhash", simhashOracle) { (s, dir) =>
      val sh = shingleRows(docs(s, dir))
        .withColumn("h", h32(col("sh")))
      val bitSums = (0 until 32).map { i =>
        sum(expr(s"((h div ${1L << i}) % 2) * 2 - 1")).as(s"b$i")
      }
      val sums = sh.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val simhashExpr = (0 until 32)
        .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      // Persist the tiny per-doc simhash table: both join sides reuse it,
      // and banding is one posexplode pass (not a 4-way recomputing union).
      val sim = sums.select(col("doc_id"), expr(simhashExpr).as("simhash")).persist()
      val bandCols = (0 until 4).map(k => expr(s"(simhash div ${1L << (8 * k)}) % 256"))
      val banded = sim.select(col("doc_id"), col("simhash"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
      val ba = banded.select(col("doc_id").as("da"), col("simhash").as("ha"),
        col("band"), col("bkey"))
      val bb = banded.select(col("doc_id").as("db"), col("simhash").as("hb"),
        col("band"), col("bkey"))
      // Hamming filter BEFORE the distinct: a pair can collide in up to 4
      // bands, so the dedup exchange would otherwise carry every candidate
      // pair (~208k at sf0.1); filtering first shrinks it to the matches
      // (~hundreds). Catalyst does not push a filter through Deduplicate on
      // its own — measured 1.0 s → 0.75 s warm at sf0.1.
      ba.join(bb, Seq("band", "bkey")).filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------------
    // Edit-distance fuzzy near-dup: the dedup family member the
    // shingle/signature operators miss — character-LEVEL corruption
    // (OCR noise, mojibake, diff-sized whitespace runs) breaks every
    // 3-gram it touches, but stays cheap under Levenshtein. Classic
    // blocked record-linkage shape: candidates from an equi-join on
    // (word-count bucket, 8-char prefix) — a block key a ≤ τ edit
    // never leaves unless it hits the first 8 chars or crosses the
    // 10-word bucket edge, the standard stated blocking trade (same
    // epistemic status as LSH banding) — then exact unit-cost
    // Levenshtein over the 80-char heads, ≤ τ = 12 kept. Both engines
    // implement textbook Levenshtein; the corpus is ASCII so code-unit
    // vs code-point counting cannot diverge. Shape at 100 TB: pair
    // cost tracks block collisions, never n²; the DP is 80×80 ints
    // per candidate inside codegen.
    QuerySpec.sql(
      "p_dedup_fuzzy",
      """WITH d AS (
        |  SELECT doc_id,
        |         len(string_split(text, ' ')) // 10 AS wbucket,
        |         substr(text, 1, 8) AS blk,
        |         substr(text, 1, 80) AS head
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
        |FROM d a JOIN d b
        |  ON a.wbucket = b.wbucket AND a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 12
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        expr("size(split(text, ' ')) div 10").cast("long").as("wbucket"),
        substring(col("text"), 1, 8).as("blk"),
        substring(col("text"), 1, 80).as("head"))
      // Distance is a function of the HEAD, so identical heads collapse to
      // one representative before the DP pays anything (the jaccard
      // exact-dedup-first move): Levenshtein runs once per DISTINCT head
      // pair; member pairs expand back through equi-joins. On a dup-heavy
      // corpus this is the difference between collision-quadratic DP cost
      // and output-bounded expansion (38 s → ~4 s on the 10× worst case).
      val reps = d.groupBy("wbucket", "blk", "head")
        .agg(min(col("doc_id")).as("rep")).persist()
      val members = d.join(reps, Seq("wbucket", "blk", "head"))
        .select(col("doc_id"), col("rep"))
      // Same head ⇒ distance 0: every within-group pair, no DP.
      val within = members.select(col("rep"), col("doc_id").as("doc_a"))
        .join(members.select(col("rep"), col("doc_id").as("doc_b")), "rep")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), lit(0L).as("edit_dist"))
      // Distinct heads in a block: one DP per rep pair, then expand.
      val repPairs = reps.select(col("wbucket"), col("blk"),
          col("head").as("head_a"), col("rep").as("rep_a"))
        .join(reps.select(col("wbucket"), col("blk"),
          col("head").as("head_b"), col("rep").as("rep_b")),
          Seq("wbucket", "blk"))
        .filter(col("head_a") < col("head_b"))
        .select(col("rep_a"), col("rep_b"),
          levenshtein(col("head_a"), col("head_b")).cast("long")
            .as("edit_dist"))
        .filter(col("edit_dist") <= 12)
      val cross = repPairs
        .join(members.select(col("rep").as("rep_a"), col("doc_id").as("ia")),
          "rep_a")
        .join(members.select(col("rep").as("rep_b"), col("doc_id").as("ib")),
          "rep_b")
        .select(least(col("ia"), col("ib")).as("doc_a"),
          greatest(col("ia"), col("ib")).as("doc_b"), col("edit_dist"))
      within.unionByName(cross).orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------------
    // Embedding-cosine near-dup: pairs with cosine >= 0.45. Both engines
    // compute bit-identical doubles (sequential codegen fold), so the
    // threshold and the emitted floor(cos*1e6) are exact. Norms are
    // precomputed per vector (O(n), not O(n²)); the pair loop is one fused
    // codegen dot per pair. Blocking: at this scale a self-join suffices;
    // the 100 TB path is p_ann_lsh's bucketing.
    QuerySpec.sql(
      "p_dedup_embed",
      s"""$ONormCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       CAST(floor(($OCos) * 1000000) AS BIGINT) AS score_micro
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ($OCos) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      guardEmbedExact(s, dir)
      val e = embsN(s, dir)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("norm").as("na"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("norm").as("nb"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .filter(cos >= 0.45)
        .select(col("vec_a"), col("vec_b"),
          floor(cos * 1000000).cast("long").as("score_micro"))
        .orderBy("vec_a", "vec_b")
    },

    // ---------------------------------------------------------------------
    // Embedding-cosine near-dup, LSH-blocked (the 100 TB path for the query
    // above): candidates are same-bucket pairs under the 4-hyperplane sign
    // LSH — an equi-join on the bucket key whose cost tracks bucket
    // collisions (~n²/16 here, and n²/2^planes in general), not n². Sign-LSH
    // is angle-preserving, so high-cosine pairs collide with high
    // probability; the oracle computes the identical candidate set, so the
    // check is exact.
    QuerySpec.sql(
      "p_dedup_embed_lsh",
      s"""$oBucketedCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       CAST(floor(($OCos) * 1000000) AS BIGINT) AS score_micro
         |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ($OCos) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      val e = bucketedEmbs(s, dir)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("norm").as("na"), col("bucket"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("norm").as("nb"), col("bucket"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
        .filter(cos >= 0.45)
        .select(col("vec_a"), col("vec_b"),
          floor(cos * 1000000).cast("long").as("score_micro"))
        .orderBy("vec_a", "vec_b")
    },

    // ---------------------------------------------------------------------
    // Semantic dedup (the SemDeDup shape — Abbas et al. 2023,
    // arXiv:2303.09540): cluster the corpus with the IVF coarse quantizer,
    // then prune, within each cluster, every vector that has a lower-id
    // neighbor at cosine >= 0.45 (greedy keep-first — deterministic, no
    // RNG). Per pruned doc: its cluster, the keeper (min such neighbor)
    // and how many lower near-dup neighbors it had. 100 TB posture: the
    // pairwise work is confined to within-cluster join partitions — cost
    // tracks sum(|cluster|²) controlled by the quantizer's K, never
    // corpus n²; the assignment pass is p_ann_ivf's broadcast
    // centroid-table scan. (A deployment trains the centroids — see
    // Ivf.trainKMeans; the operator is unchanged.)
    QuerySpec.sql("p_dedup_semantic", dedupSemanticOracle) { (s, dir) =>
      Ivf.semanticPrune(ivfScored(s, dir).persist(), 0.45)
    },

    // ---------------------------------------------------------------------
    // Embedding outlier report (the prototypicality metric of
    // data-pruning work, e.g. Sorscher et al. 2022, arXiv:2206.14486 —
    // SemDeDup's complement): per vector, its best coarse-centroid
    // alignment (cosine to the nearest IVF centroid); the corpus's
    // BOTTOM-30 — vectors far from every prototype — are the outlier
    // candidates a curation pass reviews (mislabeled, off-distribution,
    // or novel). Reuses the broadcast centroid-table scoring pass;
    // the global bottom-k plans as TakeOrderedAndProject (per-partition
    // partial top-k, never a corpus sort). Ties break on vec_id so the
    // oracle compare is exact; the cosine is floor-scaled to micro only
    // AFTER the bit-identical double comparison.
    QuerySpec.sql("p_embed_outliers", embedOutliersOracle) { (s, dir) =>
      val scored = ivfScored(s, dir)
      val cnorms = typedlit((0 until IvfK).map(k => k -> centroidNorm(k)).toMap)
      val wc = Window.partitionBy("vec_id").orderBy(col("dk").desc, col("k"))
      scored
        .withColumn("crank", row_number().over(wc))
        .filter(col("crank") === 1)
        .select(col("vec_id"), col("k").as("cluster"),
          (col("dk") / (col("norm") * element_at(cnorms, col("k")))).as("cos"))
        .orderBy(col("cos").asc, col("vec_id"))
        .limit(30)
        .select(col("vec_id"), col("cluster"),
          floor(col("cos") * 1000000).cast("long").as("align_micro"))
    },

    // ---------------------------------------------------------------------
    // ANN brute force: cosine top-5 per probe vector (vec_id < 20). The
    // probe side is tiny and broadcast; the big side is scanned once —
    // the right baseline plan at any scale.
    QuerySpec.sql(
      "p_ann_topk",
      s"""$ONormCte
         |SELECT query_id, neighbor_id, rank, score_micro FROM (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY a.vec_id
         |                            ORDER BY ($OCos) DESC, b.vec_id) AS rank,
         |         CAST(floor(($OCos) * 1000000) AS BIGINT) AS score_micro
         |  FROM e a JOIN e b ON a.vec_id < 20 AND b.vec_id <> a.vec_id
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = embsN(s, dir)
      val probes = broadcast(
        e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
            col("norm").as("na")))
      val base = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
        col("norm").as("nb"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      probes.join(base, col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          floor(col("cos") * 1000000).cast("long").as("score_micro"))
        .orderBy("query_id", "rank")
    },

    // ---------------------------------------------------------------------
    // ANN, LSH-bucketed (the scale path): 4 md5-derived random hyperplanes
    // → 16 sign buckets; probes search only their own bucket. Bucket
    // assignment is an equi-join key, so at 100 TB this is a co-partitioned
    // join instead of a scan per probe.
    QuerySpec.sql("p_ann_lsh", annLshOracle) { (s, dir) =>
      val bucketed = bucketedEmbs(s, dir)
      val probes = bucketed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
          col("norm").as("na"), col("bucket"))
      val base = bucketed
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
          col("norm").as("nb"), col("bucket"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(probes).join(base, Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          floor(col("cos") * 1000000).cast("long").as("score_micro"))
        .orderBy("query_id", "rank")
    },

    // ---------------------------------------------------------------------
    // Corpus kNN graph — EVERY vector gets its top-3 in-bucket
    // neighbors, not just a probe set: the similarity graph that
    // graph-based curation consumes (SemDeDup variants prune on it,
    // near-dup clustering walks it, graph-density sampling weights by
    // it). Same sign-LSH candidate plan as p_ann_lsh but symmetric:
    // a co-partitioned bucket self-join (NO broadcast — both sides are
    // the corpus), so at 100 TB it's one shuffle on the bucket key with
    // cost tracking bucket collisions. The per-vector top-3 is a
    // rank-limited window: Spark's WindowGroupLimit caps every map
    // task's output at k per vector BEFORE the window exchange (the
    // same skew-immune shape as p_source_quota).
    QuerySpec.sql(
      "p_knn_graph",
      s"""$oBucketedCte
         |SELECT a_id, b_id, rank, score_micro FROM (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |         CAST(row_number() OVER (PARTITION BY a.vec_id
         |           ORDER BY list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         |                    / (a.norm * b.norm) DESC, b.vec_id)
         |              AS BIGINT) AS rank,
         |         CAST(floor(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         |                    / (a.norm * b.norm) * 1000000) AS BIGINT) AS score_micro
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |) WHERE rank <= 3 ORDER BY a_id, rank""".stripMargin) { (s, dir) =>
      val bucketed = bucketedEmbs(s, dir)
      val a = bucketed.select(col("vec_id").as("a_id"),
        col("embedding").as("ea"), col("norm").as("na"), col("bucket"))
      val b = bucketed.select(col("vec_id").as("b_id"),
        col("embedding").as("eb"), col("norm").as("nb"), col("bucket"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
      a.join(b, Seq("bucket"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("a_id"), col("b_id"), col("rank"),
          floor(col("cos") * 1000000).cast("long").as("score_micro"))
        .orderBy("a_id", "rank")
    },

    // ---------------------------------------------------------------------
    // Contrastive triplet generation — the training-set materializer for
    // embedding models (anchor, hardest positive, hardest negative):
    // per anchor, its most-similar SAME-label and most-similar
    // DIFFERENT-label in-bucket neighbor; the margin (pos − neg) is the
    // triplet-loss signal, and near-zero/negative margins are exactly
    // the triplets that move a model. Anchors missing either side are
    // dropped (no degenerate triplets). Plan: ONE bucket self-join and
    // ONE groupBy with two FILTERed max_by aggregates — both argmaxes
    // ride the same map-side combine; ordering is on the floored micro
    // score with ties to the lower id, so both engines rank
    // identically. 100 TB posture: candidates are bucket-collision-
    // bounded (the kNN-graph law), the aggregate is one shuffle of
    // one row per anchor.
    QuerySpec.sql(
      "p_contrastive_triplets",
      s"""$oBucketedCte, lab AS (
         |  SELECT e.vec_id, e.embedding, e.norm, e.bucket, b.label
         |  FROM e JOIN embeddings b USING (vec_id)
         |), cand AS (
         |  SELECT a.vec_id AS anchor_id, b.vec_id AS b_id,
         |         a.label AS la, b.label AS lb,
         |         CAST(floor(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         |                    / (a.norm * b.norm) * 1000000) AS BIGINT) AS cm
         |  FROM lab a JOIN lab b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |), pos AS (
         |  SELECT anchor_id, b_id AS pos_id, cm AS pos_micro,
         |         row_number() OVER (PARTITION BY anchor_id
         |                            ORDER BY cm DESC, b_id) AS rn
         |  FROM cand WHERE la = lb
         |), neg AS (
         |  SELECT anchor_id, b_id AS neg_id, cm AS neg_micro,
         |         row_number() OVER (PARTITION BY anchor_id
         |                            ORDER BY cm DESC, b_id) AS rn
         |  FROM cand WHERE la <> lb
         |)
         |SELECT anchor_id, pos_id, pos_micro, neg_id, neg_micro,
         |       pos_micro - neg_micro AS margin_micro
         |FROM pos JOIN neg USING (anchor_id)
         |WHERE pos.rn = 1 AND neg.rn = 1
         |ORDER BY anchor_id""".stripMargin) { (s, dir) =>
      val labels = embs(s, dir).select(col("vec_id"), col("label"))
      val lab = bucketedEmbs(s, dir).join(labels, "vec_id")
      val a = lab.select(col("vec_id").as("anchor_id"), col("embedding").as("ea"),
        col("norm").as("na"), col("bucket"), col("label").as("la"))
      val b = lab.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("norm").as("nb"), col("bucket"), col("label").as("lb"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      a.join(b, Seq("bucket"))
        .filter(col("anchor_id") =!= col("b_id"))
        .select(col("anchor_id"), col("b_id"), col("la"), col("lb"),
          floor(cos * 1000000).cast("long").as("cm"))
        .groupBy("anchor_id")
        .agg(
          expr("max_by(b_id, struct(cm, -b_id)) FILTER (WHERE la = lb)")
            .as("pos_id"),
          expr("max(cm) FILTER (WHERE la = lb)").as("pos_micro"),
          expr("max_by(b_id, struct(cm, -b_id)) FILTER (WHERE la <> lb)")
            .as("neg_id"),
          expr("max(cm) FILTER (WHERE la <> lb)").as("neg_micro"))
        .filter(col("pos_id").isNotNull && col("neg_id").isNotNull)
        .select(col("anchor_id"), col("pos_id"), col("pos_micro"),
          col("neg_id"), col("neg_micro"),
          (col("pos_micro") - col("neg_micro")).as("margin_micro"))
        .orderBy("anchor_id")
    },

    // ---------------------------------------------------------------------
    // Hard-negative mining (contrastive-training data op): per probe, the
    // top-3 most-similar vectors with a DIFFERENT label — the negatives
    // that actually move an embedding model. Same LSH-bucketed candidate
    // plan as p_ann_lsh (broadcast probes ⋈ bucket) with the label
    // inequality pushed into the join filter, so candidates are pruned
    // before the cosine is evaluated; labels ride along from one extra
    // id equi-join against the (narrow) embeddings projection.
    QuerySpec.sql("p_ann_hard_negatives", annHardNegativesOracle) { (s, dir) =>
      val labels = embs(s, dir).select(col("vec_id"), col("label"))
      val bucketed = bucketedEmbs(s, dir).join(labels, "vec_id")
      val probes = bucketed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
          col("norm").as("na"), col("bucket"), col("label").as("query_label"))
      val base = bucketed
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
          col("norm").as("nb"), col("bucket"), col("label").as("neighbor_label"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(probes).join(base, Seq("bucket"))
        .filter(col("neighbor_label") =!= col("query_label"))
        .select(col("query_id"), col("query_label"), col("neighbor_id"),
          col("neighbor_label"), cos.as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("query_label"), col("neighbor_id"),
          col("neighbor_label"), col("rank"),
          floor(col("cos") * 1000000).cast("long").as("score_micro"))
        .orderBy("query_id", "rank")
    },

    // ---------------------------------------------------------------------
    // Margin-based cross-source pair mining (Artetxe & Schwenk 2019,
    // arXiv:1811.01136 — the bitext-mining criterion behind CCMatrix/
    // NLLB's parallel-corpus harvesting): a raw cosine cutoff over-mines
    // dense neighborhoods and under-mines sparse ones, so each candidate
    // pair's cosine is NORMALIZED by the mean similarity of both
    // endpoints' neighborhoods — accept only pairs that stand OUT of
    // their neighborhoods (margin ≥ 1.2). Label 0 = source side, label
    // 1 = target side. Candidates come from the 4-hyperplane sign-LSH
    // bucket equi-join (each vector has ONE 4-bit bucket, so pairs are
    // unique by construction — no distinct needed); neighborhood means
    // are top-4 folds over each endpoint's candidates. Exactness: every
    // cosine is floored to integer micro BEFORE any sum (the PQ trick),
    // so aggregates are order-independent and the margin ratio is pure
    // integer arithmetic on positives. 100 TB posture: candidate
    // generation is the bucket equi-join (cost tracks collisions, not
    // |A|×|B|); the two neighborhood windows and the final best-per-a
    // window are all candidate-bounded shuffles; nothing depends on a
    // broadcast.
    QuerySpec.sql("p_bitext_mine", bitextMineOracle) { (s, dir) =>
      val labels = embs(s, dir).select(col("vec_id"), col("label"))
      val bucketed = bucketedEmbs(s, dir).join(labels, "vec_id")
      val a = bucketed.filter(col("label") === 0)
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"),
          col("norm").as("na"), col("bucket"))
      val b = bucketed.filter(col("label") === 1)
        .select(col("vec_id").as("b_id"), col("embedding").as("eb"),
          col("norm").as("nb"), col("bucket"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val cand = a.join(b, Seq("bucket"))
        .select(col("a_id"), col("b_id"),
          floor(cos * 1000000).cast("long").as("cos_micro"))
        .filter(col("cos_micro") > 0)
        .persist()
      val wa = Window.partitionBy("a_id").orderBy(col("cos_micro").desc, col("b_id"))
      val wb = Window.partitionBy("b_id").orderBy(col("cos_micro").desc, col("a_id"))
      val avgA = cand.withColumn("rn", row_number().over(wa)).filter(col("rn") <= 4)
        .groupBy("a_id")
        .agg(expr("CAST(sum(cos_micro) div count(1) AS BIGINT)").as("avg_a"))
      val avgB = cand.withColumn("rn", row_number().over(wb)).filter(col("rn") <= 4)
        .groupBy("b_id")
        .agg(expr("CAST(sum(cos_micro) div count(1) AS BIGINT)").as("avg_b"))
      val wBest = Window.partitionBy("a_id")
        .orderBy(col("margin_ppm").desc, col("b_id"))
      cand.join(avgA, "a_id").join(avgB, "b_id")
        .withColumn("margin_ppm",
          expr("CAST(cos_micro * 1000000 div ((avg_a + avg_b) div 2) AS BIGINT)"))
        .withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("a_id"), col("b_id"), col("cos_micro"), col("margin_ppm"),
          (col("margin_ppm") >= 1200000L).cast("long").as("accepted"))
        .orderBy("a_id")
    },

    // ---------------------------------------------------------------------
    // ANN, IVF-style (inverted-file coarse quantization — the other
    // canonical 100 TB similarity-search layout): every base vector is
    // assigned to its nearest of 8 coarse centroids (argmax of dot, ties
    // to the lowest index); a probe searches only its `nprobe = 2` nearest
    // centroid lists. At scale the base table is PARTITIONED BY cluster,
    // so a probe batch is a broadcast join against 2/8 of the data per
    // probe — cost tracks nprobe/K, not corpus size. Centroids here are
    // md5-derived literals (a deployment would k-means them; the operator
    // is unchanged).
    QuerySpec.sql("p_ann_ivf", annIvfOracle) { (s, dir) =>
      // The scored table feeds both the base assignment and the probe
      // ranking — persist the one cheap intermediate instead of scoring
      // the corpus twice.
      val scored = ivfScored(s, dir).persist()
      val assigned = ivfAssigned(scored)
        .join(scored.filter(col("k") === 0).select("vec_id", "embedding", "norm"),
          "vec_id")
      // Probes rank ALL centroids and keep the nprobe = 2 nearest.
      val wc = Window.partitionBy("vec_id").orderBy(col("dk").desc, col("k"))
      val probeClusters = scored.filter(col("vec_id") < 20)
        .withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= 2)
        .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
          col("norm").as("na"), col("k").as("cluster"))
      val base = assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("eb"), col("norm").as("nb"), col("cluster"))
      val cos = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(probeClusters).join(base, Seq("cluster"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          floor(col("cos") * 1000000).cast("long").as("score_micro"))
        .orderBy("query_id", "rank")
    },

    // ---------------------------------------------------------------------
    // Cross-modal join: text metadata × embedding cluster (the IVF coarse
    // quantizer doubles as a corpus clustering). Per (lang, cluster):
    // document count and total chars — the "how does my corpus distribute
    // over embedding space" report every curation pipeline runs. One
    // equi-join (doc_id = vec_id) + one groupBy; at 100 TB both sides
    // shuffle on the id (or the assigned table is bucketed by id and the
    // join is co-located).
    QuerySpec.sql("p_text_embed_join", textEmbedJoinOracle) { (s, dir) =>
      docs(s, dir)
        .join(ivfAssigned(ivfScored(s, dir)), col("doc_id") === col("vec_id"))
        .groupBy("lang", "cluster")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc_id"))
        .orderBy("lang", "cluster")
    },

    // ---------------------------------------------------------------------
    // Token counting: whitespace tokens, alphabetic regex tokens, and a
    // BPE-ish subword proxy (runs of <=4 letters), all codegen'd scalar
    // functions on the scan — no shuffle except the final sort.
    QuerySpec.sql(
      "p_text_tokens",
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
        |       len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_subword_tokens,
        |       n_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long")
            .as("n_alpha_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0))).cast("long")
            .as("n_subword_tokens"),
          col("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Quality scoring: integer word/stopword statistics + a rule-based
    // quality bucket (all integer comparisons — deterministic).
    QuerySpec.sql(
      "p_text_quality",
      """SELECT doc_id, n_words, n_stop, sum_word_chars,
        |  CASE WHEN n_words >= 60 AND n_stop * 10 <= n_words THEN 'high'
        |       WHEN n_words >= 30 THEN 'medium' ELSE 'low' END AS quality
        |FROM (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS n_stop,
        |    len(replace(text, ' ', '')) AS sum_word_chars
        |  FROM documents
        |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val ws = split(col("text"), " ")
      docs(s, dir)
        .select(col("doc_id"),
          size(ws).cast("long").as("n_words"),
          size(filter(ws, w => w.isin("the", "a"))).cast("long").as("n_stop"),
          length(regexp_replace(col("text"), " ", "")).cast("long").as("sum_word_chars"))
        .withColumn("quality",
          when(col("n_words") >= 60 && col("n_stop") * 10 <= col("n_words"), "high")
            .when(col("n_words") >= 30, "medium")
            .otherwise("low"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Gopher-style quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1),
    // restated in exact integer arithmetic: word-count bounds, mean word
    // length in [3, 10] chars (as 3·n ≤ chars ≤ 10·n), ≥ 2 stopwords, and
    // the most-frequent-word share ≤ 20% (as 5·top ≤ n). The top-word
    // count is a run-length fold over the SORTED word array — one HOF on
    // the scan instead of an explode + two groupBy shuffles, so the whole
    // report is scan-local: the 100 TB plan has no shuffle at all (the
    // orderBy exists only for the deterministic oracle compare).
    QuerySpec.sql(
      "p_quality_gopher",
      s"""WITH $OGopherStatsCtes
         |SELECT doc_id, n_words, n_stop, top_word_n,
         |       (n_word_chars * 1000000) // n_words AS mean_wlen_micro,
         |       CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT) AS r_wordcount,
         |       CAST(3 * n_words <= n_word_chars
         |            AND n_word_chars <= 10 * n_words AS BIGINT) AS r_wordlen,
         |       CAST(n_stop >= 2 AS BIGINT) AS r_stopwords,
         |       CAST(5 * top_word_n <= n_words AS BIGINT) AS r_repetition,
         |       CAST($OGopherKeepCond AS BIGINT) AS keep
         |FROM base JOIN top USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Rule expressions live in GopherRules — the identical code backs
      // the streaming qualityGate, so this oracle verifies both.
      GopherRules.withFlags(docs(s, dir))
        .select("doc_id", "n_words", "n_stop", "top_word_n",
          "mean_wlen_micro", "r_wordcount", "r_wordlen", "r_stopwords",
          "r_repetition", "keep")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Hashed linear quality classifier — the fastText shape (Joulin et al.
    // 2016, arXiv:1607.01759) that GPT-3/CCNet-style pipelines deploy as
    // their learned quality filter: words hash into `QcBuckets` feature
    // buckets, a linear model scores the bag, sign decides keep/drop.
    // Weights here are md5-derived stand-ins in exact integer micro-units
    // (a TRAINED model = swap the 64-entry literal map — the same
    // trained-model-as-data reasoning as the PQ codebook and IVF
    // centroids). 100 TB posture: the model rides inside the scan as a
    // map literal — scoring is one HOF lambda per row, ZERO shuffle
    // (the orderBy exists only for the deterministic oracle compare);
    // classifier application is embarrassingly parallel, which is why
    // production pipelines run it first. A real fastText model also
    // hashes word bigrams — same plan, two transform legs.
    // Scoring expression lives in QualityClassifier — the identical code
    // backs the streaming front door's classifier stage, so this oracle
    // verifies both.
    QuerySpec.sql("p_quality_classifier", qualityClassifierOracle) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          QualityClassifier.scoreMicro(col("text")).as("score_micro"))
        .withColumn("keep", (col("score_micro") >= 0L).cast("long"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Quality-filter agreement matrix: the 2×2 confusion table between the
    // rule-based gate (Gopher) and the learned classifier — the report a
    // pipeline designer reads before choosing (or chaining) filters:
    // off-diagonal cells are exactly the documents where swapping filters
    // changes the corpus. Both verdicts come from the SAME shared
    // expressions that back the oracle-verified single-filter queries and
    // the streaming gate (GopherRules / QualityClassifier), so this
    // operator adds no new semantics to trust — only the join of two
    // proven ones. Shape at 100 TB: both verdicts are scan-local column
    // expressions on the same pass over the corpus (no join between the
    // two filters — they compute side by side on each row), then ONE
    // map-side-combined aggregate to ≤ 4 cells; the share arithmetic runs
    // on the 4-row frame against its broadcast total.
    QuerySpec.sql("p_filter_agreement", filterAgreementOracle) { (s, dir) =>
      val flagged = QualityClassifier.withScore(GopherRules.withFlags(docs(s, dir)))
      val cells = flagged
        .groupBy(col("keep").as("rule_keep"), col("cls_keep"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_words")).cast("long").as("n_words"))
      val tot = cells.agg(sum(col("n_docs")).as("total_docs"))
      cells.crossJoin(broadcast(tot))
        .select(col("rule_keep"), col("cls_keep"), col("n_docs"), col("n_words"),
          expr("(n_docs * 1000000) div total_docs").as("share_ppm"))
        .orderBy("rule_keep", "cls_keep")
    },

    // ---------------------------------------------------------------------
    // PMI collocations: top-20 adjacent word pairs by pointwise mutual
    // information — the phrase-discovery pass (word2vec's phrase step,
    // NLTK collocations) that decides which bigrams a tokenizer should
    // treat as units. PMI's log is monotone, so ranking by the RATIO
    // c_xy·N_w² / (N_b·c_x·c_y) is ranking by PMI — and the ratio stays
    // in exact integer arithmetic (DECIMAL(38,0) intermediates; log would
    // differ at ULP level across engines, see the TF-IDF note). Support
    // floor c_xy ≥ 5 kills the hapax-pair degeneracy (a once-seen pair of
    // once-seen words maximizes PMI). Shape at 100 TB: bigram and unigram
    // counts are map-side-combined aggregates with vocabulary-bounded
    // output (Heaps' law); the two count joins are vocabulary-sized; the
    // final top-k is TakeOrderedAndProject partial heaps — the corpus is
    // touched exactly twice (once per n-gram order), never sorted.
    QuerySpec.sql(
      "p_pmi_collocations",
      """WITH w AS (
        |  SELECT string_split(text, ' ') AS ws FROM documents
        |), uni AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(ws) AS word FROM w) GROUP BY 1
        |), bi AS (
        |  SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy FROM (
        |    SELECT unnest(list_transform(range(1, len(ws)),
        |                                 i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |    FROM w) GROUP BY 1
        |), nw AS (SELECT CAST(sum(c) AS BIGINT) AS n_words FROM uni),
        |nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bigrams FROM bi)
        |SELECT bigram, c_xy, ux.c AS c_x, uy.c AS c_y,
        |       CAST((c_xy::HUGEINT * n_words * n_words * 1000000)
        |            // (n_bigrams::HUGEINT * ux.c * uy.c) AS BIGINT)
        |         AS lift_ppm
        |FROM bi, nw, nb
        |JOIN uni ux ON ux.word = string_split(bigram, ' ')[1]
        |JOIN uni uy ON uy.word = string_split(bigram, ' ')[2]
        |WHERE c_xy >= 5
        |ORDER BY lift_ppm DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      val w = docs(s, dir).select(split(col("text"), " ").as("ws"))
      val uni = w.select(explode(col("ws")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
      // Compiled positional-bigram kernel (one pass, codegen) — the
      // interpreted transform-lambda formulation it replaces is pinned
      // equivalent in FunctionsSpec.
      val bi = docs(s, dir)
        .select(explode(
          graft.functions.WordNgrams.ngrams(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
      val nw = uni.agg(sum(col("c")).as("n_words"))
      val nb = docs(s, dir)
        .agg(sum(greatest(size(split(col("text"), " ")) - 1, lit(0)))
          .cast("long").as("n_bigrams"))
      bi
        .withColumn("x", expr("split(bigram, ' ')[0]"))
        .withColumn("y", expr("split(bigram, ' ')[1]"))
        .join(uni.select(col("word").as("x"), col("c").as("c_x")), "x")
        .join(uni.select(col("word").as("y"), col("c").as("c_y")), "y")
        .crossJoin(broadcast(nw)).crossJoin(broadcast(nb))
        .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
          expr("""CAST((CAST(c_xy AS DECIMAL(38,0)) * n_words * n_words * 1000000)
                 |     div (CAST(n_bigrams AS DECIMAL(38,0)) * c_x * c_y) AS BIGINT)"""
            .stripMargin).as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("bigram"))
        .limit(20)
    },

    // ---------------------------------------------------------------------
    // Vocabulary-growth report: per source, token count, type (distinct
    // word) count, hapax legomena count, and the type/token + hapax/type
    // ratios in ppm — the Heaps'-law diagnostic that distinguishes a
    // natural-language source (hapax share ~40–60%, vocabulary still
    // growing) from template/boilerplate output (tiny closed vocabulary),
    // and the empirical basis for the vocabulary-bounded cost claims the
    // shingle/BPE/TF-IDF operators make. Shape at 100 TB: explode →
    // (source, word) count with map-side combine — output is the
    // vocabulary, not the corpus — then a second vocabulary-sized
    // aggregate to #sources rows. The corpus is touched once.
    QuerySpec.sql(
      "p_vocab_growth",
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |), wc AS (
        |  SELECT source, word, CAST(count(*) AS BIGINT) AS c
        |  FROM w GROUP BY 1, 2
        |)
        |SELECT source,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_types,
        |       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
        |       (CAST(count(*) AS BIGINT) * 1000000) // CAST(sum(c) AS BIGINT)
        |         AS type_token_ppm,
        |       (CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) * 1000000)
        |         // CAST(count(*) AS BIGINT) AS hapax_type_ppm
        |FROM wc GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("n_types"),
          count(when(col("c") === 1, 1)).cast("long").as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
          expr("(n_types * 1000000) div n_tokens").as("type_token_ppm"),
          expr("(n_hapax * 1000000) div n_types").as("hapax_type_ppm"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------------
    // Unigram rarity score — the integer-exact stand-in for LM-perplexity
    // quality filtering (the third classic signal after rule sets and
    // repetition; real pipelines score with a KenLM/unigram model and cut
    // on perplexity). Per word, inverse frequency N div n_w (rational, not
    // log — log would differ at ULP level across engines, see the TF-IDF
    // note); per doc, the sum and the per-word mean in micro units. Plan:
    // one map-side-combined vocabulary count (tiny output), broadcast back
    // onto the exploded words, one per-doc aggregate — the same two-
    // shuffle shape as decontamination, vocabulary never on the driver.
    QuerySpec.sql(
      "p_text_rarity",
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), wc AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn FROM wc
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(nn // n) AS BIGINT) AS rarity_sum,
        |       CAST((sum(nn // n) * 1000000) // count(*) AS BIGINT)
        |         AS rarity_micro
        |FROM w JOIN wc USING (word), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val wc = words.groupBy("word").agg(count(lit(1)).as("n"))
      val tot = wc.agg(sum(col("n")).as("nn"))
      words
        .join(broadcast(wc), "word")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(expr("nn div n")).as("rarity_sum"))
        .select(col("doc_id"), col("n_words"), col("rarity_sum"),
          // DECIMAL intermediate: a rare-word-heavy doc's rarity_sum
          // approaches N per unique word — ×1e6 wraps BIGINT at corpus
          // scale while the per-word mean stays representable.
          expr("CAST((CAST(rarity_sum AS DECIMAL(38,0)) * 1000000) div " +
            "n_words AS BIGINT)").as("rarity_micro"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Language ID: marker-word scoring against small per-language lexicons
    // (the n-gram-profile heuristic reduced to unigram markers; scores are
    // integer counts, argmax with alphabetical tie-break).
    QuerySpec.sql("p_text_langid", langidOracle) { (s, dir) =>
      val ws = split(col("text"), " ")
      def score(words: Seq[String]): Column =
        size(filter(ws, w => w.isin(words: _*))).cast("long")
      val scored = docs(s, dir).select(col("doc_id"),
        score(LangMarkers("de")).as("s_de"),
        score(LangMarkers("en")).as("s_en"),
        score(LangMarkers("es")).as("s_es"),
        score(LangMarkers("fr")).as("s_fr"),
        score(LangMarkers("zh")).as("s_zh"))
      scored
        .withColumn("best",
          greatest(col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh")))
        .select(col("doc_id"),
          when(col("s_de") === col("best"), "de")
            .when(col("s_en") === col("best"), "en")
            .when(col("s_es") === col("best"), "es")
            .when(col("s_fr") === col("best"), "fr")
            .otherwise("zh").as("pred_lang"),
          col("best").as("best_score"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Document fingerprinting: min-hash over word 4-gram shingles (a
    // winnowing-style rolling fingerprint) + shingle count.
    QuerySpec.sql(
      "p_text_fingerprint",
      s"""WITH words AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |), sh4 AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(ws) - 2, 1)),
         |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) AS sh
         |  FROM words
         |)
         |SELECT doc_id, min(${oH60("sh")}) AS fingerprint,
         |       count(*) AS n_shingles
         |FROM sh4 GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(shingles4(col("text"))).as("sh"))
        .groupBy("doc_id")
        .agg(min(h60(col("sh"))).as("fingerprint"), count(lit(1)).as("n_shingles"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Benchmark decontamination: per train doc, how many of its distinct
    // word 3-grams also occur anywhere in the held-out eval slice (sources
    // src0/src1 — a deterministic stand-in for a benchmark suite), flagged
    // at >= 10% overlap. The n-gram-overlap check every LLM pipeline runs
    // before training. 100 TB posture: one equi-join of train shingles
    // against the DISTINCT eval shingle set — eval suites are tiny next to
    // the corpus, so Catalyst broadcasts the eval side; past broadcast
    // size it is a plain shuffle join on the shingle, never a cross join.
    QuerySpec.sql(
      "p_decontaminate",
      s"""$OShinglesCte, esh AS (
         |  SELECT DISTINCT sh FROM shingles s JOIN documents d USING (doc_id)
         |  WHERE d.source IN ('src0', 'src1')
         |), tsh AS (
         |  SELECT s.doc_id, s.sh FROM shingles s JOIN documents d USING (doc_id)
         |  WHERE d.source NOT IN ('src0', 'src1')
         |), tot AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
         |  FROM tsh GROUP BY 1
         |), hit AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS nc
         |  FROM tsh t JOIN esh USING (sh) GROUP BY 1
         |)
         |SELECT t.doc_id, coalesce(h.nc, 0) AS n_contaminated, t.n_shingles,
         |       CAST(coalesce(h.nc, 0) * 10 >= t.n_shingles AS BIGINT) AS flagged
         |FROM tot t LEFT JOIN hit h USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val isEval = col("source").isin("src0", "src1")
      val evalSh = shingleRows(d.filter(isEval)).select("sh").distinct()
      val trainSh = shingleRows(d.filter(!isEval)).persist()
      val tot = trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val hit = trainSh.join(evalSh, "sh")
        .groupBy("doc_id").agg(count(lit(1)).as("nc"))
      tot.join(hit, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nc"), lit(0L)).as("n_contaminated"),
          col("n_shingles"),
          (coalesce(col("nc"), lit(0L)) * 10 >= col("n_shingles"))
            .cast("long").as("flagged"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Bloom-filter decontamination probe (rows-only): the 100 TB form of
    // p_decontaminate. The distinct eval shingle set folds into a
    // mergeable Bloom sketch (per-partition partial filters, OR-merged —
    // df.stat.bloomFilter's treeAggregate), broadcast once, and the train
    // corpus is probed scan-locally: ZERO shuffle of the corpus shingles,
    // vs the join form which shuffles every train shingle at broadcast
    // overflow. The price is one-sided error — false positives only,
    // never false negatives — so bloom counts dominate the exact join's
    // per doc and every exact-flagged doc stays flagged (the safe
    // direction: may over-quarantine, never under). fpp = 1e-3. No DuckDB
    // oracle (no Bloom sketch there); PipelineQueriesSpec pins the
    // superset invariant and the false-positive budget against
    // p_decontaminate's exact counts.
    QuerySpec.rowsOnly("p_decontaminate_bloom") { (s, dir) =>
      val d = docs(s, dir)
      val isEval = col("source").isin("src0", "src1")
      val evalSh = shingleRows(d.filter(isEval)).select("sh").distinct()
      // Sketch keyed on xxhash64 longs so the probe is the BUILT-IN
      // might_contain expression (fully codegen'd; the previous closure
      // UDF was the one non-codegen membership test on this path).
      val bf = graft.functions.BloomSketch.build(evalSh, "sh", 0.001)
      shingleRows(d.filter(!isEval))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(graft.functions.BloomSketch.mightContain(bf, col("sh")), 1L)
            .otherwise(0L)).as("n_contaminated_bloom"))
        .select(col("doc_id"), col("n_contaminated_bloom"), col("n_shingles"),
          (col("n_contaminated_bloom") * 10 >= col("n_shingles"))
            .cast("long").as("flagged"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Semantic decontamination — the embedding-level member of the
    // decontamination family (exact shingle ⋈ / Bloom probe / THIS):
    // paraphrased benchmark leakage shares no shingle, but its embedding
    // still sits next to the eval set's, so recent pipelines also cut on
    // max cosine to any held-out eval vector. Eval = vec_id < 20 (the
    // ANN probe convention); per train vector: the best eval match
    // (ties → lower eval id), floor(cos·1e6) micro score, contaminated
    // at cos ≥ 0.42. 100 TB posture: the eval set is small by nature
    // (benchmarks, not corpora) — broadcast it once and the whole
    // operator is a scan-stage fold: per-train-vec max_by over
    // #eval candidates, map-side combined; no train-side shuffle beyond
    // n-row partial-agg exchange. Cosines are bit-identical across
    // engines (sequential codegen fold), so threshold and floor are
    // exact.
    QuerySpec.sql(
      "p_decontaminate_semantic",
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings
        |), ev AS (SELECT vec_id, emb, norm FROM e WHERE vec_id < 20),
        |tr AS (SELECT vec_id, label, emb, norm FROM e WHERE vec_id >= 20),
        |sc AS (
        |  SELECT t.vec_id, t.label, v.vec_id AS eval_id,
        |         list_dot_product(t.emb, v.emb) / (t.norm * v.norm) AS cos
        |  FROM tr t CROSS JOIN ev v
        |), best AS (
        |  SELECT vec_id, label, eval_id, cos,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY cos DESC, eval_id) AS rn
        |  FROM sc
        |)
        |SELECT vec_id, CAST(label AS BIGINT) AS label,
        |       eval_id AS best_eval_id,
        |       CAST(floor(cos * 1000000) AS BIGINT) AS sim_micro,
        |       CAST(cos >= 0.42 AS BIGINT) AS contaminated
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("label"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
      val ev = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("eval_id"), col("embedding").as("ev_emb"),
          col("norm").as("ev_norm"))
      val cos = dot(col("embedding"), col("ev_emb")) / (col("norm") * col("ev_norm"))
      e.filter(col("vec_id") >= 20)
        .crossJoin(broadcast(ev))
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("eval_id"), cos.as("cos"))
        .groupBy("vec_id", "label")
        .agg(max_by(struct(col("eval_id"), col("cos")),
          struct(col("cos"), (-col("eval_id")).as("nid"))).as("best"))
        .select(col("vec_id"), col("label"),
          col("best.eval_id").as("best_eval_id"),
          floor(col("best.cos") * 1000000).cast("long").as("sim_micro"),
          (col("best.cos") >= 0.42).cast("long").as("contaminated"))
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------------
    // Distributed BPE tokenizer training (Sennrich et al. 2016) — the
    // merge-discovery loop run over the corpus before any LLM training.
    // See [[BpeTrain]] for the plan: the corpus is aggregated ONCE into
    // the word-frequency table; all merge rounds run on that vocab-
    // bounded table (pair counts map-side combined, argmax is a 1-row
    // collect, merges applied by a scan-local fold). Iterative, but the
    // round COUNT is fixed, so training unrolls into chained DuckDB CTEs
    // ([[BpeTrain.trainOracleSql]]) and the learned merge table itself
    // hash-matches; the spec additionally pins equality against an
    // independent Scala BPE model + the non-increasing-count guarantee.
    QuerySpec.sql("p_bpe_train", BpeTrain.trainOracleSql(10)) { (s, dir) =>
      BpeTrain.train(s, docs(s, dir), rounds = 10)
    },

    // ---------------------------------------------------------------------
    // BPE tokenization APPLIED — the other half of the tokenizer loop:
    // train's learned merges encode every document (character start,
    // merges in rank order, the same greedy fold). The merge table is
    // tiny by construction (ranks, not corpus) and rides in the plan;
    // encoding is pure scan work — the 100 TB plan is one pass, no
    // shuffle beyond the oracle-compare sort. Oracle-paired END TO END:
    // the fixed round count unrolls training into chained DuckDB CTEs
    // (see [[BpeTrain.encodeOracleSql]]), so the learned merges AND the
    // per-doc encode are hash-verified, not just spec-pinned.
    QuerySpec.sql("p_bpe_encode", BpeTrain.encodeOracleSql(10)) { (s, dir) =>
      val merges = BpeTrain.train(s, docs(s, dir), rounds = 10)
        .select("left", "right").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      BpeTrain.encode(docs(s, dir), merges)
    },

    // ---------------------------------------------------------------------
    // Best-fit-decreasing sequence packing — the padding-minimizing
    // counterpart to p_pack_sequences' order-preserving contiguous
    // bins (see [[BinPack]]): docs md5-routed to packing partitions,
    // each independently running deterministic textbook BFD; at most
    // one ≤-half-full bin can exist per partition (the BFD guarantee
    // the spec pins). Sequential placement is beyond ANSI SQL but NOT
    // beyond DuckDB: a recursive CTE replays the exact same BFD
    // (largest-first, fullest-fitting-bin, ties to the lowest bin id)
    // one placement per recursion step with the fill levels carried as
    // a list — so every per-doc assignment is oracle-verified, not just
    // the invariants.
    QuerySpec.sql(
      "p_pack_bfd",
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
         |         ${oH32("CAST(doc_id AS VARCHAR)")} % 32 AS part
         |  FROM documents
         |), o AS (
         |  SELECT doc_id, ntok, part,
         |         row_number() OVER (PARTITION BY part ORDER BY ntok DESC, doc_id) AS j,
         |         count(*) OVER (PARTITION BY part) AS nd
         |  FROM d
         |), pack AS (
         |  SELECT part, CAST(0 AS BIGINT) AS j, nd,
         |         CAST([] AS BIGINT[]) AS fills,
         |         CAST([] AS BIGINT[]) AS bins,
         |         CAST([] AS BIGINT[]) AS ids
         |  FROM (SELECT DISTINCT part, nd FROM o)
         |  UNION ALL
         |  SELECT part, j, nd,
         |         CASE WHEN best = 0 THEN list_append(fills, ntok)
         |              ELSE list_transform(range(1, len(fills) + 1),
         |                     i -> CASE WHEN i = best THEN fills[i] + ntok
         |                               ELSE fills[i] END) END AS fills,
         |         list_append(bins, CASE WHEN best = 0 THEN len(fills)
         |                                ELSE best - 1 END) AS bins,
         |         list_append(ids, doc_id) AS ids
         |  FROM (
         |    SELECT p.part, p.j + 1 AS j, p.nd, p.fills, p.bins, p.ids,
         |           o.doc_id, o.ntok,
         |           list_filter(range(1, len(p.fills) + 1),
         |                       i -> p.fills[i] + o.ntok <= 512) AS cand,
         |           coalesce(list_min(list_filter(cand,
         |             i -> p.fills[i] = list_max(
         |                    list_transform(cand, k -> p.fills[k])))), 0) AS best
         |    FROM pack p JOIN o ON o.part = p.part AND o.j = p.j + 1
         |  )
         |), placed AS (
         |  SELECT part, unnest(ids) AS doc_id, unnest(bins) AS bin
         |  FROM pack WHERE j = nd
         |)
         |SELECT s.doc_id, d.ntok, CAST(s.part AS BIGINT) AS part,
         |       CAST(s.bin AS BIGINT) AS bin
         |FROM placed s JOIN d USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      BinPack.packBestFit(docs(s, dir), capacity = 512L)
    },

    // ---------------------------------------------------------------------
    // Intra-document repetition (Gopher-style duplicate-n-gram signal):
    // total vs distinct word 3-grams per doc, repetition ratio in exact
    // integer micro-units (floor((total-distinct)*1e6/total) — no float
    // compare). Entirely scan-local codegen'd work: the 100 TB plan is a
    // single pass with no shuffle at all (the orderBy exists only for the
    // deterministic oracle compare).
    QuerySpec.sql(
      "p_text_repetition",
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |)
        |SELECT doc_id, n_grams_total, n_grams_distinct,
        |  CAST(CASE WHEN n_grams_total > 0
        |    THEN (n_grams_total - n_grams_distinct) * 1000000 // n_grams_total
        |    ELSE 0 END AS BIGINT) AS rep_micro
        |FROM (
        |  SELECT doc_id, greatest(len(ws) - 2, 0) AS n_grams_total,
        |    len(list_distinct(list_transform(
        |      range(1, greatest(len(ws) - 1, 1)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS n_grams_distinct
        |  FROM words
        |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          greatest(size(split(col("text"), " ")) - 2, lit(0)).cast("long")
            .as("n_grams_total"),
          size(shingles3(col("text"))).cast("long").as("n_grams_distinct"))
        .withColumn("rep_micro",
          when(col("n_grams_total") > 0,
            expr("(n_grams_total - n_grams_distinct) * 1000000 div n_grams_total"))
            .otherwise(lit(0L)))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Corpus boilerplate report: the 50 highest-document-frequency
    // shingles above a min-support floor — the "stop-shingle" list a
    // web-scale jaccard/minhash index caps away (see the
    // p_dedup_ngram_jaccard note), here as a first-class report. One
    // map-side-combined groupBy on the shingle plus a global top-k
    // (TakeOrdered — no full sort). Total order (df desc, sh) makes the
    // LIMIT deterministic on both engines.
    QuerySpec.sql(
      "p_text_boilerplate",
      s"""$OShinglesCte, df AS (
         |  SELECT sh, CAST(count(*) AS BIGINT) AS df FROM shingles GROUP BY sh
         |)
         |SELECT sh, df FROM df
         |WHERE df >= 3
         |ORDER BY df DESC, sh LIMIT 50""".stripMargin) { (s, dir) =>
      shingleRows(docs(s, dir))
        .groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3)
        .orderBy(col("df").desc, col("sh"))
        .limit(50)
    },

    // ---------------------------------------------------------------------
    // Curation funnel: the survival report every training-data pipeline
    // produces — how many docs (and tokens) remain after each stage of
    // raw → exact-dedup (keep min doc_id per content hash) → quality
    // floor. One persisted base, three aggregates; at 100 TB the keeper
    // flag is one hash-partitioned window (or the groupBy-join form) and
    // each stage is a map-side-combined count/sum.
    QuerySpec.sql(
      "p_curate_funnel",
      """WITH base AS (
        |  SELECT doc_id, md5(text) AS grp,
        |         len(string_split(text, ' ')) AS ntok
        |  FROM documents
        |), keep AS (
        |  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY grp) AS keeper
        |  FROM base
        |)
        |SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(ntok) AS BIGINT) AS sum_tokens
        |FROM base
        |UNION ALL
        |SELECT 'b_dedup', CAST(count(*) AS BIGINT), CAST(sum(ntok) AS BIGINT)
        |FROM keep WHERE keeper
        |UNION ALL
        |SELECT 'c_quality', CAST(count(*) AS BIGINT), CAST(sum(ntok) AS BIGINT)
        |FROM keep WHERE keeper AND ntok >= 30
        |ORDER BY stage""".stripMargin) { (s, dir) =>
      val base = docs(s, dir).select(col("doc_id"), md5(col("text")).as("grp"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      val keep = base.withColumn("keeper",
        col("doc_id") === min(col("doc_id")).over(Window.partitionBy("grp")))
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("sum_tokens"))
      stage("a_raw", base)
        .unionByName(stage("b_dedup", keep.filter(col("keeper"))))
        .unionByName(stage("c_quality",
          keep.filter(col("keeper") && col("ntok") >= 30)))
        .orderBy("stage")
    },

    // ---------------------------------------------------------------------
    // The COMPOSED curation pass (see [[CurationPipeline]]): eval-source
    // drop → Gopher rules → exact dedup → near-dup component collapse →
    // decontamination → survivor-weighted mixture resampling, as the one
    // per-document materialization a training run consumes. The oracle
    // re-states the WHOLE chain in SQL over the component oracles' own
    // CTEs (recursive-CTE components for the collapse), so the driver
    // hash-verifies the composition end to end; PipelineQueriesSpec
    // additionally model-checks it against a Scala reimplementation.
    QuerySpec.sql("p_curation_pipeline", curationOracle) { (s, dir) =>
      CurationPipeline.curate(s, dir).orderBy("doc_id")
    },

    // Its funnel audit: per-stage survival counts across the full chain.
    QuerySpec.sql("p_curation_funnel_full", curationFunnelOracle) { (s, dir) =>
      CurationPipeline.stageCounts(s, dir)
    },

    // ---------------------------------------------------------------------
    // Stratified train/val/test split: DETERMINISTIC hash-bucket
    // assignment (md5 of the doc id — reproducible across runs, clusters,
    // and engines; never rand()), reported per (source, split). This is
    // the split every training pipeline needs to be able to re-derive
    // from scratch. Scan-local assignment + one groupBy shuffle.
    QuerySpec.sql(
      "p_sample_stratified",
      s"""SELECT source,
         |  CASE WHEN ${oH32("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
         |       WHEN ${oH32("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val bucket = pmod(h32(col("doc_id").cast("string")), lit(100))
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          when(bucket < 90, lit("train"))
            .when(bucket < 95, lit("val"))
            .otherwise(lit("test")).as("split"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"),
          min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"))
        .orderBy("source", "split")
    },

    // ---------------------------------------------------------------------
    // Sequence packing: greedy CONTIGUOUS packing of documents into
    // fixed-token-budget training sequences (bin = running token total
    // before the doc, integer-divided by the budget), per source in
    // doc_id order. The Spark side runs the DISTRIBUTED two-phase prefix
    // sum (SequencePack — partial sums + broadcast offsets) so one giant
    // source never serializes into a single window task; the oracle IS
    // the window formulation, so the hash-compare proves the distributed
    // scan exact every round.
    QuerySpec.sql(
      "p_pack_sequences",
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS ntok,
        |    CAST(sum(len(string_split(text, ' '))) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents
        |)
        |SELECT source, (cum - ntok) // 512 AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      SequencePack.packed(docs(s, dir), budget = 512L)
    },

    // ---------------------------------------------------------------------
    // Multimodal metadata: treat the payload as an opaque binary column
    // with typed metadata (byte length + sha256) — the schema/plumbing
    // pattern for image/audio blobs. The blob here is the utf8 encoding of
    // `text` (the container ships no media decoders).
    QuerySpec.sql(
      "p_multimodal_meta",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val blob = col("text").cast("binary")
      docs(s, dir)
        .select(col("doc_id"),
          length(blob).cast("long").as("n_bytes"),
          sha2(blob, 256).as("sha"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Multimodal decode (rows-only): Dataset[T] mapPartitions over a REAL
    // image codec — each document's payload is a deterministic PNG (derived
    // from its text, since the corpus ships no image column) decoded
    // through javax.imageio, the JDK's actual PNG plugin. The executor-side
    // batch shape (one codec context per partition, typed output schema)
    // and the decode cost are those of a genuine image pipeline; swapping
    // in a real binary parquet column changes one `select`. See
    // [[graft.functions.Media]].
    // Full-content oracle: every output column — including the MEAN LUMA
    // of the decoded raster — is predicted in SQL. The oracle replays the
    // rolling payload hash, then the 64-bit xorshift pixel stream itself
    // (UBIGINT xor/shift with HUGEINT-mod multiplication emulating Java's
    // wrapping <<) one pixel per recursion step, and folds BT.601 luma;
    // PNG being lossless, the REAL javax.imageio decode must reproduce
    // those exact pixels or the hash gate fails. (The PNG byte size is
    // deliberately not emitted: it is zlib-encoder-dependent, the one
    // thing SQL cannot predict.)
    QuerySpec.sql(
      "p_multimodal_decode",
      """WITH RECURSIVE m AS (
        |  SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(1, length(text) + 1),
        |                          i -> CAST(unicode(text[i]) AS BIGINT))),
        |           (a, b) -> (a * 31 + b) & 2147483647) AS h0
        |  FROM documents
        |), geom AS (
        |  SELECT doc_id, h0,
        |         16 + (h0 % 16) AS width,
        |         16 + ((h0 // 16) % 16) AS height,
        |         (16 + (h0 % 16)) * (16 + ((h0 // 16) % 16)) AS npx
        |  FROM m
        |), pix AS (
        |  SELECT doc_id, npx, 0 AS i, CAST(h0 | 1 AS UBIGINT) AS s,
        |         CAST(0 AS BIGINT) AS lum
        |  FROM geom
        |  UNION ALL
        |  SELECT doc_id, npx, i + 1, s3,
        |         lum + 299 * ((CAST(s3 & 16777215 AS BIGINT) >> 16) & 255)
        |             + 587 * ((CAST(s3 & 16777215 AS BIGINT) >> 8) & 255)
        |             + 114 * (CAST(s3 & 16777215 AS BIGINT) & 255)
        |  FROM (
        |    SELECT doc_id, npx, i, lum,
        |      xor(s2b, CAST((CAST(s2b AS HUGEINT) * 131072)
        |                    % 18446744073709551616 AS UBIGINT)) AS s3
        |    FROM (
        |      SELECT doc_id, npx, i, lum, xor(s1, s1 >> 7) AS s2b FROM (
        |        SELECT doc_id, npx, i, lum,
        |          xor(s, CAST((CAST(s AS HUGEINT) * 8192)
        |                      % 18446744073709551616 AS UBIGINT)) AS s1
        |        FROM pix WHERE i < npx
        |      ) a
        |    ) b
        |  ) c
        |), fin AS (
        |  SELECT doc_id AS fdoc, lum AS flum, i AS fi FROM pix
        |)
        |SELECT g.doc_id, CAST(g.width AS BIGINT) AS width,
        |       CAST(g.height AS BIGINT) AS height,
        |       CAST(g.npx AS BIGINT) AS n_pixels,
        |       CAST(f.flum // g.npx AS BIGINT) AS mean_luma_milli
        |FROM geom g JOIN fin f ON f.fdoc = g.doc_id AND f.fi = g.npx
        |ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Decode parallelism must track CORES, not input-file count: the
      // corpus parquet is one small file → one scan partition, which would
      // run the (CPU-bound) codec serially. GUARDED: only widen when the
      // scan is narrower than the cores — a big corpus already has
      // plentiful scan partitions, and full-shuffling media payloads to
      // "gain" parallelism would be pure waste there (prefer a smaller
      // files.maxPartitionBytes at ingest if decode needs finer splits).
      val narrow = docs(s, dir).select(col("doc_id"), col("text"))
      val blobs = (
        if (narrow.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
          narrow.repartition(s.sparkContext.defaultParallelism)
        else narrow
      ).as[(Long, String)]
      blobs.mapPartitions { it =>
        it.map { case (id, text) =>
          val png = graft.functions.Media.textToPng(text)
          val (w, h, lum) = graft.functions.Media.decodePng(png)
          (id, w.toLong, h.toLong, w.toLong * h, lum)
        }
      }.toDF("doc_id", "width", "height", "n_pixels", "mean_luma_milli")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Multimodal frame sampling (rows-only): the video analog of the
    // decode query — one row per SAMPLED keyframe (a flatMap, so row count
    // is data-dependent). The payload deterministically models an
    // 8–23-frame clip; every 4th frame is rendered as a distinct PNG and
    // decoded through the same real javax.imageio path, mirroring a
    // keyframe-stride sampler (generator output, typed schema, per-
    // partition codec init).
    // ---------------------------------------------------------------------
    // TF-IDF keyword extraction: top-5 terms per source (domain) by an
    // exact-integer tf-idf variant — score = tf·(N/df) in micro-units via
    // BIGINT division, a monotone rational stand-in for tf·log(N/df) that
    // both engines compute bit-identically (log would differ at ULP level
    // and break the hash gate). Shape at 100 TB: one explode + two
    // map-side-combined aggregations (term frequency per (source, word);
    // document frequency per word), one equi-join on `word` — the df side
    // is vocabulary-sized, orders below the corpus, and broadcastable
    // after a df floor — and a per-source top-k window over data already
    // shuffled to a handful of source partitions. No all-pairs, no
    // corpus-sized sort. The tf·1e6·N intermediate is computed in DECIMAL
    // — it wraps BIGINT long before the (small) score output does, and
    // the oracle's HUGEINT arithmetic must not be the only exact side.
    QuerySpec.sql("p_text_tfidf", tfidfOracle) { (s, dir) =>
      val toks = docs(s, dir)
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
      val tf = toks.groupBy("source", "word")
        .agg(count(lit(1)).as("tf"))
      val df = toks.select("word", "doc_id").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs_total"))
      val scored = tf.join(broadcast(df), "word")
        .crossJoin(broadcast(nDocs))
        .withColumn("score_micro",
          expr("CAST((CAST(tf AS DECIMAL(38,0)) * 1000000 * n_docs_total) " +
            "div df AS BIGINT)"))
      val w = Window.partitionBy("source")
        .orderBy(col("score_micro").desc, col("word"))
      scored
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("source"), col("word"), col("tf"), col("df"),
          col("score_micro"), col("rank"))
        .orderBy("source", "rank")
    },

    // ---------------------------------------------------------------------
    // Domain mixture weights: the data-mixing table an LLM training run
    // needs — per source, doc/token counts, the source's token share, and
    // the resampling weight that rebalances to a UNIFORM target mixture
    // (weight = target_share / actual_share, in exact ppm integer math).
    // One map-side-combined aggregation to a handful of rows, then a
    // broadcast of the 1-row total — the post-agg cross join touches
    // #sources rows regardless of corpus size. Both engines widen before
    // the ×1e6 scaling (DECIMAL(38,0) / HUGEINT), so the ppm math is
    // exact past ~9e12 total tokens — the 100 TB regime — not just here.
    QuerySpec.sql(
      "p_mix_weights",
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |         CAST(count(*) AS BIGINT) AS n_sources
        |  FROM per
        |)
        |SELECT source, n_docs, n_tokens,
        |       CAST((CAST(n_tokens AS HUGEINT) * 1000000) // total_tokens
        |            AS BIGINT) AS token_share_ppm,
        |       CAST((CAST(total_tokens AS HUGEINT) * 1000000)
        |            // (CAST(n_sources AS HUGEINT) * n_tokens)
        |            AS BIGINT) AS weight_ppm
        |FROM per, tot ORDER BY source""".stripMargin) { (s, dir) =>
      val per = docs(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_sources"))
      // DECIMAL before the ×1e6 scaling: a 100 TB corpus holds ~1e13
      // tokens and the BIGINT product would wrap (DuckDB computes the
      // same expression in HUGEINT — integer math must not diverge).
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div " +
            "total_tokens AS BIGINT)").as("token_share_ppm"),
          expr("CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000) div " +
            "(CAST(n_sources AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
            .as("weight_ppm"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------------
    // Span-level duplication report (exact-substring dedup shape): every
    // 8-word span, hashed with position-free identity, flagged when the
    // SAME span text appears in another document — per doc, the span
    // count, cross-doc duplicated span count, and the duplication ratio.
    // This is the "repeated long span" statistic substring-dedup passes
    // act on (span granularity, unlike the per-doc Jaccard operators).
    // Shape at 100 TB: spans live once in a persisted (doc, h) relation;
    // duplicate detection is one hash-partitioned aggregate over h; the
    // flag join is an equi-join on h against the (much smaller) dup-hash
    // set. A production pass adds a document-frequency cap on stop-spans
    // exactly like the shingle index; omitted so the oracle stays small.
    QuerySpec.sql(
      "p_span_dedup",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |s AS (
         |  SELECT doc_id,
         |         ${oH60("array_to_string(ws[i:i+7], ' ')")} AS h
         |  FROM w, unnest(range(1, greatest(len(ws) - 6, 1))) t(i)
         |),
         |dup AS (SELECT h FROM s GROUP BY h HAVING count(DISTINCT doc_id) > 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |       CAST(count(*) FILTER (WHERE h IN (SELECT h FROM dup)) AS BIGINT)
         |         AS n_dup_spans,
         |       (CAST(count(*) FILTER (WHERE h IN (SELECT h FROM dup)) AS BIGINT)
         |        * 1000000) // CAST(count(*) AS BIGINT) AS dup_ratio_micro
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Compiled positional 8-gram kernel (codegen; replaces the
      // interpreted transform + per-element slice/concat_ws lambda —
      // FunctionsSpec pins the equivalence).
      val spans = docs(s, dir)
        .select(col("doc_id"), explode(
          graft.functions.WordNgrams.ngrams(col("text"), 8)).as("span"))
        .select(col("doc_id"), h60(col("span")).as("h"))
        // Persisted — unlike the bigram family, measured to PAY here
        // (round 22: warm 1.5 s persisted vs 1.7-1.9 s recomputed at
        // sf0.1): the 8-gram hash rows are consumed by the dup aggregate
        // AND as the probe side of the dup join, and the h60 (md5) hash
        // is the expensive part of the recompute. At 100 TB the operator
        // would swap this for a two-pass recompute if cache pressure
        // bites (MEMORY_AND_DISK of ~1 row/word spills); local evidence
        // keeps the persist.
        .persist()
      val dup = spans.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("h"), lit(1L).as("is_dup"))
      spans.join(dup, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_dup_spans"))
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          expr("(n_dup_spans * 1000000) div n_spans").as("dup_ratio_micro"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Mixture resampling materializer: APPLY the p_mix_weights rebalance —
    // per document, the number of copies a uniform-target resample keeps
    // (floor(weight) guaranteed + one more with probability frac(weight),
    // decided by the document's own md5 hash, never rand(): re-derivable
    // on any cluster, any partitioning, any retry). Shape at 100 TB: the
    // weights aggregate to #sources rows, broadcast back, and the
    // per-doc decision is scan-local — one map-side agg + one broadcast
    // join for the whole materialization pass.
    QuerySpec.sql(
      "p_mix_resample",
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source
         |), tot AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |         CAST(count(*) AS BIGINT) AS n_sources
         |  FROM per
         |), w AS (
         |  SELECT source,
         |         (total_tokens * 1000000) // (n_sources * n_tokens) AS weight_ppm
         |  FROM per, tot
         |)
         |SELECT doc_id, d.source AS source, weight_ppm,
         |       CAST(weight_ppm // 1000000
         |            + CASE WHEN ${oH60("text || CAST(doc_id AS VARCHAR)")} % 1000000
         |                        < weight_ppm % 1000000
         |                   THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
         |FROM documents d JOIN w USING (source)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val per = docs(s, dir)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_sources"))
      val weights = per.crossJoin(broadcast(tot))
        .select(col("source"),
          expr("CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000) div " +
            "(CAST(n_sources AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
            .as("weight_ppm"))
      docs(s, dir)
        .join(broadcast(weights), "source")
        .select(col("doc_id"), col("source"), col("weight_ppm"),
          (expr("weight_ppm div 1000000") +
            when(h60(concat(col("text"), col("doc_id").cast("string")))
              % lit(1000000L) < col("weight_ppm") % lit(1000000L), lit(1L))
              .otherwise(lit(0L))).as("n_repeats"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Embedding int8 quantization (rows-only): per-vector symmetric int8
    // compression — scale = max|x|/127, q_i = round(x_i/scale) — the 4×
    // memory cut an at-scale ANN index takes before anything else. All
    // array math is scan-local (`transform`/`aggregate` inside codegen,
    // zero shuffle); the report aggregates per label so the output stays
    // small while the spec checks the per-element contract. Engines'
    // float rounding differs at ULP level, so the check is rows-only;
    // `PipelineQueriesSpec` bounds the dequantization error at scale/2
    // per element and proves the quantized ints live in [-127, 127].
    QuerySpec.rowsOnly("p_embed_quantize") { (s, dir) =>
      // The 1e-30 floor makes an all-zero vector quantize to zeros instead
      // of 0/0 = NaN (which an ANSI int cast rejects); it cannot perturb a
      // nonzero vector, whose scale is >= ulp(float)/127 >> 1e-30.
      val qcols = embs(s, dir)
        .withColumn("scale",
          expr("greatest(aggregate(embedding, CAST(0.0 AS DOUBLE), " +
            "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE)))) / 127.0, 1e-30d)"))
        .withColumn("q",
          expr("transform(embedding, x -> CAST(round(x / scale) AS INT))"))
      qcols
        .select(col("label"), col("scale"),
          expr("aggregate(q, 0L, (acc, v) -> acc + abs(v))").as("l1_q"),
          expr("aggregate(q, 0, (acc, v) -> greatest(acc, abs(v)))").as("linf_q"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          avg(col("scale")).as("avg_scale"),
          avg(col("l1_q")).as("avg_l1_q"),
          max(col("linf_q")).as("max_linf_q"))
        .orderBy("label")
    },

    // ---------------------------------------------------------------------
    // Approximate distinct (HLL++, rows-only): per-source exact vs
    // approximate distinct text counts. The sketch is mergeable —
    // map-side partials combine without row exchange, the aggregation
    // plan a 100 TB distinct-count must use (exact countDistinct expands
    // rows per group). Engines' HLL implementations differ, so the check
    // is rows-only here; `PipelineQueriesSpec` bounds the relative error
    // against the exact count instead.
    QuerySpec.rowsOnly("p_approx_distinct") { (s, dir) =>
      docs(s, dir)
        .groupBy("source")
        .agg(countDistinct(col("text")).as("n_exact"),
          approx_count_distinct(col("text"), 0.02).as("n_approx"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------------
    // Approximate quantiles (rows-only): per-source p50/p90/p99 of document
    // length via a mergeable quantile summary — like the HLL sketch, the
    // aggregation plan a 100 TB length-distribution report must use
    // (map-side partial summaries merge without a global sort; exact
    // percentiles would sort the corpus per group). Engines' summaries
    // differ, so the check is rows-only; the spec bounds the rank error
    // against exact percentiles instead.
    QuerySpec.rowsOnly("p_approx_quantiles") { (s, dir) =>
      docs(s, dir)
        .groupBy("source")
        .agg(
          percentile_approx(col("n_chars"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          count(lit(1)).as("n_docs"))
        .select(col("source"), col("q")(0).as("p50"), col("q")(1).as("p90"),
          col("q")(2).as("p99"), col("min_chars"), col("max_chars"), col("n_docs"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------------
    // PII-shaped redaction: mask every digit run in the semi-structured
    // `props` payload and report the per-record redaction count — the
    // masking pass a training pipeline runs over user-generated metadata
    // (emails/phones/SSNs differ only in the regex; the corpus's digit
    // runs are the pattern that exists in this testdata). Entirely
    // scan-local codegen (regexp_replace + regexp_extract_all inside the
    // scan stage, zero shuffle before the output sort) — at 100 TB this
    // is a map-only pass whose cost is the regex engine, which is the
    // correct floor.
    QuerySpec.sql(
      "p_pii_redact",
      """SELECT event_id,
        |       regexp_replace(props, '\d+', '<NUM>', 'g') AS redacted,
        |       CAST(len(regexp_extract_all(props, '\d+')) AS BIGINT)
        |         AS n_redactions
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      TemporalQueries.events(s, dir)
        .select(col("event_id"),
          regexp_replace(col("props"), "\\d+", "<NUM>").as("redacted"),
          size(regexp_extract_all(col("props"), lit("\\d+"), lit(0)))
            .cast("long").as("n_redactions"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------------
    // Corpus n-gram top-k: the 20 most frequent word bigrams with counts —
    // the corpus statistic a tokenizer/BPE-merge pre-pass needs. One scan,
    // one transform (no self-join: consecutive pairs come from a single
    // array-slice lambda over each doc's word array), one map-side-combined
    // groupBy, and a global top-k that Spark plans as TakeOrderedAndProject
    // (per-partition partial top-20 → driver merge of 20-row heaps — never
    // a corpus-wide sort). Ties break on the bigram string so the oracle
    // hash-compare is exact.
    QuerySpec.sql(
      "p_ngram_topk",
      """WITH w AS (
        |  SELECT string_split(text, ' ') AS ws FROM documents
        |), b AS (
        |  SELECT unnest(list_transform(range(1, len(ws)),
        |                               i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM w
        |)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(explode(
          graft.functions.WordNgrams.ngrams(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },

    // ---------------------------------------------------------------------
    // Count-Min-Sketch heavy hitters (rows-only): the exact bigram top-20
    // above, re-estimated through a mergeable CMS — completing the sketch
    // family (HLL distinct, quantile summary, Bloom membership, CMS
    // frequency) that is the only aggregation toolkit that still works at
    // 100 TB when the key space itself won't fit anywhere. Per-partition
    // partial sketches merge associatively (treeAggregate), one fixed-size
    // table ships to the driver, and per-key estimates cost O(depth).
    // One-sided error: cms_n >= exact_n always, overshoot <= eps·N with
    // prob >= 1 - delta (eps = 1e-4, delta = 1e-3; Spark sizes
    // width = ceil(2/eps) = 20k, depth = ceil(log2(1/(1-confidence))) = 10
    // — ~1.5 MB, constant in corpus size). Fixed seed keeps runs
    // deterministic. No DuckDB oracle (no CMS there);
    // PipelineQueriesSpec pins the dominance + overshoot-budget
    // invariants against the exact counts. The probe is a codegen'd
    // Catalyst expression ([[graft.functions.CmsSketch]]) — the sketch
    // rides the generated class's references array like Spark's own
    // Bloom join-filter probes; no closure UDF anywhere on the path.
    QuerySpec.rowsOnly("p_ngram_topk_cms") { (s, dir) =>
      // NOT persisted (measured round 22): the sketch build and the exact
      // count each re-derive the exploded bigrams from the column-pruned
      // scan through the compiled kernel — warm 0.9 s persisted vs 0.6 s
      // recomputed at sf0.1, and caching the corpus-multiple exploded
      // relation is the guide-§5 spill cliff at 100 TB.
      val bigrams = docs(s, dir)
        .select(explode(
          graft.functions.WordNgrams.ngrams(col("text"), 2)).as("bigram"))
      val cms = graft.functions.CmsSketch.serialize(
        bigrams.stat.countMinSketch("bigram", 1e-4, 0.999, 42))
      bigrams
        .groupBy("bigram").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("bigram"))
        .limit(20)
        .withColumn("cms_n",
          graft.functions.CmsSketch.estimateCount(cms, col("bigram")))
        .select(col("bigram"), col("exact_n"), col("cms_n"))
    },

    // ---------------------------------------------------------------------
    // Bigram LM fit score (the log-free perplexity proxy): per document,
    // the MEAN conditional probability of its word bigrams under the
    // corpus's own bigram model — P(w2|w1) = c(w1 w2) / c(w1 ·) — in exact
    // ppm integers. Low scores mark out-of-distribution documents (the
    // quality-ranking signal a KenLM perplexity filter provides, e.g.
    // CCNet, arXiv:1911.00359), high scores mark formulaic/templated text;
    // integer rational arithmetic instead of log-probs keeps both engines
    // bit-identical (a log would diverge at ULP level, and c12·1e6 is
    // computed in DECIMAL(38,0) — at 1e13 corpus tokens the BIGINT product
    // wraps). 100 TB posture: both count tables are DISTINCT-bigram-
    // bounded (≤ min(vocab², corpus tokens)) and map-side combined; the
    // probability join is one equi-join of the exploded bigrams against
    // them — shuffle bounded by corpus tokens, with AQE free to broadcast
    // the count tables only when their POST-AGGREGATE size is known small;
    // no stage depends on broadcast for correctness. Docs with < 2 words
    // have no bigram and are excluded by construction in both engines.
    QuerySpec.sql(
      "p_lm_bigram_score",
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), b AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |                                       i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM w
        |), cbi AS (
        |  SELECT bigram, count(*) AS c12 FROM b GROUP BY 1
        |), cuni AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
        |  FROM b GROUP BY 1
        |), scored AS (
        |  SELECT b.doc_id,
        |         CAST((CAST(c.c12 AS HUGEINT) * 1000000) // u.c1 AS BIGINT) AS p_ppm
        |  FROM b
        |  JOIN cbi c USING (bigram)
        |  JOIN cuni u ON split_part(b.bigram, ' ', 1) = u.w1
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bi = docs(s, dir)
        .select(col("doc_id"), explode(
          graft.functions.WordNgrams.ngrams(col("text"), 2)).as("bigram"))
      // NOT persisted (measured round 22): both consumers (the count build
      // and the probability join) re-derive the exploded bigrams from the
      // column-pruned scan through the compiled kernel — warm 1.6 s
      // persisted vs 1.1 s recomputed at sf0.1. Materializing a
      // corpus-multiple exploded relation also IS the guide-§5 spill
      // cliff at 100 TB: two scans of the raw corpus beat one scan plus a
      // cache write+read of a larger-than-corpus intermediate.
      val w1 = element_at(split(col("bigram"), " "), 1)
      val cBi = bi.groupBy("bigram").agg(count(lit(1)).as("c12")).persist()
      // Unigram counts DERIVED from the distinct-bigram count table, not
      // re-aggregated from the corpus-sized occurrence relation: the count
      // of bigrams starting with w1 is by definition the sum of c12 over
      // the (vocabulary-bounded) distinct bigrams with that first word —
      // one full corpus shuffle replaced by a pass over the tiny count
      // table (guide §2.3 "aggregate before you shuffle").
      val cUni = cBi.groupBy(w1.as("w1")).agg(sum(col("c12")).as("c1"))
      bi.join(cBi, "bigram")
        .join(cUni, w1 === col("w1"))
        .select(col("doc_id"),
          expr("CAST((CAST(c12 AS DECIMAL(38,0)) * 1000000) div c1 AS BIGINT)")
            .as("p_ppm"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("CAST(sum(p_ppm) div count(1) AS BIGINT)").as("score_ppm"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Data-selection importance weighting (the DSIR shape, arXiv:
    // 2302.03169, linearized): per TRAIN document, its fit under a bigram
    // model of the TARGET distribution (the eval slice — what we want
    // more of) MINUS its fit under the train corpus's own model; positive
    // importance = looks more like the target than like the corpus —
    // rank by it to select pretraining data for a domain. DSIR proper
    // sums log-likelihood ratios; logs (and therefore products) cannot be
    // bit-identical across engines, so this linearization differences the
    // MEAN conditional probabilities in exact ppm (documented trade —
    // the RANKING signal, which is what selection consumes, is
    // preserved; a bigram unseen in a model scores 0 there, the
    // zero-smoothing choice made deterministic). Same 100 TB posture as
    // `p_lm_bigram_score`: two distinct-bigram-bounded count tables per
    // model, map-side combined; per-doc scoring is LEFT equi-joins of the
    // exploded train bigrams — token-bounded shuffles, no broadcast
    // dependence.
    QuerySpec.sql(
      "p_dsir_importance",
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |), b AS (
        |  SELECT doc_id, source, unnest(list_transform(range(1, len(ws)),
        |                                i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM w
        |), bt AS (SELECT bigram FROM b WHERE source IN ('src0', 'src1')),
        |bc AS (SELECT doc_id, bigram FROM b WHERE source NOT IN ('src0', 'src1')),
        |cbi_t AS (SELECT bigram, count(*) AS c12 FROM bt GROUP BY 1),
        |cuni_t AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
        |           FROM bt GROUP BY 1),
        |cbi_c AS (SELECT bigram, count(*) AS c12 FROM bc GROUP BY 1),
        |cuni_c AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
        |           FROM bc GROUP BY 1),
        |scored AS (
        |  SELECT b.doc_id,
        |         coalesce(CAST((CAST(t.c12 AS HUGEINT) * 1000000) // tu.c1
        |                       AS BIGINT), 0) AS pt_ppm,
        |         coalesce(CAST((CAST(c.c12 AS HUGEINT) * 1000000) // cu.c1
        |                       AS BIGINT), 0) AS pc_ppm
        |  FROM bc b
        |  LEFT JOIN cbi_t t USING (bigram)
        |  LEFT JOIN cuni_t tu ON split_part(b.bigram, ' ', 1) = tu.w1
        |  LEFT JOIN cbi_c c USING (bigram)
        |  LEFT JOIN cuni_c cu ON split_part(b.bigram, ' ', 1) = cu.w1
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(pt_ppm) // count(*) AS BIGINT) AS target_ppm,
        |       CAST(sum(pc_ppm) // count(*) AS BIGINT) AS corpus_ppm,
        |       CAST(sum(pt_ppm) // count(*) - sum(pc_ppm) // count(*)
        |            AS BIGINT) AS importance_ppm
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val isEval = col("source").isin("src0", "src1")
      def bigramsOf(d: DataFrame): DataFrame = d
        .select(col("doc_id"), explode(
          graft.functions.WordNgrams.ngrams(col("text"), 2)).as("bigram"))
      val d = docs(s, dir)
      val bt = bigramsOf(d.filter(isEval))
      // bc NOT persisted (measured round 22, same verdict as
      // p_lm_bigram_score): warm 1.9 s persisted vs 1.4 s recomputed at
      // sf0.1 — recomputing the compiled explode per consumer beats
      // caching the corpus-multiple relation, and avoids the §5 spill
      // cliff at scale.
      val bc = bigramsOf(d.filter(!isEval))
      val w1 = element_at(split(col("bigram"), " "), 1)
      // Each model's unigram table is derived from its (vocabulary-
      // bounded) distinct-bigram count table instead of a second
      // corpus-sized aggregation — sum(c12) per first word is exactly
      // count(*) per first word over the occurrences (same rewrite as
      // p_lm_bigram_score; the oracle states the direct form and the
      // hash-compare pins the equality).
      def model(b: DataFrame, suffix: String): (DataFrame, DataFrame) = {
        val cbi = b.groupBy("bigram").agg(count(lit(1)).as(s"c12$suffix"))
          .persist()
        val cuni = cbi.groupBy(w1.as(s"w1$suffix"))
          .agg(sum(col(s"c12$suffix")).as(s"c1$suffix"))
        (cbi, cuni)
      }
      val (cbiT, cuniT) = model(bt, "_t")
      val (cbiC, cuniC) = model(bc, "_c")
      def ppm(c12: String, c1: String): Column = coalesce(
        expr(s"CAST((CAST($c12 AS DECIMAL(38,0)) * 1000000) div $c1 AS BIGINT)"),
        lit(0L))
      bc.join(cbiT, Seq("bigram"), "left")
        .join(cuniT, w1 === col("w1_t"), "left")
        .join(cbiC, Seq("bigram"), "left")
        .join(cuniC, w1 === col("w1_c"), "left")
        .select(col("doc_id"),
          ppm("c12_t", "c1_t").as("pt_ppm"), ppm("c12_c", "c1_c").as("pc_ppm"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("CAST(sum(pt_ppm) div count(1) AS BIGINT)").as("target_ppm"),
          expr("CAST(sum(pc_ppm) div count(1) AS BIGINT)").as("corpus_ppm"))
        .withColumn("importance_ppm", col("target_ppm") - col("corpus_ppm"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm):
    // per document, hash its word 4-grams positionally, slide a w=4
    // window over the hash sequence, keep each window's MINIMUM — the
    // guarantee-bearing fingerprint selection (any shared substring of
    // ≥ w+k−1 grams shares a fingerprint) that samples ~1/w of the grams
    // position-robustly, unlike a global minhash. Values-only selection
    // makes the MOSS rightmost-tie rule moot (the selected VALUE is the
    // min either way). Output per doc: gram count, fingerprint count, and
    // how many of its fingerprints some OTHER doc also selected — the
    // span-sharing report at fingerprint (not full-span) cost. 100 TB
    // posture: selection is scan-local array math (one lambda chain, no
    // shuffle); the sharing join is fingerprint-bounded (~1/w of corpus
    // grams, map-side-combined df counts) — the same two-aggregate shape
    // as the boilerplate report, never a pairwise join.
    QuerySpec.sql(
      "p_winnow_fingerprint",
      s"""WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, list_transform(range(1, len(ws) - 2),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS gs
        |  FROM w WHERE len(ws) >= 4
        |), h AS (
        |  SELECT doc_id, len(gs) AS n_grams,
        |         list_transform(gs, g -> ${oH32("g")}) AS hs
        |  FROM g
        |), f AS (
        |  SELECT doc_id, n_grams,
        |         list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
        |           i -> list_min(list_slice(hs, i, i + 3)))) AS fps
        |  FROM h
        |), fp AS (
        |  SELECT doc_id, n_grams, unnest(fps) AS fp FROM f
        |), df AS (
        |  SELECT fp, count(*) AS n_docs FROM fp GROUP BY 1
        |)
        |SELECT p.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams,
        |       CAST(count(*) AS BIGINT) AS n_fingerprints,
        |       CAST(sum(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_shared_fp
        |FROM fp p JOIN df d USING (fp)
        |GROUP BY p.doc_id, p.n_grams ORDER BY p.doc_id""".stripMargin) { (s, dir) =>
      // Gram→hash→window-min→distinct fused into ONE compiled pass
      // ([[graft.functions.WinnowFingerprints]] — replaces four interpreted
      // HOF lambdas and three intermediate arrays per row; FunctionsSpec
      // pins equivalence against the declarative chain). n_grams =
      // size(ws) - 3 is the gram count by construction under the >= 4
      // filter.
      val fpRows = docs(s, dir)
        .filter(size(split(col("text"), " ")) >= 4)
        .select(col("doc_id"),
          (size(split(col("text"), " ")) - 3).cast("long").as("n_grams"),
          explode(graft.functions.WinnowFingerprints
            .fingerprints(col("text"), 4, 4)).as("fp"))
        // One selection pass feeds both the df counts and the per-doc roll-up.
        .persist()
      val dfCounts = fpRows.groupBy("fp").agg(count(lit(1)).as("n_docs"))
      fpRows.join(dfCounts, "fp")
        .groupBy("doc_id", "n_grams")
        .agg(count(lit(1)).as("n_fingerprints"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_shared_fp"))
        .select(col("doc_id"), col("n_grams"), col("n_fingerprints"),
          col("n_shared_fp"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Per-source quota sampling: cap every source (domain) at 10 documents,
    // chosen by a deterministic md5 order — the standard per-domain cap a
    // web-crawl curation pass applies so no single domain dominates the
    // mixture. The `row_number ≤ k` filter over the per-source window is
    // planned as WindowGroupLimit: each map task keeps only its local
    // top-10 per source BEFORE the exchange, so the shuffle carries
    // O(sources × k × tasks), not the corpus. Salting is unnecessary even
    // for a skewed giant domain because the partial limit bounds every
    // task's output.
    QuerySpec.sql(
      "p_source_quota",
      s"""SELECT source, doc_id, rank FROM (
         |  SELECT source, doc_id,
         |         CAST(row_number() OVER (
         |           PARTITION BY source
         |           ORDER BY ${oH60("text || CAST(doc_id AS VARCHAR)")}, doc_id
         |         ) AS BIGINT) AS rank
         |  FROM documents
         |) WHERE rank <= 10 ORDER BY source, rank""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source")
        .orderBy(h60(concat(col("text"), col("doc_id").cast("string"))),
          col("doc_id"))
      docs(s, dir)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select("source", "doc_id", "rank")
        .orderBy("source", "rank")
    },

    // ---------------------------------------------------------------------
    // Embedding dominant-dimension histogram: per label, which dimension
    // holds each vector's max — the cheap diagnostic for a collapsed or
    // un-whitened embedding space (a healthy space spreads argmax across
    // dims; a collapsed one concentrates). Exact comparisons only (argmax
    // position, first occurrence on ties — both engines' semantics), no
    // float arithmetic, so the oracle hash-compare is exact. Scan-local
    // per row + one map-side-combined groupBy to #labels × #dims rows.
    QuerySpec.sql(
      "p_embed_dominant_dim",
      """SELECT label,
        |       CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS dim,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM embeddings GROUP BY 1, 2 ORDER BY label, dim""".stripMargin) { (s, dir) =>
      embs(s, dir)
        .select(col("label"),
          array_position(col("embedding"), array_max(col("embedding"))).as("dim"))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "dim")
    },

    // Frame sampling with a REAL oracle: the sampler's stride/count
    // arithmetic AND the decoded frame dimensions are deterministic
    // functions of the payload hash (Media.textToPng embeds them;
    // decodePng reads them back from actual PNG bytes), so DuckDB can
    // replicate the rolling hash (ASCII corpus: code points = UTF-8
    // bytes) and predict what the REAL javax.imageio decode must return —
    // a decode that lies about dimensions fails the hash gate. Mean-luma
    // content checking stays with p_multimodal_decode (spec-pinned; the
    // xorshift pixel stream is not reasonably SQL-expressible).
    QuerySpec.sql(
      "p_multimodal_frames",
      """WITH m AS (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(range(1, length(text) + 1),
        |                            i -> CAST(unicode(text[i]) AS BIGINT))),
        |           (a, b) -> (a * 31 + b) & 2147483647) AS checksum
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, checksum, 8 + (checksum % 16) AS n_frames FROM m
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(16 + ((checksum + i * 2654435761) % 16) AS BIGINT) AS width,
        |       CAST(16 + (((checksum + i * 2654435761) // 16) % 16) AS BIGINT) AS height
        |FROM f, unnest(range(0, n_frames, 4)) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Same GUARDED cores-not-files repartition as p_multimodal_decode:
      // ~21k PNG round-trips at sf0.1 are pure CPU and must fan out, but
      // only when the scan is narrower than the cores.
      val narrow = docs(s, dir).select(col("doc_id"), col("text"))
      val blobs = (
        if (narrow.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
          narrow.repartition(s.sparkContext.defaultParallelism)
        else narrow
      ).as[(Long, String)]
      blobs.mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val checksum = graft.functions.Media.payloadHash(text.getBytes("UTF-8"))
          val nFrames = 8 + (checksum % 16).toInt
          (0 until nFrames by 4).map { f =>
            // Each sampled keyframe is a REAL PNG encode+decode round-trip
            // (frame index perturbs the rendered image).
            val (w, h, _) = graft.functions.Media
              .decodePng(graft.functions.Media.textToPng(text, f))
            (id, f.toLong, nFrames.toLong, w.toLong, h.toLong)
          }
        }
      }.toDF("doc_id", "frame_idx", "n_frames", "width", "height")
        .orderBy("doc_id", "frame_idx")
    },

    // ---------------------------------------------------------------------
    // Token-budget document chunking: split every document into C = 32-token
    // windows at stride S = 24 (8-token overlap) — the context-window prep
    // pass that turns a curated corpus into model-ready sequences (the
    // complement of p_pack_sequences, which packs SHORT docs; this splits
    // LONG ones). Per chunk: its index, 1-based start token, token count,
    // and a content hash (the downstream join key for chunk-level dedup or
    // embedding). 100 TB posture: pure scan-local array math — one lambda
    // builds all chunk slices, the explode is a flatMap inside the scan
    // stage, ZERO shuffles except the oracle-compare sort (spec asserts no
    // Exchange before it).
    QuerySpec.sql(
      "p_chunk_tokens",
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |), n AS (
         |  SELECT doc_id, ws,
         |         CASE WHEN len(ws) <= 32 THEN 1
         |              ELSE 1 + (len(ws) - 9) // 24 END AS nch
         |  FROM w
         |)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |       CAST(i * 24 + 1 AS BIGINT) AS start_word,
         |       CAST(len(cws) AS BIGINT) AS n_tokens,
         |       ${oH60("array_to_string(cws, ' ')")} AS chunk_hash
         |FROM (
         |  SELECT doc_id, unnest(range(nch)) AS i,
         |         unnest(list_transform(range(nch),
         |           i -> list_slice(ws, i * 24 + 1, i * 24 + 32))) AS cws
         |  FROM n)
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        // Chunk count in INTEGER arithmetic (1 + ceil((n-C)/S) for n > C):
        // float division near an exact multiple would be a cross-engine
        // hazard; `div` and DuckDB's `//` agree on positive operands.
        .withColumn("nch", expr(
          "CASE WHEN size(ws) <= 32 THEN 1 ELSE 1 + (size(ws) - 9) div 24 END"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, nch - 1)," +
            " i -> struct(i AS i, slice(ws, i * 24 + 1, 32) AS cws))")).as("c"))
        .select(col("doc_id"),
          col("c.i").cast("long").as("chunk_idx"),
          (col("c.i") * 24 + 1).cast("long").as("start_word"),
          size(col("c.cws")).cast("long").as("n_tokens"),
          h60(array_join(col("c.cws"), " ")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---------------------------------------------------------------------
    // Content-defined chunking (the Rabin/Gear CDC idea applied at word
    // granularity): a chunk boundary falls AFTER any word whose hash ≡ 0
    // (mod 8) — expected chunk ≈ 8 words, and boundaries depend only on
    // LOCAL content, so inserting or deleting a sentence shifts one
    // chunk instead of re-striding the whole document (the failure mode
    // of p_chunk_tokens' fixed windows; CDC chunk hashes keep matching
    // downstream dedup/embedding keys across edits). Pure scan-local
    // and LINEAR per doc: boundary positions first, then one slice per
    // chunk — each word is copied exactly once. (The naive fold that
    // concat-accumulates chunks word by word re-copies the accumulator
    // per element — quadratic per doc: 58 s at the 100× probe vs 21 s
    // for this formulation, which is md5-bound — one hash per word is
    // the boundary definition itself.) ZERO shuffle before the
    // oracle-compare sort.
    QuerySpec.sql(
      "p_chunk_cdc",
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |), tok AS (
         |  SELECT doc_id, unnest(ws) AS word,
         |         unnest(range(1, len(ws) + 1)) AS pos
         |  FROM w
         |), c AS (
         |  SELECT doc_id, pos, word,
         |         coalesce(SUM(CASE WHEN ${oH32("word")} % 8 = 0
         |                           THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |           0) AS chunk_idx
         |  FROM tok
         |)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(count(*) AS BIGINT) AS n_words,
         |       ${oH60("string_agg(word, ' ' ORDER BY pos)")} AS chunk_hash
         |FROM c GROUP BY doc_id, chunk_idx
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      val boundary = (w: Column) => h32(w) % 8 === 0
      // 1-based positions of chunk-closing words.
      val bpos = transform(
        filter(
          transform(col("ws"), (w, i) =>
            struct((i + 1).as("p"), boundary(w).as("b"))),
          x => x.getField("b")),
        x => x.getField("p"))
      // Chunk k spans starts[k]..ends[k]; the trailing (start > end)
      // pair appears iff the last word closed a chunk — filtered out.
      val chunks = expr(
        """filter(
          |  transform(concat(array(1), transform(bpos, p -> p + 1)),
          |    (st, i) -> struct(st AS st,
          |      element_at(concat(bpos, array(size(ws))), i + 1) AS en)),
          |  c -> c.st <= c.en)""".stripMargin)
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("bpos", bpos)
        .select(col("doc_id"), col("ws"),
          posexplode(chunks).as(Seq("chunk_idx", "c")))
        .select(col("doc_id"), col("chunk_idx"),
          expr("slice(ws, c.st, c.en - c.st + 1)").as("cws"))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(col("cws")).cast("long").as("n_words"),
          h60(array_join(col("cws"), " ")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---------------------------------------------------------------------
    // Curriculum ordering: phase docs easy→hard for staged training
    // (curriculum-learning data prep). Difficulty = mean word length in
    // exact micro units; phases are VALUE-bucketed at fixed cutoffs
    // (4.40/4.50/4.63 chars — the corpus quartiles, stable across SFs)
    // rather than rank-bucketed: ntile() over a global ORDER BY funnels
    // the corpus into ONE window task, while value cutoffs keep phase
    // assignment scan-local with zero shuffle — the difference between
    // a curriculum that plans at 100 TB and one that doesn't (rank
    // boundaries at scale come from approx quantiles over a sample,
    // then apply as values — this operator IS that apply step). The
    // within-phase order key is the md5 shuffle convention of
    // p_train_shards: a loader sorts by (phase, order_key) and gets a
    // deterministic easy→hard schedule, shuffled within each phase.
    QuerySpec.sql(
      "p_curriculum_order",
      s"""SELECT doc_id,
         |       (len(replace(text, ' ', '')) * 1000000)
         |         // len(string_split(text, ' ')) AS difficulty_micro,
         |       CAST(CASE
         |         WHEN (len(replace(text, ' ', '')) * 1000000)
         |              // len(string_split(text, ' ')) < 4400000 THEN 0
         |         WHEN (len(replace(text, ' ', '')) * 1000000)
         |              // len(string_split(text, ' ')) < 4500000 THEN 1
         |         WHEN (len(replace(text, ' ', '')) * 1000000)
         |              // len(string_split(text, ' ')) < 4630000 THEN 2
         |         ELSE 3 END AS BIGINT) AS phase,
         |       ${oH60("CAST(doc_id AS VARCHAR) || ':' || text")} AS order_key
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          // BIGINT before the ×1e6: a ~2200-char doc would wrap INT32.
          expr("(CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000000) " +
            "div size(split(text, ' '))").cast("long").as("difficulty_micro"),
          h60(concat(col("doc_id").cast("string"), lit(":"), col("text")))
            .as("order_key"))
        .withColumn("phase",
          when(col("difficulty_micro") < 4400000L, 0L)
            .when(col("difficulty_micro") < 4500000L, 1L)
            .when(col("difficulty_micro") < 4630000L, 2L)
            .otherwise(3L))
        .select("doc_id", "difficulty_micro", "phase", "order_key")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Deterministic training-shard manifest: the global-shuffle prep a data
    // loader consumes. Every document gets a content-derived order key
    // (md5 — re-derivable on any cluster, any retry, never rand()) and a
    // shard = key mod 64; the manifest reports, per shard, its doc/token
    // mass, source diversity (the interleaving a shuffled loader expects),
    // and the first document in shard order (the determinism witness a
    // resumable loader seeks to). 100 TB posture: shard assignment is
    // scan-local; the aggregate and the per-shard head are one groupBy and
    // one WindowGroupLimit-style window over the SAME hash-partitioned
    // exchange on `shard`; the real materialization is a
    // `partitionBy(shard)` write with in-shard sort — no global sort ever.
    QuerySpec.sql(
      "p_train_shards",
      s"""WITH k AS (
         |  SELECT doc_id, source,
         |         len(string_split(text, ' ')) AS n_tok,
         |         ${oH60("CAST(doc_id AS VARCHAR) || ':' || text")} AS okey
         |  FROM documents
         |), s AS (SELECT *, okey % 64 AS shard FROM k),
         |agg AS (
         |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
         |  FROM s GROUP BY 1
         |), head AS (
         |  SELECT shard, doc_id AS head_doc FROM (
         |    SELECT shard, doc_id,
         |           row_number() OVER (PARTITION BY shard
         |                              ORDER BY okey, doc_id) AS rn
         |    FROM s) WHERE rn = 1
         |)
         |SELECT shard, n_docs, n_tokens, n_sources, head_doc
         |FROM agg JOIN head USING (shard) ORDER BY shard""".stripMargin) { (s, dir) =>
      val keyed = docs(s, dir).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("n_tok"),
          h60(concat(col("doc_id").cast("string"), lit(":"), col("text"))).as("okey"))
        .withColumn("shard", col("okey") % 64)
      val agg = keyed.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        countDistinct(col("source")).as("n_sources"))
      val w = Window.partitionBy("shard").orderBy(col("okey"), col("doc_id"))
      val head = keyed.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("shard"), col("doc_id").as("head_doc"))
      agg.join(head, "shard")
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          col("n_sources"), col("head_doc"))
        .orderBy("shard")
    },

    // ---------------------------------------------------------------------
    // Exact-substring deduplication with REWRITE (the ExactSubstr recipe of
    // Lee et al. 2022, arXiv:2107.06499, at fixed-window granularity):
    // every document is cut into disjoint 8-word blocks; a block whose
    // content appeared EARLIER in the corpus (global first occurrence by
    // (doc_id, block_idx)) is removed, and the document is rewritten from
    // its surviving blocks + the <8-word tail. Output pins the rewrite
    // exactly: block/removal counts, the new length, and a hash of the
    // rewritten text. The suffix-array formulation of the paper is a
    // single-machine construction; disjoint-block hashing is its
    // distributable form — every stage is a bounded-key join or a linear
    // aggregate. 100 TB posture: first-occurrence is one min-aggregate
    // over block hashes (map-side combined), membership is one equi-join
    // back on the hash (corpus-sized build side — AQE picks the join
    // strategy from runtime sizes, same shape as p_span_dedup), and the
    // rewrite is a per-doc regroup on the documents' own key.
    QuerySpec.sql("p_substr_dedup", substrDedupOracle) { (s, dir) =>
      val base = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), col("ws"), size(col("ws")).as("n"),
          expr("size(ws) div 8").as("nb"))
      // sequence(0, -1) would DESCEND in Spark; guard the zero-block case.
      val h = base
        .select(col("doc_id"), explode(expr(
          "IF(nb = 0, array()," +
            " transform(sequence(0, nb - 1)," +
            "   i -> struct(i AS idx, array_join(slice(ws, i * 8 + 1, 8), ' ') AS btext)))"))
          .as("c"))
        .select(col("doc_id"), col("c.idx").as("idx"), col("c.btext").as("btext"))
        .withColumn("bh", h60(col("btext")))
        .withColumn("ord", col("doc_id") * 1000000 + col("idx"))
        .persist()
      val first = h.groupBy("bh").agg(min(col("ord")).as("keep_ord"))
      val kept = h.join(first, "bh").filter(col("ord") === col("keep_ord"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          expr("array_join(transform(array_sort(collect_list(struct(idx, btext)))," +
            " x -> x.btext), ' ')").as("ktext"))
      base.join(kept, Seq("doc_id"), "left")
        .withColumn("n_removed", col("nb") - coalesce(col("n_kept"), lit(0L)))
        .withColumn("tail",
          expr("IF(n = nb * 8, '', array_join(slice(ws, nb * 8 + 1, n - nb * 8), ' '))"))
        .withColumn("new_text",
          expr("array_join(filter(array(coalesce(ktext, ''), tail), x -> x != ''), ' ')"))
        .select(col("doc_id"),
          col("nb").cast("long").as("n_blocks"),
          col("n_removed").cast("long").as("n_removed"),
          (col("n") - lit(8) * col("n_removed")).cast("long").as("n_words_new"),
          h60(col("new_text")).as("new_hash"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Product-quantization ANN (Jégou et al. 2011, the IVFADC building
    // block): 64 dims = 8 subspaces × 8 dims, 16 codewords per subspace —
    // every base vector collapses to an 8-byte code (32× compression of
    // the 256-byte float32 vector; the ONLY way 100 TB of embeddings fits
    // a cluster's RAM). Search is asymmetric distance computation: each
    // probe precomputes its 8×16 inner-product lookup table; a candidate's
    // score is 8 table lookups, never a 64-dim float op. Per-term scores
    // are floor-scaled to integer micros BEFORE the 8-term sum, so the
    // accumulation is order-independent (float sums are not) and the
    // oracle compare stays exact. 100 TB posture: the codebook is a
    // 128-row broadcast table (same table-not-literals reasoning as the
    // IVF quantizer — a trained codebook is a data swap); encoding is one
    // crossJoin + map-side-combined argmin per (vector, subspace); the
    // probe LUT (queries × 128 rows) is broadcast and scoring is one
    // map-side-combined sum — compose with the IVF coarse lists
    // (p_ann_ivf) to bound the scored candidates per probe.
    QuerySpec.sql("p_ann_pq", annPqOracle) { (s, dir) =>
      val cb = broadcast(pqCodebook(s))
      val e = embs(s, dir)
      // Encode: argmin_j ||x_m − c_{m,j}||²; the ||x_m||² term is constant
      // per (vector, subspace), so argmin(cn2 − 2·x_m·c), ties to lowest j.
      // One compiled scan-local pass ([[graft.functions.PqEncodeCodes]] —
      // bit-exact with the crossJoin+max_by formulation it replaced, pinned
      // in FunctionsSpec): the codebook is a driver-side constant, so the
      // k·m× row expansion and the groupBy argmin shuffle buy nothing.
      val codes = pqCodes(e)
      val lut = e.filter(col("vec_id") < 20)
        .crossJoin(cb)
        .select(col("vec_id").as("query_id"), col("m"), col("j"),
          floor(lit(1000000.0) *
            dot(expr(s"slice(embedding, m * $PqD + 1, $PqD)"), col("cvec")))
            .cast("long").as("qd"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("adc_micro").desc, col("neighbor_id"))
      codes.join(broadcast(lut), Seq("m", "j"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qd"))
        .groupBy("query_id", "neighbor_id")
        .agg(sum(col("qd")).as("adc_micro"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc_micro"))
        .orderBy("query_id", "rank")
    },

    // ---------------------------------------------------------------------
    // IVFADC — the full Jégou et al. 2011 composition, and the layout
    // production ANN systems (FAISS's IndexIVFPQ) actually deploy at this
    // data scale: the IVF coarse quantizer bounds the candidates to the
    // probe's nprobe = 2 inverted lists (nprobe/K of the corpus), and PQ
    // asymmetric distance scores them — 8 integer table lookups per
    // candidate against vectors stored as 8-byte codes. Per 100 TB query:
    // cost = (nprobe/K) × corpus × 8 lookups, memory = codes not floats.
    // Everything composes from the two operators' own building blocks:
    // the coarse lists partition the base table (at scale: PARTITIONED BY
    // cluster, so a probe batch touches nprobe/K of the files), the
    // codebook and probe LUT are the same broadcast tables as p_ann_pq.
    QuerySpec.sql("p_ann_ivfpq", annIvfPqOracle) { (s, dir) =>
      val scored = ivfScored(s, dir).persist()
      val cb = broadcast(pqCodebook(s))
      // Same compiled PQ encoder as p_ann_pq (see that query's comment).
      val codes = pqCodes(embs(s, dir))
      val base = ivfAssigned(scored).join(codes, "vec_id")
      val wc = Window.partitionBy("vec_id").orderBy(col("dk").desc, col("k"))
      val probeClusters = scored.filter(col("vec_id") < 20)
        .withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= 2)
        .select(col("vec_id").as("query_id"), col("k").as("cluster"))
      val lut = embs(s, dir).filter(col("vec_id") < 20).crossJoin(cb)
        .select(col("vec_id").as("query_id"), col("m"), col("j"),
          floor(lit(1000000.0) *
            dot(expr(s"slice(embedding, m * $PqD + 1, $PqD)"), col("cvec")))
            .cast("long").as("qd"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("adc_micro").desc, col("neighbor_id"))
      broadcast(probeClusters).join(base, Seq("cluster"))
        .filter(col("vec_id") =!= col("query_id"))
        .join(broadcast(lut), Seq("query_id", "m", "j"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qd"))
        .groupBy("query_id", "neighbor_id")
        .agg(sum(col("qd")).as("adc_micro"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc_micro"))
        .orderBy("query_id", "rank")
    },

    // ---------------------------------------------------------------------
    // Inter-source overlap matrix: pairwise shingle-level Jaccard between
    // every pair of sources — the corpus-DIVERSITY report a mixture
    // designer reads before setting weights (near-identical crawls get
    // merged or down-weighted; p_dedup_source_matrix counts verified
    // doc-level duplicate PAIRS, this measures vocabulary-level overlap of
    // the sources themselves). Shape at 100 TB: the distinct (source, sh)
    // relation is vocabulary-bounded (Heaps' law), the self-join is an
    // equi-join on the shingle — a shingle present in k sources emits
    // C(k,2) ≤ C(#sources,2) pairs, so the join output is bounded by
    // #shingles × #sources², never doc-count²; the full pair frame is
    // #sources² rows built from the per-source count table. A production
    // pass adds the standard document-frequency cap on stop-shingles.
    QuerySpec.sql(
      "p_source_overlap",
      s"""$OShinglesCteBySource,
         |per AS (
         |  SELECT s.source, CAST(coalesce(c.n, 0) AS BIGINT) AS n
         |  FROM (SELECT DISTINCT source FROM documents) s
         |  LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n
         |             FROM ssh GROUP BY 1) c ON s.source = c.source
         |),
         |inter AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         CAST(count(*) AS BIGINT) AS n_common
         |  FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.source < b.source
         |  GROUP BY 1, 2
         |)
         |SELECT pa.source AS src_a, pb.source AS src_b,
         |       coalesce(n_common, 0) AS n_common,
         |       pa.n AS n_a, pb.n AS n_b,
         |       CASE WHEN pa.n + pb.n - coalesce(n_common, 0) > 0
         |            THEN (coalesce(n_common, 0) * 1000000)
         |                   // (pa.n + pb.n - coalesce(n_common, 0))
         |            ELSE 0 END AS jaccard_ppm
         |FROM per pa JOIN per pb ON pa.source < pb.source
         |LEFT JOIN inter ON src_a = pa.source AND src_b = pb.source
         |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
      // Deliberately NOT persisted: the overlap self-join's two sides are
      // the identical exchange subtree (AQE plans a ReusedExchange), and a
      // CacheManager persist forces columnar materialization of the wide
      // string relation instead — measured +0.6 s at sf0.1 when tried in
      // round 21.
      val sh = docs(s, dir)
        .select(col("source"), explode(shingles3(col("text"))).as("sh"))
        .distinct()
      // Source list from the DOCUMENTS table, not the shingle relation: a
      // source whose docs are all < 3 words has an empty vocabulary but
      // still belongs in every one of its matrix rows (n=0, jaccard 0 —
      // the two-empty-vocab denominator is pinned in both engines).
      val allSrc = docs(s, dir).select("source").distinct()
      val per = allSrc
        .join(sh.groupBy("source").agg(count(lit(1)).as("cnt")),
          Seq("source"), "left")
        .select(col("source"), coalesce(col("cnt"), lit(0L)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_common"))
      // #sources² pair frame from the tiny per-source table; the overlap
      // join fills in zero for disjoint pairs.
      val pairs = per.select(col("source").as("src_a"), col("n").as("n_a"))
        .join(per.select(col("source").as("src_b"), col("n").as("n_b")),
          col("src_a") < col("src_b"))
      pairs.join(inter, Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          col("n_a"), col("n_b"),
          expr("CASE WHEN n_a + n_b - coalesce(n_common, 0) > 0 THEN " +
            "(coalesce(n_common, 0) * 1000000) div " +
            "(n_a + n_b - coalesce(n_common, 0)) ELSE 0 END")
            .as("jaccard_ppm"))
        .orderBy("src_a", "src_b")
    },

    // ---------------------------------------------------------------------
    // Temperature-scaled mixture weights (multilingual sampling, XLM
    // arXiv:1901.07291 §3.1): resampling shares ∝ share^(1/T) with T = 2 —
    // the standard low-resource up-weighting. Cross-engine exactness
    // hinges on IEEE-754 sqrt being CORRECTLY ROUNDED (unlike pow/exp/ln,
    // which differ at ULP level between libm and the JVM): share_ppm·1e6
    // ≤ 1e12 is exactly representable in double, both engines produce the
    // bit-identical square root, and floor lands on the same integer.
    // Shape at 100 TB: one map-side-combined corpus aggregate to #sources
    // rows; everything after is arithmetic on that tiny frame.
    QuerySpec.sql(
      "p_mix_temperature",
      """WITH per AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source
        |), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per),
        |shr AS (
        |  SELECT source, n_tokens,
        |         (n_tokens * 1000000) // total_tokens AS token_share_ppm,
        |         CAST(floor(sqrt(CAST((n_tokens * 1000000) // total_tokens
        |           AS DOUBLE) * 1000000)) AS BIGINT) AS root
        |  FROM per, tot
        |), rtot AS (SELECT CAST(sum(root) AS BIGINT) AS root_total FROM shr)
        |SELECT source, n_tokens, token_share_ppm,
        |       (root * 1000000) // root_total AS temp_share_ppm,
        |       CASE WHEN token_share_ppm > 0
        |            THEN ((root * 1000000) // root_total) * 1000000
        |                   // token_share_ppm
        |            ELSE 0 END AS boost_ppm
        |FROM shr, rtot ORDER BY source""".stripMargin) { (s, dir) =>
      val per = docs(s, dir)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("total_tokens"))
      val shr = per.crossJoin(broadcast(tot))
        .withColumn("token_share_ppm",
          expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div " +
            "total_tokens AS BIGINT)"))
        .withColumn("root",
          floor(sqrt(col("token_share_ppm").cast("double") * 1000000.0))
            .cast("long"))
      val rtot = shr.agg(sum(col("root")).as("root_total"))
      shr.crossJoin(broadcast(rtot))
        .select(col("source"), col("n_tokens"), col("token_share_ppm"),
          expr("(root * 1000000) div root_total").as("temp_share_ppm"),
          // A source below 1 ppm of the corpus floors to share 0; DuckDB's
          // // would error and Spark's div would NULL on it, so the boost
          // is pinned to 0 in BOTH engines (the sub-ppm tail needs a wider
          // unit, not a boost number).
          expr("CASE WHEN token_share_ppm > 0 THEN " +
            "((root * 1000000) div root_total) * 1000000 div " +
            "token_share_ppm ELSE 0 END").as("boost_ppm"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------------
    // Lexicon topic tagging: per document, match counts against small
    // topical lexicons plus the dominant topic (deterministic tie-break to
    // the alphabetically-first topic) — the taxonomy-labeling pass a
    // mixture report slices on (FlashText/Aho-Corasick shape; at real
    // vocabulary sizes the lexicons become a broadcast map feeding one
    // trie-match pass, same contract). The lexicons ride INSIDE the scan
    // as array literals — one lambda pass per row over the word array,
    // ZERO shuffle (the spec asserts no Exchange in the plan).
    QuerySpec.sql(
      "p_topic_tag",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |c AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter(ws, x -> list_contains($OTopicRelational, x))) AS BIGINT) AS n_relational,
         |         CAST(len(list_filter(ws, x -> list_contains($OTopicStorage, x))) AS BIGINT) AS n_storage,
         |         CAST(len(list_filter(ws, x -> list_contains($OTopicStreaming, x))) AS BIGINT) AS n_streaming
         |  FROM w
         |)
         |SELECT doc_id, n_relational, n_storage, n_streaming,
         |       CASE WHEN n_relational >= n_storage AND n_relational >= n_streaming
         |              THEN 'relational'
         |            WHEN n_storage >= n_streaming THEN 'storage'
         |            ELSE 'streaming' END AS top_topic
         |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      def matches(lexicon: Seq[String]): Column =
        size(filter(col("ws"),
          w => array_contains(array(lexicon.map(lit): _*), w))).cast("long")
      docs(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n_relational", matches(TopicRelational))
        .withColumn("n_storage", matches(TopicStorage))
        .withColumn("n_streaming", matches(TopicStreaming))
        .select(col("doc_id"), col("n_relational"), col("n_storage"),
          col("n_streaming"),
          when(col("n_relational") >= col("n_storage") &&
            col("n_relational") >= col("n_streaming"), "relational")
            .when(col("n_storage") >= col("n_streaming"), "storage")
            .otherwise("streaming").as("top_topic"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------------
    // Sequence-length bucketing report — the batching-efficiency audit a
    // training launch runs before picking bucket boundaries (pad-to-
    // power-of-two batching, the dynamic-batching complement of
    // p_pack_sequences): each doc lands in the smallest power-of-two
    // bucket holding its token count; per bucket the report gives doc and
    // token mass, the padded cost of batching at that width, the padding
    // waste (ppm, integer arithmetic), and the batch count at an
    // 8192-token batch budget. ONE scan-local CASE ladder + ONE map-side-
    // combined groupBy over ≤9 groups — no join, no window; at 100 TB
    // this is a single partial-agg pass whose reduce side is 9 rows.
    // (The ladder tops out at 4096; corpus max here is 100 tokens — a
    // longer-context corpus extends the ladder, it never changes shape.)
    QuerySpec.sql(
      "p_len_bucket",
      """WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents
        |), b AS (
        |  SELECT ntok,
        |         CASE WHEN ntok <= 16 THEN 16 WHEN ntok <= 32 THEN 32
        |              WHEN ntok <= 64 THEN 64 WHEN ntok <= 128 THEN 128
        |              WHEN ntok <= 256 THEN 256 WHEN ntok <= 512 THEN 512
        |              WHEN ntok <= 1024 THEN 1024 WHEN ntok <= 2048 THEN 2048
        |              ELSE 4096 END AS bucket
        |  FROM t
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(ntok) AS BIGINT) AS sum_tokens,
        |       CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
        |       CAST(((count(*) * bucket - sum(ntok)) * 1000000)
        |            // (count(*) * bucket) AS BIGINT) AS waste_ppm,
        |       CAST((count(*) + (8192 // bucket) - 1) // (8192 // bucket)
        |            AS BIGINT) AS n_batches
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(size(split(col("text"), " ")).cast("long").as("ntok"))
        .withColumn("bucket",
          when(col("ntok") <= 16, 16L).when(col("ntok") <= 32, 32L)
            .when(col("ntok") <= 64, 64L).when(col("ntok") <= 128, 128L)
            .when(col("ntok") <= 256, 256L).when(col("ntok") <= 512, 512L)
            .when(col("ntok") <= 1024, 1024L).when(col("ntok") <= 2048, 2048L)
            .otherwise(4096L))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
        .select(col("bucket"), col("n_docs"), col("sum_tokens"),
          (col("n_docs") * col("bucket")).as("padded_tokens"),
          expr("((n_docs * bucket - sum_tokens) * 1000000) " +
            "div (n_docs * bucket)").as("waste_ppm"),
          expr("(n_docs + (8192 div bucket) - 1) div (8192 div bucket)")
            .as("n_batches"))
        .orderBy("bucket")
    },

    // ---------------------------------------------------------------------
    // Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009,
    // SIGIR — the fusion rule RAG stacks and dataset-search tools default
    // to): per probe document (doc_id < 10), a LEXICAL arm ranks the
    // corpus by shared distinct 3-gram shingles (the inverted-index
    // retrieval shape: probe shingles broadcast, ONE equi-join on the
    // shingle, count per candidate — at 100 TB this is the posting-list
    // intersection, never a doc×doc scan) and a VECTOR arm ranks by
    // embedding cosine (brute-force broadcast arm here, the p_ann_topk
    // yardstick; a deployment swaps in the LSH/IVF arm — same contract).
    // Each arm keeps its top-20; fusion scores 10⁹//(60+rank) per arm in
    // BIGINT (k=60 from the paper; integer division so the oracle compare
    // is exact), a FULL OUTER join merges the two lists (0-rank sentinel
    // = "not retrieved by this arm"), and the fused top-5 per probe is a
    // rank-limited window. Candidate-bounded end to end: ≤40 fused rows
    // per probe regardless of corpus size.
    QuerySpec.sql(
      "p_retrieve_hybrid",
      s"""$OShinglesCte, lexov AS (
         |  SELECT q.doc_id AS query_id, d.doc_id AS doc_id,
         |         CAST(count(*) AS BIGINT) AS ov
         |  FROM shingles q JOIN shingles d
         |    ON q.sh = d.sh AND q.doc_id < 10 AND d.doc_id <> q.doc_id
         |  GROUP BY 1, 2
         |), lex AS (
         |  SELECT query_id, doc_id, lex_rank FROM (
         |    SELECT query_id, doc_id,
         |           CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY ov DESC, doc_id) AS BIGINT) AS lex_rank
         |    FROM lexov
         |  ) WHERE lex_rank <= 20
         |), e AS (
         |  $ONormBody
         |), vec AS (
         |  SELECT query_id, doc_id, vec_rank FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
         |           CAST(row_number() OVER (PARTITION BY a.vec_id
         |             ORDER BY ($OCos) DESC, b.vec_id) AS BIGINT) AS vec_rank
         |    FROM e a JOIN e b ON a.vec_id < 10 AND b.vec_id <> a.vec_id
         |  ) WHERE vec_rank <= 20
         |), fused AS (
         |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         |         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |         COALESCE(l.lex_rank, 0) AS lex_rank,
         |         COALESCE(v.vec_rank, 0) AS vec_rank,
         |         CAST((CASE WHEN l.lex_rank IS NULL THEN 0
         |                    ELSE 1000000000 // (60 + l.lex_rank) END)
         |            + (CASE WHEN v.vec_rank IS NULL THEN 0
         |                    ELSE 1000000000 // (60 + v.vec_rank) END)
         |              AS BIGINT) AS rrf_score
         |  FROM lex l FULL OUTER JOIN vec v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
         |)
         |SELECT query_id, doc_id, lex_rank, vec_rank, rrf_score, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
         |  FROM fused
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val sh = shingleRows(docs(s, dir))
      val qsh = broadcast(sh.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("sh")))
      val wl = Window.partitionBy("query_id").orderBy(col("ov").desc, col("doc_id"))
      val lex = qsh.join(sh, Seq("sh"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("ov"))
        .withColumn("lex_rank", row_number().over(wl).cast("long"))
        .filter(col("lex_rank") <= 20)
        .select("query_id", "doc_id", "lex_rank")
      val e = embsN(s, dir)
      val probes = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("ea"),
          col("norm").as("na")))
      val base = e.select(col("vec_id").as("doc_id"), col("embedding").as("eb"),
        col("norm").as("nb"))
      val cosc = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val wv = Window.partitionBy("query_id").orderBy(col("cos").desc, col("doc_id"))
      val vec = probes.join(base, col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"), cosc.as("cos"))
        .withColumn("vec_rank", row_number().over(wv).cast("long"))
        .filter(col("vec_rank") <= 20)
        .select("query_id", "doc_id", "vec_rank")
      val wf = Window.partitionBy("query_id").orderBy(col("rrf_score").desc, col("doc_id"))
      lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf_score",
          expr("(CASE WHEN lex_rank IS NULL THEN CAST(0 AS BIGINT) " +
            "ELSE 1000000000 div (60 + lex_rank) END) " +
            "+ (CASE WHEN vec_rank IS NULL THEN CAST(0 AS BIGINT) " +
            "ELSE 1000000000 div (60 + vec_rank) END)"))
        .withColumn("lex_rank", coalesce(col("lex_rank"), lit(0L)))
        .withColumn("vec_rank", coalesce(col("vec_rank"), lit(0L)))
        .withColumn("rank", row_number().over(wf).cast("long"))
        .filter(col("rank") <= 5)
        .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf_score", "rank")
        .orderBy("query_id", "rank")
    },

    // ---------------------------------------------------------------------
    // Graph centrality over the corpus kNN graph — integer-arithmetic
    // PageRank (Page et al. 1999) on the p_knn_graph edge set, the
    // graph-density selection signal of graph-based curation (pick
    // central/prototypical docs, or DOWN-weight them for diversity).
    // All arithmetic is BIGINT at a 10⁹ scale with truncating division
    // (score//outdeg contributions, (85·inflow)//100 damping, +0.15·10⁹
    // teleport), so three engines' floats never meet and the oracle
    // compare is exact. Plan: the edge list is built once (the p_knn_graph
    // bucket self-join + WindowGroupLimit top-3) and persisted; the
    // iterative core is [[GraphRank.pageRank]] — PrIters iterations
    // (GRAFT_PAGERANK_ITERS, oracle CTE chain generated to match) of the
    // canonical distributed-PageRank shape with localCheckpoint lineage
    // cuts every 5 rounds, so a 20-iteration centrality run plans a
    // bounded DAG. At 100 TB the edges are hash-partitioned by src and
    // every iteration reuses that partitioning; dangling nodes (singleton
    // buckets) simply leak their mass, identically in both engines.
    // Output: the 30 most central vectors (TakeOrdered, never a global
    // sort) with their in-degree.
    QuerySpec.sql("p_graph_pagerank", pagerankOracle) { (s, dir) =>
      val bucketed = bucketedEmbs(s, dir)
      val ea = bucketed.select(col("vec_id").as("a_id"),
        col("embedding").as("ea"), col("norm").as("na"), col("bucket"))
      val eb = bucketed.select(col("vec_id").as("b_id"),
        col("embedding").as("eb"), col("norm").as("nb"), col("bucket"))
      val cosc = dot(col("ea"), col("eb")) / (col("na") * col("nb"))
      val wk = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
      val edges = ea.join(eb, Seq("bucket"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), cosc.as("cos"))
        .withColumn("rank", row_number().over(wk))
        .filter(col("rank") <= 3)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .persist()
      val nodes = bucketed.select(col("vec_id"))
      // SIZE-GATED broadcast iteration (same driver-side estimate
      // discipline as the jaccard/shingle gates — never Catalyst's
      // scan-derived guess): top-3 edges ≈ 3 rows/vector ≈ 120 B/vector
      // framed, score/inflow tables ≈ 32 B/vector. Under the session
      // threshold each iteration is two broadcast joins + the one
      // unavoidable groupBy(dst) exchange; past it (the 100 TB case) the
      // canonical shuffle plan runs unchanged. The vector count comes from
      // the parquet FOOTERS (a driver-side metadata read), not a count()
      // job: sizing a gate must not cost an action at DataFrame-
      // construction time (see [[parquetRowCount]]).
      val nVecs = parquetRowCount(s, s"$dir/embeddings.parquet")
      val bcThreshold = s.sessionState.conf.autoBroadcastJoinThreshold
      val smallGraph = bcThreshold > 0 && nVecs * 120L <= bcThreshold
      val scores = GraphRank.pageRank(nodes, edges, PrIters,
        broadcastSmall = smallGraph)
      val indeg = edges.groupBy("dst").agg(count(lit(1)).as("in_deg"))
      scores
        .join(indeg.withColumnRenamed("dst", "idst"),
          col("vec_id") === col("idst"), "left")
        .select(col("vec_id"), col("score").as("pr_score"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"))
        .orderBy(col("pr_score").desc, col("vec_id"))
        .limit(30)
    },

    // ---------------------------------------------------------------------
    // Tokenizer fertility by (predicted) language — the report a
    // multilingual pipeline reads to detect tokenizer bias: per language,
    // subword tokens per whitespace word (fertility) and chars per
    // subword, in exact ppm. Composes two oracle-proven expression sets
    // (the langid marker scoring and the p_text_tokens subword regex) on
    // ONE scan-local pass, then a map-side-combined groupBy to ≤5 rows —
    // at 100 TB nothing shuffles but the per-language partials. The ppm
    // ratios widen the summed counts to DECIMAL(38,0) before the ×1e6
    // scaling (DuckDB computes the same products in HUGEINT), so the
    // math is exact at ~1e13+ corpus words, not just at test scale.
    QuerySpec.sql("p_tokenizer_fertility", tokenizerFertilityOracle) { (s, dir) =>
      val ws = split(col("text"), " ")
      def score(words: Seq[String]): Column =
        size(filter(ws, w => w.isin(words: _*))).cast("long")
      docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          score(LangMarkers("de")).as("s_de"),
          score(LangMarkers("en")).as("s_en"),
          score(LangMarkers("es")).as("s_es"),
          score(LangMarkers("fr")).as("s_fr"),
          score(LangMarkers("zh")).as("s_zh"),
          size(ws).cast("long").as("n_words"),
          size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0)))
            .cast("long").as("n_subwords"))
        .withColumn("best",
          greatest(col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh")))
        .withColumn("pred_lang",
          when(col("s_de") === col("best"), "de")
            .when(col("s_en") === col("best"), "en")
            .when(col("s_es") === col("best"), "es")
            .when(col("s_fr") === col("best"), "fr")
            .otherwise("zh"))
        .groupBy("pred_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("sum_words"),
          sum(col("n_subwords")).as("sum_subwords"),
          sum(col("n_chars")).as("sum_chars"))
        .select(col("pred_lang"), col("n_docs"), col("sum_words"),
          col("sum_subwords"),
          expr("CASE WHEN sum_words > 0 " +
            "THEN CAST((CAST(sum_subwords AS DECIMAL(38,0)) * 1000000) " +
            "div sum_words AS BIGINT) ELSE CAST(0 AS BIGINT) END")
            .as("fertility_ppm"),
          expr("CASE WHEN sum_subwords > 0 " +
            "THEN CAST((CAST(sum_chars AS DECIMAL(38,0)) * 1000000) " +
            "div sum_subwords AS BIGINT) ELSE CAST(0 AS BIGINT) END")
            .as("chars_per_subword_ppm"))
        .orderBy("pred_lang")
    },

    // ---------------------------------------------------------------------
    // Weighted priority sampling (Duffield et al. 2007) — the
    // weighted-without-replacement sampler mixture construction uses when
    // longer/higher-quality docs should be proportionally likelier: each
    // doc draws a deterministic 60-bit uniform u (md5 of its id) and is
    // ranked by the priority key u div w ASCENDING (small key ⟺ large
    // w/u priority), w = word count; top-25 per source survive. ALL
    // INTEGER — no float pow/log to diverge at ULP level, so the sample
    // is hash-exact across engines; u ≤ 2⁶⁰ never overflows. Shape at
    // 100 TB: key is scan-local, the per-source top-k plans as
    // WindowGroupLimit — every map task caps its local 25 BEFORE the
    // exchange (the p_source_quota shape), so the shuffle carries
    // O(sources × k × tasks), not the corpus.
    QuerySpec.sql("p_sample_weighted", sampleWeightedOracle) { (s, dir) =>
      val wnd = Window.partitionBy("source")
        .orderBy(col("sample_key"), col("doc_id"))
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("weight"),
          (h60(col("doc_id").cast("string")) + 1L).as("u"))
        .withColumn("sample_key", expr("u div weight"))
        .withColumn("rank", row_number().over(wnd).cast("long"))
        .filter(col("rank") <= 25)
        .select("source", "doc_id", "weight", "sample_key", "rank")
        .orderBy("source", "rank")
    },

    // ---------------------------------------------------------------------
    // Classifier calibration (reliability diagram): does the learned
    // quality score predict the rule-based keep rate? Classifier scores
    // bucket into 8 fixed 2.0-unit bins (floored division — negatives
    // handled by an explicit sign CASE so Spark's truncate-toward-zero
    // `div` and DuckDB's flooring `//` never see a negative operand);
    // per bin: doc count, exact score sum, and the Gopher-rule keep rate
    // in ppm. Both verdicts come from the SAME shared expressions the
    // single-filter oracles verify (GopherRules / QualityClassifier), on
    // one scan-local pass → ONE map-side-combined aggregate to ≤8 rows.
    QuerySpec.sql("p_cls_calibration", clsCalibrationOracle) { (s, dir) =>
      QualityClassifier.withScore(GopherRules.withFlags(docs(s, dir)))
        .select(col("doc_id"), col("keep").as("rule_keep"),
          col("cls_score_micro").as("score"))
        .withColumn("bucket", expr(
          "greatest(-4L, least(3L, CASE WHEN score >= 0 THEN score div 2000000 " +
            "ELSE -(((-score) + 1999999) div 2000000) END))"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("score")).as("sum_score_micro"),
          sum(col("rule_keep")).as("n_rule_keep"))
        .select(col("bucket"), col("n_docs"), col("sum_score_micro"),
          col("n_rule_keep"),
          expr("(n_rule_keep * 1000000) div n_docs").as("rule_keep_ppm"))
        .orderBy("bucket")
    })

  // ------------------------------------------------- product quantization

  /** PQ geometry: 64 dims = PqM × PqD subspaces, PqK codewords per
    * subspace → an 8-byte code per vector. (defs, not vals: the `specs`
    * Seq renders the oracle SQL during object init, BEFORE later vals
    * would be assigned.) */
  private def PqM = 8
  private def PqD = 8
  private def PqK = 16

  /** Codeword `j` of subspace `m`: md5-derived coordinates in [-1, 1)
    * (seed namespace disjoint from the LSH planes and IVF centroids) —
    * same exact-representability argument as [[planeCoefs]]. */
  private def pqCoefs(m: Int, j: Int): Array[Double] =
    Array.tabulate(PqD) { i =>
      java.lang.Long.parseLong(md5hex(s"pq_${m}_${j}_$i").substring(0, 8), 16)
        .toDouble / 2147483648.0 - 1.0
    }

  /** ||c_{m,j}||², computed once driver-side with the sequential fold both
    * engines consume as the identical rendered literal. */
  private def pqNorm2(m: Int, j: Int): Double = {
    val c = pqCoefs(m, j); var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  /** PQ codes `(vec_id, m, j)` via the compiled scan-local encoder
    * ([[graft.functions.PqEncodeCodes]]): argmin-by-(cost, j) per subspace
    * with the identical double arithmetic and tie order as the
    * crossJoin+max_by formulation it replaced (FunctionsSpec pins the
    * equivalence on real embeddings). The codebook is bound into the
    * expression as the driver-side constant it already was — a trained
    * refresh re-plans the query exactly like re-collecting a trained
    * table. */
  private def pqCodes(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(graft.functions.PqEncodeCodes.encode(col("embedding"),
        IndexedSeq.tabulate(PqM)(m => IndexedSeq.tabulate(PqK)(j => pqCoefs(m, j))),
        IndexedSeq.tabulate(PqM)(m => IndexedSeq.tabulate(PqK)(j => pqNorm2(m, j)))))
        .as(Seq("m", "j")))

  /** The PQ codebook as a 128-row broadcastable TABLE `(m, j, cvec, cn2)`
    * — a trained codebook (per-subspace k-means) is a data swap, exactly
    * like [[Ivf.trainKMeans]] for the coarse quantizer. */
  private def pqCodebook(s: SparkSession): DataFrame = {
    import s.implicits._
    (for (m <- 0 until PqM; j <- 0 until PqK)
      yield (m, j, pqCoefs(m, j).toSeq, pqNorm2(m, j))).toDF("m", "j", "cvec", "cn2")
  }

  /** Oracle mirroring p_ann_pq: the same codebook literals, argmin by
    * (cost, j) per (vector, subspace), micro-floored LUT terms, integer
    * ADC sum, top-5 by (adc DESC, neighbor_id). */
  private def annPqOracle: String = {
    val rows = (for (m <- 0 until PqM; j <- 0 until PqK) yield {
      val lst = pqCoefs(m, j).map(_.toString).mkString("[", ", ", "]")
      s"($m, $j, $lst::DOUBLE[], ${pqNorm2(m, j)})"
    }).mkString(",\n    ")
    s"""WITH cb(m, j, cvec, cn2) AS (VALUES
       |    $rows
       |), e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sub AS (
       |  SELECT vec_id, m, j,
       |         cn2 - 2 * list_dot_product(
       |           list_slice(emb, m * $PqD + 1, m * $PqD + $PqD), cvec) AS cost
       |  FROM e CROSS JOIN cb
       |), codes AS (
       |  SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j,
       |           row_number() OVER (PARTITION BY vec_id, m
       |                              ORDER BY cost, j) AS rn
       |    FROM sub) WHERE rn = 1
       |), lut AS (
       |  SELECT a.vec_id AS query_id, c.m, c.j,
       |         CAST(floor(1000000 * list_dot_product(
       |           list_slice(a.emb, c.m * $PqD + 1, c.m * $PqD + $PqD),
       |           c.cvec)) AS BIGINT) AS qd
       |  FROM e a CROSS JOIN cb c WHERE a.vec_id < 20
       |), adc AS (
       |  SELECT l.query_id, c.vec_id AS neighbor_id,
       |         CAST(sum(l.qd) AS BIGINT) AS adc_micro
       |  FROM codes c JOIN lut l ON c.m = l.m AND c.j = l.j
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, rank, adc_micro FROM (
       |  SELECT query_id, neighbor_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_micro DESC, neighbor_id)
       |              AS BIGINT) AS rank,
       |         adc_micro
       |  FROM adc) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle mirroring p_ann_ivfpq: the IVF assignment + probe-cluster
    * CTEs of [[annIvfOracle]] composed with the PQ codebook/codes/LUT
    * CTEs of [[annPqOracle]]; candidates restricted to the probe's
    * nprobe = 2 lists, scored by the integer ADC sum, top-3. */
  private def annIvfPqOracle: String = {
    def coefList(c: Int): String =
      centroidCoefs(c).map(_.toString).mkString("[", ", ", "]")
    val dots = (0 until IvfK)
      .map(k => s"list_dot_product(embedding::DOUBLE[], ${coefList(k)}::DOUBLE[]) AS d$k")
      .mkString(",\n         ")
    val bestExpr = s"greatest(${(0 until IvfK).map(k => s"d$k").mkString(", ")})"
    val clusterExpr = (0 until IvfK)
      .map(k => s"WHEN d$k = best THEN $k").mkString("CASE ", " ", " END")
    val probeArms = (0 until IvfK)
      .map(k => s"SELECT vec_id AS query_id, $k AS k, d$k AS dk " +
        s"FROM assigned WHERE vec_id < 20")
      .mkString("\n  UNION ALL ")
    val cbRows = (for (m <- 0 until PqM; j <- 0 until PqK) yield {
      val lst = pqCoefs(m, j).map(_.toString).mkString("[", ", ", "]")
      s"($m, $j, $lst::DOUBLE[], ${pqNorm2(m, j)})"
    }).mkString(",\n    ")
    s"""WITH cb(m, j, cvec, cn2) AS (VALUES
       |    $cbRows
       |), em AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |d AS (
       |  SELECT vec_id,
       |         $dots
       |  FROM embeddings
       |), assigned AS (
       |  SELECT vec_id, $clusterExpr AS cluster,
       |         ${(0 until IvfK).map(k => s"d$k").mkString(", ")}
       |  FROM (SELECT *, $bestExpr AS best FROM d)
       |), probe_k AS (
       |  $probeArms
       |), probe_clusters AS (
       |  SELECT query_id, k AS cluster FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY dk DESC, k) AS crank
       |    FROM probe_k
       |  ) WHERE crank <= 2
       |), sub AS (
       |  SELECT vec_id, m, j,
       |         cn2 - 2 * list_dot_product(
       |           list_slice(emb, m * $PqD + 1, m * $PqD + $PqD), cvec) AS cost
       |  FROM em CROSS JOIN cb
       |), codes AS (
       |  SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j,
       |           row_number() OVER (PARTITION BY vec_id, m
       |                              ORDER BY cost, j) AS rn
       |    FROM sub) WHERE rn = 1
       |), lut AS (
       |  SELECT a.vec_id AS query_id, c.m, c.j,
       |         CAST(floor(1000000 * list_dot_product(
       |           list_slice(a.emb, c.m * $PqD + 1, c.m * $PqD + $PqD),
       |           c.cvec)) AS BIGINT) AS qd
       |  FROM em a CROSS JOIN cb c WHERE a.vec_id < 20
       |), adc AS (
       |  SELECT p.query_id, b.vec_id AS neighbor_id,
       |         CAST(sum(l.qd) AS BIGINT) AS adc_micro
       |  FROM probe_clusters p
       |  JOIN assigned b ON b.cluster = p.cluster AND b.vec_id <> p.query_id
       |  JOIN codes c ON c.vec_id = b.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.m = c.m AND l.j = c.j
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, rank, adc_micro FROM (
       |  SELECT query_id, neighbor_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_micro DESC, neighbor_id)
       |              AS BIGINT) AS rank,
       |         adc_micro
       |  FROM adc) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle mirroring p_substr_dedup: same blocks, same global
    * first-occurrence rule, same rewrite (kept blocks in order + tail). */
  private def substrDedupOracle: String = {
    // Outer coalesce: DuckDB's array_to_string over an EMPTY list is NULL
    // (a fully-removed doc with no tail), where Spark's array_join is ''.
    val newText = "coalesce(array_to_string(list_filter(" +
      "[coalesce(ktext, ''), array_to_string(list_slice(ws, nb * 8 + 1, n), ' ')]," +
      " x -> x <> ''), ' '), '')"
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |), b AS (
       |  SELECT doc_id, ws, len(ws) AS n, len(ws) // 8 AS nb FROM w
       |), occ AS (
       |  SELECT doc_id, unnest(range(nb)) AS idx,
       |         unnest(list_transform(range(nb),
       |           i -> array_to_string(list_slice(ws, i * 8 + 1, i * 8 + 8), ' ')))
       |           AS btext
       |  FROM b
       |), h AS (
       |  SELECT doc_id, idx, btext, ${oH60("btext")} AS bh,
       |         doc_id * 1000000 + idx AS ord
       |  FROM occ
       |), fst AS (
       |  SELECT bh, min(ord) AS keep_ord FROM h GROUP BY 1
       |), kept AS (
       |  SELECT h.doc_id, count(*) AS n_kept,
       |         string_agg(h.btext, ' ' ORDER BY h.idx) AS ktext
       |  FROM h JOIN fst f ON f.bh = h.bh AND h.ord = f.keep_ord
       |  GROUP BY 1
       |)
       |SELECT b.doc_id, CAST(nb AS BIGINT) AS n_blocks,
       |       CAST(nb - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |       CAST(n - 8 * (nb - coalesce(n_kept, 0)) AS BIGINT) AS n_words_new,
       |       ${oH60(newText)} AS new_hash
       |FROM b LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ oracle SQL bodies

  private def langidOracle: String = {
    def score(lang: String): String = {
      val lst = LangMarkers(lang).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), w -> w IN ($lst))) AS s_$lang"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, ${score("de")}, ${score("en")}, ${score("es")},
       |         ${score("fr")}, ${score("zh")}
       |  FROM documents
       |), best AS (
       |  SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
       |         greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
       |  FROM scored
       |)
       |SELECT doc_id,
       |  CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
       |       WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
       |       ELSE 'zh' END AS pred_lang,
       |  best AS best_score
       |FROM best ORDER BY doc_id""".stripMargin
  }

  /** Oracle for the integer tf-idf keyword extraction (same rational
    * score, same top-5-per-source window, same tiebreak). */
  private def tfidfOracle: String =
    """WITH toks AS (
      |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents
      |), tfreq AS (
      |  SELECT source, word, CAST(count(*) AS BIGINT) AS tf
      |  FROM toks GROUP BY source, word
      |), dfreq AS (
      |  SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM toks GROUP BY word
      |), nd AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs_total FROM documents
      |), scored AS (
      |  SELECT source, tfreq.word AS word, tf, df,
      |         (tf * 1000000 * n_docs_total) // df AS score_micro
      |  FROM tfreq JOIN dfreq ON tfreq.word = dfreq.word CROSS JOIN nd
      |), ranked AS (
      |  SELECT source, word, tf, df, score_micro,
      |         CAST(row_number() OVER (
      |           PARTITION BY source ORDER BY score_micro DESC, word
      |         ) AS BIGINT) AS rank
      |  FROM scored
      |)
      |SELECT source, word, tf, df, score_micro, rank
      |FROM ranked WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  /** Oracle for the exact-dedup-first + prefix-filtered Jaccard join; same
    * three-stage construction as the Spark side (see the query comment). */
  private def jaccardOracle: String =
    s"""WITH grps AS (
       |  SELECT doc_id, md5(text) AS grp, text FROM documents
       |), members AS (
       |  SELECT grp, doc_id FROM grps
       |), reps AS (
       |  SELECT grp, min(doc_id) AS rep FROM members GROUP BY grp
       |), repdocs AS (
       |  SELECT g.doc_id, g.text FROM grps g
       |  JOIN reps r ON r.grp = g.grp AND r.rep = g.doc_id
       |), words AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM repdocs
       |), shingles AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(ws) - 1, 1)),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
       |  FROM words
       |), hashed AS (
       |  SELECT doc_id, ${oH60("sh")} AS h FROM shingles
       |), lists AS (
       |  SELECT doc_id, list_sort(list(h)) AS shs, count(*) AS n
       |  FROM hashed GROUP BY doc_id
       |), prefix AS (
       |  SELECT doc_id, n, h, list_position(shs, h) AS pos
       |  FROM (SELECT doc_id, n, shs,
       |          unnest(shs[1 : n - (n + 1) // 2 + 1]) AS h FROM lists)
       |), cands AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM prefix a JOIN prefix b ON a.h = b.h AND a.doc_id < b.doc_id
       |  WHERE a.n <= 2 * b.n AND b.n <= 2 * a.n
       |    AND least(a.n - a.pos, b.n - b.pos) + 1 >= (a.n + b.n + 2) // 3
       |), reppairs AS (
       |  SELECT c.da, c.db,
       |         len(list_intersect(la.shs, lb.shs)) AS n_common,
       |         la.n + lb.n - len(list_intersect(la.shs, lb.shs)) AS n_union
       |  FROM cands c
       |  JOIN lists la ON la.doc_id = c.da
       |  JOIN lists lb ON lb.doc_id = c.db
       |  WHERE 2 * len(list_intersect(la.shs, lb.shs))
       |        >= la.n + lb.n - len(list_intersect(la.shs, lb.shs))
       |), cross_pairs AS (
       |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
       |         greatest(ma.doc_id, mb.doc_id) AS doc_b,
       |         rp.n_common, rp.n_union
       |  FROM reppairs rp
       |  JOIN reps ra ON ra.rep = rp.da
       |  JOIN reps rb ON rb.rep = rp.db
       |  JOIN members ma ON ma.grp = ra.grp
       |  JOIN members mb ON mb.grp = rb.grp
       |), within_pairs AS (
       |  SELECT m1.doc_id AS doc_a, m2.doc_id AS doc_b, z.n AS n_common, z.n AS n_union
       |  FROM members m1
       |  JOIN members m2 ON m2.grp = m1.grp AND m1.doc_id < m2.doc_id
       |  JOIN reps r ON r.grp = m1.grp
       |  JOIN lists z ON z.doc_id = r.rep
       |  WHERE z.n >= 1
       |)
       |SELECT doc_a, doc_b, n_common, n_union FROM cross_pairs
       |UNION ALL
       |SELECT doc_a, doc_b, n_common, n_union FROM within_pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** CTE chain ending in `verified(da, db, n_common, n_union)` — the
    * minhash-LSH verified pair set, shared by the pair query's oracle and
    * the clustering oracle. */
  private def minhashVerifiedCtes: String = {
    val sigCols = (0 until 16)
      .map(j => s"min((${MinhashA(j)} * h + ${MinhashB(j)}) % $MinhashP) AS m$j")
      .mkString(",\n    ")
    val bandSelects = (0 until 4).map { b =>
      val ms = (0 until 4).map(r => s"m${4 * b + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $ms)) AS bkey FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""$OShinglesCte, hashed AS (
       |  SELECT doc_id, sh, ${oH32("sh")} AS h FROM shingles
       |), sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hashed GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), cands AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |), common AS (
       |  SELECT c.da, c.db, count(*) AS n_common
       |  FROM cands c
       |  JOIN shingles sa ON sa.doc_id = c.da
       |  JOIN shingles sb ON sb.doc_id = c.db AND sb.sh = sa.sh
       |  GROUP BY 1, 2
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
       |), verified AS (
       |  SELECT c.da, c.db, c.n_common,
       |         sa.n + sb.n - c.n_common AS n_union
       |  FROM common c
       |  JOIN sizes sa ON sa.doc_id = c.da
       |  JOIN sizes sb ON sb.doc_id = c.db
       |  WHERE 2 * c.n_common >= sa.n + sb.n - c.n_common
       |)""".stripMargin
  }

  private def minhashOracle: String =
    s"""$minhashVerifiedCtes
       |SELECT da AS doc_a, db AS doc_b, n_common, n_union
       |FROM verified ORDER BY doc_a, doc_b""".stripMargin

  /** Oracle for the incremental batch dedup: the full verified pair set
    * restricted to incoming doc_b (the oracle favors clarity; the Spark
    * side restricts candidate GENERATION instead — same set). */
  private def minhashIncrementalOracle: String =
    s"""$minhashVerifiedCtes, split AS (
       |  SELECT (max(doc_id) * 4) // 5 AS split_id FROM documents
       |)
       |SELECT da AS doc_a, db AS doc_b, n_common, n_union,
       |       (da <= split_id) AS vs_existing
       |FROM verified, split
       |WHERE db > split_id ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components of the verified pairs as a transitive closure —
    * exact at oracle scale; the unique min-label fixpoint matches the
    * Spark side's label propagation. */
  private def dedupClusterOracle: String = {
    val ctes = minhashVerifiedCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$ctes, sym AS (
       |  SELECT da AS a, db AS b FROM verified
       |  UNION ALL SELECT db, da FROM verified
       |), reach(doc, r) AS (
       |  SELECT DISTINCT a, a FROM sym
       |  UNION
       |  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.doc = s.b
       |), rep AS (
       |  SELECT doc, min(r) AS cluster_rep FROM reach GROUP BY doc
       |)
       |SELECT cluster_rep, CAST(count(*) AS BIGINT) AS n_members,
       |       max(doc) AS max_doc
       |FROM rep GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** CTE chain for the COMPOSED curation pipeline — every stage re-stated
    * in DuckDB SQL over the same CTEs its component oracles use: Gopher
    * rules (p_quality_gopher), exact keeper (min doc_id per md5),
    * survivor-restricted verified pairs + recursive-CTE components
    * (p_dedup_cluster), decontamination counts (p_decontaminate) at the
    * pipeline's 80% verbatim cut, survivor-weighted resample
    * (p_mix_resample's formula). Ends in
    * `resampled(doc_id, source, n_tokens, weight_ppm, n_repeats)`. */
  private def curationCtes: String = {
    val ctes = minhashVerifiedCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$ctes, gtop AS (
       |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n
       |  FROM (SELECT doc_id, word, count(*) AS c
       |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |              FROM documents) GROUP BY 1, 2)
       |  GROUP BY 1
       |), gbase AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |         CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_word_chars,
       |         CAST(len(list_filter(string_split(text, ' '),
       |                              x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
       |  FROM documents
       |), quality AS (
       |  SELECT b.doc_id, b.source, b.n_words
       |  FROM gbase b JOIN gtop t USING (doc_id)
       |  WHERE b.source NOT IN ('src0', 'src1')
       |    AND b.n_words >= 50 AND b.n_words <= 100000
       |    AND 3 * b.n_words <= b.n_word_chars
       |    AND b.n_word_chars <= 10 * b.n_words
       |    AND b.n_stop >= 2 AND 5 * t.top_word_n <= b.n_words
       |), exact AS (
       |  SELECT q.* FROM quality q JOIN (
       |    SELECT min(d.doc_id) AS keeper
       |    FROM documents d JOIN quality USING (doc_id)
       |    GROUP BY md5(d.text)
       |  ) k ON k.keeper = q.doc_id
       |), spairs AS (
       |  SELECT v.da, v.db FROM verified v
       |  JOIN exact ea ON ea.doc_id = v.da
       |  JOIN exact eb ON eb.doc_id = v.db
       |), csym AS (
       |  SELECT da AS a, db AS b FROM spairs
       |  UNION ALL SELECT db, da FROM spairs
       |), creach(doc, r) AS (
       |  SELECT DISTINCT a, a FROM csym
       |  UNION
       |  SELECT s.a, creach.r FROM csym s JOIN creach ON creach.doc = s.b
       |), crep AS (
       |  SELECT doc, min(r) AS rep FROM creach GROUP BY doc
       |), neardup AS (
       |  SELECT e.* FROM exact e LEFT JOIN crep ON crep.doc = e.doc_id
       |  WHERE crep.doc IS NULL OR crep.rep = e.doc_id
       |), esh AS (
       |  SELECT DISTINCT sh FROM shingles s JOIN documents d USING (doc_id)
       |  WHERE d.source IN ('src0', 'src1')
       |), ssh AS (
       |  SELECT s.doc_id, s.sh FROM shingles s JOIN neardup USING (doc_id)
       |), stot AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
       |  FROM ssh GROUP BY 1
       |), shit AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS nc
       |  FROM ssh t JOIN esh USING (sh) GROUP BY 1
       |), clean AS (
       |  SELECT n.* FROM neardup n
       |  LEFT JOIN stot ON stot.doc_id = n.doc_id
       |  LEFT JOIN shit ON shit.doc_id = n.doc_id
       |  WHERE coalesce(shit.nc, 0) * 100 < 80 * coalesce(stot.n_shingles, 1)
       |), cper AS (
       |  SELECT source, CAST(sum(n_words) AS BIGINT) AS n_tokens
       |  FROM clean GROUP BY source
       |), ctot AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |         CAST(count(*) AS BIGINT) AS n_sources
       |  FROM cper
       |), cw AS (
       |  SELECT source,
       |         (total_tokens * 1000000) // (n_sources * n_tokens) AS weight_ppm
       |  FROM cper, ctot
       |), resampled AS (
       |  SELECT c.doc_id, c.source, c.n_words AS n_tokens, weight_ppm,
       |         CAST(weight_ppm // 1000000
       |              + CASE WHEN ${oH60("d.text || CAST(d.doc_id AS VARCHAR)")}
       |                          % 1000000 < weight_ppm % 1000000
       |                     THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
       |  FROM clean c
       |  JOIN documents d ON d.doc_id = c.doc_id
       |  JOIN cw ON cw.source = c.source
       |)""".stripMargin
  }

  private def curationOracle: String =
    s"""$curationCtes
       |SELECT doc_id, source, n_tokens, weight_ppm, n_repeats
       |FROM resampled ORDER BY doc_id""".stripMargin

  private def curationFunnelOracle: String =
    s"""$curationCtes
       |SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_words) AS BIGINT) AS sum_tokens
       |FROM gbase WHERE source NOT IN ('src0', 'src1')
       |UNION ALL SELECT 'b_quality', CAST(count(*) AS BIGINT),
       |       CAST(sum(n_words) AS BIGINT) FROM quality
       |UNION ALL SELECT 'c_exact_dedup', CAST(count(*) AS BIGINT),
       |       CAST(sum(n_words) AS BIGINT) FROM exact
       |UNION ALL SELECT 'd_near_dedup', CAST(count(*) AS BIGINT),
       |       CAST(sum(n_words) AS BIGINT) FROM neardup
       |UNION ALL SELECT 'e_decontaminated', CAST(count(*) AS BIGINT),
       |       CAST(sum(n_words) AS BIGINT) FROM clean
       |ORDER BY stage""".stripMargin

  private def simhashOracle: String = {
    val bitSums = (0 until 32)
      .map(i => s"sum(((h // ${1L << i}) % 2) * 2 - 1) AS b$i")
      .mkString(",\n    ")
    val simhashExpr = (0 until 32)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    val bandSelects = (0 until 4).map { k =>
      s"SELECT doc_id, simhash, $k AS band, (simhash // ${1L << (8 * k)}) % 256 AS bkey FROM sim"
    }.mkString("\n  UNION ALL\n  ")
    s"""$OShinglesCte, hashed AS (
       |  SELECT doc_id, ${oH32("sh")} AS h FROM shingles
       |), sums AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed GROUP BY doc_id
       |), sim AS (
       |  SELECT doc_id, $simhashExpr AS simhash FROM sums
       |), banded AS (
       |  $bandSelects
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Oracle mirroring p_ann_hard_negatives: the LSH bucket CTE plus the
    * label projection, label inequality in the join, same top-3. */
  private def annHardNegativesOracle: String = {
    s"""$oBucketedCte, el AS (
       |  SELECT e.vec_id, e.embedding, e.norm, e.bucket, x.label
       |  FROM e JOIN embeddings x USING (vec_id)
       |)
       |SELECT query_id, query_label, neighbor_id, neighbor_label, rank,
       |       score_micro FROM (
       |  SELECT a.vec_id AS query_id, a.label AS query_label,
       |         b.vec_id AS neighbor_id, b.label AS neighbor_label,
       |         row_number() OVER (PARTITION BY a.vec_id
       |                            ORDER BY ($OCos) DESC, b.vec_id) AS rank,
       |         CAST(floor(($OCos) * 1000000) AS BIGINT) AS score_micro
       |  FROM el a JOIN el b
       |    ON a.bucket = b.bucket AND a.vec_id < 20 AND b.label <> a.label
       |) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  private def annLshOracle: String = {
    s"""$oBucketedCte
       |SELECT query_id, neighbor_id, rank, score_micro FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY a.vec_id
       |                            ORDER BY ($OCos) DESC, b.vec_id) AS rank,
       |         CAST(floor(($OCos) * 1000000) AS BIGINT) AS score_micro
       |  FROM e a JOIN e b
       |    ON a.bucket = b.bucket AND a.vec_id < 20 AND b.vec_id <> a.vec_id
       |) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle mirroring p_text_embed_join: same centroid assignment CTE as
    * [[annIvfOracle]], then the documents join + per-(lang, cluster) agg. */
  private def textEmbedJoinOracle: String = {
    def coefList(c: Int): String =
      centroidCoefs(c).map(_.toString).mkString("[", ", ", "]")
    val dots = (0 until IvfK)
      .map(k => s"list_dot_product(embedding::DOUBLE[], ${coefList(k)}::DOUBLE[]) AS d$k")
      .mkString(",\n         ")
    val bestExpr = s"greatest(${(0 until IvfK).map(k => s"d$k").mkString(", ")})"
    val clusterExpr = (0 until IvfK)
      .map(k => s"WHEN d$k = best THEN $k").mkString("CASE ", " ", " END")
    s"""WITH d AS (
       |  SELECT vec_id,
       |         $dots
       |  FROM embeddings
       |), assigned AS (
       |  SELECT vec_id, $clusterExpr AS cluster
       |  FROM (SELECT *, $bestExpr AS best FROM d)
       |)
       |SELECT lang, cluster, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       min(doc_id) AS min_doc_id
       |FROM documents JOIN assigned ON doc_id = vec_id
       |GROUP BY lang, cluster ORDER BY lang, cluster""".stripMargin
  }

  /** Oracle mirroring p_embed_outliers: same centroid + norm literals,
    * same argmax assignment, cosine via the identical `norm * cnorm`
    * product, bottom-30 by (cos asc, vec_id). */
  private def embedOutliersOracle: String = {
    def coefList(c: Int): String =
      centroidCoefs(c).map(_.toString).mkString("[", ", ", "]")
    val dots = (0 until IvfK)
      .map(k => s"list_dot_product(embedding::DOUBLE[], ${coefList(k)}::DOUBLE[]) AS d$k")
      .mkString(",\n         ")
    val bestExpr = s"greatest(${(0 until IvfK).map(k => s"d$k").mkString(", ")})"
    val clusterExpr = (0 until IvfK)
      .map(k => s"WHEN d$k = best THEN $k").mkString("CASE ", " ", " END")
    val cnormExpr = (0 until IvfK)
      .map(k => s"WHEN cluster = $k THEN ${centroidNorm(k)}")
      .mkString("CASE ", " ", " END")
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings
       |), d AS (
       |  SELECT vec_id, norm,
       |         $dots
       |  FROM e0
       |), assigned AS (
       |  SELECT vec_id, norm, best, $clusterExpr AS cluster
       |  FROM (SELECT *, $bestExpr AS best FROM d)
       |), scored AS (
       |  SELECT vec_id, cluster,
       |         best / (norm * ($cnormExpr)) AS cos
       |  FROM assigned
       |)
       |SELECT vec_id, cluster,
       |       CAST(floor(cos * 1000000) AS BIGINT) AS align_micro
       |FROM scored ORDER BY cos ASC, vec_id LIMIT 30""".stripMargin
  }

  /** Oracle mirroring p_dedup_semantic: the annIvfOracle assignment CTE,
    * then the within-cluster lower-neighbor prune at the same bit-exact
    * cosine threshold. */
  private def dedupSemanticOracle: String = {
    def coefList(c: Int): String =
      centroidCoefs(c).map(_.toString).mkString("[", ", ", "]")
    val dots = (0 until IvfK)
      .map(k => s"list_dot_product(embedding::DOUBLE[], ${coefList(k)}::DOUBLE[]) AS d$k")
      .mkString(",\n         ")
    val bestExpr = s"greatest(${(0 until IvfK).map(k => s"d$k").mkString(", ")})"
    val clusterExpr = (0 until IvfK)
      .map(k => s"WHEN d$k = best THEN $k").mkString("CASE ", " ", " END")
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings
       |), d AS (
       |  SELECT vec_id, embedding, norm,
       |         $dots
       |  FROM e0
       |), assigned AS (
       |  SELECT vec_id, embedding, norm, $clusterExpr AS cluster
       |  FROM (SELECT *, $bestExpr AS best FROM d)
       |)
       |SELECT b.vec_id AS pruned_id, b.cluster AS cluster,
       |       min(a.vec_id) AS keeper_id, CAST(count(*) AS BIGINT) AS n_dup_lower
       |FROM assigned a JOIN assigned b
       |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE ($OCos) >= 0.45
       |GROUP BY b.vec_id, b.cluster
       |ORDER BY pruned_id""".stripMargin
  }

  /** Oracle mirroring p_ann_ivf: same centroid literals, same
    * argmax-assignment (first index attaining the max), same nprobe = 2
    * probe ranking, same cosine top-3. All comparisons are over
    * bit-identical doubles (see [[planeCoefs]]), so the hash-compare is
    * exact. */
  private def annIvfOracle: String = {
    def coefList(c: Int): String =
      centroidCoefs(c).map(_.toString).mkString("[", ", ", "]")
    val dots = (0 until IvfK)
      .map(k => s"list_dot_product(embedding::DOUBLE[], ${coefList(k)}::DOUBLE[]) AS d$k")
      .mkString(",\n         ")
    val bestExpr = s"greatest(${(0 until IvfK).map(k => s"d$k").mkString(", ")})"
    val clusterExpr = (0 until IvfK)
      .map(k => s"WHEN d$k = best THEN $k").mkString("CASE ", " ", " END")
    val probeArms = (0 until IvfK)
      .map(k => s"SELECT vec_id AS query_id, embedding, norm, $k AS k, d$k AS dk " +
        s"FROM assigned WHERE vec_id < 20")
      .mkString("\n  UNION ALL ")
    val pcos = "list_dot_product(p.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (p.norm * b.norm)"
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings
       |), d AS (
       |  SELECT vec_id, embedding, norm,
       |         $dots
       |  FROM e0
       |), assigned AS (
       |  SELECT *, $clusterExpr AS cluster
       |  FROM (SELECT *, $bestExpr AS best FROM d)
       |), probe_k AS (
       |  $probeArms
       |), probe_clusters AS (
       |  SELECT query_id, embedding, norm, k AS cluster FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY dk DESC, k) AS crank
       |    FROM probe_k
       |  ) WHERE crank <= 2
       |)
       |SELECT query_id, neighbor_id, rank, score_micro FROM (
       |  SELECT p.query_id, b.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY p.query_id
       |                            ORDER BY ($pcos) DESC, b.vec_id) AS rank,
       |         CAST(floor(($pcos) * 1000000) AS BIGINT) AS score_micro
       |  FROM probe_clusters p JOIN assigned b
       |    ON p.cluster = b.cluster AND b.vec_id <> p.query_id
       |) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }
}
