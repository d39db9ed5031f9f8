package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup, Multimodal, TextOps}

/** Driver queries for the training-data pipeline operators (dedup,
  * similarity search, text analysis, multimodal), with DuckDB oracles where
  * the computation is engine-mirrorable. Hash-family ops (xxhash64 MinHash,
  * SimHash, MurmurHash hyperplanes) are not expressible in DuckDB and get
  * rows-only checks; their correctness is pinned by unit tests instead. */
object OpsPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Per-document text statistics (tokens, ratios, quality, lang, md5). */
  def textStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id") +: TextOps.statsColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")

  /** Exact-dedup groups by normalized-content md5. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir), "text", "doc_id").orderBy("keep_id")

  /** Exact pairwise word-3-gram Jaccard ≥ 0.5 via inverted index. */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docs(s, dir), "text", "doc_id", n = 3, threshold = 0.5)
      .orderBy("id1", "id2")

  /** MinHash-LSH near-dups (xxhash64 — rows-only check). */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(docs(s, dir), "text", "doc_id",
      threshold = 0.5, numHashes = 64, bands = 16).orderBy("id1", "id2")

  /** SimHash near-dups within hamming 8 (rows-only check). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDuplicates(docs(s, dir), "text", "doc_id", maxHamming = 8)
      .orderBy("id1", "id2")

  /** Brute-force cosine top-20 for the query vector of vec_id=0; outputs
    * (rank, vec_id) only — rank gaps are >>ulp so ordering is
    * engine-stable even though float summation order differs. */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val q = e.where(col("vec_id") === 0).select(col("embedding")).first()
      .getSeq[Float](0).map(_.toDouble)
    val top = Ann.bruteForceTopK(e, "embedding", "vec_id", q, 20)
    import s.implicits._
    top.collect().zipWithIndex
      .map { case (r, i) => ((i + 1).toLong, r.getLong(0)) }
      .toSeq.toDF("rank", "vec_id")
  }

  /** Exact all-pairs cosine ≥ 0.4 (IDs only, threshold margin >>ulp). */
  def cosinePairs(s: SparkSession, dir: String): DataFrame =
    Ann.cosinePairsExact(embeddings(s, dir), "embedding", "vec_id", 0.4)
      .select("id1", "id2").orderBy("id1", "id2")

  /** LSH-bucketed variant (MurmurHash planes — rows-only check). */
  def cosinePairsLsh(s: SparkSession, dir: String): DataFrame =
    Ann.cosineNearDuplicates(embeddings(s, dir), "embedding", "vec_id",
      threshold = 0.3, dim = 64, bits = 4)
      .select("id1", "id2").orderBy("id1", "id2")

  /** Multimodal pipeline: synthetic media → batched feature extraction →
    * aggregate feature stats (rows-only check; decode is stubbed). */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(docs(s, dir), "doc_id", "text")
    val features = Multimodal.extractFeatures(media, dims = 16)
    features.select(col("media_id"),
      aggregate(col("features"), lit(0.0), (acc, x) => acc + x.cast("double"))
        .as("feature_sum"),
      size(col("features")).as("dims"))
      .orderBy("media_id")
  }

  /** Hourly event rollup: nanosecond timestamps bucketed with integral
    * division (exact at any magnitude — doubles can't hold ns epochs), and
    * value sums carried in decimal so the result is order-independent and
    * engine-exact, then surfaced as double. */
  def eventsWindowed(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .selectExpr("ts DIV 3600000000000 AS bucket", "event_type",
        "CAST(value AS DECIMAL(18,6)) AS v")
      .groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("total_value"))
      .orderBy("bucket", "event_type")

  /** Per-language document rollup (exact counts, decimal-exact avg). */
  def langRollup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_chars"))
      .orderBy("lang")

  /** The BASELINE workload: full compare + rendered report (text/html/json);
    * emits size metrics so the bench measures the same thing the reference
    * benchmarks (compare construction AND report rendering). */
  def compareReport(s: SparkSession, dir: String): DataFrame = {
    val c = ComparePack.compare(s, dir)
    val data = c.buildReportData()
    val text = data.render
    import s.implicits._
    Seq((text.length.toLong, data.toHtml.length.toLong, data.toJson.length.toLong,
      text.linesIterator.size.toLong))
      .toDF("report_chars", "html_chars", "json_chars", "report_lines")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_windowed" -> (eventsWindowed _),
    "q_docs_lang_rollup" -> (langRollup _),
    "q_compare_report" -> (compareReport _),
    "q_text_stats" -> (textStats _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_jaccard_pairs" -> (jaccardPairs _),
    "q_dedup_minhash_lsh" -> (minhashPairs _),
    "q_dedup_simhash" -> (simhashPairs _),
    "q_ann_topk" -> (annTopK _),
    "q_embedding_cosine_pairs" -> (cosinePairs _),
    "q_embedding_cosine_lsh" -> (cosinePairsLsh _),
    "q_multimodal_features" -> (multimodalFeatures _))

  // ---------- DuckDB oracles ----------

  private val statsSql: String = {
    // DuckDB single-quoted strings keep backslashes literal, so regex
    // patterns go in verbatim (no doubling).
    val stop = "\\b(the|a|an|and|of|to|in|is|it|for)\\b"
    val markers = TextOps.LangMarkers
    // mirrors TextOps expression-for-expression (same arithmetic order)
    def cnt(expr: String, pat: String) = s"len(regexp_extract_all($expr, '$pat'))"
    val scoreCols = markers.map { case (l, p) =>
      s"${cnt("lower(text)", p)} AS score_$l"
    }.mkString(", ")
    // argmax with first-wins tie-break in marker order (en, de, fr, es)
    val lang = markers.tail.foldLeft(("score_" + markers.head._1, s"'${markers.head._1}'")) {
      case ((bs, bl), (l, _)) =>
        (s"greatest($bs, score_$l)", s"CASE WHEN score_$l > $bs THEN '$l' ELSE $bl END")
    }
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(${cnt("text", "\\S+")} AS BIGINT) AS n_tokens,
       |    CAST(${cnt("lower(text)", stop)} AS BIGINT) AS n_stopwords,
       |    ${cnt("text", "[a-zA-Z]")} AS n_alpha,
       |    ${cnt("text", "[ ]")} AS n_space,
       |    ${cnt("text", "\\S")} AS n_nonspace,
       |    $scoreCols
       |  FROM documents),
       |r AS (
       |  SELECT *,
       |    CASE WHEN n_chars IS NULL OR n_chars = 0 THEN 0.0
       |         ELSE CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS alpha_ratio,
       |    CASE WHEN n_chars IS NULL OR n_chars = 0 THEN 0.0
       |         ELSE CAST(n_space AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS space_ratio,
       |    CASE WHEN n_tokens = 0 THEN 0.0
       |         ELSE CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS stopword_ratio,
       |    CASE WHEN n_tokens = 0 THEN 0.0
       |         ELSE CAST(n_nonspace AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS mean_token_len
       |  FROM base)
       |SELECT doc_id, n_chars, n_tokens, n_stopwords, alpha_ratio, space_ratio,
       |  stopword_ratio, mean_token_len,
       |  0.5 * (least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0)
       |    + 0.3 * stopword_ratio + 0.2 * alpha_ratio AS quality_score,
       |  (n_tokens < 5 OR alpha_ratio < 0.5 OR mean_token_len > 20.0) AS low_quality,
       |  CASE WHEN ${lang._1} = 0 THEN 'und' ELSE ${lang._2} END AS lang_id,
       |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
       |FROM r ORDER BY doc_id""".stripMargin
  }

  private val fingerprintSql =
    "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"

  private val dedupExactSql: String =
    s"""SELECT $fingerprintSql AS fingerprint, CAST(min(doc_id) AS BIGINT) AS keep_id,
       | CAST(count(*) AS BIGINT) AS n
       |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  private val jaccardSql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents),
       |grams0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)-1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) g
       |  FROM toks WHERE len(t) >= 3
       |  UNION ALL
       |  SELECT doc_id, array_to_string(t, ' ') g FROM toks WHERE len(t) < 3),
       |grams AS (SELECT DISTINCT doc_id, g FROM grams0),
       |sizes AS (SELECT doc_id, count(*) sz FROM grams GROUP BY 1),
       |inter AS (SELECT a.doc_id id1, b.doc_id id2, count(*) i
       |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id1, id2, CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE) AS jaccard
       |FROM inter JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
       |WHERE CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE) >= 0.5
       |ORDER BY id1, id2""".stripMargin

  private val annTopKSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      |q AS (SELECT v FROM e WHERE vec_id = 0),
      |scored AS (SELECT e.vec_id, list_cosine_similarity(e.v, (SELECT v FROM q)) c FROM e)
      |SELECT CAST(row_number() OVER (ORDER BY c DESC, vec_id) AS BIGINT) AS rank, vec_id
      |FROM scored ORDER BY c DESC, vec_id LIMIT 20""".stripMargin

  private val cosinePairsSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
      |SELECT a.vec_id AS id1, b.vec_id AS id2
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
      |ORDER BY id1, id2""".stripMargin

  private val eventsWindowedSql: String =
    """SELECT epoch_ns(ts) // 3600000000000 AS bucket, event_type,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  private val langRollupSql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      | CAST(sum(n_chars) AS BIGINT) AS total_chars,
      | CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_events_windowed" -> eventsWindowedSql,
    "q_docs_lang_rollup" -> langRollupSql,
    "q_text_stats" -> statsSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_jaccard_pairs" -> jaccardSql,
    "q_ann_topk" -> annTopKSql,
    "q_embedding_cosine_pairs" -> cosinePairsSql)
}
