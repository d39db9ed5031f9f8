package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword search over a document corpus: BM25 top-k scoring against a
  * fixed query-term set — the lexical-retrieval complement to the
  * embedding-based ANN family in [[Ann]].
  *
  * Scale design: for a bounded query-term list the whole score is a per-row
  * expression — tokens, per-term tf, and doc length all come from one
  * codegen'd `split`/`filter`/`size` chain, so there is NO per-token
  * explode/shuffle. The pipeline is two corpus scans: (1) a single
  * all-columns-pruned aggregate collecting N, total token count, and each
  * term's document frequency (one row to the driver, broadcast back as plan
  * literals); (2) a map-side scoring pass feeding `TakeOrderedAndProject`
  * for the global top-k — per-partition heaps, k×partitions rows moved, no
  * global sort. At 100 TB the stats pass amortizes across queries (store it
  * with the corpus like [[Ivf]] stores centroids).
  *
  * Two scoring families, same pattern as the md5/xxhash64 dedup split:
  *  - [[bm25TopK]] — classic double-precision BM25 (Robertson idf with the
  *    Lucene `ln(1 + …)` smoothing): the production path.
  *  - [[bm25TopKPortable]] — fixed-point integer scoring, bit-identical
  *    across engines, used by the correctness oracle: the idf keeps the
  *    Robertson–Sparck-Jones odds WITHOUT the log (a rational number), k1
  *    and b are fixed at 6/5 and 3/4, and every per-term score is an exact
  *    BIGINT floor((SCALE·num)/den) computed with two-step integer
  *    division so nothing overflows. Identical tie-breaks (doc id).
  */
object Search {

  final case class CorpusStats(n: Long, totalLen: Long, df: Map[String, Long])

  private def tokensExpr(textCol: String): String =
    s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> length(x) > 0)"

  /** One aggregate pass over the corpus: doc count, total token count, and
    * per-term document frequencies (single driver row — O(terms) bytes). */
  def corpusStats(
      docs: DataFrame, textCol: String, terms: Seq[String]): CorpusStats = {
    val toks = tokensExpr(textCol)
    val agg = docs
      .selectExpr(s"size($toks) AS dl", s"$toks AS toks")
      .selectExpr(
        Seq("count(1) AS n", "sum(dl) AS tl") ++
          terms.zipWithIndex.map { case (t, i) =>
            s"sum(CASE WHEN array_contains(toks, '$t') THEN 1 ELSE 0 END) AS df_$i"
          }: _*)
      .first()
    CorpusStats(
      agg.getLong(0), agg.getLong(1),
      terms.zipWithIndex.map { case (t, i) => t -> agg.getLong(2 + i) }.toMap)
  }

  /** Classic BM25 top-k (double scoring, Lucene-style idf). Emits
    * (id, score, per-term tf columns) for the k best docs with score > 0. */
  def bm25TopK(
      docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      stats: Option[CorpusStats] = None): DataFrame = {
    val st = stats.getOrElse(corpusStats(docs, textCol, terms))
    val avgdl = st.totalLen.toDouble / st.n
    val toks = tokensExpr(textCol)
    val tfExprs = terms.zipWithIndex.map { case (t, i) =>
      s"size(filter(_graft_toks, x -> x = '$t')) AS tf_$i"
    }
    val scoreTerms = terms.zipWithIndex.map { case (t, i) =>
      val df = st.df(t)
      val idf = math.log(1.0 + (st.n - df + 0.5) / (df + 0.5))
      s"($idf * tf_$i * ${k1 + 1.0} / (tf_$i + $k1 * ${1.0 - b} + $k1 * $b * _graft_dl / $avgdl))"
    }
    docs
      .selectExpr(s"`$idCol` AS id", s"$toks AS _graft_toks")
      .selectExpr(Seq("id", "size(_graft_toks) AS _graft_dl") ++ tfExprs: _*)
      .selectExpr(
        Seq("id", s"${scoreTerms.mkString(" + ")} AS score") ++
          terms.indices.map(i => s"tf_$i"): _*)
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Fixed-point scale for the portable scorer: four decimal digits of
    * per-term score resolution. */
  val PortableScale = 10000L

  /** Engine-portable BM25 variant: integer-exact scoring.
    *
    * Per term with document frequency df over N docs of total length TL:
    *   idf  = (2(N−df)+1) / (2df+1)                 (RSJ odds, no log)
    *   sat  = tf(k1+1) / (tf + k1(1−b+b·dl/avgdl))  with k1=6/5, b=3/4
    * which clears to the integer fraction
    *   num  = (2N−2df+1) · 22 · TL · tf
    *   den  = (2df+1) · (10·TL·tf + 3·TL + 9·dl·N)
    * and the emitted per-term score is floor(SCALE·num/den), computed as
    * (num DIV den)·SCALE + ((num MOD den)·SCALE) DIV den so the largest
    * intermediate is den·SCALE (< 2⁶³ for corpora up to ~10⁸ total tokens).
    * Total score = Σ term scores in BIGINT — exact, order-independent, and
    * reproducible on any engine with 64-bit integer division. */
  def bm25TopKPortable(
      docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int,
      stats: Option[CorpusStats] = None): DataFrame = {
    val st = stats.getOrElse(corpusStats(docs, textCol, terms))
    val n = st.n
    val tl = st.totalLen
    val toks = tokensExpr(textCol)
    val tfExprs = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(size(filter(_graft_toks, x -> x = '$t')) AS BIGINT) AS tf_$i"
    }
    val scoreTerms = terms.zipWithIndex.map { case (t, i) =>
      val df = st.df(t)
      val idfNum = 2L * (n - df) + 1L
      val idfDen = 2L * df + 1L
      // every literal L-suffixed: bare ints would multiply in INT and
      // overflow under ANSI before BIGINT promotion kicks in
      val num = s"(${idfNum}L * 22L * ${tl}L * tf_$i)"
      val den = s"(${idfDen}L * (10L * ${tl}L * tf_$i + 3L * ${tl}L + 9L * _graft_dl * ${n}L))"
      s"(($num DIV $den) * ${PortableScale}L + (($num % $den) * ${PortableScale}L) DIV $den)"
    }
    docs
      .selectExpr(s"`$idCol` AS id", s"$toks AS _graft_toks")
      .selectExpr(
        Seq("id", "CAST(size(_graft_toks) AS BIGINT) AS _graft_dl") ++ tfExprs: _*)
      .selectExpr(
        Seq("id", s"${scoreTerms.mkString(" + ")} AS score") ++
          terms.indices.map(i => s"tf_$i AS tf_$i"): _*)
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  // ---- persisted inverted index (the 100 TB lexical-search layout) ----

  /** The portable per-term score as a Column over (tf, dl) columns — the
    * same exact BIGINT fraction [[bm25TopKPortable]] scores with, shared by
    * the scan and index paths so their results are bit-identical. */
  private def portableTermScore(
      tf: Column, dl: Column, n: Long, tl: Long, df: Long): Column = {
    val idfNum = 2L * (n - df) + 1L
    val idfDen = 2L * df + 1L
    val num = lit(idfNum) * lit(22L) * lit(tl) * tf
    val den = lit(idfDen) * (lit(10L) * lit(tl) * tf + lit(3L) * lit(tl) +
      lit(9L) * dl * lit(n))
    // BIGINT integral division (the SQL DIV operator) — a double-division
    // floor would lose exactness once the numerator passes 2^53
    def fdiv(a: Column, b: Column): Column = call_function("div", a, b)
    fdiv(num, den) * lit(PortableScale) + fdiv(pmod(num, den) * lit(PortableScale), den)
  }

  /** Spark's xxhash64 of a string term, evaluated driver-side (same seed
    * the `xxhash64` function uses), for computing partition buckets of
    * probe terms without a Spark job. */
  private def termBucket(term: String, numBuckets: Int): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(term),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  /** Build the persisted inverted index: postings (term, doc_id, tf, dl)
    * written `partitionBy(bucket)` with bucket = pmod(xxhash64(term), B),
    * plus a corpus-stats sidecar (N, total tokens). ONE shuffle on
    * (doc, term) builds tf (dl rides along as a pre-explode per-row
    * expression); the repartition on the partition column keeps the file
    * count at B, not tasks × B (the round-4 partitionBy lesson). Index
    * construction is a one-off ingest job — probes then read only the
    * probed terms' partition directories. */
  def writeInvertedIndex(
      docs: DataFrame, textCol: String, idCol: String,
      path: String, numBuckets: Int = 256): Unit = {
    require(numBuckets > 0)
    postingsOf(docs, textCol, idCol, numBuckets)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    writeStats(path, statsOf(docs, textCol))
    graft.sources.LayoutMeta.write(path, "_graft_index_buckets",
      numBuckets.toString)
  }

  /** Append one batch of documents to an existing index (or create it):
    * postings append into their bucket partitions, the corpus-stats
    * sidecar accumulates (N, total tokens). Single-writer discipline is
    * the caller's (foreachBatch provides it — see
    * [[graft.streaming.IngestSearch]]); a replayed batch appends its
    * postings and stats twice, the same at-least-once caveat as the
    * MinHash ingest loop — dedup upstream (IngestDedup) or compact
    * downstream if replay matters. */
  def appendToInvertedIndex(
      batch: DataFrame, textCol: String, idCol: String,
      path: String, numBuckets: Int = 256): Unit = {
    // an empty batch must not create a schemaless (unreadable) index dir
    if (batch.isEmpty) return
    if (graft.sources.LayoutMeta.exists(path, "_graft_index_buckets")) {
      val existing =
        graft.sources.LayoutMeta.read(path, "_graft_index_buckets").trim.toInt
      require(existing == numBuckets,
        s"index at $path was built with $existing buckets, not $numBuckets")
      postingsOf(batch, textCol, idCol, numBuckets)
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(path)
      val prev = readStats(path)
      val b = statsOf(batch, textCol)
      writeStats(path, (prev._1 + b._1, prev._2 + b._2))
    } else {
      writeInvertedIndex(batch, textCol, idCol, path, numBuckets)
    }
  }

  private def postingsOf(
      docs: DataFrame, textCol: String, idCol: String,
      numBuckets: Int): DataFrame = {
    val toks = tokensExpr(textCol)
    docs
      .selectExpr(s"`$idCol` AS doc_id", s"$toks AS _graft_toks")
      .selectExpr("doc_id", "CAST(size(_graft_toks) AS BIGINT) AS dl",
        "explode(_graft_toks) AS term")
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(numBuckets.toLong)))
  }

  private def statsOf(docs: DataFrame, textCol: String): (Long, Long) = {
    val g = docs.selectExpr(s"${tokensExpr(textCol)} AS t")
      .selectExpr("count(1) AS n", "sum(size(t)) AS tl").first()
    (g.getLong(0), if (g.isNullAt(1)) 0L else g.getLong(1))
  }

  private def writeStats(path: String, s: (Long, Long)): Unit =
    graft.sources.LayoutMeta.write(path, "_graft_corpus_stats.tsv",
      s"${s._1}\t${s._2}")

  private def readStats(path: String): (Long, Long) = {
    val Array(nStr, tlStr) =
      graft.sources.LayoutMeta.read(path, "_graft_corpus_stats.tsv")
        .trim.split('\t')
    (nStr.toLong, tlStr.toLong)
  }

  /** BM25 top-k from the persisted index: reads ONLY the probe terms'
    * bucket partitions (a partition filter — ≤ |terms| of B directories),
    * collects the probed terms' document frequencies from those postings
    * (a tiny aggregate over candidate rows), then scores each posting
    * map-side with [[portableTermScore]] and sums per doc — the shuffle
    * carries candidate docs only, never the corpus. Bit-identical to
    * [[bm25TopKPortable]] over the same corpus by construction. */
  def bm25TopKFromIndex(
      spark: SparkSession, path: String, terms: Seq[String], k: Int,
      numBuckets: Int = 256): DataFrame = {
    val (n, tl) = readStats(path)
    val buckets = terms.map(termBucket(_, numBuckets)).distinct
    val postings = spark.read.parquet(path)
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val dfByTerm = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val contrib = terms.foldLeft(lit(0L)) { (acc, t) =>
      when(col("term") === lit(t),
        portableTermScore(col("tf"), col("dl"), n, tl,
          dfByTerm.getOrElse(t, 0L))).otherwise(acc)
    }
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === lit(t), col("tf")).otherwise(lit(0L)))
        .as(s"tf_$i")
    }
    postings
      .select(col("doc_id").as("id"), contrib.as("_graft_contrib"),
        col("term"), col("tf"))
      .groupBy(col("id"))
      .agg(sum(col("_graft_contrib")).as("score"), tfCols: _*)
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  // ---- Trigram substring search (corpus grep) ---------------------------

  /** Build the persisted CHARACTER-TRIGRAM postings index for substring
    * search — corpus grep without a full text scan per pattern (the
    * pg_trgm / code-search-index design). Postings are one (g, doc_id)
    * row per DISTINCT trigram per document (array_distinct before the
    * explode, so a repetitive document costs its vocabulary, not its
    * length), partitioned by bucket = pmod(xxhash64(g), B) — a probe
    * reads only its own trigrams' partition directories. Bucketing is a
    * pruning device only: it never affects results, so the non-portable
    * fast hash is fine here. Index construction is a one-off ingest job
    * (one shuffle to B files); [[substringSearchFromIndex]] probes it. */
  def writeTrigramIndex(docs: DataFrame, textCol: String, idCol: String,
      path: String, numBuckets: Int = 64, mode: String = "overwrite"): Unit = {
    require(numBuckets > 0)
    // bucketing parameters ride the layout (the inverted-index marker
    // discipline): an append or probe under a different bucket count would
    // silently prune partitions holding real postings
    if (mode == "append" && graft.sources.LayoutMeta.exists(path, TrigramBucketsFile)) {
      val existing =
        graft.sources.LayoutMeta.read(path, TrigramBucketsFile).trim.toInt
      require(existing == numBuckets,
        s"trigram index at $path was built with $existing buckets, not $numBuckets")
    }
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"""CASE WHEN length(`$textCol`) >= 3
                 THEN array_distinct(transform(sequence(1, length(`$textCol`) - 2),
                                               i -> substring(`$textCol`, i, 3)))
                 ELSE CAST(array() AS array<string>) END""").as("__grams"))
      .select(col("doc_id"), explode(col("__grams")).as("g"))
      .withColumn("bucket", pmod(xxhash64(col("g")), lit(numBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket").parquet(path)
    graft.sources.LayoutMeta.write(path, TrigramBucketsFile, numBuckets.toString)
  }

  private[graft] val TrigramBucketsFile = "_graft_trigram_buckets"

  /** True once [[writeTrigramIndex]] has committed at least one batch. */
  def trigramIndexReady(path: String): Boolean =
    graft.sources.LayoutMeta.exists(path, TrigramBucketsFile)

  /** Rolling-ingest append into a [[writeTrigramIndex]] layout — the
    * batch's distinct-trigram postings land in the same bucket partitions
    * (no rewrite of existing postings); bucket-count drift is rejected via
    * the layout marker. At-least-once replay duplicates a document's
    * postings, which the probe tolerates (it counts DISTINCT matched
    * trigrams per doc). */
  def appendToTrigramIndex(batch: DataFrame, textCol: String, idCol: String,
      path: String, numBuckets: Int = 64): Unit = {
    if (batch.isEmpty) return
    writeTrigramIndex(batch, textCol, idCol, path, numBuckets,
      mode = if (trigramIndexReady(path)) "append" else "overwrite")
  }

  /** Substring search over the trigram index: every document containing
    * `pattern` contains ALL of the pattern's trigrams, so the candidate
    * set — docs whose matched-trigram count equals the pattern's distinct
    * trigram count — is recall-complete by construction, and only THOSE
    * documents are verified with a real `contains`. The probe reads ≤
    * |trigrams| of B partition directories (partition filter), the
    * candidate aggregation shuffles candidate postings only, and the
    * verify is a broadcast semi-join onto the corpus when the candidate
    * set is small.
    *
    * The broadcast is GUARDED, not assumed: the candidate count (one
    * cheap job over the pruned postings — the aggregation the probe runs
    * anyway) decides the plan. At or below `broadcastLimit` candidates,
    * the semi-join broadcasts; above it — a pattern so common its
    * candidates approach the corpus — the index is pruning nothing and
    * the right plan is the plain `contains` full scan, which is what the
    * fallback runs (no corpus-sized frame is ever broadcast, no OOM
    * cliff on low-selectivity patterns). Both branches return identical
    * results: the candidate set is recall-complete and `contains` is the
    * final verdict either way. Returns the matching ids as (idCol). */
  def substringSearchFromIndex(
      spark: SparkSession, path: String,
      docs: DataFrame, textCol: String, idCol: String,
      pattern: String, numBuckets: Int = 64,
      broadcastLimit: Long = 4000000L): DataFrame = {
    require(pattern.length >= 3,
      s"pattern must be >= 3 chars for the trigram index, got '$pattern'")
    require(broadcastLimit > 0, s"broadcastLimit must be > 0, got $broadcastLimit")
    // a probe under the wrong bucket count would silently prune away real
    // postings — reject drift when the layout carries its marker
    if (graft.sources.LayoutMeta.exists(path, TrigramBucketsFile)) {
      val existing =
        graft.sources.LayoutMeta.read(path, TrigramBucketsFile).trim.toInt
      require(existing == numBuckets,
        s"trigram index at $path was built with $existing buckets, not $numBuckets")
    }
    val grams = pattern.sliding(3).toSeq.distinct
    val buckets = grams.map(termBucket(_, numBuckets)).distinct
    val cand = spark.read.parquet(path)
      .where(col("bucket").isin(buckets: _*) && col("g").isin(grams: _*))
      // DISTINCT matched trigrams, not posting rows: an at-least-once
      // ingest replay duplicates a document's postings, and a plain count
      // would overshoot |grams| and silently DROP the true match
      .groupBy("doc_id").agg(countDistinct(col("g")).as("__ng"))
      .where(col("__ng") === grams.length)
      .select("doc_id")
    if (cand.count() <= broadcastLimit)
      docs
        .join(broadcast(cand.withColumnRenamed("doc_id", idCol)), Seq(idCol), "left_semi")
        .where(col(textCol).contains(pattern))
        .select(col(idCol))
    else docs.where(col(textCol).contains(pattern)).select(col(idCol))
  }

  /** Reciprocal-rank fusion of ranked retrieval lists — the standard hybrid-
    * search combinator (lexical BM25 ∪ embedding ANN, or any mix of
    * retrievers). Each input carries (id, rank) [+ `groupCols` for batched
    * multi-query fusion]; the fused score is the EXACT scaled integer
    *   Σ_lists scale DIV (rrfK + rank)
    * — the float 1/(k+r) formulation sums in ulp-dependent order, the
    * integer form is associative-commutative and hash-checkable.
    *
    * Scale shape: union of k-bounded lists (rows ≤ lists·k per query) →
    * one hash aggregation on (groupCols, id) → global TakeOrdered (or the
    * bounded-heap per-group top-k when fusing many queries at once). No
    * Window, no join — fusion cost is proportional to the candidate lists,
    * never the corpus. */
  def rrfFuse(lists: Seq[DataFrame], k: Int,
      rrfK: Long = 60L, scale: Long = 1000000000000L,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(rrfK >= 0 && scale > 0, s"bad rrfK/scale: $rrfK/$scale")
    val keep = groupCols ++ Seq("id", "rank")
    val u = lists.map(_.select(keep.map(col): _*)).reduce(_ unionByName _)
    val scored = u.select((groupCols.map(col) :+ col("id") :+
      expr(s"CAST($scale AS BIGINT) DIV (CAST($rrfK AS BIGINT) + rank)")
        .as("c")): _*)
    val fused = scored
      .groupBy((groupCols :+ "id").map(col): _*)
      .agg(sum(col("c")).as("rrf_scaled"), count(lit(1)).as("n_lists"))
    if (groupCols.isEmpty)
      fused.orderBy(col("rrf_scaled").desc, col("id").asc).limit(k)
    else
      // scores are ≤ lists·scale < 2^53 — exact through the double heap
      GroupTopK.topKPerGroup(fused, groupCols, "rrf_scaled", "id", k)
        .withColumn("rrf_scaled", col("rrf_scaled").cast("long"))
  }
}
