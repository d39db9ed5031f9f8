package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.LayoutMeta

/** Deterministic training order: a pseudorandom permutation of a corpus
  * WITHOUT a global sort — the step between "curated corpus" and "training
  * shards" in a large-scale pipeline (training wants each epoch to stream
  * the data in a fresh, reproducible random order; a literal
  * `ORDER BY rand()` of 100 TB is a global sort with a nondeterministic
  * key, wrong on both axes).
  *
  * Construction: hash each id with the epoch seed, route the row to
  * `shard = hash mod shards`, rank it within the shard by `(hash, id)`.
  * Reading shards `0..shards-1` each in `pos` order IS the permutation:
  *
  *   - **Deterministic**: the order is a pure function of (ids, seed,
  *     shards) — independent of input partitioning, cluster size, or row
  *     arrival order (the `id` tiebreak covers hash collisions). Any two
  *     runs — or a re-run after a crash — produce the identical epoch.
  *   - **Epochs**: vary `seed` (e.g. epoch number); each epoch is an
  *     independent permutation with no coordination or state.
  *   - **Scale shape**: ONE hash shuffle on `shard`, then a PER-SHARD
  *     local sort — no global ordering anywhere. Size `shards` so a
  *     shard's rows fit an executor's sort buffer (100 TB / 100k shards
  *     = ~1 GB sorts); the window partitions by shard, so parallelism is
  *     `shards`, not 1 (a `row_number()` over the whole frame would
  *     collapse to a single task — the anti-pattern this operator
  *     replaces).
  *
  * Hash families, following the repo's dedup convention: the PORTABLE
  * family uses the md5 48-bit prefix ([[Dedup.md5Prefix48]] — mirrorable
  * in any engine with md5 + hex parsing, which is what makes the driver
  * query oracle-checkable); production deployments flip `portable = false`
  * for `xxhash64` (faster, same properties, no engine mirror). Family
  * agreement on the permutation PROPERTIES (not values — the hashes
  * differ by design) is pinned in TrainOrderSpec. */
object TrainOrder {

  /** The epoch hash of an id: non-negative, deterministic in (seed, id).
    * Package-visible so the spec can pin the non-negative contract on the
    * hash itself (pmod would mask a sign-bit regression downstream). */
  private[graft] def epochHash(id: Column, seed: Long, portable: Boolean): Column =
    if (portable)
      Dedup.md5Prefix48(md5(concat(lit(seed.toString), lit(":"),
        id.cast("string")).cast("binary")))
    else
      // xxhash64 is signed; the UNSIGNED shift clears the sign bit
      // (shiftright is arithmetic and would keep it) so both families
      // honor the non-negative contract plain `% n` consumers rely on
      shiftrightunsigned(xxhash64(lit(seed), id), 1)

  /** Assign every row a `(shard, pos)` training coordinate: `shard` in
    * `[0, shards)`, `pos` counting from 1 within the shard in hash order.
    * All input columns ride along. One shuffle (on shard), per-shard sort.
    *
    * PRECONDITION — `idCol` values must be UNIQUE: duplicate ids share the
    * epoch hash, tie the `(hash, id)` sort key, and make `pos` among the
    * duplicates depend on arrival order — exactly the nondeterminism this
    * operator exists to remove. Dedup upstream (the pipeline's own dedup
    * stage) or pick a unique key. The input must not already carry the
    * OUTPUT coordinate names (`shard`, `pos`) — chaining epochs means
    * dropping the previous epoch's coordinates first; rejected loudly
    * rather than silently producing an ambiguous or clobbered column. */
  def order(df: DataFrame, idCol: String, seed: Long, shards: Int,
      portable: Boolean = false): DataFrame =
    coordinates(df, idCol, seed, shards, portable, prePartition = false)

  /** Shared coordinate assignment. `prePartition = true` repartitions on
    * the shard key BEFORE the window so the window's clustering
    * requirement is satisfied by that exchange (no second one) and the
    * output partition count is `shards` — what [[writeShards]] needs for
    * its one-file-per-shard write. `order` keeps the planner-inserted
    * exchange instead (session parallelism for downstream work). */
  /** Shared hash-and-shard prelude: validates inputs and appends
    * `__graft_h` + `shard`. ONE home for the guards (a copy of this
    * prelude once silently lost the shards check — caught in review) and
    * one home for a load-bearing rule: hashing happens on the frame's
    * OWN id type, so multi-source callers must apply it per source
    * BEFORE any union — union type coercion (int ids widening to long)
    * would otherwise change the hash input and silently re-deal the
    * epoch. Collision guards compare case-insensitively to match the
    * analyzer's default resolution (`withColumn("pos", …)` would
    * silently REPLACE an existing `POS` column). */
  private def hashShard(df: DataFrame, idCol: String, seed: Long,
      shards: Int, portable: Boolean): DataFrame = {
    require(shards >= 1, s"shards must be positive, got $shards")
    Seq("shard", "pos").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column — drop or rename it before " +
          "assigning training coordinates"))
    // the operator's working names: withColumn would silently REPLACE (and
    // the final projection then drops) a real input column named __graft_h
    // — data loss, not an error, without this guard (idCol == "__graft_h"
    // is the same collision, caught by the same check)
    require(!df.columns.exists(_.toLowerCase.startsWith("__graft_")),
      "input carries a reserved '__graft_'-prefixed column — rename it " +
        "before assigning training coordinates (the prefix is this " +
        "operator's working-column namespace)")
    df.withColumn("__graft_h", epochHash(col(idCol), seed, portable))
      .withColumn("shard", pmod(col("__graft_h"), lit(shards.toLong)))
  }

  private[graft] def coordinates(df: DataFrame, idCol: String, seed: Long,
      shards: Int, portable: Boolean, prePartition: Boolean): DataFrame = {
    val hashed = hashShard(df, idCol, seed, shards, portable)
    val clustered =
      if (prePartition) hashed.repartition(shards, col("shard")) else hashed
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__graft_h"), col(idCol))
    clustered
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__graft_h")
  }

  /** Materialize the epoch as TRAINING SHARD FILES: `path/shard=k/` holds
    * exactly ONE parquet file whose row order IS the shard's `pos` order,
    * so a training reader streams each shard front-to-back with zero
    * further sorting (parquet preserves row order within a file; a
    * single-file shard has no cross-file ordering to reconstruct).
    *
    * ONE shuffle, ONE sort: the repartition on the shard key happens
    * BEFORE the pos window, so the window's clustering requirement is
    * satisfied by that exchange (spec-pinned: exactly one exchange and
    * one sort in the coordinate plan), and the window's own
    * (shard, hash, id) output order doubles as the (shard, pos) order the
    * partitioned write wants — rows stream into each directory's file in
    * pos order with no writer-side re-sort of consequence. A colliding
    * pair of shard values still lands whole in one partition, so each
    * `shard=` directory receives exactly
    * one writer's file; the write pins `maxRecordsPerFile = 0` so a
    * session-level rolling conf cannot silently split a shard and void
    * the single-file contract. Size `shards` so one shard fits a write
    * task (the [[order]] sizing rule). */
  def writeShards(df: DataFrame, idCol: String, seed: Long, shards: Int,
      path: String, portable: Boolean = false): Unit = {
    coordinates(df, idCol, seed, shards, portable, prePartition = true)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", "0")
      .partitionBy("shard").parquet(path)
    writeManifest(df.sparkSession, path)
  }

  /** The shard-layout manifest's meta name: one line per landed shard,
    * `<shard>\t<rows>\t<max pos>`, after a `v1` header. Written by every
    * shard-landing method AFTER the parquet commit; lives on the layout's
    * own filesystem ([[LayoutMeta]]). */
  private[graft] val ManifestFile = "_graft_shards"

  /** Record each landed shard's row count and max `pos` next to the data.
    * Without this, shard discovery is directory listing + parquet footers —
    * at the 100k-shard sizing rule a training loader pays 100k footer
    * stats before step one, and [[resume]] has nothing to sanity-check a
    * frontier against. One column-pruned scan of `pos` (row-group stats
    * make it cheap relative to the write it follows), collected bounded by
    * the shard count. Overwrite-mode landings delete the whole layout dir
    * first, so a crash between the parquet commit and this write leaves a
    * manifest-less layout, never a stale one; [[resume]] degrades to
    * unvalidated predicates there. */
  private[graft] def writeManifest(spark: SparkSession, path: String): Unit = {
    val stats =
      try spark.read.parquet(path)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("rows"), max(col("pos")).as("max_pos"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      catch {
        // an EMPTY source lands zero shard dirs (partitionBy of 0 rows
        // writes only _SUCCESS), so schema inference fails — a
        // legitimately-empty landing (a filter that matched nothing)
        // gets a header-only manifest, not a crash after the commit.
        // ONLY that condition (plus path-not-found, its object-store
        // twin where even _SUCCESS hasn't listed yet): AnalysisException
        // also covers genuine problems — a wrong path resolving
        // elsewhere, a layout missing the shard/pos columns — which must
        // surface, not silently land a header-only manifest (ADVICE r15)
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("UNABLE_TO_INFER_SCHEMA") ||
                c.startsWith("PATH_NOT_FOUND")) =>
          Array.empty[(Long, Long, Long)]
      }
    val body = ("v1" +: stats.map { case (s, n, m) => s"$s\t$n\t$m" }.toSeq)
      .mkString("\n")
    LayoutMeta.writeAtomic(spark, path, ManifestFile, body)
  }

  /** The landed layout's manifest: shard → (row count, max pos). None for
    * layouts written before manifests existed (resume then skips frontier
    * validation — the predicates themselves need no manifest). */
  def readManifestOpt(spark: SparkSession,
      path: String): Option[Map[Long, (Long, Long)]] =
    LayoutMeta.readAtomicOpt(spark, path, ManifestFile).map { body =>
      val lines = body.split("\n").toSeq
      require(lines.headOption.contains("v1"),
        s"unrecognized shard manifest version at $path: " +
          s"'${lines.headOption.getOrElse("")}'")
      lines.drop(1).filter(_.nonEmpty).map { l =>
        val Array(s, n, m) = l.split("\t")
        s.toLong -> (n.toLong, m.toLong)
      }.toMap
    }

  /** Loud half-landed-layout check: the manifest's shard set must equal
    * the `shard=` directories actually present (a restore that lost a
    * shard dir, or a hand-pruned layout, must not silently train on a
    * subset while the manifest claims the full epoch). */
  private def requireManifestMatchesDirs(spark: SparkSession, path: String,
      manifest: Map[Long, (Long, Long)]): Unit = {
    val fs = LayoutMeta.fs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map(_.getPath.getName.drop("shard=".length).toLong).toSet
    val landed = manifest.keySet
    if (dirs != landed) {
      val missing = (landed -- dirs).toSeq.sorted
      val extra = (dirs -- landed).toSeq.sorted
      throw new IllegalStateException(
        s"shard layout at $path disagrees with its manifest " +
          s"(half-landed or hand-modified layout): manifest shards " +
          s"without a directory: ${missing.mkString("[", ",", "]")}, " +
          s"directories not in the manifest: ${extra.mkString("[", ",", "]")} " +
          "— re-land the layout (or delete the manifest to read unvalidated)")
    }
  }

  /** Interleave several sources into one deterministic training order with
    * MIXTURE WEIGHTS: source k with weight w_k occupies ~w_k of every
    * prefix of the stream (temperature-style mixing — weights need not
    * sum to 1; only ratios matter). Each source is hashed independently
    * (its own id space), positions are STRETCHED by 1/w_k (a source
    * twice as heavy packs its rows twice as densely on the shared axis),
    * and the merged (shard, mix_pos) order is again a pure function of
    * (ids, seed, shards, weights).
    *
    * Scale shape — ONE shuffle total (spec-pinned): the union is
    * repartitioned on `shard` BEFORE either window, and partitioning by
    * `shard` alone satisfies the per-source window's (source, shard)
    * clustering too (co-location on a subset of the keys co-locates the
    * finer grouping), so the planner inserts no further exchange — where
    * the naive per-source-order-then-merge formulation shuffles every
    * source once and the union again (S+1 exchanges). Two per-partition
    * sorts remain: the per-source rank and the interleave rank.
    * Output columns: (id, source, shard, pos) — consume by NAME, with
    * `pos` re-ranked over the interleaved stream. */
  def interleave(sources: Seq[(String, DataFrame, Double)], idCol: String,
      seed: Long, shards: Int, portable: Boolean = false): DataFrame =
    interleaveImpl(sources, idCol, seed, shards, portable,
      payload = false, prePartition = false)

  /** [[interleave]] with the PAYLOAD riding along: every source column
    * crosses the same single shuffle the coordinates do, so the mixed
    * stream arrives ready to consume (or to land via
    * [[writeInterleavedShards]]) with NO per-source join-back — the naive
    * "interleave coordinates, then join each source's rows back by id"
    * formulation costs one extra shuffle per source per epoch at scale.
    *
    * Heterogeneous sources union by NAME with null-fill: a column absent
    * from some source is NULL on that source's rows (the unified schema a
    * single landed layout needs anyway); same-name columns must be
    * union-coercible or the union rejects them loudly. The epoch hash is
    * computed per source BEFORE the union ([[hashShard]]'s contract), so
    * payload/ id type coercion never re-deals the permutation. Sources
    * must not already carry a `source` column (the output tag) — rename
    * it upstream (rejected loudly).
    * Output: payload columns + (source, shard, pos). */
  def interleaveRows(sources: Seq[(String, DataFrame, Double)], idCol: String,
      seed: Long, shards: Int, portable: Boolean = false): DataFrame =
    interleaveImpl(sources, idCol, seed, shards, portable,
      payload = true, prePartition = false)

  /** Land the MIXED corpus as training shard files: [[interleaveRows]]'
    * payload-carrying stream written as `path/shard=k/` with exactly ONE
    * parquet file per shard whose row order IS the shard's interleaved
    * `pos` order — the [[writeShards]] contract for the multi-source
    * epoch. Same plan discipline: the repartition on the shard key is the
    * ONE exchange (it satisfies both windows' clustering), the interleave
    * window's (shard, axis, source, id) output order doubles as the
    * (shard, pos) write order, and `maxRecordsPerFile = 0` pins the
    * single-file contract against session confs. Parallelism = shards;
    * size `shards` so one shard fits a write task. */
  def writeInterleavedShards(sources: Seq[(String, DataFrame, Double)],
      idCol: String, seed: Long, shards: Int, path: String,
      portable: Boolean = false): Unit = {
    interleaveRowsForWritePlan(sources, idCol, seed, shards, portable)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", "0")
      .partitionBy("shard").parquet(path)
    writeManifest(sources.head._2.sparkSession, path)
  }

  /** The exact frame [[writeInterleavedShards]] hands to the writer —
    * package-visible so the spec can pin the one-exchange plan shape of
    * the WRITE path (prePartition) separately from [[interleaveRows]]. */
  private[graft] def interleaveRowsForWritePlan(
      sources: Seq[(String, DataFrame, Double)], idCol: String, seed: Long,
      shards: Int, portable: Boolean = false): DataFrame =
    interleaveImpl(sources, idCol, seed, shards, portable,
      payload = true, prePartition = true)

  /** TEMPERATURE-weighted mixture planning — the "how many epochs of each
    * source" arithmetic a multi-source recipe needs before
    * [[interleaveEpochs]] can run (the mT5/data-balancing standard):
    * sampling probability `p_i ∝ n_i^alpha` (α = 1 is proportional, α → 0
    * approaches uniform — small sources get UP-weighted as α falls), and
    * each source's epoch multiplier spends a total `budget` of rows
    * according to p: `epochs_i = min(maxEpochs, p_i · budget / n_i)`.
    * `maxEpochs` caps the up-weighting of tiny sources (unbounded repeats
    * of a small corpus are a memorization hazard, the standard caveat);
    * a capped source simply contributes fewer rows than its p asked for.
    *
    * DETERMINISTIC float contract: the normalizer folds `n_i^alpha` in
    * SORTED-TAG order and the epochs expression is exactly
    * `(s/z · budget)/n` — bit-reproducible, and an engine can mirror it
    * literally (at α = 1/2, `n^alpha` IS `sqrt(n)` in every IEEE libm —
    * what makes the driver query hash-checkable). Returned in the
    * CALLER's source order. */
  def temperatureEpochs(sizes: Seq[(String, Long)], alpha: Double,
      budget: Long, maxEpochs: Double = 16.0): Seq[(String, Double)] = {
    require(sizes.nonEmpty, "temperatureEpochs needs at least one source")
    require(sizes.map(_._1).distinct.size == sizes.size,
      s"duplicate source tags in ${sizes.map(_._1)}")
    sizes.foreach { case (t, n) =>
      require(n > 0L, s"source '$t' is empty (n=$n) — an empty source " +
        "has no sampling weight; drop it from the mixture")
    }
    require(!alpha.isNaN && alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1] (1 = proportional, smaller = flatter), " +
        s"got $alpha")
    require(budget > 0L, s"budget must be positive, got $budget")
    require(!maxEpochs.isNaN && !maxEpochs.isInfinite && maxEpochs > 0.0,
      s"maxEpochs must be positive and finite, got $maxEpochs")
    // α = 1/2 goes through sqrt EXPLICITLY: sqrt is the one power the
    // IEEE spec requires correctly rounded everywhere, while Math.pow is
    // allowed 1 ulp of slack — pinning the oracle's sqrt mirror on a
    // pow-intrinsic special case would be a cross-platform gamble
    // (review r16). α = 1 is exact multiplication-free identity.
    val powA: Double => Double =
      if (alpha == 0.5) math.sqrt
      else if (alpha == 1.0) identity
      else x => math.pow(x, alpha)
    val pows = sizes.map { case (t, n) => (t, n, powA(n.toDouble)) }
    // sorted-tag fold: the one float sum, order fixed for reproducibility
    // and engine mirroring
    val z = pows.sortBy(_._1).map(_._3).foldLeft(0.0)(_ + _)
    pows.map { case (t, n, s) =>
      t -> math.min(maxEpochs, s / z * budget.toDouble / n.toDouble)
    }
  }

  /** [[temperatureEpochs]] over live frames: one column-pruned `count()`
    * per source (the price [[interleaveEpochs]] pays anyway for its
    * co-finish weights), returning the `(tag, df, epochs)` triples
    * [[interleaveEpochs]]/[[writeEpochShards]] consume directly. */
  def temperatureMixture(sources: Seq[(String, DataFrame)], alpha: Double,
      budget: Long, maxEpochs: Double = 16.0): Seq[(String, DataFrame, Double)] = {
    require(sources.nonEmpty, "temperatureMixture needs at least one source")
    val sizes = sources.map { case (t, df) => t -> df.count() }
    val epochs = temperatureEpochs(sizes, alpha, budget, maxEpochs).toMap
    sources.map { case (t, df) => (t, df, epochs(t)) }
  }

  /** Epoch replication — the "2.3 epochs of source A" half of a training
    * recipe: every row appears `floor(epochs)` times, plus once more on a
    * DETERMINISTIC fraction `epochs - floor(epochs)` of the ids
    * (selected by an independent hash of `(seed, id)` — NOT the position
    * hash, so which rows repeat is uncorrelated with where they land).
    * `epochs < 1` is deterministic downsampling with the same rule.
    *
    * Output: the input columns + `rep` (replica index, 0-based) +
    * `rep_id` (`"<id>#<rep>"` — unique because `rep` is the final
    * `#`-free segment), the column to feed DOWNSTREAM as the id:
    * hashing `rep_id` places every replica independently, so a document
    * seen 3 times is spread across the epoch stream, not clumped.
    *
    * Scale shape: NARROW — a per-row `explode(sequence(...))` of at most
    * `ceil(epochs)` elements and a filter; no shuffle, no action. The
    * fractional selection threshold compares the 48-bit keep-hash
    * against `round(frac · 2^48)` — exact, no modulo bias, and an
    * engine with md5 can mirror it bit-for-bit (the portable family). */
  def replicate(df: DataFrame, idCol: String, epochs: Double, seed: Long,
      portable: Boolean = false): DataFrame = {
    require(!epochs.isNaN && !epochs.isInfinite && epochs > 0,
      s"epochs must be a positive finite number, got $epochs")
    Seq("rep", "rep_id").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column — drop or rename it before " +
          "epoch replication (the name is this operator's output)"))
    require(!idCol.equalsIgnoreCase("rep") && !idCol.equalsIgnoreCase("rep_id"),
      s"idCol '$idCol' collides with a replicate output column")
    val full = math.floor(epochs).toLong
    val capped = math.ceil(epochs).toLong.max(1L)
    val frac = epochs - full
    val base = df.withColumn("rep",
      explode(sequence(lit(0L), lit(capped - 1L))))
    val kept =
      if (frac == 0.0) base
      else {
        // independent of epochHash by salt (":keep:"): repeat-selection
        // and position must not correlate
        val keep48 =
          if (portable)
            Dedup.md5Prefix48(md5(concat(lit(seed.toString), lit(":keep:"),
              col(idCol).cast("string")).cast("binary")))
          else shiftrightunsigned(xxhash64(lit(seed), lit("keep"), col(idCol)), 16)
        val threshold = math.round(frac * (1L << 48).toDouble)
        base.where(col("rep") < lit(full) || keep48 < lit(threshold))
      }
    kept.withColumn("rep_id",
      concat(col(idCol).cast("string"), lit("#"), col("rep")))
  }

  /** Interleave sources by EPOCH COUNTS instead of density weights — the
    * full training recipe ("2.5 epochs of A mixed with 1 epoch of B"):
    * each source is [[replicate]]d by its epoch count, every replica is
    * placed independently (hashed on `rep_id`), and the mixture weight is
    * the source's REPLICATED row count, so sources exhaust TOGETHER:
    * rank r of a source with n replicated rows lands at axis r/n, every
    * source's global axis ends at 1.0, and within each shard the sources
    * run out at the same point up to hash-balance variance ("epochs over
    * the same run" IS the co-finish property). Coordinates-only output:
    * (idCol, rep, rep_id, source, shard, pos). [[interleaveEpochsRows]]
    * rides the payload; [[writeEpochShards]] lands it.
    *
    * Cost note: deriving the co-finish weights takes one `count()` per
    * source over the replicated frame — a column-pruned scan, the price
    * of exactness (the kept fraction is hash-selected, so the count is
    * not `n·epochs` analytically). */
  def interleaveEpochs(sources: Seq[(String, DataFrame, Double)],
      idCol: String, seed: Long, shards: Int,
      portable: Boolean = false): DataFrame =
    interleaveEpochsImpl(sources, idCol, seed, shards, portable,
      payload = false, prePartition = false)

  /** [[interleaveEpochs]] with every source column riding the single
    * shuffle ([[interleaveRows]]' contract): the mixed multi-epoch stream
    * arrives ready to consume, replicas included, with no join-back.
    * Output: payload columns + rep + rep_id + (source, shard, pos). */
  def interleaveEpochsRows(sources: Seq[(String, DataFrame, Double)],
      idCol: String, seed: Long, shards: Int,
      portable: Boolean = false): DataFrame =
    interleaveEpochsImpl(sources, idCol, seed, shards, portable,
      payload = true, prePartition = false)

  /** Land the multi-epoch mixture as training shard files — the
    * [[writeInterleavedShards]] contract (ONE exchange, one pos-ordered
    * file per `shard=` dir, `maxRecordsPerFile = 0` pinned) over
    * [[interleaveEpochsRows]]' stream. */
  def writeEpochShards(sources: Seq[(String, DataFrame, Double)],
      idCol: String, seed: Long, shards: Int, path: String,
      portable: Boolean = false): Unit = {
    interleaveEpochsImpl(sources, idCol, seed, shards, portable,
      payload = true, prePartition = true)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", "0")
      .partitionBy("shard").parquet(path)
    writeManifest(sources.head._2.sparkSession, path)
  }

  private def interleaveEpochsImpl(sources: Seq[(String, DataFrame, Double)],
      idCol: String, seed: Long, shards: Int, portable: Boolean,
      payload: Boolean, prePartition: Boolean): DataFrame = {
    require(sources.nonEmpty, "interleaveEpochs needs at least one source")
    val weighted = sources.map { case (tag, df, epochs) =>
      val projected = if (payload) df else df.select(col(idCol))
      val replicated = replicate(projected, idCol, epochs, seed, portable)
      val n = replicated.count()
      require(n > 0, s"source '$tag' replicated to zero rows " +
        s"(epochs=$epochs) — an empty source cannot define a co-finish " +
        "weight; drop it from the mixture")
      (tag, replicated, n.toDouble)
    }
    interleaveImpl(weighted, "rep_id", seed, shards, portable,
      payload = true, prePartition = prePartition)
  }

  /** Resume a crashed or preempted LOCK-STEP training run from the
    * persisted shard layout ([[writeShards]] / [[writeInterleavedShards]] /
    * [[writeEpochShards]] output at `path`): rows with `pos > afterPos`
    * in every shard — the readers consumed shards in lock-step, so one
    * global step maps to one per-shard cutoff. This is the constant-
    * frontier case of the ragged Map-frontier overload below
    * and delegates to it whenever the layout carries a manifest (clamping
    * each shard's cutoff to its landed max — a shard shorter than
    * `afterPos` is simply finished); manifest-less layouts get the plain
    * pushed filter, unvalidated.
    *
    * Scale shape: the filter reaches the parquet scan as a pushed
    * predicate, and because each shard file is WRITTEN in pos order its
    * row groups carry tight disjoint min/max ranges on `pos` — the scan
    * SKIPS every fully-trained row group and I/O follows the remaining
    * suffix of the epoch, not the corpus size (spec-pinned PushedFilters;
    * a resume at 90% of a 100 TB epoch reads ~10 TB). */
  def resume(spark: SparkSession, path: String, afterPos: Long): DataFrame = {
    require(afterPos >= 0, s"afterPos must be non-negative, got $afterPos")
    readManifestOpt(spark, path) match {
      case Some(m) =>
        require(m.nonEmpty,
          s"layout at $path landed ZERO rows (empty source) — nothing to " +
            "resume")
        val landedMax = m.values.map(_._2).max
        require(afterPos <= landedMax,
          s"afterPos=$afterPos is beyond the layout's landed max pos " +
            s"$landedMax at $path — the training bookkeeping and the " +
            "layout disagree (wrong layout, or a corrupted step counter)")
        resume(spark, path,
          m.map { case (k, (_, maxPos)) => k -> math.min(afterPos, maxPos) })
      case None =>
        spark.read.parquet(path).where(col("pos") > lit(afterPos))
    }
  }

  /** Resume a RAGGED crash: a preempted multi-host run leaves shard k at
    * its own frontier p_k (hosts never finish in lock-step), and the two
    * global-cutoff approximations are both wrong at scale — min(p_k)
    * re-serves already-trained rows (duplicate gradient steps), max(p_k)
    * silently skips data. `frontier` maps shard → last consumed pos;
    * shards OMITTED from the map are treated as finished and excluded
    * entirely (to resume an unstarted shard, include it at 0).
    *
    * Scale shape — TWO compilation strategies, switched on the number of
    * DISTINCT cutoffs (`maxDisjunctCutoffs`, default
    * [[DisjunctCutoffThreshold]] = 1024):
    *
    *   - **≤ threshold (disjunction)**: per-cutoff predicates —
    *     `shard IN (…) AND pos > p` OR'd over the distinct cutoffs, the
    *     Or tree built BALANCED (depth log₂ cutoffs; a left-deep
    *     `reduce(_ || _)` would stack-overflow Catalyst's recursive
    *     TreeNode transforms once cutoffs reach the tens of thousands) —
    *     from which Catalyst extracts BOTH prunings: the shard-only
    *     disjunction becomes a partition filter (finished/omitted shards
    *     are never listed, let alone read), and the pos-only disjunction
    *     reaches the parquet scan as a pushed `pos > min(p_k)` that
    *     row-group-prunes the common trained prefix (pos-ordered shard
    *     files have tight disjoint ranges); the exact per-shard cut is
    *     applied by the residual filter on the pruned remainder.
    *   - **> threshold (broadcast frontier)**: a real ragged crash at the
    *     documented sizing rule (100 TB / 100k shards) leaves ~every
    *     shard at its own cutoff — ~100k disjuncts is predicate-AS-data,
    *     so the frontier becomes a broadcast-joined FRAME instead: the
    *     scan keeps the same two prunings as simple predicates —
    *     `pos > min(p_k)` (pushed, row-group-prunes the common trained
    *     prefix) AND `shard IN (live shards)` (one In node → partition
    *     pruning; elided when every landed shard is live) — and the
    *     exact per-shard cut is applied residually by an inner broadcast
    *     join against the (shard, cutoff) frontier (frontier size =
    *     shard count: KBs where a 100k-disjunct expression would be a
    *     planning hazard). Output columns and rows are identical to the
    *     disjunction strategy (spec-pinned on both counts).
    *
    * Both prunings are spec-pinned under both strategies. Shards whose
    * frontier equals their landed max are dropped from the predicate at
    * compile time (nothing left to serve), so a mostly-finished resume
    * lists only the shards still in progress.
    *
    * Validation (layouts with a [[writeManifest manifest]] — every layout
    * this module lands): the manifest's shard set must match the
    * directories on disk ([[requireManifestMatchesDirs]] — half-landed
    * layouts fail loudly), every frontier shard must exist in the
    * manifest, and no frontier may exceed its shard's landed max (a
    * reader claiming to have consumed a row that was never landed is
    * bookkeeping corruption, not a resume). */
  def resume(spark: SparkSession, path: String,
      frontier: Map[Long, Long],
      maxDisjunctCutoffs: Int = DisjunctCutoffThreshold): DataFrame = {
    require(maxDisjunctCutoffs >= 1,
      s"maxDisjunctCutoffs must be positive, got $maxDisjunctCutoffs")
    require(frontier.nonEmpty,
      "resume frontier is empty — every shard omitted means every shard " +
        "finished, and an all-finished run has nothing to resume")
    frontier.foreach { case (k, p) =>
      require(k >= 0 && p >= 0,
        s"resume frontier entries must be non-negative, got shard=$k pos=$p")
    }
    val manifest = readManifestOpt(spark, path)
    manifest.foreach { m =>
      requireManifestMatchesDirs(spark, path, m)
      val unknown = (frontier.keySet -- m.keySet).toSeq.sorted
      require(unknown.isEmpty,
        s"resume frontier names shards the layout at $path never landed: " +
          s"${unknown.mkString("[", ",", "]")} (manifest has " +
          s"${m.keySet.size} shards)")
      val beyond = frontier.collect {
        case (k, p) if p > m(k)._2 => s"shard=$k pos=$p>landed ${m(k)._2}"
      }
      require(beyond.isEmpty,
        s"resume frontier is beyond the landed layout at $path: " +
          s"${beyond.mkString("; ")} — the training bookkeeping and the " +
          "layout disagree")
    }
    val df = spark.read.parquet(path)
    // drop served-out shards (frontier == landed max) before compiling:
    // they contribute no rows, and excluding them turns into partition
    // pruning instead of a scan that filters everything away
    val live = manifest match {
      case Some(m) => frontier.filter { case (k, p) => p < m(k)._2 }
      case None => frontier
    }
    if (live.isEmpty) return df.where(lit(false))
    // literals in the shard column's OWN type (partition inference reads
    // small ints as IntegerType): a long literal would wrap the column in
    // a cast, which can defeat partition pruning
    val shardType = df.schema("shard").dataType
    def shardLit(k: Long): Column = lit(k).cast(shardType)
    val byCut = live.groupBy(_._2).map { case (cut, ks) =>
      cut -> ks.keys.toSeq.sorted
    }.toSeq.sortBy(_._1)
    val coversAll = manifest.exists(m => live.keySet == m.keySet)
    if (byCut.size == 1 && coversAll)
      // the lock-step case: one cutoff over every landed shard — no
      // shard predicate needed, and the plan is the plain pushed filter
      df.where(col("pos") > lit(byCut.head._1))
    else if (byCut.size <= maxDisjunctCutoffs)
      df.where(balancedOr(byCut.map { case (cut, ks) =>
        val shardPred =
          if (ks.size == 1) col("shard") === shardLit(ks.head)
          else col("shard").isin(ks.map(shardLit): _*)
        shardPred && col("pos") > lit(cut)
      }.toIndexedSeq))
    else {
      // broadcast-frontier strategy (see the scaladoc): the two prunings
      // stay simple predicates on the scan; the exact per-shard cut rides
      // a broadcast inner join so the predicate size is constant in the
      // cutoff count. The working column name is guarded like the
      // coordinate assigners' namespace — a landed layout cannot carry it
      // (hashShard rejects the prefix at write time), but resume also
      // accepts manifest-less foreign layouts.
      Seq(FrontierCutCol, "__graft_fshard").foreach(c =>
        require(!df.columns.exists(_.equalsIgnoreCase(c)),
          s"input layout already has a '$c' column — the name is this " +
            "resume strategy's working column"))
      val minCut = byCut.head._1
      val liveShards = live.keys.toSeq.sorted
      val keep =
        if (coversAll) col("pos") > lit(minCut)
        else col("pos") > lit(minCut) &&
          col("shard").isin(liveShards.map(shardLit): _*)
      // a LOCAL list, not parallelize: the frontier is KB-scale, a
      // LocalRelation beats an RDD scan job — and sparkContext throws on
      // a Connect session, which this read-only path supports (review r16)
      val frontierRows: java.util.List[org.apache.spark.sql.Row] =
        scala.jdk.CollectionConverters.SeqHasAsJava(
          live.toSeq.sortBy(_._1).map { case (k, p) =>
            org.apache.spark.sql.Row(k, p)
          }).asJava
      val frontierDf = spark.createDataFrame(frontierRows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__graft_fshard",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField(FrontierCutCol,
            org.apache.spark.sql.types.LongType, nullable = false))))
        .select(col("__graft_fshard").cast(shardType).as("__graft_fshard"),
          col(FrontierCutCol))
      df.where(keep)
        .join(broadcast(frontierDf), col("shard") === col("__graft_fshard"))
        .where(col("pos") > col(FrontierCutCol))
        .select(df.columns.map(col): _*)
    }
  }

  /** Distinct-cutoff count above which [[resume]] switches from the
    * disjunction compilation to the broadcast-frontier one: 1024 keeps
    * the expression path for every frontier a human could enumerate
    * (where the Or still constant-folds into textbook prunings) and
    * routes anything machine-scale to the join. */
  private[graft] val DisjunctCutoffThreshold = 1024

  private[graft] val FrontierCutCol = "__graft_fcut"

  /** A BALANCED Or over `ps` — depth log₂ n. `reduce(_ || _)` builds a
    * left-deep tree whose depth equals the disjunct count, and Catalyst's
    * recursive TreeNode transforms overflow the stack (or crawl) in the
    * tens of thousands — exactly the shape a ragged 100k-shard frontier
    * produces. */
  private def balancedOr(ps: IndexedSeq[Column]): Column =
    if (ps.length == 1) ps.head
    else {
      val (l, r) = ps.splitAt(ps.length / 2)
      balancedOr(l) || balancedOr(r)
    }

  /** Curriculum ordering — easy-to-hard training schedules (sequence-length
    * or quality curricula) without a global sort: rows are bucketed into
    * difficulty TIERS by explicit score boundaries, and each shard streams
    * its tiers in ascending order with the seeded pseudorandom permutation
    * WITHIN each tier ("sorted by difficulty, shuffled within difficulty" —
    * a literal `ORDER BY score` destroys intra-batch diversity, a plain
    * shuffle destroys the schedule; the tiered blend is the standard
    * compromise).
    *
    * `tier = |{b in boundaries : score > b}|` (the comparison-count rule,
    * 0-based; boundaries must be strictly increasing). A NULL score lands
    * in the LAST tier — unknown difficulty trains last, not first
    * (documented choice; filter upstream to drop such rows instead). For a
    * hard-to-easy schedule, negate the score and the boundaries.
    *
    * Scale shape: identical to [[order]] — the tier is a narrow per-row
    * expression, so the plan is still ONE hash shuffle on `shard` plus a
    * per-shard local sort (now on (tier, hash, id)); parallelism stays
    * `shards`, nothing global anywhere. Output: input columns +
    * `tier` + (shard, pos). */
  def curriculum(df: DataFrame, idCol: String, scoreCol: String,
      boundaries: Seq[Double], seed: Long, shards: Int,
      portable: Boolean = false): DataFrame =
    curriculumImpl(df, idCol, scoreCol, boundaries, seed, shards, portable,
      prePartition = false)

  /** [[curriculum]] with DERIVED boundaries — the standard ask is "25/50/
    * 25 by length", not hand-computed score literals: `fractions` gives
    * each tier's target mass (must sum to 1), and the boundaries are the
    * percentile_disc order statistics of the NON-NULL scores at the
    * cumulative interior fractions (rank `ceil(p·n)` — actual elements of
    * the column, exact and engine-mirrorable; [[Profile.numericProfile]]'s
    * definition). One [[Profile.selectRanks]] pass derives every boundary
    * — the distributed bucketed rank selection, so no task ever sorts the
    * whole score column — then delegates to [[curriculum]] (same plan:
    * one exchange, per-shard sort).
    *
    * Tier populations match the fractions up to ties at a boundary value
    * (rows EQUAL to a boundary land in the lower tier, the
    * percentile_disc convention) and NULL scores, which are excluded from
    * the quantiles and land in the LAST tier ([[curriculum]]'s rule).
    * Boundary values that COLLIDE under extreme ties are deduplicated —
    * the adjacent tiers merge rather than erroring (strictly-increasing
    * boundaries are [[curriculum]]'s contract). */
  def curriculumByQuantiles(df: DataFrame, idCol: String, scoreCol: String,
      fractions: Seq[Double], seed: Long, shards: Int,
      portable: Boolean = false): DataFrame =
    curriculum(df, idCol, scoreCol,
      quantileBoundaries(df, scoreCol, fractions), seed, shards, portable)

  /** The interior percentile_disc boundaries [[curriculumByQuantiles]]
    * derives — public because a multi-epoch run should derive them ONCE
    * and hold them fixed (re-deriving per epoch on a corpus that grows
    * between epochs would silently shift the schedule): derive here, then
    * feed the literals to [[curriculum]]/[[writeCurriculumShards]] for
    * every epoch seed. */
  def quantileBoundaries(df: DataFrame, scoreCol: String,
      fractions: Seq[Double]): Seq[Double] = {
    require(fractions.size >= 2,
      s"need at least two tier fractions (one tier is just order()), " +
        s"got $fractions")
    require(fractions.forall(f => !f.isNaN && !f.isInfinite && f > 0.0),
      s"tier fractions must be finite and positive, got $fractions")
    require(math.abs(fractions.sum - 1.0) <= 1e-9,
      s"tier fractions must sum to 1, got $fractions (sum ${fractions.sum})")
    // cumulative fractions in DECIMAL, not float scanLeft: 0.1 + 0.2
    // floats to 0.30000000000000004, whose ceil(p·n) rank is one ABOVE
    // percentile_disc(0.3) whenever p·n lands integral — BigDecimal over
    // the shortest decimal representations sums the fractions a human
    // wrote exactly (review r16)
    val cuts = fractions.init
      .scanLeft(BigDecimal(0)) { (acc, f) =>
        acc + BigDecimal(java.lang.Double.toString(f))
      }
      .tail.map(_.toDouble)
    val stacked = df.select(lit(scoreCol).as("column"),
      col(scoreCol).cast("double").as("v"))
    val r = stacked.agg(count(col("v")).as("n"),
      min(col("v")).as("mn"), max(col("v")).as("mx")).first()
    val n = r.getLong(0)
    require(n > 0,
      s"no non-NULL '$scoreCol' values — quantile boundaries are undefined")
    val ranks = cuts.map(p => math.max(1L, math.ceil(p * n).toLong))
    val hits = Profile.selectRanks(stacked,
      Map(scoreCol -> ranks.distinct),
      Map(scoreCol -> ((r.getDouble(1), r.getDouble(2)))))
    ranks.map(k => hits((scoreCol, k))).distinct
  }

  /** Land the curriculum as training shard files — the [[writeShards]]
    * contract (one pos-ordered file per `shard=` dir, ONE exchange,
    * `maxRecordsPerFile = 0` pinned, manifest written) over
    * [[curriculum]]'s tiered order: a reader streaming each shard
    * front-to-back gets the easy-to-hard schedule for free. */
  def writeCurriculumShards(df: DataFrame, idCol: String, scoreCol: String,
      boundaries: Seq[Double], seed: Long, shards: Int, path: String,
      portable: Boolean = false): Unit = {
    curriculumImpl(df, idCol, scoreCol, boundaries, seed, shards, portable,
      prePartition = true)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", "0")
      .partitionBy("shard").parquet(path)
    writeManifest(df.sparkSession, path)
  }

  private def curriculumImpl(df: DataFrame, idCol: String, scoreCol: String,
      boundaries: Seq[Double], seed: Long, shards: Int, portable: Boolean,
      prePartition: Boolean): DataFrame = {
    require(boundaries.nonEmpty,
      "curriculum needs at least one tier boundary (a boundary-less " +
        "curriculum is just order())")
    require(boundaries.forall(b => !b.isNaN && !b.isInfinite),
      s"tier boundaries must be finite, got $boundaries")
    require(boundaries.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      s"tier boundaries must be strictly increasing, got $boundaries")
    require(!df.columns.exists(_.equalsIgnoreCase("tier")),
      "input already has a 'tier' column — drop or rename it before " +
        "curriculum ordering (the name is this operator's output)")
    require(!idCol.equalsIgnoreCase("tier") && !scoreCol.equalsIgnoreCase("tier"),
      "idCol/scoreCol collide with the curriculum 'tier' output column")
    val hashed = hashShard(df, idCol, seed, shards, portable)
    val tier = when(col(scoreCol).isNull, lit(boundaries.size))
      .otherwise(boundaries.map(b =>
        when(col(scoreCol) > lit(b), 1).otherwise(0)).reduce(_ + _))
    val tiered = hashed.withColumn("tier", tier.cast("int"))
    val clustered =
      if (prePartition) tiered.repartition(shards, col("shard")) else tiered
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("tier"), col("__graft_h"), col(idCol))
    clustered
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__graft_h")
  }

  /** Token-budget PREFIX of a training stream: the maximal prefix of the
    * global consumption order whose token sum fits `budget` — "train on
    * the first N tokens of this mixture", the cut every budgeted run
    * makes. The global order is lexicographic `(pos, shard)`: readers
    * drain position p from every shard before p+1, which is how
    * lock-step shard consumption already behaves; granularity is one
    * `(pos, shard)` cell (= one row in every layout this module lands).
    *
    * `df` is any coordinate-carrying stream — [[order]]/[[interleaveRows]]
    * output or a landed layout read back — with an integral token-count
    * column (fractional counts: round upstream; negative counts are
    * undefined — the cut assumes a monotone cumulative sum). NULL token
    * counts contribute 0 and the row still ships with its cell.
    *
    * Scale shape: two tiny jobs + one pruned scan. (1) per-`pos` token
    * totals — one shuffle with `max_pos` (= corpus/shards) groups — then
    * the running total over pos in a single-partition window of those
    * max_pos ROLLUP rows (not the corpus; ~1M rows at 100 TB/100k
    * shards), giving the last fully-covered position P*. (2) the same
    * rollup over the single boundary position P*+1 by shard (≤ shards
    * rows) spends the remainder in shard order, giving the boundary
    * shard S*. The result predicate is three literals —
    * `pos <= P*+1 AND (pos <= P* OR (pos = P*+1 AND shard <= S*))` — so
    * on a landed layout the leading conjunct reaches the parquet scan
    * pushed (row groups beyond the cut are SKIPPED; a 10% budget reads
    * ~10% of the layout) and `shard <= S*` partition-prunes nothing but
    * costs nothing (spec-pinned). */
  def prefixByBudget(df: DataFrame, tokenCol: String, budget: Long): DataFrame = {
    requirePrefixColumns(df, tokenCol)
    prefixImpl(df,
      df.groupBy(col("pos")).agg(
        sum(coalesce(col(tokenCol).cast("long"), lit(0L))).as("__graft_t")),
      tokenCol, budget)
  }

  private def requirePrefixColumns(df: DataFrame, tokenCol: String): Unit =
    Seq("shard", "pos", tokenCol).foreach(c =>
      require(df.columns.exists(_.equalsIgnoreCase(c)),
        s"prefixByBudget needs a '$c' column — run it on a training-order " +
          "stream (order/interleaveRows output or a landed shard layout)"))

  /** The per-position token-index sidecar's directory name under a landed
    * layout. The leading underscore keeps it INVISIBLE to layout reads
    * (Spark skips `_`/`.`-prefixed paths), so writing an index never
    * changes what `spark.read.parquet(layout)` returns. */
  private[graft] def tokenIndexPath(path: String, tokenCol: String): String =
    s"$path/_graft_token_index_${tokenCol.toLowerCase}"

  /** Precompute the per-position token totals of a landed layout ONCE, so
    * every subsequent [[prefixByBudget]] cut answers from the tiny index
    * instead of rescanning the layout: the heavy half of a cut is the
    * per-pos rollup — a (pos, tokenCol)-pruned scan of the whole corpus —
    * while the index has one row per POSITION (corpus/shards; ~1M rows at
    * 100 TB / 100k shards, a few MB as one parquet file). Budget sweeps,
    * checkpoint scheduling, and repeated cuts against the same epoch pay
    * the corpus scan once here and never again.
    *
    * Staleness contract: every landing in this module overwrites the whole
    * layout directory, which deletes any sidecar with it — a stale index
    * cannot survive a re-land. (This module's layouts are never appended
    * to in place.) */
  def writeTokenIndex(spark: SparkSession, path: String,
      tokenCol: String): Unit =
    spark.read.parquet(path)
      .groupBy(col("pos"))
      .agg(sum(coalesce(col(tokenCol).cast("long"), lit(0L))).as("tokens"))
      .coalesce(1)
      .write.mode("overwrite").parquet(tokenIndexPath(path, tokenCol))

  /** [[prefixByBudget]] over a LANDED layout, answering the heavy half of
    * the cut from the [[writeTokenIndex]] sidecar when one exists (falling
    * back to the on-the-fly rollup when it does not): the per-pos running
    * total reads the index's one tiny file, and the only layout I/O is the
    * boundary position's single pushed-equality scan (~one row group per
    * shard) plus the pruned prefix read the caller consumes. */
  def prefixByBudget(spark: SparkSession, path: String, tokenCol: String,
      budget: Long): DataFrame = {
    val df = spark.read.parquet(path)
    // gate on the index's COMMIT marker, not the bare dir: a writer that
    // crashed mid-index leaves a partial dir that would fail the read —
    // an uncommitted index falls back to the on-the-fly rollup instead
    val idxDir = tokenIndexPath(path, tokenCol)
    val committed = LayoutMeta.fs(spark, path)
      .exists(new org.apache.hadoop.fs.Path(idxDir, "_SUCCESS"))
    if (committed)
      prefixImpl(df,
        spark.read.parquet(idxDir)
          .select(col("pos"), col("tokens").as("__graft_t")),
        tokenCol, budget)
    else prefixByBudget(df, tokenCol, budget)
  }

  private def prefixImpl(df: DataFrame, perPos: DataFrame, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"token budget must be non-negative, got $budget")
    requirePrefixColumns(df, tokenCol)
    // coalesce BEFORE summing (here and in every perPos source): a
    // position or boundary shard whose tokens are all NULL must cost 0
    // and still ship — a bare sum would yield NULL, fail the <= budget
    // filter, and wrongly cut zero-cost leading cells
    val toks = coalesce(col(tokenCol).cast("long"), lit(0L))
    val wPos = Window.orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = perPos
      .withColumn("__graft_c", sum(col("__graft_t")).over(wPos))
      .where(col("__graft_c") <= lit(budget))
      .agg(max(col("pos")), max(col("__graft_c"))).first()
    val (pStar, used) =
      if (covered.isNullAt(0)) (0L, 0L)
      else (covered.getLong(0), covered.getLong(1))
    val shardType = df.schema.fields
      .find(_.name.equalsIgnoreCase("shard")).get.dataType
    val wShard = Window.orderBy(col("__graft_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = df.where(col("pos") === lit(pStar + 1L))
      .groupBy(col("shard").cast("long").as("__graft_s")).agg(sum(toks).as("__graft_t"))
      .withColumn("__graft_c", sum(col("__graft_t")).over(wShard))
      .where(col("__graft_c") <= lit(budget - used))
      .agg(max(col("__graft_s"))).first()
    val pred =
      if (!boundary.isNullAt(0)) {
        val sStar = lit(boundary.getLong(0)).cast(shardType)
        // the redundant leading conjunct is the PUSHABLE form of the cut —
        // parquet row-group pruning sees a plain pos bound; the exact
        // boundary-shard refinement evaluates residually on the remainder
        col("pos") <= lit(pStar + 1L) &&
          (col("pos") <= lit(pStar) ||
            (col("pos") === lit(pStar + 1L) && col("shard") <= sStar))
      } else if (pStar == 0L) lit(false)
      else col("pos") <= lit(pStar)
    df.where(pred)
  }

  private def interleaveImpl(sources: Seq[(String, DataFrame, Double)],
      idCol: String, seed: Long, shards: Int, portable: Boolean,
      payload: Boolean, prePartition: Boolean): DataFrame = {
    require(sources.nonEmpty, "interleave needs at least one source")
    require(sources.forall(_._3 > 0), "mixture weights must be positive")
    require(sources.map(_._1).distinct.size == sources.size,
      "source tags must be distinct — the tag is the cross-source " +
        "tiebreak, and duplicate tags would also conflate ids across sources")
    require(!idCol.equalsIgnoreCase("source") &&
      !idCol.toLowerCase.startsWith("__graft_"),
      s"idCol '$idCol' collides with an interleave output/working column")
    if (payload) sources.foreach { case (tag, df, _) =>
      require(!df.columns.exists(_.equalsIgnoreCase("source")),
        s"source '$tag' already has a 'source' column, which collides " +
          "with the interleave output tag — rename it before interleaving")
    }
    // hash PER SOURCE, before the union: hashShard's contract — union
    // type coercion must never change the hash input (each source keeps
    // exactly the (shard, pos) order() would assign it alone)
    val tagged = sources.map { case (tag, df, weight) =>
      hashShard(if (payload) df else df.select(col(idCol)),
        idCol, seed, shards, portable)
        .withColumn("source", lit(tag))
        .withColumn("__graft_w", lit(weight))
    }.reduce(_.unionByName(_, allowMissingColumns = payload))
    val clustered =
      if (prePartition) tagged.repartition(shards, col("shard"))
      else tagged.repartition(col("shard"))
    // per-source rank within the shard == order()'s pos for that source
    val wSrc = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("__graft_h"), col(idCol))
    // stretch: rank r of a weight-w source lands at r/w on the shared
    // axis; ties across sources break by (axis, source, id)
    val wMix = Window.partitionBy(col("shard"))
      .orderBy(col("__graft_axis"), col("source"), col(idCol))
    clustered
      .withColumn("__graft_axis",
        row_number().over(wSrc).cast("double") / col("__graft_w"))
      .withColumn("pos", row_number().over(wMix).cast("long"))
      .drop("__graft_h", "__graft_w", "__graft_axis")
  }
}
