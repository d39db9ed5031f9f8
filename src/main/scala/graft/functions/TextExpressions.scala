package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-class counter for text-quality statistics.
  *
  * The stats projection needs eight counts per document (chars, whitespace
  * tokens, alpha, digit, literal-space, punctuation, uppercase, non-space).
  * Expressed with built-ins that is 6+ independent `regexp_count` passes —
  * each one walks the full text through a regex engine. This expression
  * computes all eight in ONE byte-level loop (measured ~4× on the stats
  * query) while matching the regex definitions exactly:
  *
  *   - chars    = code points (`length`)
  *   - tokens   = maximal runs of non-whitespace (`\S+`), where whitespace
  *                is Java regex `\s` = [ \t\n\x0B\f\r] — ASCII-only, so
  *                non-ASCII code points are token characters, as in regex
  *   - alpha    = [a-zA-Z], digit = [0-9], space = [ ] (literal space),
  *     punct    = [.,;:!?'"()\[\]{}-], upper = [A-Z]
  *   - nonspace = code points not in `\s`
  *
  * UTF-8 continuation bytes (0b10xxxxxx) are skipped so multibyte code
  * points count once, exactly like the regex engines count them.
  */
case class TextCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_text_counts requires a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TextCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextCounts =
    copy(child = newChild)
}

object TextCounts {
  // indices into the result array
  val Chars = 0; val Tokens = 1; val Alpha = 2; val Digit = 3
  val Space = 4; val Punct = 5; val Upper = 6; val NonSpace = 7

  /** One pass over the UTF-8 bytes; called from generated code. */
  def compute(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    var chars = 0; var tokens = 0; var alpha = 0; var digit = 0
    var space = 0; var punct = 0; var upper = 0; var nonspace = 0
    var inToken = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, offset + i)
      if ((b & 0xC0) != 0x80) { // skip UTF-8 continuation bytes
        chars += 1
        val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
        if (isWs) {
          if (b == ' ') space += 1
          inToken = false
        } else {
          nonspace += 1
          if (!inToken) { tokens += 1; inToken = true }
          if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) alpha += 1
          if (b >= 'A' && b <= 'Z') upper += 1
          if (b >= '0' && b <= '9') digit += 1
          b match {
            case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' |
                 '[' | ']' | '{' | '}' | '-' => punct += 1
            case _ => ()
          }
        }
      }
      i += 1
    }
    new GenericArrayData(Array(chars, tokens, alpha, digit, space, punct, upper, nonspace))
  }

  import org.apache.spark.sql.{functions => F, SparkSession}

  val FunctionName = "graft_text_counts"

  /** Register as a SQL function in the session registry (idempotent;
    * no-op under Spark Connect — see [[GraftRegistry]]). */
  def register(spark: SparkSession): Unit =
    GraftRegistry.tempFunction(spark, FunctionName, exprs => TextCounts(exprs.head))

  /** Column wrapper; registers against the active session on first use.
    * On a non-classic (Spark Connect) session this returns the built-in
    * twin ([[countsBuiltin]]) unless `spark.graft.connect.functions=
    * server` routes to a server-side [[GraftExtensions]] install. */
  def counts(text: Column): Column =
    SparkSession.getActiveSession match {
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) &&
          !GraftRegistry.useServerFunctions(s) =>
        countsBuiltin(text)
      case other =>
        other.foreach(s => if (GraftRegistry.canRegisterClientSide(s)) register(s))
        F.call_function(FunctionName, text)
    }

  /** Pure built-in-functions twin of [[TextCounts]] — the client-side
    * Connect fallback. These are EXACTLY the regex definitions the
    * expression replaced (the expression's own spec pins "TextCounts
    * matches the regex definitions it replaces", so twin-vs-expression
    * bit-identity is the already-tested equivalence): eight independent
    * `length`/`regexp_count` passes instead of one byte loop — correct
    * everywhere, slower; install [[GraftExtensions]] server-side for the
    * fast path. Java regex `\s` is ASCII-only, matching the expression's
    * whitespace set; a NULL text yields NULL (the expression's
    * null-propagation), which the explicit when() preserves — a bare
    * array() of null counts would be an array OF nulls instead. */
  def countsBuiltin(text: Column): Column =
    F.when(text.isNotNull, F.array(
      F.length(text),                            // Chars = code points
      F.regexp_count(text, F.lit("\\S+")),       // Tokens
      F.regexp_count(text, F.lit("[a-zA-Z]")),   // Alpha
      F.regexp_count(text, F.lit("[0-9]")),      // Digit
      F.regexp_count(text, F.lit(" ")),          // Space (literal)
      F.regexp_count(text, F.lit("[.,;:!?'\"()\\[\\]{}-]")), // Punct
      F.regexp_count(text, F.lit("[A-Z]")),      // Upper
      F.regexp_count(text, F.lit("\\S"))))       // NonSpace
}

/** Single-pass marker-word counting for language ID and stopword ratios.
  *
  * The stats projection needs `\b(word1|word2|…)\b` hit counts for five
  * word sets (stopwords + four language marker sets) — five full regex
  * scans of every document. This expression makes ONE pass: segment the
  * text into maximal ASCII `\w` runs ([a-zA-Z0-9_] — exactly Java/RE2
  * word-boundary semantics with Unicode classes off), lowercase each run,
  * and count membership per set via a precomputed word→sets map. A `\w`
  * run equals a marker word iff the regex matches that occurrence (the run
  * edges ARE the `\b` boundaries), so counts are identical to the regex
  * definitions and the DuckDB oracle is unchanged.
  */
case class WordSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word-set counting requires a string column, got $other")
    }

  // word (lowercase) → indices of the sets containing it
  @transient private lazy val wordToSets: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for ((set, i) <- sets.zipWithIndex; w <- set) {
      val prev = Option(m.get(w)).getOrElse(Array.empty[Int])
      m.put(w, prev :+ i)
    }
    m
  }

  /** Instance method (captures the word map) invoked from generated code
    * via an object reference. */
  def computeCounts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Int](sets.length)
    val run = new java.lang.StringBuilder(16)
    def flush(): Unit = {
      if (run.length > 0) {
        val hit = wordToSets.get(run.toString)
        if (hit != null) { var i = 0; while (i < hit.length) { counts(hit(i)) += 1; i += 1 } }
        run.setLength(0)
      }
    }
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isWord = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '_'
      if (isWord) run.append((if (b >= 'A' && b <= 'Z') (b + 32) else b).toChar)
      else flush() // multibyte lead/continuation bytes are non-\w: boundary
      i += 1
    }
    flush()
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    computeCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSetCounts", this, classOf[WordSetCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeCounts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCounts =
    copy(child = newChild)
}

object WordSetCounts {
  import org.apache.spark.sql.{functions => F, SparkSession}

  /** Register a named instance bound to fixed word sets; needed because the
    * function registry resolves by name only (no-op under Spark Connect —
    * see [[GraftRegistry]]). */
  def register(spark: SparkSession, name: String, sets: Seq[Seq[String]]): Unit =
    GraftRegistry.tempFunction(spark, name, exprs => WordSetCounts(exprs.head, sets))

  /** Column wrapper; the name must be stable per distinct set family. On a
    * non-classic (Spark Connect) session this returns the built-in twin —
    * the parameterized name is NOT among [[GraftExtensions]]' stable
    * injections, so a server could never resolve it (the
    * [[LshPlanes.tableSignatures]] rule): the twin is the only Connect
    * path, no dial. */
  def counts(text: Column, name: String, sets: Seq[Seq[String]]): Column =
    SparkSession.getActiveSession match {
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) =>
        countsBuiltin(text, sets)
      case other =>
        other.foreach(s =>
          if (GraftRegistry.canRegisterClientSide(s)) register(s, name, sets))
        F.call_function(name, text)
    }

  /** Pure built-in-functions twin of [[WordSetCounts]] — the client-side
    * Connect fallback, bit-identical by the expression's own definition
    * ("a `\w` run equals a marker word iff the regex matches that
    * occurrence"): one case-insensitive `\b(w1|w2|…)\b` alternation per
    * set, against the ORIGINAL text. `(?i)` instead of `lower(text)`
    * because Java's default ASCII-only case fold is exactly the
    * expression's per-run byte lowercasing, while `lower()` could move
    * run boundaries for non-ASCII code points (e.g. İ lowercases to two
    * code points, one of them `\w`). Words the expression can never
    * match — anything outside `[a-z0-9_]+` (runs are lowercased `\w`
    * bytes) — are excluded rather than allowed to match spuriously; a
    * word listed k times in one set counts k× in the expression's map,
    * mirrored with (k−1) extra single-word passes (real marker sets have
    * no duplicates, so this stays one scan per set). */
  def countsBuiltin(text: Column, sets: Seq[Seq[String]]): Column = {
    val perSet = sets.map { set =>
      val eligible = set.filter(_.matches("[a-z0-9_]+"))
      if (eligible.isEmpty) F.lit(0)
      else {
        val grouped = eligible.groupBy(identity)
        val alternation =
          "(?i)\\b(?:" + grouped.keys.toSeq.sorted.mkString("|") + ")\\b"
        val base = F.regexp_count(text, F.lit(alternation))
        val extras = grouped.toSeq.collect { case (w, occ) if occ.size > 1 =>
          F.regexp_count(text, F.lit(s"(?i)\\b$w\\b")) * F.lit(occ.size - 1)
        }
        extras.foldLeft(base)(_ + _)
      }
    }
    F.when(text.isNotNull, F.array(perSet: _*))
  }
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm): byte-level k-gram Rabin–Karp rolling hashes, then the
  * minimum hash of each sliding window of `w` consecutive k-grams, deduped
  * in document order. Guarantees: any shared substring of length ≥ w+k-1
  * between two documents yields at least one shared fingerprint, and the
  * fingerprint density is ~2/(w+1) regardless of document size — the
  * standard plagiarism/near-dup chunk signature.
  *
  * One codegen'd pass per document (the rolling update is O(1) per byte);
  * downstream dedup explodes the fingerprint array into an inverted index
  * exactly like the shingle pipelines. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_winnow requires a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val Base = 1000000007L

  /** Rolling k-gram hashes + winnowing min-selection; called from generated
    * code. Returns the ordered, consecutive-deduped fingerprint array. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) {
      // degenerate: whole-text hash, mirroring wordShingles' short-text rule
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xFF) + 1; i += 1 }
      return new GenericArrayData(Array(mix(h)))
    }
    val grams = n - k + 1
    val hashes = new Array[Long](grams)
    // precompute Base^(k-1) for the rolling subtraction (wrapping arithmetic)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xFF) + 1; i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < grams) {
      h = (h - ((bytes(i - 1) & 0xFF) + 1) * pow) * Base + (bytes(i + k - 1) & 0xFF) + 1
      hashes(i) = mix(h)
      i += 1
    }
    // winnow: min of each window of w gram hashes, rightmost-min tie rule,
    // record only when the selected position changes
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPos = -1
    val first = math.min(w, grams)
    var start = 0
    while (start <= grams - first) {
      val end = math.min(start + w, grams)
      var minPos = start
      var p = start
      while (p < end) {
        if (hashes(p) <= hashes(minPos)) minPos = p
        p += 1
      }
      if (minPos != lastPos) { out += hashes(minPos); lastPos = minPos }
      start += 1
      if (first < w) start = grams // single short window: done
    }
    new GenericArrayData(out.toArray)
  }

  /** Final avalanche so structured inputs spread across the long range. */
  private def mix(x: Long): Long = {
    var z = x
    z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
    z *= 0xC4CEB9FE1A85EC53L; z ^= z >>> 33
    z
  }

  import org.apache.spark.sql.{functions => F, SparkSession}

  def functionName(k: Int, w: Int) = s"graft_winnow_${k}_$w"

  /** No-op under Spark Connect — see [[GraftRegistry]]. */
  def register(spark: SparkSession, k: Int, w: Int): Unit =
    GraftRegistry.tempFunction(spark, functionName(k, w),
      exprs => WinnowFingerprints(exprs.head, k, w))

  /** Column wrapper; registers against the active session on first use. */
  def fingerprints(text: Column, k: Int = 5, w: Int = 4): Column = {
    SparkSession.getActiveSession.foreach(register(_, k, w))
    F.call_function(functionName(k, w), text)
  }
}

/** Winnowing fingerprints over the PORTABLE md5 k-gram family, fused into
  * one expression: per document, hash every k-char gram (md5 48-bit prefix
  * of the gram's UTF-8 bytes — the engine-mirrorable family of
  * `Dedup.md5HashPair`), slide a `w`-gram window with a monotone deque
  * (smallest hash wins, RIGHTMOST position on ties), and emit the distinct
  * selected hashes. Byte-for-byte the same selection as the relational
  * explode → `rowsBetween` struct-min formulation it replaces, without
  * materializing one row per character position: the per-gram digests and
  * the O(grams) window scan happen in a tight per-document loop, and the
  * only rows downstream sees are the ~2/(w+1)-density fingerprints
  * themselves (measured ~4× on the sf0.1 winnow driver query).
  *
  * Positions are CODE POINTS (matching SQL `substr`/`length` semantics),
  * so the oracle's `substr(t, p, k)` mirror holds for any input, not just
  * ASCII. Texts shorter than k degrade to one whole-text gram; empty text
  * fingerprints the empty gram — both mirroring `substr`'s
  * truncate-past-end behavior. */
case class PortableWinnowMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_winnow_md5 requires a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    PortableWinnowMd5.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableWinnowMd5.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): PortableWinnowMd5 =
    copy(child = newChild)
}

object PortableWinnowMd5 {
  // One digest instance per thread, reset between grams — MessageDigest
  // construction (provider lookup) is far more expensive than a digest.
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code. Returns the distinct selected 48-bit
    * fingerprints in first-selection order. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // code-point start offsets (a UTF-8 byte starts a code point unless it
    // is a continuation byte 0b10xxxxxx); offsets(i) = byte offset of the
    // i-th code point, offsets(chars) = n
    var chars = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xC0) != 0x80) chars += 1; i += 1 }
    val offsets = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < n) {
      if ((bytes(i) & 0xC0) != 0x80) { offsets(c) = i; c += 1 }
      i += 1
    }
    offsets(chars) = n
    val md = digests.get()
    // gram at 0-based char position p: bytes [offsets(p), offsets(min(p+k, chars)))
    def gramHash(p: Int): Long = {
      val from = offsets(p)
      val until = offsets(math.min(p + k, chars))
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      // first 6 digest bytes, big-endian unsigned — the md5Prefix48 parse
      ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
        ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
    }
    val grams = math.max(chars - k + 1, 1)
    if (grams <= w) {
      // single (possibly short) window: min hash, rightmost on ties
      var best = gramHash(0)
      var p = 1
      while (p < grams) {
        val h = gramHash(p)
        if (h <= best) best = h
        p += 1
      }
      return new GenericArrayData(Array(best))
    }
    val hashes = new Array[Long](grams)
    i = 0
    while (i < grams) { hashes(i) = gramHash(i); i += 1 }
    // monotone deque of positions: increasing hash front-to-back; pushing
    // position p pops every back position with hash ≥ h(p) (≥, not >: equal
    // hashes yield to the LATER position — the rightmost-tie rule)
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var p = 0
    while (p < grams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(p)) tail -= 1
      deque(tail) = p; tail += 1
      val start = p - w + 1
      if (start >= 0) {
        while (deque(head) < start) head += 1
        val fp = hashes(deque(head))
        if (seen.add(fp)) out += fp
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.{functions => F, SparkSession}

  def functionName(k: Int, w: Int) = s"graft_winnow_md5_${k}_$w"

  /** No-op under Spark Connect — see [[GraftRegistry]]. */
  def register(spark: SparkSession, k: Int, w: Int): Unit =
    GraftRegistry.tempFunction(spark, functionName(k, w),
      exprs => PortableWinnowMd5(exprs.head, k, w))

  /** Column wrapper; registers against the active session on first use.
    * On a non-classic (Spark Connect) session this returns the built-in
    * twin ([[fingerprintsBuiltin]]). No `=server` dial escape here: no
    * `graft_winnow_md5_*` name is among [[GraftExtensions]]' stable
    * injections (only the non-portable `graft_winnow_5_4` is), so a
    * server could never resolve it — the [[LshPlanes.tableSignatures]]
    * rule, the twin is the only Connect path. */
  def fingerprints(text: Column, k: Int, w: Int): Column =
    SparkSession.getActiveSession match {
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) =>
        fingerprintsBuiltin(text, k, w)
      case other =>
        other.foreach(s =>
          if (GraftRegistry.canRegisterClientSide(s)) register(s, k, w))
        F.call_function(functionName(k, w), text)
    }

  /** Pure built-in-functions twin of [[PortableWinnowMd5]] — the
    * client-side Connect fallback, and a readable statement of WHAT the
    * fused expression computes: per code-point position the md5-48 hash
    * of the k-char gram (`substr` is code-point based like the
    * expression's offsets; `substr` past the end truncates, giving the
    * same short-tail grams), the min hash of each w-gram window, distinct
    * values in first-selection order.
    *
    * Value-identical by construction: a window's MIN VALUE is
    * tie-rule-independent (the rightmost-tie rule picks a position, not a
    * different value), and `array_distinct` keeps first occurrence —
    * exactly the expression's `seen.add` emission order. O(grams × w)
    * slicing instead of the monotone deque's O(grams), interpreted — the
    * usual fallback trade; install [[GraftExtensions]] server-side for
    * the fused expression. Empty text fingerprints the empty gram and
    * NULL yields NULL, both per the expression. */
  def fingerprintsBuiltin(text: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val chars = F.length(text)
    val grams = F.greatest(chars - (k - 1), F.lit(1))
    val hashes = F.transform(F.sequence(F.lit(1), grams), p =>
      F.conv(F.substring(F.md5(F.encode(F.substr(text, p, F.lit(k)), "UTF-8")),
        1, 12), 16, 10).cast("long"))
    val wins = F.when(grams <= w, F.array(F.array_min(hashes)))
      .otherwise(F.transform(F.sequence(F.lit(1), grams - (w - 1)), i =>
        F.array_min(F.slice(hashes, i, F.lit(w)))))
    F.when(text.isNotNull, F.array_distinct(wins))
  }
}

/** One md5 digest → the three integer projections the portable hash family
  * uses, skipping the hex-string round trip of `md5()` + `conv(substring)`
  * (per value, the built-in path pays a `MessageDigest.getInstance` provider
  * lookup, a 32-char hex encode, and one string parse per projection — this
  * expression reuses a thread-local digest and reads the raw bytes):
  *
  *   - `[0]` first 6 digest bytes big-endian   (= `conv(substr(h,1,12),16,10)`)
  *   - `[1]` digest bytes 8-13 big-endian      (= `conv(substr(h,17,12),16,10)`)
  *   - `[2]` first 8 digest bytes big-endian, signed (= the first 16 hex
  *     nibbles; nibble k of the hex string is `(x >>> (60-4k)) & 15`)
  *
  * Bit-identical to the hex parses for every input, so the DuckDB oracle
  * mirrors (`('0x' || substr(md5(v), …))::BIGINT`) are unchanged. */
case class Md5Longs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${Md5Longs.FunctionName} requires a binary column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Longs.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Longs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Longs =
    copy(child = newChild)
}

object Md5Longs {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def be(d: Array[Byte], from: Int, n: Int): Long = {
    var v = 0L
    var i = from
    while (i < from + n) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v
  }

  /** Called from generated code. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val md = digests.get()
    md.reset()
    md.update(bytes)
    val d = md.digest()
    new GenericArrayData(Array(be(d, 0, 6), be(d, 8, 6), be(d, 0, 8)))
  }

  import org.apache.spark.sql.{functions => F, SparkSession}

  val FunctionName = "graft_md5_longs"

  /** No-op under Spark Connect — see [[GraftRegistry]]. */
  def register(spark: SparkSession): Unit =
    GraftRegistry.tempFunction(spark, FunctionName, exprs => Md5Longs(exprs.head))

  /** Column wrapper; registers against the active session on first use.
    * On a non-classic (Spark Connect) session this returns the built-in
    * twin ([[longsBuiltin]]) unless `spark.graft.connect.functions=
    * server` routes to a server-side [[GraftExtensions]] install. */
  def longs(bin: Column): Column =
    SparkSession.getActiveSession match {
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) &&
          !GraftRegistry.useServerFunctions(s) =>
        longsBuiltin(bin)
      case other =>
        other.foreach(s => if (GraftRegistry.canRegisterClientSide(s)) register(s))
        F.call_function(FunctionName, bin)
    }

  /** Pure built-in-functions twin of [[Md5Longs]] — the client-side
    * Connect fallback: the hex-string round trip the expression exists to
    * skip, which is also why it is bit-identical by the expression's own
    * contract ("bit-identical to the hex parses for every input" — the
    * class doc's three projections spelled out with `md5()` + `conv()`).
    * The signed third projection uses `conv(…, 16, -10)`: a negative
    * target base renders the 64-bit value as SIGNED decimal, exactly the
    * expression's big-endian signed read (an unsigned `conv(…, 16, 10)`
    * would overflow the long cast for high-bit digests). Slower per value
    * (one digest per projection plus string parses) — install
    * [[GraftExtensions]] server-side for the fast path. */
  def longsBuiltin(bin: Column): Column = {
    val h = F.md5(bin)
    F.when(bin.isNotNull, F.array(
      F.conv(F.substring(h, 1, 12), 16, 10).cast("long"),
      F.conv(F.substring(h, 17, 12), 16, 10).cast("long"),
      F.conv(F.substring(h, 1, 16), 16, -10).cast("long")))
  }
}
