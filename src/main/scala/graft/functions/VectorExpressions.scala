package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns.
  *
  * `zip_with` + `aggregate` express the same computation, but Spark
  * evaluates higher-order functions interpreted — measured ~30× slower on
  * an O(n²) similarity join. This expression generates a tight primitive
  * loop inside whole-stage codegen.
  *
  * Semantics exactly match
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)`:
  * left-to-right double accumulation, so results are bit-identical to the
  * HOF form (and to any engine accumulating doubles in array order).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  // hoisted once per expression instance — nullSafeEval runs per row
  private lazy val leftElemType: DataType = elemType(left)
  private lazy val rightElemType: DataType = elemType(right)
  private lazy val leftElemNullable: Boolean = elemNullable(left)
  private lazy val rightElemNullable: Boolean = elemNullable(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product requires two numeric arrays, got ${left.dataType} and ${right.dataType}")
    }
  }

  // NULL ELEMENTS contribute 0.0 — and that must be EXPLICIT: a columnar
  // scan (vectorized parquet reader) leaves the value slot of a null
  // element UNDEFINED, so reading the primitive getter without an
  // isNullAt check returns indeterminate garbage (caught live by
  // ConnectIntegrationSpec — two runs of the same query over the same
  // file disagreed on a null-element row). The check is only emitted
  // when the schema says elements can be null.
  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftElemNullable && x.isNullAt(i)) 0.0
        else extract(x, i, leftElemType)
      val yv = if (rightElemNullable && y.isNullAt(i)) 0.0
        else extract(y, i, rightElemType)
      acc += xv * yv
      i += 1
    }
    acc
  }

  private def extract(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _: DecimalType => arr.get(i, dt).asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def genGet(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    // checkInputDataTypes admits any NumericType, so codegen must cover
    // decimal too — a missing case here crashes CODE GENERATION for a
    // query the analyzer accepted (and nullSafeEval handles)
    case d: DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, nullable: Boolean, dt: DataType): String =
        if (nullable) s"($arr.isNullAt($i) ? 0.0 : ${genGet(arr, i, dt)})"
        else genGet(arr, i, dt)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, elemNullable(left), elemType(left))} *
         |    ${get(b, elemNullable(right), elemType(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Bounded top-k aggregate over (score, id) pairs: keeps the k best rows
  * under (score DESC, id ASC) in a size-k heap. The point is the SHUFFLE
  * SHAPE: as a [[TypedImperativeAggregate]] it partial-aggregates map-side,
  * so each input partition contributes at most k heap entries per group —
  * a `groupBy(query).agg(top_k(...))` moves ≤ k×partitions tiny rows per
  * query instead of shuffling (and single-task sorting) the entire scored
  * stream the way `row_number().over(Window.partitionBy(query))` does.
  * That window plan collapses parallelism to #queries; this one keeps it.
  *
  * Output: `array<struct<score double, id bigint>>` in rank order (best
  * first). Deterministic: exact top-k under the total order (score desc,
  * id asc), independent of input order/partitioning. NULL scores and ids
  * are skipped.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private lazy val k: Int = {
    require(kExpr.foldable, "top_k k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"top_k k must be positive, got $v")
    v
  }

  // head = WORST kept element (lowest score; ties: highest id), so a full
  // heap replaces its head when a better candidate arrives
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.compare(cand, buf.head) < 0) { buf.dequeue(); buf.enqueue(cand) }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      other: scala.collection.mutable.PriorityQueue[(Double, Long)])
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    // NON-destructive: eval can run more than once per buffer (e.g. when
    // the aggregate is used as a running window function), so sort a copy
    // instead of draining the heap. sorted(worstFirst) ascending = best
    // first = rank order.
    val ranked = buf.toArray.sorted(worstFirst)
    new GenericArrayData(ranked.map(e => InternalRow(e._1, e._2)).toArray[Any])
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, IntegerType)

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
}

/** Element-wise sum + count over an array column in ONE pass:
  * `groupBy(cluster).agg(vector_sum(vec))` returns
  * `struct<sums array<double>, n bigint>` per group.
  *
  * Built for k-means training ([[graft.operators.Ivf]]): the alternative —
  * `posexplode(vec)` then `groupBy(cluster, pos).agg(sum, count)` — fans
  * every row out dim× before aggregating (100 TB × 64 becomes 6.4 PB of
  * exploded rows through the partial aggregate). This buffer updates dim
  * doubles in place per input row, and the shuffle carries one
  * (k × dim)-double buffer per map partition. */
case class VectorSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[VectorSum.Buffer] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum requires a numeric array, got $other")
    }

  override def createAggregationBuffer(): VectorSum.Buffer = new VectorSum.Buffer(null, 0L)

  override def update(buf: VectorSum.Buffer, input: InternalRow): VectorSum.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      require(buf.sums.length == n,
        s"vector_sum: ragged input — saw lengths ${buf.sums.length} and $n")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf.sums(i) += VectorSum.toDouble(arr, i, elemType)
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VectorSum.Buffer, other: VectorSum.Buffer): VectorSum.Buffer = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums.clone(); buf.n = other.n }
      else {
        require(buf.sums.length == other.sums.length,
          s"vector_sum: ragged input — saw lengths ${buf.sums.length} and ${other.sums.length}")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.n += other.n
      }
    }
    buf
  }

  override def eval(buf: VectorSum.Buffer): Any = {
    val sums = if (buf.sums == null) Array.empty[Double] else buf.sums
    InternalRow(new GenericArrayData(sums.map(x => x: Any)), buf.n)
  }

  override def serialize(buf: VectorSum.Buffer): Array[Byte] = {
    val dim = if (buf.sums == null) -1 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + math.max(dim, 0) * 8)
    bb.putInt(dim).putLong(buf.n)
    if (dim > 0) buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSum.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val dim = bb.getInt
    val n = bb.getLong
    if (dim < 0) new VectorSum.Buffer(null, n)
    else new VectorSum.Buffer(Array.fill(dim)(bb.getDouble), n)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("n", LongType)))

  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSum =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
}

object VectorSum {
  final class Buffer(var sums: Array[Double], var n: Long)

  private[functions] def toDouble(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.get(i, d).asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
}

/** Shared registry access for graft's custom Catalyst expressions.
  *
  * Classic (JVM) sessions register client-side into the session's function
  * registry. Spark Connect sessions CANNOT — by design, resolution happens
  * on the server, so client-side registration of JVM expressions is
  * impossible from any library. The supported Connect route is installing
  * [[GraftExtensions]] on the SERVER
  * (`spark.sql.extensions=graft.functions.GraftExtensions`); the
  * `call_function(name, …)` plans this library builds then resolve there.
  * A loud client-side error would wrongly block that working path, so
  * non-classic sessions are a deliberate no-op here (an uninstalled server
  * surfaces `UNRESOLVED_ROUTINE: graft_…`, which names the function to
  * install). */
object GraftRegistry {
  /** True when client-side JVM expression registration is possible — the
    * ONE definition of "is this a classic session" ([[tempFunction]] and
    * the scalar wrappers' Connect-fallback dispatch both key on it). The
    * SCALAR wrappers — including the string expression family
    * ([[TextCounts]], [[WordSetCounts]], [[Md5Longs]]) — fall back to
    * pure built-in-function twins on non-classic (Connect) sessions:
    * bit-identical, slower (HOFs/regexes evaluate per pass), but working
    * out of the box instead of requiring the server-side
    * [[GraftExtensions]] install. The heap aggregates are narrower:
    * [[TopKByScore]] has a sort-based twin (value-identical; order can
    * diverge only on a -0.0/0.0 score tie — see
    * [[VectorFunctions.topKByScore]]) and [[VectorSum]] a fold-based one
    * (same sums up to float summation order, ±ulp — see
    * [[VectorFunctions.vectorSum]]); only the non-portable rolling-hash
    * winnow family still needs the server install. */
  def canRegisterClientSide(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.isInstanceOf[org.apache.spark.sql.classic.SparkSession]

  def tempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    if (canRegisterClientSide(spark))
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    // else Connect: see scaladoc — server-side GraftExtensions

  /** Scalar-wrapper dispatch for a NON-classic session: `"fallback"`
    * (default) returns the built-in twin — works against any server;
    * `"server"` emits `call_function` so a Connect server WITH
    * [[GraftExtensions]] installed serves the fast codegen expression
    * (set `spark.graft.connect.functions=server` on such deployments —
    * the client cannot probe the server's extension list at plan-build
    * time, so this is an explicit, documented dial, not a guess). */
  private val serverFunctionsMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  private[graft] def useServerFunctions(
      spark: org.apache.spark.sql.SparkSession): Boolean = {
    // memoized per session: on Connect a conf read is a server RPC, and
    // query-build hot loops construct dozens-to-hundreds of these columns
    // (one per LSH plane) — the dial is a deployment property, read once
    val memo = serverFunctionsMemo.get(spark)
    if (memo != null) memo.booleanValue()
    else {
      val v =
        try spark.conf.get("spark.graft.connect.functions", "fallback") == "server"
        catch { case scala.util.control.NonFatal(_) => false }
      serverFunctionsMemo.put(spark, java.lang.Boolean.valueOf(v))
      v
    }
  }
}

/** Session-extension installer: `SparkSession.builder()
  * .withExtensions(new GraftExtensions).getOrCreate()` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the required
  * form for Spark Connect SERVERS) makes every stable-name graft function
  * available to pure-SQL and Connect users cluster-wide. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, clazz, builder) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(clazz, name),
        builder))
    }
}

object GraftExtensions {
  /** Every graft function with a STABLE name (parameterized families —
    * WordSetCounts instances, winnow k/w variants other than the default —
    * bind constants into the expression and are registered per-session by
    * their wrappers instead). */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (VectorFunctions.FunctionName, classOf[DotProduct].getCanonicalName,
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    (VectorFunctions.TopKFunctionName, classOf[TopKByScore].getCanonicalName,
      (exprs: Seq[Expression]) => TopKByScore(exprs(0), exprs(1), exprs(2))),
    (VectorFunctions.VectorSumFunctionName, classOf[VectorSum].getCanonicalName,
      (exprs: Seq[Expression]) => VectorSum(exprs(0))),
    (TextCounts.FunctionName, classOf[TextCounts].getCanonicalName,
      (exprs: Seq[Expression]) => TextCounts(exprs.head)),
    (Md5Longs.FunctionName, classOf[Md5Longs].getCanonicalName,
      (exprs: Seq[Expression]) => Md5Longs(exprs.head)),
    (WinnowFingerprints.functionName(5, 4), classOf[WinnowFingerprints].getCanonicalName,
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs.head, 5, 4)))
}

/** All multi-table hyperplane-LSH signatures of a vector in ONE expression:
  * element t of the result is table t's `bits`-bit signature (bit p =
  * sign(v · plane_{t·bits+p}), planes from [[LshPlanes]]'s deterministic
  * formula — the same values [[LshPlanes.vector]] exposes for oracle SQL
  * literals and driver-side query signing).
  *
  * Composing this from per-plane `DotProduct(vec, vecLit(plane))` columns
  * is semantically identical but materializes tables × bits × dim literal
  * nodes in the Catalyst tree (128 planes × 64 dims ≈ 8k nodes, doubled
  * per self-join side): ANALYSIS and optimization of that tree dominated
  * the sf0.1 multi-table cosine query (~9s of its 11.7s was driver-side
  * planning). One opaque node with the planes held as a reference object
  * keeps the tree O(1) and the inner loop primitive; per-element semantics
  * (left-to-right double accumulation, numeric-element cast) are
  * bit-identical to the DotProduct composition, pinned in OpsSpec. */
case class LshTableSignatures(child: Expression, dim: Int, bits: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(dim >= 1 && bits >= 1 && bits <= 63 && tables >= 1,
    "dim/bits/tables must be positive (bits ≤ 63)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_sigs requires a numeric array column, got $other")
    }

  // planes(t*bits + p)(d) — computed once per expression instance and
  // shipped to executors as a codegen reference object
  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(tables * bits)(g => LshPlanes.vector(g, dim).toArray)

  private lazy val getElem: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType => (a, i) => a.getLong(i).toDouble
      case ShortType => (a, i) => a.getShort(i).toDouble
      case ByteType => (a, i) => a.getByte(i).toDouble
      case dt: DecimalType => (a, i) =>
        a.get(i, dt).asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }

  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  /** Called from generated code. */
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    // read each vector element once, not tables × bits times. NULL
    // elements read as 0.0 EXPLICITLY: a columnar scan leaves the value
    // slot of a null element undefined, so the bare getter returns
    // indeterminate garbage there (ConnectIntegrationSpec caught two runs
    // of the same query disagreeing on a null-element row); the isNullAt
    // branch is skipped when the schema forbids null elements.
    val n = math.min(arr.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    if (elemNullable)
      while (i < n) { v(i) = if (arr.isNullAt(i)) 0.0 else getElem(arr, i); i += 1 }
    else
      while (i < n) { v(i) = getElem(arr, i); i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        val plane = planes(t * bits + p)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += v(d) * plane(d); d += 1 }
        if (acc >= 0) sig |= 1L << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshTableSigs", this, classOf[LshTableSignatures].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshTableSignatures =
    copy(child = newChild)
}

/** The deterministic hyperplane family shared by the engine expression,
  * Ann's per-plane column formulation, driver-side query signing, and the
  * oracle SQL literal embedding: component (p, d) is a signed unit-range
  * double derived from a murmur3 hash of the index pair. */
object LshPlanes {
  import org.apache.spark.sql.{functions => F, SparkSession}

  def component(p: Int, d: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((p, d))
    h.toDouble / Int.MaxValue
  }

  def vector(globalPlane: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => component(globalPlane, d))

  def functionName(dim: Int, bits: Int, tables: Int) =
    s"graft_lsh_sigs_${dim}_${bits}_$tables"

  /** No-op under Spark Connect — see [[GraftRegistry]]. */
  def register(spark: SparkSession, dim: Int, bits: Int, tables: Int): Unit =
    GraftRegistry.tempFunction(spark, functionName(dim, bits, tables),
      exprs => LshTableSignatures(exprs.head, dim, bits, tables))

  /** Column wrapper; registers against the active session on first use.
    * On a non-classic (Connect) session, falls back to the built-in twin
    * ([[tableSignaturesBuiltin]]) — bit-identical, no server install
    * needed; see [[GraftRegistry.canRegisterClientSide]]. */
  def tableSignatures(vec: Column, dim: Int, bits: Int, tables: Int): Column =
    SparkSession.getActiveSession match {
      // no useServerFunctions escape here: the parameterized name is NOT
      // among GraftExtensions' stable injections, so a server can never
      // resolve it — the builtin twin is the only Connect path
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) =>
        tableSignaturesBuiltin(vec, dim, bits, tables)
      case other =>
        other.foreach(s =>
          if (GraftRegistry.canRegisterClientSide(s)) register(s, dim, bits, tables))
        F.call_function(functionName(dim, bits, tables), vec)
    }

  /** Pure built-in-functions twin of [[LshTableSignatures]] — the
    * client-side Connect fallback: per-plane [[VectorFunctions
    * .dotProductBuiltin]] sign bits OR-ed into each table's signature.
    * Exactly the tables × bits × dim literal-tree formulation the opaque
    * expression exists to avoid, so planning cost is real — correctness
    * over speed, install [[GraftExtensions]] server-side for the fast
    * path. Two semantic guards keep it bit-identical (spec-pinned): a
    * NaN dot leaves the bit UNSET (Java `>=` semantics — SQL would order
    * NaN above every number), and a NULL vector yields a NULL signature
    * array (not an array of zero signatures). */
  def tableSignaturesBuiltin(vec: Column, dim: Int,
      bits: Int, tables: Int): Column = {
    // the expression's own parameter contract — without it bits=64 would
    // silently wrap the shift and bits=0 would throw an opaque
    // empty-reduce instead of the named require
    require(dim >= 1 && bits >= 1 && bits <= 63 && tables >= 1,
      "dim/bits/tables must be positive (bits ≤ 63)")
    val sigs = (0 until tables).map { t =>
      (0 until bits).map { p =>
        val plane = F.array(vector(t * bits + p, dim).map(F.lit): _*)
        val dot = VectorFunctions.dotProductBuiltin(vec, plane)
        F.when(!F.isnan(dot) && dot >= 0, F.lit(1L << p)).otherwise(F.lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    F.when(vec.isNotNull, F.array(sigs: _*))
  }
}

object VectorFunctions {
  import org.apache.spark.sql.{functions => F, SparkSession}

  val FunctionName = "graft_dot_product"
  val TopKFunctionName = "graft_top_k"
  val VectorSumFunctionName = "graft_vector_sum"

  /** Register [[DotProduct]], [[TopKByScore]] and [[VectorSum]] as SQL
    * functions in the session's registry (idempotent; no-op under Spark
    * Connect — see [[GraftRegistry]]). The analyzer wraps a bare
    * AggregateFunction in a Complete AggregateExpression, so the registry
    * builders can return the aggregates directly. */
  def register(spark: SparkSession): Unit = {
    GraftRegistry.tempFunction(spark, FunctionName,
      exprs => DotProduct(exprs(0), exprs(1)))
    GraftRegistry.tempFunction(spark, TopKFunctionName,
      exprs => TopKByScore(exprs(0), exprs(1), exprs(2)))
    GraftRegistry.tempFunction(spark, VectorSumFunctionName,
      exprs => VectorSum(exprs(0)))
  }

  /** Column wrapper for [[DotProduct]]. Registers against the active
    * session on first use (resolution happens at analysis time, so the
    * active session at *query build* is the one that matters). On a
    * non-classic (Spark Connect) session — where client-side JVM
    * expression registration is impossible by design — this returns the
    * BUILT-IN twin instead ([[dotProductBuiltin]]): bit-identical,
    * interpreted-HOF slow, but working without the server-side
    * [[GraftExtensions]] install. */
  def dotProduct(a: Column, b: Column): Column =
    SparkSession.getActiveSession match {
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) &&
          !GraftRegistry.useServerFunctions(s) =>
        dotProductBuiltin(a, b)
      case other =>
        other.foreach(s => if (GraftRegistry.canRegisterClientSide(s)) register(s))
        F.call_function(FunctionName, a, b)
    }

  /** Pure built-in-functions twin of [[DotProduct]] — the client-side
    * fallback for Spark Connect sessions. Bit-identical by construction
    * (spec-pinned): the same min-length truncation (slice to
    * `least(size(a), size(b))` — zip_with alone would null-pad the
    * shorter side), the same left-to-right double accumulation from 0.0,
    * the same element-to-double casts, NULL for a NULL array, 0.0 for
    * empty arrays. ~30× slower than the codegen'd expression (HOFs
    * evaluate interpreted) — install [[GraftExtensions]] on the Connect
    * server for the fast path.
    *
    * One contract difference a plain-column twin cannot close: the
    * EXPRESSION rejects non-numeric array inputs at analysis time
    * (checkInputDataTypes); the builtin has no schema to check at build
    * time, so a non-numeric array is instead rejected by the runtime
    * ANSI cast (the Spark 4 default) — and under legacy mode would
    * silently coalesce to 0.0. Pass numeric arrays, as the expression's
    * contract already requires. */
  def dotProductBuiltin(a: Column, b: Column): Column = {
    val n = F.least(F.size(a), F.size(b))
    // explicit NULL guard: under legacy (non-ANSI) semantics size(NULL)
    // is -1, which slice rejects at runtime — the when() also gives the
    // expression's exact NULL-in-NULL-out behavior. NULL ELEMENTS are
    // DEFINED as 0.0 by the expression (explicit isNullAt guard), so
    // each side coalesces to 0.0 — a bare cast would poison the whole
    // aggregate to NULL on the first null slot.
    F.when(a.isNotNull && b.isNotNull,
      F.aggregate(
        F.zip_with(F.slice(a, F.lit(1), n), F.slice(b, F.lit(1), n),
          (x, y) => F.coalesce(x.cast("double"), F.lit(0.0)) *
            F.coalesce(y.cast("double"), F.lit(0.0))),
        F.lit(0.0), (acc, v) => acc + v))
  }

  /** Aggregate column for [[TopKByScore]]: the k best (score, id) pairs of
    * the group as `array<struct<score, id>>` in rank order. On a
    * non-classic (Spark Connect) session without the `=server` dial this
    * returns [[topKByScoreBuiltin]] — value-identical, with ONE documented
    * reduced guarantee: a -0.0/0.0 score tie can rank in either order
    * (SQL comparisons normalize the zeros equal, Java's Double.compare
    * does not), and the collect-then-sort shape buffers whole groups
    * where the heap keeps k rows. Install [[GraftExtensions]] server-side
    * and set `spark.graft.connect.functions=server` for the exact heap. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    SparkSession.getActiveSession match {
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) &&
          !GraftRegistry.useServerFunctions(s) =>
        topKByScoreBuiltin(score, id, k)
      case other =>
        other.foreach(s => if (GraftRegistry.canRegisterClientSide(s)) register(s))
        F.call_function(TopKFunctionName, score, id, F.lit(k))
    }

  /** Sort-based built-in twin of [[TopKByScore]] — the client-side Connect
    * fallback: collect the group's (score, id) pairs, `array_sort` under
    * the heap's exact comparator (score DESC, id ASC; Spark orders NaN
    * above every number, matching Java's Double.compare), slice the top
    * k. NULL scores/ids are skipped (the when() yields a NULL struct,
    * which collect_list drops — the expression's skip rule). Known
    * corner, spec-documented: Spark comparisons treat -0.0 = 0.0 while
    * the heap's Double.compare orders -0.0 < 0.0, so a crossed-zero
    * score tie falls through to the id tiebreak here — the SET of
    * returned pairs is identical, only the order of that one tie can
    * differ. */
  def topKByScoreBuiltin(score: Column, id: Column, k: Int): Column = {
    require(k > 0, s"top_k k must be positive, got $k")
    val pair = F.when(score.isNotNull && id.isNotNull,
      F.struct(score.cast("double").as("score"), id.cast("long").as("id")))
    F.slice(
      F.array_sort(F.collect_list(pair), (l, r) =>
        F.when(l.getField("score") > r.getField("score"), -1)
          .when(l.getField("score") < r.getField("score"), 1)
          .when(l.getField("id") < r.getField("id"), -1)
          .when(l.getField("id") > r.getField("id"), 1)
          .otherwise(0)),
      1, k)
  }

  /** Aggregate column for [[VectorSum]]: element-wise sums + row count of a
    * numeric array column, as `struct<sums array<double>, n bigint>`. On a
    * non-classic (Spark Connect) session without the `=server` dial this
    * returns [[vectorSumBuiltin]] — same sums/count semantics with ONE
    * documented reduced guarantee: the twin folds the group's arrays in
    * collect order while the expression accumulates per partition and
    * merges, so float summation ORDER differs and each sum can land a few
    * ulp away from the expression's (and vary run-to-run with partitioning
    * — exactly as the expression's own partial-merge order already does).
    * The twin also buffers whole groups via `collect_list` where the
    * expression keeps one dim-length buffer. Install [[GraftExtensions]]
    * server-side and set `spark.graft.connect.functions=server` for the
    * constant-memory codegen path. */
  def vectorSum(vec: Column): Column =
    SparkSession.getActiveSession match {
      case Some(s) if !GraftRegistry.canRegisterClientSide(s) &&
          !GraftRegistry.useServerFunctions(s) =>
        vectorSumBuiltin(vec)
      case other =>
        other.foreach(s => if (GraftRegistry.canRegisterClientSide(s)) register(s))
        F.call_function(VectorSumFunctionName, vec)
    }

  /** Pure built-in twin of [[VectorSum]] — the client-side Connect
    * fallback: `collect_list` the group's arrays (dropping NULL arrays,
    * the expression's skip rule), left-fold element-wise with NULL
    * elements coalesced to 0.0 (the expression's isNullAt skip), count =
    * collected size. Ragged input raises the expression's error at
    * runtime (a `raise_error` branch guarded by a distinct-lengths probe —
    * without it `zip_with` would silently null-pad the shorter array).
    * Empty/all-NULL groups yield `(array(), 0)`, matching `eval` on a
    * never-updated buffer. Reduced guarantees vs the expression, both
    * documented at [[vectorSum]]: ±ulp summation-order nondeterminism and
    * whole-group buffering. One schema nit: the twin's `sums` element
    * nullability is `true` (HOF typing) where the expression declares
    * `false` — values are never null either way. */
  def vectorSumBuiltin(vec: Column): Column = {
    val vs = F.collect_list(vec)
    val folded = F.aggregate(
      vs,
      F.array().cast("array<double>"),
      (acc, v) => F.when(F.size(acc) === 0,
          F.transform(v, x => F.coalesce(x.cast("double"), F.lit(0.0))))
        .otherwise(F.zip_with(acc, v,
          (a, x) => a + F.coalesce(x.cast("double"), F.lit(0.0)))))
    val ragged = F.size(F.array_distinct(F.transform(vs, v => F.size(v)))) > 1
    F.struct(
      F.when(ragged, F.raise_error(F.lit(
          "vector_sum: ragged input — mixed array lengths in one group"))
          .cast("array<double>"))
        .otherwise(folded).as("sums"),
      F.size(vs).cast("long").as("n"))
  }
}
