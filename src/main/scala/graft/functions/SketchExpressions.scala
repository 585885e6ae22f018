package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `kmin_values(hash, k)` — the K-Minimum-Values distinct-count
  * sketch (Bar-Yossef et al. 2002): the k smallest DISTINCT hash
  * values of a group, sorted ascending.
  *
  * Why a custom aggregate: the declarative equivalent —
  * `groupBy(key, hash)` to dedup, then a per-key window `row_number
  * <= k`, then `max` — shuffles EVERY distinct hash of every key and
  * sorts each key's full distinct set, just to keep k values. As a
  * [[TypedImperativeAggregate]] the state is a bounded k-element
  * sorted set: map-side partials keep at most k longs per key, the
  * exchange moves O(keys x k), and merge is a bounded set union —
  * the mergeability that makes the sketch work at 100 TB (and across
  * materialized per-partition sketches: merging two groups' arrays
  * with the same k yields exactly the union corpus's sketch).
  *
  * Estimator contract (KMV, hash domain [0, 2^60) — the engine's
  * md5-60-bit family): with fewer than k distinct values the sketch
  * IS the distinct set (exact count); otherwise
  * `(k-1) * 2^60 / kth_min` estimates the cardinality. Both the
  * sketch contents and the estimate are exactly reproducible in SQL
  * (sorted distinct + row_number + one correctly-rounded IEEE
  * division), so the p34 gate hash-matches end-to-end — no
  * engine-specific serialization leaks into results, unlike Spark's
  * own HyperLogLog++ `approx_count_distinct`.
  *
  * Null hashes are skipped (`count(DISTINCT x)` semantics); an
  * all-null group evaluates to an empty array.
  */
case class KMinValues(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with BinaryLike[Expression] {

  def this(child: Expression, kExpr: Expression) = this(child, kExpr, 0, 0)

  override def left: Expression = child
  override def right: Expression = kExpr

  // k via constant-folding eval, not a Literal pattern: SQL callers
  // can legally pass any foldable integer expression (`1 + 1`), and a
  // pattern miss here would throw from inside the analyzer instead of
  // returning the TypeCheckFailure below
  private lazy val kOpt: Option[Int] =
    if (!kExpr.foldable) None
    else Option(kExpr.eval()).collect { case n: Number => n.intValue() }
  private lazy val k: Int = kOpt.get

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmin_values"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT hash column, got ${child.dataType.sql}")
    else if (kOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be a foldable integer")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def bound(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { buf.add(v); if (buf.size > k) buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) bound(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) bound(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KMinValues =
    copy(child = newLeft, kExpr = newRight)
}

/** `count_min(hash, depth, width)` — the Count-Min frequency sketch
  * (Cormode & Muthukrishnan 2005): a depth x width grid of counters;
  * each value increments one counter per row, the estimated frequency
  * of a value is the MIN of its counters (never an underestimate).
  *
  * Why a custom aggregate: exact per-term frequencies at corpus scale
  * shuffle the full term histogram (every distinct term of every
  * group). Here map-side partials are a fixed depth*width counter
  * grid per group, the exchange moves O(groups x depth x width)
  * regardless of term cardinality, and merge is elementwise sum —
  * commutative and associative, so the sketch is identical under any
  * partitioning/merge order (unlike Spark's own
  * `count_min_sketch(...)`, whose binary output is not oracle-able).
  *
  * Row hashes derive from the engine's 60-bit md5 hash by
  * Kirsch-Mitzenmacher ([[graft.pipeline.Dedup]]'s MinHash trick):
  * h1 = low 30 bits, h2 = high 30 bits, bucket_i = (h1 + i*h2) mod
  * width — integer arithmetic any SQL engine reproduces exactly.
  * Null hashes are skipped (`count(x)` semantics).
  */
case class CountMin(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)

  private def foldInt(e: Expression): Option[Int] =
    if (!e.foldable) None
    else Option(e.eval()).collect { case n: Number => n.intValue() }
  private lazy val depthOpt = foldInt(depthExpr)
  private lazy val widthOpt = foldInt(widthExpr)
  private lazy val depth = depthOpt.get
  private lazy val width = widthOpt.get

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT hash column, got ${child.dataType.sql}")
    else if (depthOpt.isEmpty || widthOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: depth and width must be foldable integers")
    else if (depth <= 0 || width <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: depth and width must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val h1 = h & ((1L << 30) - 1)
      val h2 = h >>> 30
      var i = 0
      while (i < depth) {
        buf(i * width + java.lang.Math.floorMod(h1 + i * h2, width.toLong).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren(0), depthExpr = newChildren(1),
      widthExpr = newChildren(2))
}

/** `hyper_log_log(hash, p)` — the HyperLogLog cardinality sketch
  * (Flajolet et al. 2007): m = 2^p registers, each the maximum
  * "leading-zero rank" rho of the hashes that landed in its bucket.
  *
  * Why a custom aggregate (KMV already estimates cardinality): HLL is
  * THE industry-standard mergeable distinct sketch, and its state is
  * 2^p BYTES per group regardless of cardinality — at p=4 that is 16
  * bytes where KMV(k=128) moves 1 KB per group per partial. Map-side
  * partials are the register array, the exchange moves O(groups x m)
  * bytes, and merge is elementwise max — commutative, associative,
  * idempotent, so the sketch is identical under any partitioning AND
  * under re-aggregation of materialized per-shard sketches (the
  * daily-rollup shape: union day sketches with [[SketchFunctions
  * .hllMerge]] instead of re-scanning the year).
  *
  * Determinism contract (what makes this oracle-able where Spark's
  * own `approx_count_distinct` HLL++ binary is not): hashes are the
  * engine's 60-bit md5 family ([[Md5Hash.h60]]); bucket = low p bits,
  * rho = (60-p) - bitlength(hash >> p) + 1 (so an all-zero remainder
  * scores (60-p)+1) — pure integer ops any engine reproduces, e.g.
  * `length(bin(h // m))` in DuckDB. The estimator is exposed as exact
  * column arithmetic over the registers ([[SketchFunctions
  * .hllHarmonicScaled]]: an exact DECIMAL sum of 2^(61-reg), cast to
  * double only at the end), so both the registers and the estimate
  * hash-match cross-engine. Null hashes are skipped; an all-null
  * group evaluates to m zero registers.
  */
case class HyperLogLog(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with BinaryLike[Expression] {

  def this(child: Expression, pExpr: Expression) = this(child, pExpr, 0, 0)

  override def left: Expression = child
  override def right: Expression = pExpr

  private lazy val pOpt: Option[Int] =
    if (!pExpr.foldable) None
    else Option(pExpr.eval()).collect { case n: Number => n.intValue() }
  private lazy val p: Int = pOpt.get
  private lazy val m: Int = 1 << p
  /** Remainder width: the hash domain is [0, 2^60). */
  private lazy val w: Int = 60 - p

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyper_log_log"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT hash column, got ${child.dataType.sql}")
    else if (pOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: p must be a foldable integer")
    else if (p < 2 || p > 16)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: p must be in [2, 16], got $p")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & (m - 1)).toInt
      val rem = h >>> p
      val rho =
        if (rem == 0L) w + 1
        else w - (64 - java.lang.Long.numberOfLeadingZeros(rem)) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val arr = new Array[Long](buf.length)
    var i = 0
    while (i < buf.length) { arr(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperLogLog =
    copy(child = newLeft, pExpr = newRight)
}

/** `hll_merge_agg(regs, p)` — AGGREGATE fold of [[HyperLogLog]]
  * register arrays: elementwise max over the group's rows. The
  * column-level pairwise [[SketchFunctions.hllMerge]] combines two
  * sketches side-by-side; this is its N-row aggregate form — the one
  * a materialized rollup needs, where each stored row carries the
  * registers of one (group × batch) partial and a query
  * re-aggregating a coarser grain must fold ALL of them.
  *
  * Exactness: register max is associative and commutative, so the
  * fold is BIT-IDENTICAL to the one-shot [[HyperLogLog]] over the
  * union of the underlying rows — which is what lets
  * [[graft.plans.AggregateRewriteRule]] substitute it for the
  * original sketch aggregate without changing a single output bit
  * (digests and estimates layered above are pure projections of the
  * registers).
  *
  * `p` pins the register count so an EMPTY group (global aggregate
  * over zero rows) evaluates to the same 2^p zero registers the
  * one-shot sketch would emit. Null arrays are skipped;
  * shorter-than-2^p input arrays are a contract violation and fail
  * loudly.
  */
case class HllMergeAgg(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with BinaryLike[Expression] {

  def this(child: Expression, pExpr: Expression) = this(child, pExpr, 0, 0)

  override def left: Expression = child
  override def right: Expression = pExpr

  private lazy val pOpt: Option[Int] =
    if (!pExpr.foldable) None
    else Option(pExpr.eval()).collect { case n: Number => n.intValue() }
  private lazy val m: Int = 1 << pOpt.get

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if pOpt.isEmpty =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: p must be a foldable integer")
    case ArrayType(LongType, _) if pOpt.get < 2 || pOpt.get > 16 =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: p must be in [2, 16], got ${pOpt.get}")
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> registers, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == m,
        s"$prettyName: register array has ${arr.numElements()} entries, " +
          s"expected 2^p = $m")
      // a register is a leading-zero rank over the engine's 60-BIT
      // hash domain (HyperLogLog.update: w = 60 - p suffix bits, so
      // rank <= w + 1): 0 <= r <= 60 - p + 1. A value outside that
      // range is corrupt (or foreign) MV data — the .toByte below
      // would silently wrap it, so fail loudly, mirroring the length
      // check (the Scaladoc's contract).
      val maxRank = 60 - pOpt.get + 1
      var i = 0
      while (i < m) {
        val r = arr.getLong(i)
        require(r >= 0 && r <= maxRank,
          s"$prettyName: register $i holds $r, outside [0, $maxRank] " +
            s"for p=${pOpt.get} — corrupt register data")
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val arr = new Array[Long](buf.length)
    var i = 0
    while (i < buf.length) { arr(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllMergeAgg =
    copy(child = newLeft, pExpr = newRight)
}

/** `reservoir_keys(rank, key, k)` — the k keys with the SMALLEST
  * (rank, key) pairs of a group, emitted in that order: the bounded
  * deterministic reservoir behind fixed-size sampling.
  *
  * Why a custom aggregate: the declarative fixed-k-per-stratum shape
  * ([[graft.pipeline.Sampling.fixedSizeStratified]]) is a stratum-
  * keyed window — it shuffles EVERY row of every stratum and sorts
  * the whole stratum just to keep k of them; a hot stratum ("half
  * the corpus is English") is one giant sort partition. Here the
  * state is a bounded k-pair sorted set: map-side partials keep at
  * most k (rank, key) pairs per stratum, the exchange moves
  * O(strata × k), and merge is a bounded union — the reservoir form
  * that survives a 100 TB stratum. Determinism is inherited from the
  * rank being the md5 variate's RAW 32-bit integer (scaling to
  * [0, 1) divides by a constant — order-preserving — so the kept set
  * equals the window formulation's exactly).
  *
  * Ties: (rank, key) pairs are totally ordered with the key as
  * tiebreak, same contract as the window's `ORDER BY u, key`. Null
  * ranks/keys are skipped. An all-null group yields an empty array.
  */
case class ReservoirKeys(
    rankExpr: Expression,
    keyExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
    with TernaryLike[Expression] {

  def this(rankExpr: Expression, keyExpr: Expression, kExpr: Expression) =
    this(rankExpr, keyExpr, kExpr, 0, 0)

  override def first: Expression = rankExpr
  override def second: Expression = keyExpr
  override def third: Expression = kExpr

  private lazy val kOpt: Option[Int] =
    if (!kExpr.foldable) None
    else Option(kExpr.eval()).collect { case n: Number => n.intValue() }
  private lazy val k: Int = kOpt.get

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "reservoir_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    if (rankExpr.dataType != LongType || keyExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT (rank, key) columns, got " +
          s"(${rankExpr.dataType.sql}, ${keyExpr.dataType.sql})")
    else if (kOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be a foldable integer")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](Ordering.Tuple2[Long, Long])

  private def bound(buf: java.util.TreeSet[(Long, Long)],
      pair: (Long, Long)): Unit = {
    if (buf.size < k) { buf.add(pair); () }
    else if (Ordering.Tuple2[Long, Long].lt(pair, buf.last)) {
      buf.add(pair); if (buf.size > k) buf.pollLast(); ()
    }
  }

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val r = rankExpr.eval(input)
    val key = keyExpr.eval(input)
    if (r != null && key != null)
      bound(buf, (r.asInstanceOf[Long], key.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) bound(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next()._2; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (r, key) = it.next(); bb.putLong(r); bb.putLong(key) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ReservoirKeys =
    copy(rankExpr = newFirst, keyExpr = newSecond, kExpr = newThird)
}

/** `top_k_by_score(score, key, k)` — the keys of a group's k BEST
  * (score DESC, key ASC on ties) rows, emitted best-first: the
  * bounded-state grouped top-k selector.
  *
  * Why a custom aggregate: the declarative top-k-per-group shape is a
  * group-keyed window (`row_number() OVER (PARTITION BY g ORDER BY
  * score DESC, key) <= k`) — it shuffles EVERY row of every group and
  * sorts the whole group just to keep k of them; a hot group ("one
  * source is half the corpus") is one giant sort partition. Here the
  * state is a bounded k-pair sorted set: map-side partials keep at
  * most k (score, key) pairs per group, the exchange moves
  * O(groups × k), and merge is a bounded union — the selection form
  * that survives a 100 TB group. The kept set equals the window
  * formulation's EXACTLY (same total order), so a SQL-window oracle
  * can hash-check it.
  *
  * Ordering is total: java.lang.Double.compare on the score, key
  * ascending on equal scores. Signed zeros are normalized to +0.0 at
  * update (Double.compare says -0.0 < 0.0, but Spark's window sort
  * and SQL engines compare them EQUAL with the tie broken by key —
  * without normalization the kept set would diverge from the window
  * formulation when -0.0 and 0.0 scores straddle the k boundary).
  * Null scores/keys and NaN scores are skipped (a NaN "score"
  * carries no ranking information; with Double.compare it would
  * outrank every real score). An all-null group yields an empty
  * array.
  */
case class TopKByScore(
    scoreExpr: Expression,
    keyExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
    with TernaryLike[Expression] {

  def this(scoreExpr: Expression, keyExpr: Expression, kExpr: Expression) =
    this(scoreExpr, keyExpr, kExpr, 0, 0)

  override def first: Expression = scoreExpr
  override def second: Expression = keyExpr
  override def third: Expression = kExpr

  private lazy val kOpt: Option[Int] =
    if (!kExpr.foldable) None
    else Option(kExpr.eval()).collect { case n: Number => n.intValue() }
  private lazy val k: Int = kOpt.get

  // best-first: higher score first, smaller key first on equal scores
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != DoubleType || keyExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (DOUBLE score, BIGINT key) columns, got " +
          s"(${scoreExpr.dataType.sql}, ${keyExpr.dataType.sql})")
    else if (kOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be a foldable integer")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def bound(buf: java.util.TreeSet[(Double, Long)],
      pair: (Double, Long)): Unit = {
    if (buf.size < k) { buf.add(pair); () }
    else if (ord.lt(pair, buf.last)) {
      buf.add(pair); if (buf.size > k) buf.pollLast(); ()
    }
  }

  override def update(
      buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val key = keyExpr.eval(input)
    if (s != null && key != null) {
      val score = s.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(score))
        // -0.0 → +0.0: match Spark/SQL sort semantics (see Scaladoc)
        bound(buf, (if (score == 0.0) 0.0 else score,
          key.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) bound(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next()._2; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, key) = it.next(); bb.putDouble(s); bb.putLong(key) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopKByScore =
    copy(scoreExpr = newFirst, keyExpr = newSecond, kExpr = newThird)
}

object SketchFunctions {
  import org.apache.spark.sql.functions._

  /** 2^60 as a double — a power of two, exactly representable. */
  private val HashDomain = 1152921504606846976.0d

  /** Column-level `kmin_values(hash, k)` (hash: BIGINT in [0, 2^60)). */
  def kminValues(hash: Column, k: Int): Column =
    ColumnBridge.column(KMinValues(
      ColumnBridge.expression(hash),
      ColumnBridge.expression(lit(k))).toAggregateExpression())

  /** Column-level `reservoir_keys(rank, key, k)`: the k keys with the
    * smallest (rank, key) pairs, in that order.
    */
  def reservoirKeys(rank: Column, key: Column, k: Int): Column =
    ColumnBridge.column(ReservoirKeys(
      ColumnBridge.expression(rank),
      ColumnBridge.expression(key),
      ColumnBridge.expression(lit(k))).toAggregateExpression())

  /** Column-level `top_k_by_score(score, key, k)`: the keys of the k
    * best (score DESC, key ASC) rows, best-first.
    */
  def topKByScore(score: Column, key: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score),
      ColumnBridge.expression(key),
      ColumnBridge.expression(lit(k))).toAggregateExpression())

  /** KMV cardinality estimate from a `kminValues(_, k)` array:
    * exact size below k, `(k-1) * 2^60 / kth` at k. Deterministic
    * cross-engine: the multiply is exact (small-int x power of two),
    * long->double and the divide are correctly-rounded IEEE ops.
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(
        lit((k - 1).toDouble * HashDomain) / element_at(sketch, k).cast("double"))

  /** The k smallest of two same-k sketches' union — exactly the
    * sketch the UNION corpus would have produced (the KMV merge
    * property). Pure array ops, no re-scan of either corpus.
    */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** KMV Jaccard estimate between two same-k sketches (Beyer et al.
    * 2007): the union sketch is a uniform size-k sample of the union's
    * distinct values, so the fraction of it present in BOTH sides is
    * an unbiased estimate of |A∩B| / |A∪B|. Deterministic cross-engine
    * (set ops on exact longs + one int/int division); estimate the
    * intersection cardinality as `kmvJaccard * kmvEstimate(kmvUnion)`.
    * Null only when both sketches are empty (both corpora had no
    * values — 0/0 has no meaningful Jaccard).
    */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val u = kmvUnion(a, b, k)
    size(array_intersect(u, array_intersect(a, b))).cast("double") /
      when(size(u) === 0, lit(null)).otherwise(size(u).cast("double"))
  }

  /** Column-level `hyper_log_log(hash, p)` (hash: BIGINT in
    * [0, 2^60)). Returns the 2^p register array (each register the
    * max rho of its bucket; 0 = bucket never hit).
    */
  def hyperLogLog(hash: Column, p: Int): Column =
    ColumnBridge.column(HyperLogLog(
      ColumnBridge.expression(hash),
      ColumnBridge.expression(lit(p))).toAggregateExpression())

  /** `2^bits` as DECIMAL(38,0) via the catalyst ShiftLeft (the Scala
    * `shiftleft` helper only takes a literal shift; the SQL
    * expression shifts by any column). Exact for bits in [0, 62].
    */
  private def pow2Decimal(bits: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        ColumnBridge.expression(lit(1L)),
        ColumnBridge.expression(bits.cast("int")))).cast("decimal(38,0)")

  /** Count of never-hit registers — the input to linear-counting
    * (`m * ln(m / n_zero)`), which production estimators apply below
    * ~2.5m. Exposed as data rather than folded into [[hllEstimate]]:
    * `ln` is not correctly-rounded IEEE, so baking it in would make
    * the estimate engine-dependent in the last ulp.
    */
  def hllZeroRegisters(regs: Column): Column =
    size(filter(regs, r => r === 0L)).cast("long")

  /** The HLL harmonic denominator scaled by 2^61: an EXACT integer —
    * sum over registers of 2^(61 - reg), accumulated in DECIMAL(38,0)
    * (max m * 2^61 ~ 2^77 at p=16, well inside 38 digits) and cast to
    * double only once at the end (one correctly-rounded conversion,
    * identical in any IEEE engine; a float running sum would be
    * accumulation-order-dependent and never hash-match).
    */
  def hllHarmonicScaled(regs: Column): Column =
    aggregate(regs, lit(0L).cast("decimal(38,0)"),
      (acc, r) => acc + pow2Decimal(lit(61L) - r)).cast("double")

  /** Raw HLL cardinality estimate: alpha_m * m^2 * 2^61 / S where S =
    * [[hllHarmonicScaled]] and alpha_m = 0.7213 / (1 + 1.079/m)
    * (documented for all m — the small-m Flajolet constants are a
    * calibration refinement, not a different estimator). Every factor
    * before the divide is exact (m^2 and 2^61 are powers of two;
    * 1.079/m is exact for power-of-two m), and the two divides are
    * correctly-rounded IEEE ops in a pinned order — bit-identical
    * cross-engine. Below ~2.5m apply linear counting from
    * [[hllZeroRegisters]] instead.
    */
  def hllEstimate(regs: Column, p: Int): Column = {
    val m = 1 << p
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit((m.toLong * m).toDouble) * lit(1152921504606846976.0 * 2) /
      hllHarmonicScaled(regs)
  }

  /** Elementwise max of two same-p register arrays — exactly the
    * sketch the UNION corpus would have produced (the HLL merge
    * property). Pure array ops: roll daily sketches into monthly
    * without re-scanning a byte of the corpus.
    */
  /** Aggregate fold of register arrays (one per row) — elementwise
    * max; bit-identical to the one-shot sketch over the union. `p`
    * pins the register count for the empty-group case.
    */
  def hllMergeAgg(regs: Column, p: Int): Column =
    ColumnBridge.column(HllMergeAgg(
      ColumnBridge.expression(regs),
      ColumnBridge.expression(lit(p))).toAggregateExpression())

  def hllMerge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x, y))

  /** Linear-counting estimate `m * ln(m / V)` from the zero-register
    * count V — NULL when no register is empty (LC undefined there).
    * Engine-side convenience: `ln` makes it non-oracle-able (the
    * [[hllZeroRegisters]] note), so the GATES expose V and raw-HLL
    * instead; user pipelines want this below ~2.5m.
    */
  def hllLinearCount(regs: Column, p: Int): Column = {
    val m = (1 << p).toDouble
    val z = hllZeroRegisters(regs)
    when(z > 0, lit(m) * log(lit(m) / z.cast("double")))
  }

  /** The production estimator ladder (Flajolet et al. §4): linear
    * counting while the raw estimate sits below 2.5m and empty
    * registers remain, raw HLL otherwise. Same ln caveat as
    * [[hllLinearCount]] — use for analytics, not for hash-gated
    * cross-engine outputs.
    */
  def hllEstimateCorrected(regs: Column, p: Int): Column = {
    val raw = hllEstimate(regs, p)
    when(raw <= lit(2.5 * (1 << p)) && hllZeroRegisters(regs) > 0,
      hllLinearCount(regs, p)).otherwise(raw)
  }

  /** Column-level `count_min(hash, depth, width)` (hash: BIGINT in
    * [0, 2^60)). Returns the depth*width counter grid, row-major.
    */
  def countMin(hash: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CountMin(
      ColumnBridge.expression(hash),
      ColumnBridge.expression(lit(depth)),
      ColumnBridge.expression(lit(width))).toAggregateExpression())

  /** Estimated frequency of `hash` from a `countMin(_, depth, width)`
    * grid: the min over depth rows of the counter each row hashed the
    * value into. Always >= the true count (collisions only ever add).
    * Pure integer column ops — exactly reproducible in SQL.
    */
  def cmEstimate(sketch: Column, hash: Column, depth: Int, width: Int): Column = {
    val h1 = hash.bitwiseAND(lit((1L << 30) - 1))
    val h2 = shiftright(hash, 30)
    val probes = (0 until depth).map { i =>
      element_at(sketch,
        (pmod(h1 + lit(i.toLong) * h2, lit(width.toLong)) +
          lit(i.toLong * width + 1L)).cast("int"))
    }
    if (probes.size == 1) probes.head else least(probes: _*)
  }
}
