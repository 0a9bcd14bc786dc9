package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-derived hash primitives shared by the sketch operators (MinHash,
  * SimHash, hyperplane LSH, media checksums).
  *
  * Design constraint: every hash here must be computable bit-for-bit in
  * plain ANSI-ish SQL so the driver's DuckDB oracle can replay the exact
  * semantics (`CAST('0x' || substr(md5(s), i, n) AS BIGINT)`), which is what
  * turns the sketch family from "trust my specs" into driver-verified
  * correctness rows. md5 is marginally slower than xxhash64 per call, but
  * each operator makes exactly ONE pass over its input array inside a
  * codegen'd Catalyst expression — replacing the round-1 design of 16-64
  * interpreted higher-order `aggregate()` passes per row (the single biggest
  * bench cost at sf0.1: 121 s for SimHash alone).
  */
object TextHash {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = mdLocal.get()
    d.reset()
    d.digest(bytes)
  }

  /** First 15 hex chars of md5 as a non-negative 60-bit long.
    * DuckDB parity: `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val b = md5(bytes)
    (((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) | ((b(2) & 0xffL) << 40) |
      ((b(3) & 0xffL) << 32) | ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)) >>> 4
  }

  def hash60Utf8(s: UTF8String): Long = hash60(s.getBytes)

  /** 28-bit hash from md5 hex chars 1-7 (`substr(md5(s),1,7)`). */
  def hash28a(b: Array[Byte]): Long =
    ((b(0) & 0xffL) << 20) | ((b(1) & 0xffL) << 12) | ((b(2) & 0xffL) << 4) | ((b(3) & 0xffL) >>> 4)

  /** 28-bit hash from md5 hex chars 9-15 (`substr(md5(s),9,7)`). */
  def hash28b(b: Array[Byte]): Long =
    ((b(4) & 0xffL) << 20) | ((b(5) & 0xffL) << 12) | ((b(6) & 0xffL) << 4) | ((b(7) & 0xffL) >>> 4)

  /** Largest prime below 2^28 — the minhash permutation modulus. */
  val MinhashPrime: Long = 268435399L

  /** Per-permutation odd multipliers, md5-derived (inlined as literal
    * constants into the oracle SQL).
    */
  def permMultiplier(i: Int): Long = hash28a(md5(s"perm:$i".getBytes("UTF-8"))) | 1L

  // k md5 digests per signature — memoized per k, not recomputed per row
  private val multCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def multipliers(k: Int): Array[Long] =
    multCache.computeIfAbsent(k, (k2: Integer) => Array.tabulate(k2)(permMultiplier))

  /** k MinHash values in ONE pass over the shingle array.
    *
    * Hash family: h_i(s) = (a(s)·c_i + b(s)) mod P over two independent
    * 28-bit md5 slices (products < 2^56 — no overflow in either engine).
    * A plain linear family (a + i·b) is NOT enough: the argmin becomes
    * dominated by min b(s) as i grows, so the k minima correlate and bands
    * deterministically miss true near-dups. DuckDB parity per shingle:
    * a = `CAST('0x'||substr(md5(s),1,7) AS BIGINT)`,
    * b = `...substr(md5(s),9,7)...`, h_i = `(a*c_i + b) % 268435399`.
    */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val mult = multipliers(k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val b = md5(s.getBytes)
        val ha = hash28a(b)
        val hb = hash28b(b)
        var j = 0
        while (j < k) {
          val h = (ha * mult(j) + hb) % MinhashPrime
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 60-bit SimHash in ONE pass: per-bit majority vote (2*ones >= n) of the
    * shingles' hash60 values. 60 bits (not 64) so the per-shingle hash and
    * every band stay non-negative in BIGINT arithmetic on both engines.
    */
  def simhash60(arr: ArrayData): Long = {
    val ones = new Array[Int](60)
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        cnt += 1
        val h = hash60(s.getBytes)
        var j = 0
        while (j < 60) { ones(j) += ((h >>> j) & 1L).toInt; j += 1 }
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 60) { if (2 * ones(j) >= cnt) r |= (1L << j); j += 1 }
    r
  }
}

/** One-pass helpers for shingling and vector bucketing (codegen targets). */
object VecHash {

  /** Distinct word n-gram shingles in ONE pass.
    *
    * Semantics identical to the built-in chain
    * `array_distinct(transform(sequence(...), i -> concat_ws(' ', slice(split(lower(text),' '),...))))`
    * — but that chain INLINES the `split(lower(text))` sub-expression into
    * every lambda element, recomputing the full tokenization once per
    * shingle index (O(words²) per document; measured 8 s just to explode
    * 260k shingles at sf0.1). DuckDB parity unchanged:
    * `list_distinct([array_to_string(w[i:i+n-1],' ') for i in range(1, len(w)-n+2)])`
    * over `w = string_split(lower(text),' ')`.
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Long]]()

  /** Flattened hyperplane weight table [t][p][j] (md5-derived, see
    * [[Similarity.hyperplaneWeight]]), memoized per (tables, planes, dim).
    */
  def weights(tables: Int, planes: Int, dim: Int): Array[Long] =
    weightCache.computeIfAbsent((tables, planes, dim), { key =>
      val (t, p, d) = key
      val w = new Array[Long](t * p * d)
      var i = 0
      for (ti <- 0 until t; pi <- 0 until p; ji <- 0 until d) {
        w(i) = Similarity.hyperplaneWeight(ti, pi, ji); i += 1
      }
      w
    })

  /** Cosine similarity of two float arrays in ONE codegen pass —
    * bit-identical to the built-in higher-order chain
    * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,v)=>acc+v) /
    * (sqrt(aggregate(a,0.0,acc+v*v)) * sqrt(aggregate(b,0.0,acc+v*v)))`,
    * which Spark executes INTERPRETED (higher-order functions are
    * CodegenFallback): per-element FLOAT product (rounded to float, as the
    * float×float lambda does), DOUBLE accumulation left-to-right, null when
    * the chain would be null (zip_with pads unequal lengths with null;
    * null elements poison the aggregate).
    */
  def cosineSim(a: ArrayData, b: ArrayData): java.lang.Double = {
    val la = a.numElements(); val lb = b.numElements()
    if (la != lb) return null // zip_with pad -> null product -> null sum
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i); val y = b.getFloat(i)
      dot += (x * y).toDouble // float multiply THEN widen, like the lambda
      na += (x * x).toDouble
      nb += (y * y).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** One bucket id per table in ONE pass over the vector: p sign bits of
    * integer-quantized projections (floor(x·1024)·w, exact fixed-point).
    */
  def hyperplaneBuckets(vec: ArrayData, tables: Int, planes: Int, dim: Int): ArrayData = {
    val w = weights(tables, planes, dim)
    val d = math.min(dim, vec.numElements())
    val q = new Array[Long](d)
    var j = 0
    while (j < d) { q(j) = math.floor(vec.getFloat(j).toDouble * 1024).toLong; j += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var proj = 0L
        var jj = 0
        while (jj < d) { proj += q(jj) * w(base + jj); jj += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n)` → array<string>: one-pass distinct n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(s: Any): Any =
    VecHash.wordShingles(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecHash.wordShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** `hyperplane_buckets(vec, tables, planes, dim)` → array<long>.
  * Declares `array<float>` input: the evaluator reads 4-byte floats, so an
  * `array<double>` child must be rejected (or cast) at ANALYSIS time —
  * silently reading half of each 8-byte slot would corrupt every bucket id.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int, dim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets requires array<float>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    VecHash.hyperplaneBuckets(v.asInstanceOf[ArrayData], tables, planes, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecHash.hyperplaneBuckets($c, $tables, $planes, $dim)")
  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}

/** `minhash_sig(shingles, k)` → array<long>: one-pass k-MinHash signature. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(a: Any): Any =
    TextHash.minhashSig(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** `simhash60(shingles)` → long: one-pass 60-bit SimHash. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(a: Any): Any =
    TextHash.simhash60(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash60($c)")
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

/** `cosine_sim(a, b)` → double: one-pass codegen cosine of two
  * `array<float>` columns, numerically identical to the interpreted
  * higher-order chain it replaces (see [[VecHash.cosineSim]]).
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VecHash.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VecHash.cosineSim($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** `hash60(str)` → long: md5-derived 60-bit content hash (fingerprints). */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(s: Any): Any =
    TextHash.hash60Utf8(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.hash60Utf8($c)")
  override protected def withNewChildInternal(c: Expression): Hash60 = copy(child = c)
}

/** Column-level API for the hash expressions. */
object hashfns {
  import GraftSqlBridge.{toColumn => column}
  private def e(c: Column): Expression = GraftSqlBridge.toExpression(c)
  def minhash_sig(shingles: Column, k: Int): Column = column(MinHashSig(e(shingles), k))
  def simhash60(shingles: Column): Column = column(SimHash60(e(shingles)))
  def hash60(s: Column): Column = column(Hash60(e(s)))
  def word_shingles(text: Column, n: Int): Column = column(WordShingles(e(text), n))
  def cosine_sim(a: Column, b: Column): Column = column(CosineSim(e(a), e(b)))
  def hyperplane_buckets(vec: Column, tables: Int, planes: Int, dim: Int): Column =
    column(HyperplaneBuckets(e(vec), tables, planes, dim))
}
