package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot fingerprinting path. These are
  * genuine `Expression`s (not Scala UDFs) so they stay inside Tungsten row
  * processing with no serialization boundary; `Fnv64` additionally
  * implements `doGenCode` so it fuses into whole-stage codegen.
  */

/** FNV-1a 64-bit rolling hash over a string's UTF-8 bytes — the document
  * fingerprint primitive (content-defined, order-sensitive). Codegen'd:
  * the generated code is a tight byte loop inside the fused stage. */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Fnv64 = copy(child = newChild)
}

/** 64-bit SimHash over an array of string tokens: each token hashed
  * (murmur3 of its UTF-8 bytes, applied twice for 64 bits), per-bit
  * majority vote forms the signature. Single pass over the token array —
  * versus O(64·n) when composed from built-in array functions.
  * Near-duplicate docs land within small Hamming distance
  * (Charikar's SimHash, public algorithm). */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
        val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x85ebca6b)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
}

/** k-permutation MinHash signature in ONE pass over the shingle array:
  * x = murmur3(shingle) mod P, g_i = (a_i·x + b_i) mod P with seeded
  * pseudo-random (a_i, b_i) — the standard universal-hash permutation
  * family (a_i·x stays < 2^60, no overflow). Output: array<long> of the k
  * minima. NOTE: g_i = h1 + i·h2 (Kirsch-Mitzenmacher) is NOT a valid
  * substitute here — with a common min-dominating shingle the k minima
  * collapse into an arithmetic progression and signature agreement no
  * longer estimates Jaccard.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {
  import MinHashSig._
  require(k > 0 && k <= MaxK,
    s"minhash signature length must be in [1, $MaxK], got $k") // SQL-reachable via graft_minhash
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x1b873593)
        val x = (h.toLong & 0x7fffffffL) % P
        var j = 0
        while (j < k) {
          val g = (A(j) * x + B(j)) % P
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {
  val P = 1000000007L
  val MaxK = 64
  // deterministic coefficients, a in [1, P), b in [0, P)
  private[functions] val (aArr, bArr) = {
    val r = new graft.core.Lcg(0xA5EED5EEDL)
    val a = Array.fill(MaxK)(1L + ((r.nextLong() >>> 3) % (P - 1)))
    val b = Array.fill(MaxK)((r.nextLong() >>> 3) % P)
    (a, b)
  }
  def A: Array[Long] = aArr
  def B: Array[Long] = bArr
}

/** Fraction (per-mille) of n-gram occurrences taken by the single most
  * frequent n-gram of a token array — the Gopher-style repetition signal
  * (Gopher's Table A1 cuts: 0.20 for 2-grams, 0.18 for 3-grams, 0.16 for
  * 4-grams, there as character fractions; applied here as occurrence
  * fractions). ONE pass with a hash map of exact gram strings;
  * composing this from array built-ins is O(n²) per row (each distinct
  * gram re-scans the array), which is what this expression exists to
  * avoid in the 100 TB hot path. Returns floor(1000·top/total), 0 when
  * fewer than n tokens. */
case class TopNgramFrac(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 8, s"gram size must be in [1, 8], got $n") // SQL-reachable
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val total = m - n + 1
    if (total <= 0) return 0L
    // decode each token ONCE (a gram-local decode would convert every
    // token n times — one per overlapping gram it participates in)
    val toks = new Array[String](m)
    var t = 0
    while (t < m) {
      toks(t) = if (arr.isNullAt(t)) "" else arr.getUTF8String(t).toString
      t += 1
    }
    // cap the pre-size: total*2 on a multi-million-token document would
    // allocate tens of MB of empty table up front (and can overflow Int);
    // outlier documents just let the map grow
    val counts = new java.util.HashMap[String, Integer](math.min(total, 1 << 15) * 2)
    val sb = new java.lang.StringBuilder(48)
    var top = 0
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c
      i += 1
    }
    1000L * top / total // both positive: plain division IS the floor
  }
  override protected def withNewChildInternal(newChild: Expression): TopNgramFrac =
    copy(child = newChild)
}

/** True subword token count under an ordered byte-pair-merge table
  * (Sennrich et al. 2016's public BPE algorithm): the input is
  * pre-tokenized into word/punctuation units (`[a-z0-9]+|[^a-z0-9\s]` —
  * callers lowercase first, see [[graft.ops.TextAnalysis.tokenCountBpe]]),
  * each unit is split into code points, and every merge rule is applied
  * as ONE left-to-right non-overlapping scan in table order. The result
  * is the number of surviving symbols — the train-data budgeting number a
  * 100 TB pipeline actually needs, as opposed to the word+punct proxy
  * ([[graft.ops.TextAnalysis.tokenCountWordPunct]]).
  *
  * The merge table is a PARAMETER: the default is the frozen 42-rule
  * in-code vocabulary (which the q_token_bpe DuckDB oracle replays
  * merge-for-merge), and a production vocabulary of thousands of merges
  * loads via [[BpeTokenCount.loadMerges]] (standard one-pair-per-line
  * `merges.txt` format) or any literal `Seq`. The table rides the
  * expression tree to executors — no file dependency on the cluster.
  *
  * The scan semantics (leftmost-first, merged symbol not re-paired with
  * its left neighbor within the same rule's pass) are chosen because they
  * are EXACTLY replayable in SQL: encoding symbols with two-space
  * boundaries makes each rule one non-overlapping `replace()` — see
  * [[BpeTokenCount.oracleReplaceChain]], which SparkEntry's oracle is
  * generated from. Single pass per rule over short units;
  * CodegenFallback like the other array-walking expressions (the per-row
  * cost is the unit scan itself).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  def this(child: Expression) = this(child, BpeTokenCount.Merges)
  override def dataType: DataType = IntegerType
  // array-backed for the per-unit scan; built once per (task) instance
  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray
  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.countTokens(input.asInstanceOf[UTF8String].toString, mergeArr)
  // a thousands-rule table must not be dumped into every explain() string
  override def toString: String = s"bpe_token_count($child, ${merges.length} merges)"
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** The frozen default merge table, in priority order. Every
    * multi-character component is produced by an earlier rule, so the
    * table is a genuine (tiny) BPE vocabulary over lowercase English;
    * rules whose pair never occurs are no-ops by construction. */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n", "r" -> "e",
    "o" -> "n", "e" -> "n", "a" -> "t", "o" -> "r", "e" -> "s", "s" -> "t",
    "a" -> "r", "a" -> "l", "o" -> "u", "i" -> "s", "i" -> "t", "an" -> "d",
    "in" -> "g", "e" -> "d", "o" -> "f", "t" -> "o", "h" -> "e", "l" -> "e",
    "c" -> "o", "d" -> "e", "m" -> "e", "s" -> "e", "u" -> "s", "r" -> "i",
    "l" -> "i", "r" -> "a", "b" -> "e", "c" -> "h", "p" -> "a", "w" -> "h",
    "wh" -> "i", "st" -> "a", "er" -> "s", "on" -> "g", "at" -> "e", "co" -> "m")

  /** Load an ordered merge table from the standard `merges.txt` format:
    * one `left right` pair per line (single-space separated), blank lines
    * and `#…` comment lines skipped. Read driver-side at plan time; the
    * table travels inside the expression. */
  def loadMerges(path: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala.toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }
  }

  /** The SQL replay of `merges` over a two-space symbol encoding: one
    * non-overlapping `replace()` per rule, nested in table order around
    * `inner` (a SQL expression producing `'  ' || sym1 || '  ' || sym2 ||
    * '  '`). Boundary characters are never shared between adjacent
    * matches, so SQL `replace`'s left-to-right non-overlapping scan is
    * EXACTLY the engine's per-rule pass.
    *
    * CEILING: the chain nests one function call per rule, so binder
    * recursion depth grows linearly — DuckDB's binder caps recursion at
    * 128, bounding a single chain to ~120 rules (measured: a 400-rule
    * chain fails to bind). For a production-sized table, stage the
    * replay: chunk the table and apply each chunk's chain in its own CTE
    * layer (`m1 AS (SELECT chain1 FROM spaced)`, `m2 AS (… FROM m1)`, …),
    * which this generator supports via `chunk` — callers get one
    * SELECT-expression string per chunk, in order; layer i+1's chain
    * starts from relation `m(i+1)`'s input column. Validated against
    * DuckDB at 718 rules / 8 layers. */
  def oracleReplaceChain(merges: Seq[(String, String)], inner: String,
                         chunk: Int = 100): Seq[String] = {
    require(chunk >= 1, s"chunk must be positive: $chunk")
    val grouped = merges.grouped(chunk).toSeq
    grouped.zipWithIndex.map { case (g, i) =>
      val base = if (i == 0) inner else s"m$i"
      g.foldLeft(base) { case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')" }
    }
  }

  private val unitRe = java.util.regex.Pattern.compile("[a-z0-9]+|[^a-z0-9\\s]")

  def countTokens(text: String): Int = countTokens(text, Merges.toArray)

  private[functions] def countTokens(text: String, merges: Array[(String, String)]): Int = {
    val m = unitRe.matcher(text)
    var total = 0
    while (m.find()) total += countUnit(m.group(), merges)
    total
  }

  private[functions] def countUnit(u: String, merges: Array[(String, String)]): Int = {
    if (u.length == 1) return 1
    // split into code points (alnum units are ASCII by the regex, but
    // stay code-point-correct so DuckDB's character indexing agrees)
    var syms: Array[String] = {
      val buf = new scala.collection.mutable.ArrayBuffer[String](u.length)
      var i = 0
      while (i < u.length) {
        val n = Character.charCount(u.codePointAt(i))
        buf += u.substring(i, i + n)
        i += n
      }
      buf.toArray
    }
    var r = 0
    while (r < merges.length) {
      val a = merges(r)._1
      val b = merges(r)._2
      if (syms.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2 // merged symbol is not re-paired leftward
          } else { out += syms(i); i += 1 }
        }
        if (out.length != syms.length) syms = out.toArray
      }
      r += 1
    }
    syms.length
  }
}

/** Fused 64-dim-style cosine: dot(a,b) / (‖a‖·‖b‖) over two float arrays
  * in ONE pass with three scalar accumulators — value-identical to the
  * composed `aggregate(zip_with(...))` form (each accumulator folds the
  * same IEEE addition sequence as its standalone fold), but with no
  * intermediate zipped arrays: the composed form allocates two 64-element
  * double arrays per PAIR, which made the within-cell verify of semantic
  * dedup allocation-bound (r06 measurement: the verify job dominated
  * q_semdedup's warm pass). Null inputs or length mismatch → null,
  * mirroring zip_with's null padding propagating through the fold. */
case class CosineDouble(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // float→double promotion is exact, so both element widths fold the same
  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_double expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null // zip_with pads with null → null fold
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = elem(x, i, leftIsFloat)
      val yv = elem(y, i, rightIsFloat)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineDouble =
    copy(left = l, right = r)
}

/** Fused integer dot product over two long arrays (the quantized-vector
  * scorer): one pass, two getters, one accumulator — value-identical to
  * `aggregate(zip_with(a,b,_*_), 0L, _+_)` (long addition is exact, so
  * equality does not even depend on fold order) without materializing the
  * zipped product array per scored pair. Null inputs or length mismatch →
  * null like the composed form. */
case class DotLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  // getLong over an int-element UnsafeArrayData would silently misread —
  // the quantized-vector contract is array<bigint>, enforced at analysis
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_long expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLong =
    copy(left = l, right = r)
}

/** All sign-LSH bucket keys of an embedding under `tables` (nTables tables
  * of nPlanes hyperplanes each) in ONE expression node — the fused form of
  * `array(tables.map(p => bucketCol(emb, p)))`, whose composed tree embeds
  * nTables·nPlanes 64-element literal arrays in nTables·nPlanes separate
  * aggregate(zip_with(...)) folds: q_ann_recall's 16×6-plane projection
  * alone made its formatted plan 808 KB, re-analyzed on every pass (r06
  * guide §3.3: planning time on enormous plans is itself a bottleneck).
  *
  * Value identity with the composed form: per plane, the dot is the same
  * IEEE left fold acc + x_i·p_i from 0.0; the plane contributes `1 << i`
  * iff dot >= 0. A null element or a length mismatch makes the composed
  * fold null and `when(null >= 0, …).otherwise(0)` contributes 0 — this
  * expression mirrors that. The plane table rides the expression to the
  * executors; `toString` stays compact so plans stay readable. */
case class SignLshBuckets(child: Expression, tables: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val tb: Array[Array[Array[Double]]] =
    tables.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  // the composed form maps a NULL embedding to the all-zero bucket array
  // (null dot -> when(null >= 0, …).otherwise(0)), never to a null row —
  // so this expression is non-nullable and handles null input itself
  // instead of inheriting UnaryExpression's null-propagation
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      new Array[Int](tb.length))
    else nullSafeEval(v)
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Int](tb.length)
    var t = 0
    while (t < tb.length) {
      val planes = tb(t)
      var bucket = 0
      var p = 0
      while (p < planes.length) {
        val pl = planes(p)
        if (pl.length == n) {
          var acc = 0.0
          var i = 0
          var sawNull = false
          while (i < n && !sawNull) {
            if (arr.isNullAt(i)) sawNull = true
            else {
              val xv = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
              acc += xv * pl(i)
            }
            i += 1
          }
          // !(acc < 0) not (acc >= 0): Spark's nan-safe >= treats NaN as
          // larger than any value, so a NaN dot SETS the bit in the
          // composed form — Java's acc >= 0 would clear it
          if (!sawNull && !(acc < 0)) bucket |= (1 << p)
        }
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
  override def toString: String =
    s"sign_lsh_buckets($child, ${tables.length} tables x ${tables.headOption.map(_.length).getOrElse(0)} planes)"
  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

/** Squared distances of an embedding to every centroid in ONE expression
  * node — the fused form of `array(centroids.map(c => aggregate(zip_with(
  * emb, lit(c), (x,y) => (x-y)*(x-y)), 0.0, _+_)))` (the IVF coarse
  * quantizer's assignment projection). Per centroid the fold is the same
  * IEEE sequence: t = x_i − c_i; acc += t·t, left to right from 0.0. A
  * null element or length mismatch yields a null element exactly like the
  * composed fold. `array_position(d, array_min(d))` & co. compose on top
  * unchanged, so tie-breaking is untouched. (Known benign divergence: a
  * NULL embedding yields a null ARRAY here vs the composed form's
  * array-of-null-elements — both end in a null cell assignment, and the
  * embedding corpus contract has no null vectors.) */
case class CellDistances(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  @transient private lazy val cs: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](cs.length)
    var c = 0
    while (c < cs.length) {
      val ct = cs(c)
      if (ct.length != n) out(c) = null
      else {
        var acc = 0.0
        var i = 0
        var sawNull = false
        while (i < n && !sawNull) {
          if (arr.isNullAt(i)) sawNull = true
          else {
            val xv = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            val t = xv - ct(i)
            acc += t * t
          }
          i += 1
        }
        out(c) = if (sawNull) null else java.lang.Double.valueOf(acc)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override def toString: String = s"cell_distances($child, ${centroids.length} centroids)"
  override protected def withNewChildInternal(newChild: Expression): CellDistances =
    copy(child = newChild)
}

/** `size(array_intersect(a, b))` without materializing the intersection
  * array — the per-pair cost of the exact-Jaccard verify tier. Matches
  * array_intersect's distinct semantics exactly: elements of `a` are
  * deduplicated into a set, each DISTINCT element of `b` present in it
  * counts once, and a null element is one distinct value. The verify
  * tiers feed arrays that are already distinct, but the equality holds
  * for any input. */
case class IntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  // the eval path reads UTF8String elements — enforce the string-array
  // contract at analysis instead of a runtime ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true; case _ => false }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"intersect_count expects array<string> inputs, got ${left.dataType} / ${right.dataType}")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val setA = new java.util.HashSet[Any](nx * 2)
    var i = 0
    var aHasNull = false
    while (i < nx) {
      if (x.isNullAt(i)) aHasNull = true
      else setA.add(x.getUTF8String(i))
      i += 1
    }
    var count = 0
    var bNullCounted = false
    val ny = y.numElements()
    i = 0
    while (i < ny) {
      if (y.isNullAt(i)) {
        if (aHasNull && !bNullCounted) { count += 1; bNullCounted = true }
      } else if (setA.remove(y.getUTF8String(i))) count += 1 // remove = count distinct once
      i += 1
    }
    count
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCount =
    copy(left = l, right = r)
}

object ColumnFns {
  import org.apache.spark.sql.graftbridge.SqlBridge
  def fnv64(c: Column): Column = SqlBridge.column(Fnv64(SqlBridge.expression(c)))
  def bpeTokenCount(c: Column): Column =
    SqlBridge.column(new BpeTokenCount(SqlBridge.expression(c)))
  def bpeTokenCount(c: Column, merges: Seq[(String, String)]): Column =
    SqlBridge.column(BpeTokenCount(SqlBridge.expression(c), merges))
  def simhash64(c: Column): Column = SqlBridge.column(SimHash64(SqlBridge.expression(c)))
  def minhashSig(c: Column, k: Int): Column = SqlBridge.column(MinHashSig(SqlBridge.expression(c), k))
  def topNgramFracMilli(tokens: Column, n: Int): Column =
    SqlBridge.column(TopNgramFrac(SqlBridge.expression(tokens), n))
  def cosineDouble(a: Column, b: Column): Column =
    SqlBridge.column(CosineDouble(SqlBridge.expression(a), SqlBridge.expression(b)))
  def dotLong(a: Column, b: Column): Column =
    SqlBridge.column(DotLong(SqlBridge.expression(a), SqlBridge.expression(b)))
  /** String-array intersection count (the only element type the verify
    * tiers feed it). */
  def intersectCount(a: Column, b: Column): Column =
    SqlBridge.column(IntersectCount(SqlBridge.expression(a), SqlBridge.expression(b)))
  def signLshBuckets(emb: Column, tables: Seq[Seq[Seq[Double]]]): Column =
    SqlBridge.column(SignLshBuckets(SqlBridge.expression(emb), tables))
  def cellDistances(emb: Column, centroids: Seq[Seq[Double]]): Column =
    SqlBridge.column(CellDistances(SqlBridge.expression(emb), centroids))

  /** Extension→MIME projection (reference
    * examples/test_local_file.py:201-227: 11-entry suffix map, default
    * `application/octet-stream`). Python `Path.suffix` semantics: the last
    * dot-segment, lowercased, and EMPTY for dotfiles / extension-less
    * names — the dot must not be the first character of the NAME, hence
    * the preceding `[^/]` guard (any non-slash char, including another
    * dot: `Path("scan..tif").suffix == ".tif"`). One literal-map lookup
    * over built-in expressions: codegen'd, no UDF. */
  val ExtMime: Seq[(String, String)] = Seq(
    ".jpg" -> "image/jpeg", ".jpeg" -> "image/jpeg", ".png" -> "image/png",
    ".tiff" -> "image/tiff", ".tif" -> "image/tiff", ".bmp" -> "image/bmp",
    ".webp" -> "image/webp", ".pdf" -> "application/pdf",
    ".docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".pptx" -> "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ".xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")

  def extToMime(path: Column): Column = {
    import org.apache.spark.sql.functions._
    val mimeMap = map(ExtMime.flatMap { case (e, m) => Seq(lit(e), lit(m)) }: _*)
    coalesce(
      element_at(mimeMap, lower(regexp_extract(path, "[^/](\\.[A-Za-z0-9]+)$", 1))),
      lit("application/octet-stream"))
  }
}
