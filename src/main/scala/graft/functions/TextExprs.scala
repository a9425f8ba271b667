package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{column => _}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Native Catalyst expressions for the text-dedup hot path.
  *
  * Why: Spark's higher-order functions (`transform` / `aggregate` /
  * `zip_with`) are evaluated INTERPRETED — they don't participate in
  * whole-stage codegen — so a minhash signature written as HOF folds costs
  * millions of interpreted expression-node evaluations per partition. These
  * expressions compute the same results in tight compiled loops
  * (CodegenFallback: one virtual `eval` call per row, then plain JVM code).
  * Hashing uses Spark's own XXH64 so behavior is stable across JVMs.
  */
object TextExprs {

  /** Lower-cased whitespace tokens → k-word shingles / n-grams.
    * Matches the semantics of `split(lower(text), " ")` + sliding concat:
    * consecutive spaces yield empty tokens (kept, like Spark's `split`).
    * `distinct` keeps first occurrences only (shingle sets); texts with
    * fewer than k tokens collapse to one whole-text shingle when
    * `collapseShort`, else yield an empty array (n-gram semantics). */
  case class WordShingles(child: Expression, k: Int,
                          distinct: Boolean = true, collapseShort: Boolean = true)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"

    override protected def nullSafeEval(input: Any): Any = {
      val tokens = input.asInstanceOf[UTF8String].toString.toLowerCase.split(" ", -1)
      val out =
        if (tokens.length < k) {
          if (collapseShort) Array[String](tokens.mkString(" ")) else Array.empty[String]
        } else {
          val buf = new mutable.ArrayBuffer[String](tokens.length)
          val seen = if (distinct) new mutable.HashSet[String] else null
          var i = 0
          val sb = new java.lang.StringBuilder(64)
          while (i + k <= tokens.length) {
            sb.setLength(0)
            var j = 0
            while (j < k) {
              if (j > 0) sb.append(' ')
              sb.append(tokens(i + j))
              j += 1
            }
            val s = sb.toString
            if (seen == null || seen.add(s)) buf += s
            i += 1
          }
          buf.toArray
        }
      new GenericArrayData(out.map(UTF8String.fromString).toArray[Any])
    }

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  /** Per-marker-set token membership counts: tokenizes once, returns
    * array<long> with count of tokens contained in each marker set —
    * the language-ID scoring loop as one compiled pass (the HOF version
    * re-tokenized and re-filtered per language). */
  case class MarkerCounts(child: Expression, markerSets: Seq[Seq[String]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "marker_counts"

    @transient private lazy val sets: Array[java.util.HashSet[String]] =
      markerSets.map { m =>
        val h = new java.util.HashSet[String]()
        m.foreach(h.add)
        h
      }.toArray

    override protected def nullSafeEval(input: Any): Any = {
      val tokens = input.asInstanceOf[UTF8String].toString.toLowerCase.split(" ", -1)
      val counts = new Array[Long](sets.length)
      var t = 0
      while (t < tokens.length) {
        var i = 0
        while (i < sets.length) {
          if (sets(i).contains(tokens(t))) counts(i) += 1
          i += 1
        }
        t += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
    }

    override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
      copy(child = newChild)
  }

  /** MinHash signature over an array<string> shingle set: for permutation i,
    * sig[i] = min over shingles s of XXH64(XXH64(bytes(s), 42), seed_i)
    * where seed_i = XXH64(i, 42). One pass over the shingles; 64-bit
    * min-wise independent enough for LSH banding. */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    require(numHashes >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    private lazy val seeds: Array[Long] =
      Array.tabulate(numHashes)(i => XXH64.hashLong(i.toLong, 42L))

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var p = 0
        while (p < numHashes) {
          val h = XXH64.hashLong(base, seeds(p))
          if (h < sig(p)) sig(p) = h
          p += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** Exact set Jaccard of two string arrays in one compiled pass (hash-set
    * intersection). The `array_intersect`/`array_union` formulation builds
    * two intermediate arrays per pair through interpreted expressions —
    * ruinous inside an all-pairs verifier. Inputs are treated as sets
    * (duplicates ignored), matching array_distinct'd shingles. */
  case class JaccardSim(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sim"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val xs = new java.util.HashSet[UTF8String](x.numElements() * 2)
      var i = 0
      while (i < x.numElements()) { xs.add(x.getUTF8String(i)); i += 1 }
      val ys = new java.util.HashSet[UTF8String](y.numElements() * 2)
      var inter = 0
      var j = 0
      while (j < y.numElements()) {
        val s = y.getUTF8String(j)
        if (ys.add(s) && xs.contains(s)) inter += 1
        j += 1
      }
      val union = xs.size + ys.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
      copy(left = l, right = r)
  }

  /** 64-bit SimHash over the token multiset: bit i of the result is set
    * when Σ_tokens (±1 by bit i of XXH64(token)) is positive. Same
    * semantics as the HOF formulation in TextDedup.simhash, ~100× cheaper. */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val tokens = input.asInstanceOf[UTF8String].toString.toLowerCase.split(" ", -1)
      val counts = new Array[Int](64)
      var t = 0
      while (t < tokens.length) {
        val u = UTF8String.fromString(tokens(t))
        val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        t += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Unicode NFC normalization (JDK `java.text.Normalizer`, no ICU
    * dependency): composes combining sequences to their canonical
    * precomposed form, so "café" typed as e+COMBINING ACUTE and as the
    * single é codepoint digest/dedup identically. Fast path: texts already
    * in NFC (the overwhelming majority of a crawl) are detected with
    * `isNormalized` and returned as-is, no re-encode. */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }

    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  /** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975, CACM 18(6)):
    * per-pattern OVERLAPPING occurrence counts of every `patterns(i)` in
    * the input — the blocklist/badwords primitive (C4's dirty-word screen,
    * policy phrase filters). One linear pass per row regardless of
    * pattern count: thousands of blocklist terms cost the same scan as
    * one, vs. N regex passes for the naive shape. Standard AC semantics:
    * one count per (pattern, end position), so overlapping matches and
    * nested patterns ("able" inside "table") all count.
    *
    * The goto/fail/output automaton builds once per deserialized
    * expression instance (transient lazy — O(Σ|pattern|) memory shared by
    * every row the task scans); output sets are merged through the fail
    * chain at build time, so the scan never walks fail links to report. */
  case class MultiPatternCounts(child: Expression, patterns: Seq[String])
      extends UnaryExpression with CodegenFallback {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "multi_pattern_counts"

    /** The automaton in DFA form: fail links are resolved into the
      * transition table at build (dense int rows for ASCII, a shared map
      * for wider chars), so the scan is one array load per character —
      * no fail-chain walking, no boxing on the hot path. */
    @transient private lazy val automaton: (Array[Array[Int]],
        Array[java.util.HashMap[Character, Integer]], Array[Array[Int]]) = {
      val gotoM = mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
      val outM = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
      patterns.zipWithIndex.foreach { case (p, pid) =>
        var s = 0
        p.foreach { c =>
          val nxt = gotoM(s).get(c)
          s = if (nxt != null) nxt.intValue()
          else {
            gotoM += new java.util.HashMap[Character, Integer]()
            outM += mutable.ArrayBuffer.empty[Int]
            gotoM(s).put(c, gotoM.size - 1)
            gotoM.size - 1
          }
        }
        outM(s) += pid
      }
      val n = gotoM.size
      val fail = new Array[Int](n)
      val order = mutable.ArrayBuffer.empty[Int] // BFS order (root excluded)
      val queue = new java.util.ArrayDeque[Int]()
      gotoM(0).forEach((_, v) => queue.add(v.intValue()))
      while (!queue.isEmpty) {
        val u = queue.poll()
        order += u
        gotoM(u).forEach { (c, v) =>
          queue.add(v.intValue())
          var f = fail(u)
          while (f != 0 && !gotoM(f).containsKey(c)) f = fail(f)
          val fv = gotoM(f).get(c)
          fail(v.intValue()) =
            if (fv != null && fv.intValue() != v.intValue()) fv.intValue() else 0
          outM(v.intValue()) ++= outM(fail(v.intValue()))
        }
      }
      // resolve fail links into dense DFA rows (BFS order: fail(s) < s in
      // depth, so its row is already final)
      val dfa = Array.fill(n)(new Array[Int](128))
      val wide = Array.fill(n)(new java.util.HashMap[Character, Integer]())
      def resolve(s: Int): Unit = {
        val base = if (s == 0) null else { wide(fail(s)) }
        var c = 0
        while (c < 128) {
          val g = gotoM(s).get(c.toChar)
          dfa(s)(c) = if (g != null) g.intValue()
                      else if (s == 0) 0 else dfa(fail(s))(c)
          c += 1
        }
        if (base != null) wide(s).putAll(base)
        gotoM(s).forEach((ch, v) => if (ch >= 128) wide(s).put(ch, v))
      }
      resolve(0)
      order.foreach(resolve)
      (dfa, wide, outM.map(_.toArray).toArray)
    }

    override protected def nullSafeEval(input: Any): Any = {
      val (dfa, wide, out) = automaton
      val text = input.asInstanceOf[UTF8String].toString
      val counts = new Array[Long](patterns.size)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        s = if (c < 128) dfa(s)(c)
        else {
          val nxt = wide(s).get(c)
          if (nxt != null) nxt.intValue() else 0
        }
        val o = out(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      new GenericArrayData(counts)
    }

    override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
      copy(child = newChild)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def nfcNormalize(text: Column): Column = column(NfcNormalize(expression(text)))
  def wordShingles(text: Column, k: Int): Column = column(WordShingles(expression(text), k))
  def wordNgrams(text: Column, k: Int): Column =
    column(WordShingles(expression(text), k, distinct = false, collapseShort = false))
  def minhashSig(shingles: Column, numHashes: Int): Column =
    column(MinHashSig(expression(shingles), numHashes))
  def simhash64(text: Column): Column = column(SimHash64(expression(text)))
  def jaccardSim(a: Column, b: Column): Column =
    column(JaccardSim(expression(a), expression(b)))
  def markerCounts(text: Column, markerSets: Seq[Seq[String]]): Column =
    column(MarkerCounts(expression(text), markerSets))
  def multiPatternCounts(text: Column, patterns: Seq[String]): Column =
    column(MultiPatternCounts(expression(text), patterns))
}
