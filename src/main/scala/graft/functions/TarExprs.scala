package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** POSIX ustar (tar) container handling — the WebDataset shard format.
  * Large multimodal training corpora ship as tar shards where each SAMPLE
  * is a run of adjacent entries sharing a basename (`000123.txt`,
  * `000123.json`, `000123.jpg`); readers stream entries sequentially, so
  * the layout gives sequential I/O on object stores without an index.
  * This is the export/ingest shape for image-text and interleaved corpora
  * the same way `.jsonl.zst` (ZstdExprs) is for text and WARC
  * (WarcExprs) is for crawls.
  *
  * Reference analog: none (north-star extension) — the reference pipeline
  * (`data_processing.py`) never containerizes output; this extends the
  * container family for training-data export.
  *
  * Format (POSIX.1-1988 ustar): 512-byte header per entry — NUL-padded
  * name (100 bytes), octal size at offset 124 (11 digits + NUL), octal
  * header checksum at 148 computed with the checksum field read as eight
  * spaces, `ustar\0` magic at 257 — followed by the payload zero-padded
  * to the next 512 boundary; the archive ends with two all-zero blocks.
  *
  * Decode contract ([[graft.ext.Multimodal]] convention): deliberately
  * total. A malformed header (bad magic, unparsable size, checksum
  * mismatch) or truncated payload ends the walk and the entries parsed so
  * far are returned — at corpus scale a corrupt shard tail is data loss
  * to account for, not an exception to throw. Input that fails at the
  * VERY FIRST header is not a tar at all → null (mirrors gunzip_text),
  * while a legitimate empty archive (leading zero block) → empty array.
  *
  * CodegenFallback by design: per-row work is a byte-walk over
  * variable-length blocks, not expression arithmetic.
  */
object TarExprs {

  private val Block = 512

  /** Struct per parsed entry: name, the size DECLARED by the octal header
    * field (load-bearing: payload extraction is delimited only by it),
    * and the payload bytes. */
  val tarEntryType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** `array<struct<name string, payload binary>>` → ustar archive bytes.
    * One allocation sized up front (the BinaryConcat lesson: an
    * accumulator-copying fold is quadratic in entries per shard — caught
    * by the sf10 curve on x72). Null array or any entry violating the
    * format (name missing/over 100 UTF-8 bytes, null payload) → null:
    * a shard writer must refuse, not silently truncate a sample. */
  case class TarPack(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "tar_pack"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, StringType, _, _), StructField(_, BinaryType, _, _))), _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tar_pack needs ARRAY<STRUCT<STRING, BINARY>> input, got ${other.catalogString}")
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // first pass: validate + size the one allocation. The accumulator is
      // Long and a shard whose total exceeds the JVM array limit refuses
      // (null) like every other format violation — an Int accumulator here
      // would wrap past 2 GiB and either allocate under-sized (AIOOBE) or
      // negative (NegativeArraySizeException) instead of refusing.
      var total = (2 * Block).toLong // trailer
      val names = new Array[Array[Byte]](n)
      val payloads = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val row = arr.getStruct(i, 2)
        if (row.isNullAt(0) || row.isNullAt(1)) return null
        val name = row.getUTF8String(0).getBytes
        if (name.length == 0 || name.length > 100) return null
        val payload = row.getBinary(1)
        names(i) = name
        payloads(i) = payload
        total += Block + ((payload.length.toLong + Block - 1) / Block) * Block
        i += 1
      }
      if (total > Int.MaxValue - 8) return null // > single-array capacity: refuse
      val out = new Array[Byte](total.toInt) // zero-initialized: padding + trailer free
      var o = 0
      i = 0
      while (i < n) {
        writeHeader(out, o, names(i), payloads(i).length)
        System.arraycopy(payloads(i), 0, out, o + Block, payloads(i).length)
        o += Block + ((payloads(i).length + Block - 1) / Block) * Block
        i += 1
      }
      out
    }

    private def writeOctal(out: Array[Byte], off: Int, width: Int, v: Long): Unit = {
      // width-1 octal digits, NUL terminator — the classic tar field shape
      var x = v
      var i = off + width - 2
      while (i >= off) { out(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
      out(off + width - 1) = 0
    }

    private def writeHeader(out: Array[Byte], o: Int, name: Array[Byte], size: Int): Unit = {
      System.arraycopy(name, 0, out, o, name.length)
      writeOctal(out, o + 100, 8, 420 /* 0644 */) // mode
      writeOctal(out, o + 108, 8, 0)              // uid
      writeOctal(out, o + 116, 8, 0)              // gid
      writeOctal(out, o + 124, 12, size.toLong)   // size
      writeOctal(out, o + 136, 12, 0)             // mtime: fixed for determinism
      out(o + 156) = '0'                          // typeflag: regular file
      System.arraycopy("ustar".getBytes, 0, out, o + 257, 5) // magic, NUL already there
      out(o + 263) = '0'; out(o + 264) = '0'      // version
      // checksum: sum of header bytes with the checksum field as spaces
      java.util.Arrays.fill(out, o + 148, o + 156, ' '.toByte)
      var sum = 0L
      var i = o
      while (i < o + Block) { sum += out(i) & 0xff; i += 1 }
      writeOctal(out, o + 148, 7, sum)
      out(o + 155) = ' '
    }

    override protected def withNewChildInternal(newChild: Expression): TarPack =
      copy(child = newChild)
  }

  /** ustar archive bytes → `array<struct<name, size, payload>>` of the
    * regular-file entries (non-file typeflags — directories, links, PAX
    * extension blocks — are skipped but correctly advanced over).
    *
    * Long names: a GNU longname entry (typeflag 'L', payload = the real
    * name) or a PAX extended header (typeflag 'x', `path=` record)
    * OVERRIDES the truncated 100-byte header name of the entry that
    * follows — external archives produced by GNU/BSD tar with >100-byte
    * paths ingest under their real names instead of silently truncated
    * ones. Global PAX headers ('g') are advanced over but not applied
    * (per-archive defaults are a tarball-level concern, not a row walk). */
  case class TarEntries(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(tarEntryType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "tar_entries"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"tar_entries needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val entries = scala.collection.mutable.ArrayBuffer.empty[GenericInternalRow]
      var o = 0
      var done = false
      var corrupt = false
      // set by an 'L'/'x' extension entry, consumed by the NEXT entry
      var pendingName: String = null
      while (!done && !corrupt) {
        if (o + Block > bytes.length) { corrupt = o == 0; done = true } // empty/truncated head: not a tar
        else if (isZeroBlock(bytes, o)) done = true // archive trailer
        else parseHeader(bytes, o) match {
          case None => corrupt = entries.isEmpty; done = true // salvage the prefix
          case Some((name, size, typeflag)) =>
            val dataEnd = o + Block + size
            if (size < 0 || dataEnd > bytes.length) { corrupt = entries.isEmpty; done = true }
            else {
              typeflag match {
                case '0' | 0 =>
                  val payload = java.util.Arrays.copyOfRange(bytes, o + Block, dataEnd.toInt)
                  val effName = if (pendingName != null) pendingName else name
                  entries += new GenericInternalRow(Array[Any](
                    UTF8String.fromString(effName), size, payload))
                  pendingName = null
                case 'L' => // GNU longname: payload = real name, NUL-terminated
                  var e = o + Block
                  while (e < dataEnd && bytes(e) != 0) e += 1
                  pendingName = new String(bytes, o + Block, e - (o + Block),
                    java.nio.charset.StandardCharsets.UTF_8)
                case 'x' => // PAX extended header: "len path=value\n" records
                  paxPath(bytes, o + Block, dataEnd.toInt).foreach(pendingName = _)
                case _ =>
                  pendingName = null // extension applies only to the adjacent entry
              }
              o += Block + (((size + Block - 1) / Block) * Block).toInt
            }
        }
      }
      if (corrupt) null else new GenericArrayData(entries.toArray[Any])
    }

    private def isZeroBlock(b: Array[Byte], o: Int): Boolean = {
      var i = o
      while (i < o + Block) { if (b(i) != 0) return false; i += 1 }
      true
    }

    /** Header validation is load-bearing: magic, octal size, AND the
      * checksum (recomputed with the field as spaces — catches single-byte
      * corruption anywhere in the header, the property that makes salvage
      * stop at the damage instead of mis-walking past it). */
    private def parseHeader(b: Array[Byte], o: Int): Option[(String, Long, Byte)] = {
      if (!(b(o + 257) == 'u' && b(o + 258) == 's' && b(o + 259) == 't' &&
            b(o + 260) == 'a' && b(o + 261) == 'r')) return None
      val declared = readOctal(b, o + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = o
      while (i < o + Block) {
        sum += (if (i >= o + 148 && i < o + 156) ' '.toByte else b(i)) & 0xff
        i += 1
      }
      if (sum != declared) return None
      val size = readOctal(b, o + 124, 12).getOrElse(return None)
      var end = o
      while (end < o + 100 && b(end) != 0) end += 1
      val name = new String(b, o, end - o, java.nio.charset.StandardCharsets.UTF_8)
      if (name.isEmpty) return None
      Some((name, size, b(o + 156)))
    }

    /** PAX record walk: each record is `<len> <key>=<value>\n` where len
      * counts the WHOLE record including itself. Returns the `path` value
      * if present; a malformed record ends the walk (extension headers are
      * best-effort name recovery, never a reason to drop the entry). */
    private def paxPath(b: Array[Byte], start: Int, end: Int): Option[String] = {
      var o = start
      while (o < end) {
        var i = o
        var len = 0
        while (i < end && b(i) >= '0' && b(i) <= '9') { len = len * 10 + (b(i) - '0'); i += 1 }
        if (i >= end || b(i) != ' ' || len <= 0 || o + len > end) return None
        val recEnd = o + len // points one past the trailing '\n'
        val kvStart = i + 1
        var eq = kvStart
        while (eq < recEnd && b(eq) != '=') eq += 1
        if (eq < recEnd) {
          val key = new String(b, kvStart, eq - kvStart, java.nio.charset.StandardCharsets.US_ASCII)
          if (key == "path") {
            val vEnd = if (recEnd - 1 > eq && b(recEnd - 1) == '\n') recEnd - 1 else recEnd
            return Some(new String(b, eq + 1, vEnd - (eq + 1),
              java.nio.charset.StandardCharsets.UTF_8))
          }
        }
        o = recEnd
      }
      None
    }

    /** Octal field: digits until NUL/space; tolerate leading spaces. */
    private def readOctal(b: Array[Byte], off: Int, width: Int): Option[Long] = {
      var i = off
      val end = off + width
      while (i < end && b(i) == ' ') i += 1
      var v = 0L
      var digits = 0
      while (i < end && b(i) >= '0' && b(i) <= '7') {
        v = (v << 3) | (b(i) - '0'); digits += 1; i += 1
        if (v > Int.MaxValue.toLong * 512) return None // absurd size: corrupt
      }
      if (digits == 0) None
      else if (i < end && b(i) != 0 && b(i) != ' ') None
      else Some(v)
    }

    override protected def withNewChildInternal(newChild: Expression): TarEntries =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn, toExpression}
  def tarPack(entries: Column): Column = toColumn(TarPack(toExpression(entries)))
  def tarEntries(bytes: Column): Column = toColumn(TarEntries(toExpression(bytes)))
}
