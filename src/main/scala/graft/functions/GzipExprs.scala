package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gzip member handling — crawl archives ship as CONCATENATED gzip
  * members (Common Crawl writes one member per WARC record so readers can
  * seek to a record without decompressing the file prefix; RFC 1952 §2.2
  * makes the concatenation itself a valid gzip stream). A decompressor
  * that stops at the first member silently drops the rest of the file —
  * the classic crawl-ingestion bug — so [[GunzipText]] drains members
  * until the true end of input.
  *
  * Decode contract ([[graft.ext.Multimodal]] convention): corrupt or
  * non-gzip input → null, never an exception. A malformed follower AFTER
  * a complete member ends the drain and keeps the salvage (the JDK
  * trailer probe's behavior, and the right crawl semantics — the corrupt
  * tail is data loss to account for, not a reason to drop the decoded
  * prefix). An expansion guard caps output at 64 MiB per payload — at
  * 100 TB someone WILL feed it a decompression bomb, and the failure
  * mode must be a null row, not an executor OOM.
  *
  * CodegenFallback by design: per-row work is stream decompression, not
  * expression arithmetic.
  */
object GzipExprs {

  private val MaxOut = 64 * 1024 * 1024 // 64 MiB expansion cap per payload

  /** gzip bytes (any number of concatenated members) → UTF-8 text. */
  case class GunzipText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "gunzip_text"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"gunzip_text needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      try {
        // GZIPInputStream drains concatenated members natively (it probes
        // for a next-member header after each trailer)
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
        val buf = new Array[Byte](8192)
        var total = 0
        var n = in.read(buf)
        while (n >= 0) {
          total += n
          if (total > MaxOut) return null // bomb guard: refuse, don't OOM
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        in.close()
        UTF8String.fromBytes(out.toByteArray)
      } catch {
        case _: java.io.IOException => null // not gzip / corrupt member
      }
    }

    override protected def withNewChildInternal(newChild: Expression): GunzipText =
      copy(child = newChild)
  }

  /** UTF-8 text → one gzip member (fixture generator for round-trip
    * oracles; oracles never see the compressed bytes, only the round-trip
    * identity, so deflater output stability is not load-bearing). */
  case class GzipMember(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "gzip_member"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"gzip_member needs STRING input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].getBytes
      val out = new java.io.ByteArrayOutputStream(text.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(text)
      gz.close()
      out.toByteArray
    }

    override protected def withNewChildInternal(newChild: Expression): GzipMember =
      copy(child = newChild)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def gunzipText(payload: Column): Column = column(GunzipText(expression(payload)))
  def gzipMember(text: Column): Column = column(GzipMember(expression(text)))
}
