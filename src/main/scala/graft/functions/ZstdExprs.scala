package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Zstandard frame handling — the other on-disk shape of published
  * training corpora (Dolma/RedPajama ship `.jsonl.zst`; zstd long since
  * replaced gzip as the archive codec of choice at corpus scale). Frames
  * concatenate the same way gzip members do (RFC 8878 §3: a stream is a
  * sequence of frames), and the same ingestion bug applies: a reader that
  * stops at the first frame silently drops the rest of the file, so
  * [[UnzstdText]] drains frames to the true end of input.
  *
  * Built on the zstd-jni streaming API that ships on the Spark classpath
  * (Spark's own codec dependency — no new library). Same decode contract
  * as [[GzipExprs]]: corrupt/non-zstd input → null; a malformed follower
  * AFTER a complete frame ends the drain and keeps the salvage; a 64 MiB
  * expansion guard turns decompression bombs into null rows instead of
  * executor OOMs. CodegenFallback by design (per-row stream work).
  */
object ZstdExprs {

  private val MaxOut = 64 * 1024 * 1024 // 64 MiB expansion cap per payload

  /** zstd bytes (any number of concatenated frames) → UTF-8 text. */
  case class UnzstdText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "unzstd_text"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"unzstd_text needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      if (bytes.isEmpty) return null
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var total = 0
      var salvaged = false
      try {
        // setContinuous(false) (the default) stops at frame boundaries
        // only when the underlying stream is exhausted — ZstdInputStream
        // itself drains concatenated frames until EOF
        val in = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(bytes))
        var n = in.read(buf)
        while (n >= 0) {
          total += n
          if (total > MaxOut) return null // bomb guard: refuse, don't OOM
          out.write(buf, 0, n)
          salvaged = true
          n = in.read(buf)
        }
        in.close()
        UTF8String.fromBytes(out.toByteArray)
      } catch {
        // corrupt tail after ≥1 decoded byte: keep the salvage (crawl
        // semantics — the tail is data loss to account for); corrupt or
        // non-zstd from byte 0: null
        case _: java.io.IOException =>
          if (salvaged) UTF8String.fromBytes(out.toByteArray) else null
      }
    }

    override protected def withNewChildInternal(newChild: Expression): UnzstdText =
      copy(child = newChild)
  }

  /** UTF-8 text → one zstd frame (fixture generator for round-trip
    * oracles; oracles never see the compressed bytes, only the round-trip
    * identity, so compressor output stability is not load-bearing). */
  case class ZstdFrame(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "zstd_frame"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"zstd_frame needs STRING input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].getBytes
      com.github.luben.zstd.Zstd.compress(text, 3)
    }

    override protected def withNewChildInternal(newChild: Expression): ZstdFrame =
      copy(child = newChild)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def unzstdText(payload: Column): Column = column(UnzstdText(expression(payload)))
  def zstdFrame(text: Column): Column = column(ZstdFrame(expression(text)))
}
