package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image codec expressions over the JDK-builtin `javax.imageio` stack —
  * no external libraries. `ImageMeta` parses genuine PNG/JPEG/GIF/BMP headers
  * (width/height/bands/format) without decoding pixel data: ImageIO readers
  * resolve `getWidth/getHeight/getImageTypes` from the header segment alone.
  * `EncodeImage` renders a deterministic synthetic image and encodes it with
  * the real codec — the oracle story for decode is a round-trip: dimensions
  * chosen arithmetically → real bytes → parsed back, compared against the
  * same arithmetic in SQL.
  *
  * Both are CodegenFallback by design: the per-row work is codec IO, not
  * expression arithmetic, so whole-stage codegen would buy nothing.
  */
object ImageExprs {

  /** Struct returned by [[ImageMeta]]; `n_bytes` is the payload length,
    * `channels` the color band count from the reader's image type. */
  val imageMetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Header-only image metadata from real bytes; null for payloads no
    * installed ImageIO reader claims (text, audio, truncated files). */
  case class ImageMeta(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = imageMetaType
    override def nullable: Boolean = true
    override def prettyName: String = "image_meta"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_meta needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0).toLong
          val h = reader.getHeight(0).toLong
          val types = reader.getImageTypes(0)
          val bands = if (types.hasNext) types.next().getNumBands.toLong else -1L
          val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          new GenericInternalRow(Array[Any](
            bytes.length.toLong, w, h, bands, UTF8String.fromString(fmt)))
        } finally reader.dispose()
      } catch {
        case _: java.io.IOException => null
      } finally iis.close()
    }

    override protected def withNewChildInternal(newChild: Expression): ImageMeta =
      copy(child = newChild)
  }

  /** Deterministic synthetic image encoded with the real codec: a
    * width×height 3-band image whose pixel (x,y) is a pure function of the
    * coordinates, written through `ImageIO.write` as `format` ("png",
    * "jpeg", "bmp", "gif"). Null if the format has no installed writer. */
  case class EncodeImage(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "encode_image"

    override protected def nullSafeEval(w: Any, h: Any, f: Any): Any = {
      val width = w.asInstanceOf[Int]
      val height = h.asInstanceOf[Int]
      val fmt = f.asInstanceOf[UTF8String].toString
      require(width >= 1 && height >= 1 && width <= 4096 && height <= 4096,
        s"encode_image dimensions out of range: ${width}x$height")
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val r = (x * 31 + y * 17) & 0xff
          val g = (x * 13 + y * 29) & 0xff
          val b = (x * 7 + y * 23) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream(width * height / 2 + 256)
      if (!javax.imageio.ImageIO.write(img, fmt, out)) null else out.toByteArray
    }

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): EncodeImage =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** REAL image resize (reference pipelines normalize raw crawled images to
    * a training resolution before feature extraction): decode with the real
    * codec, nearest-neighbor resample with an EXPLICIT integer mapping
    * `src = floor(dst * srcDim / dstDim)` — no Graphics2D interpolation, so
    * the output pixels are a pure function of the input pixels and both
    * dims, reproducible by any independent reimplementation — and re-encode
    * as lossless PNG. Null for undecodable payloads or out-of-range targets
    * (the decode-contract of [[ImageMeta]]). Per-row cost is the decoded
    * raster; at 100 TB this runs inside the narrow projection after a
    * metadata prefilter ([[ImageMeta]]) has dropped the junk. */
  case class ResizeImage(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "resize_image"

    /** (payload, targetW, targetH) → PNG bytes. */
    override protected def nullSafeEval(p: Any, w: Any, h: Any): Any = {
      val bytes = p.asInstanceOf[Array[Byte]]
      val dstW = w.asInstanceOf[Int]
      val dstH = h.asInstanceOf[Int]
      if (dstW < 1 || dstH < 1 || dstW > 4096 || dstH > 4096) return null
      try {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (src == null) return null
        val out = new java.awt.image.BufferedImage(
          dstW, dstH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < dstH) {
          val sy = (y.toLong * src.getHeight / dstH).toInt
          var x = 0
          while (x < dstW) {
            val sx = (x.toLong * src.getWidth / dstW).toInt
            out.setRGB(x, y, src.getRGB(sx, sy))
            x += 1
          }
          y += 1
        }
        val buf = new java.io.ByteArrayOutputStream(dstW * dstH / 2 + 256)
        if (!javax.imageio.ImageIO.write(out, "png", buf)) null else buf.toByteArray
      } catch {
        case _: java.io.IOException => null
      }
    }

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ResizeImage =
      copy(first = f, second = s, third = t)
  }

  /** Exact content checksum of a decoded image: Σ over pixels of (r+g+b),
    * as a long. PNG round-trips 8-bit RGB losslessly, so for a
    * deterministic source image the sum has a closed form an oracle can
    * recompute — the pixel-level proof that [[ResizeImage]] resampled the
    * raster it claimed to (dims alone would pass a resize that scrambled
    * content). Null for undecodable payloads. */
  case class ImagePixelSum(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "image_pixel_sum"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_pixel_sum needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) return null
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        sum
      } catch {
        case _: java.io.IOException => null
      }
    }

    override protected def withNewChildInternal(newChild: Expression): ImagePixelSum =
      copy(child = newChild)
  }

  /** Perceptual difference hash (dHash) of a decoded image — the standard
    * cheap near-duplicate signature for image corpora (resize/re-encode/
    * minor-crop variants collide or land within a few bits; hamming
    * distance on the 64-bit hash ≈ perceptual distance). Pipeline, all
    * exact integer: real-codec decode → 9×8 downsample with the SAME
    * explicit floor mapping as [[ResizeImage]] (`src = floor(dst·srcDim/
    * dstDim)`) → per-cell brightness r+g+b (comparing sums ≡ comparing
    * means, no division) → bit(y·8+x) = brightness(x+1,y) > brightness(x,y)
    * row-major into a signed long. Reproducible by any independent
    * reimplementation; null for undecodable payloads. */
  case class ImageDHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "image_dhash"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_dhash needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) return null
        val w = img.getWidth
        val h = img.getHeight
        val gray = Array.ofDim[Int](8, 9)
        var y = 0
        while (y < 8) {
          val sy = (y.toLong * h / 8).toInt
          var x = 0
          while (x < 9) {
            val sx = (x.toLong * w / 9).toInt
            val rgb = img.getRGB(sx, sy)
            gray(y)(x) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        var hash = 0L
        y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (gray(y)(x + 1) > gray(y)(x)) hash |= (1L << (y * 8 + x))
            x += 1
          }
          y += 1
        }
        hash
      } catch {
        case _: java.io.IOException => null
      }
    }

    override protected def withNewChildInternal(newChild: Expression): ImageDHash =
      copy(child = newChild)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def imageMeta(payload: Column): Column = column(ImageMeta(expression(payload)))
  def encodeImage(width: Column, height: Column, format: Column): Column =
    column(EncodeImage(expression(width.cast("int")), expression(height.cast("int")),
      expression(format)))
  def resizeImage(payload: Column, width: Column, height: Column): Column =
    column(ResizeImage(expression(payload), expression(width.cast("int")),
      expression(height.cast("int"))))
  def imagePixelSum(payload: Column): Column = column(ImagePixelSum(expression(payload)))
  def imageDHash(payload: Column): Column = column(ImageDHash(expression(payload)))
}
