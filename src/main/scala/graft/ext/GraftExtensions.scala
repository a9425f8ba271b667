package graft.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ExprBridge
import graft.functions.{TextExprs, VectorExprs}

/** SQL registration of the engine's native expressions, so
  * `spark.sql("SELECT minhash_sig(word_shingles(text, 3), 64) ...")` works
  * anywhere the Column API does. Two paths:
  *   - config-time: `.config("spark.sql.extensions", "graft.ext.GraftExtensions")`
  *   - runtime: `GraftFunctions.register(spark)` on an existing session
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def strArg(e: Expression, name: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("word_shingles",
      new ExpressionInfo(classOf[TextExprs.WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => TextExprs.WordShingles(args.head, intArg(args(1), "k"))),
    ("word_ngrams",
      new ExpressionInfo(classOf[TextExprs.WordShingles].getName, "word_ngrams"),
      (args: Seq[Expression]) => TextExprs.WordShingles(args.head, intArg(args(1), "k"),
        distinct = false, collapseShort = false)),
    ("minhash_sig",
      new ExpressionInfo(classOf[TextExprs.MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => TextExprs.MinHashSig(args.head, intArg(args(1), "numHashes"))),
    ("simhash64",
      new ExpressionInfo(classOf[TextExprs.SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => TextExprs.SimHash64(args.head)),
    ("cosine_sim",
      new ExpressionInfo(classOf[VectorExprs.CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => VectorExprs.CosineSim(args.head, args(1))),
    ("jaccard_sim",
      new ExpressionInfo(classOf[TextExprs.JaccardSim].getName, "jaccard_sim"),
      (args: Seq[Expression]) => TextExprs.JaccardSim(args.head, args(1))),
    ("lower_bound_count",
      new ExpressionInfo(classOf[graft.functions.ArrayExprs.LowerBoundCount].getName,
        "lower_bound_count"),
      // coerce here: the expression reads raw bytes by double stride, so an
      // int-typed SQL literal array must be cast, not trusted
      (args: Seq[Expression]) => graft.functions.ArrayExprs.LowerBoundCount(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[TextExprs.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => TextExprs.NfcNormalize(args.head)),
    // Aho–Corasick blocklist: multi_pattern_counts(text, 'p1', 'p2', …)
    ("multi_pattern_counts",
      new ExpressionInfo(classOf[TextExprs.MultiPatternCounts].getName,
        "multi_pattern_counts"),
      (args: Seq[Expression]) => TextExprs.MultiPatternCounts(args.head,
        args.tail.map(strArg(_, "pattern")))),
    // media container headers (ImageExprs/MediaExprs — header-only decode)
    ("image_meta",
      new ExpressionInfo(classOf[graft.functions.ImageExprs.ImageMeta].getName, "image_meta"),
      (args: Seq[Expression]) => graft.functions.ImageExprs.ImageMeta(args.head)),
    ("wav_meta",
      new ExpressionInfo(classOf[graft.functions.MediaExprs.WavMeta].getName, "wav_meta"),
      (args: Seq[Expression]) => graft.functions.MediaExprs.WavMeta(args.head)),
    ("mp4_meta",
      new ExpressionInfo(classOf[graft.functions.MediaExprs.Mp4Meta].getName, "mp4_meta"),
      (args: Seq[Expression]) => graft.functions.MediaExprs.Mp4Meta(args.head)),
    ("resize_image",
      new ExpressionInfo(classOf[graft.functions.ImageExprs.ResizeImage].getName, "resize_image"),
      (args: Seq[Expression]) => graft.functions.ImageExprs.ResizeImage(
        args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.catalyst.expressions.Cast(args(2),
          org.apache.spark.sql.types.IntegerType))),
    ("image_pixel_sum",
      new ExpressionInfo(classOf[graft.functions.ImageExprs.ImagePixelSum].getName,
        "image_pixel_sum"),
      (args: Seq[Expression]) => graft.functions.ImageExprs.ImagePixelSum(args.head)),
    ("wav_energy",
      new ExpressionInfo(classOf[graft.functions.MediaExprs.WavEnergy].getName, "wav_energy"),
      (args: Seq[Expression]) => graft.functions.MediaExprs.WavEnergy(
        args.head,
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.IntegerType))),
    ("html_extract",
      new ExpressionInfo(classOf[graft.functions.HtmlExprs.HtmlExtract].getName, "html_extract"),
      (args: Seq[Expression]) => graft.functions.HtmlExprs.HtmlExtract(args.head)),
    ("warc_records",
      new ExpressionInfo(classOf[graft.functions.WarcExprs.WarcRecords].getName, "warc_records"),
      (args: Seq[Expression]) => graft.functions.WarcExprs.WarcRecords(args.head)),
    ("gunzip_text",
      new ExpressionInfo(classOf[graft.functions.GzipExprs.GunzipText].getName, "gunzip_text"),
      (args: Seq[Expression]) => graft.functions.GzipExprs.GunzipText(args.head)),
    ("gzip_member",
      new ExpressionInfo(classOf[graft.functions.GzipExprs.GzipMember].getName, "gzip_member"),
      (args: Seq[Expression]) => graft.functions.GzipExprs.GzipMember(args.head)),
    ("tar_pack",
      new ExpressionInfo(classOf[graft.functions.TarExprs.TarPack].getName, "tar_pack"),
      (args: Seq[Expression]) => graft.functions.TarExprs.TarPack(args.head)),
    ("tar_entries",
      new ExpressionInfo(classOf[graft.functions.TarExprs.TarEntries].getName, "tar_entries"),
      (args: Seq[Expression]) => graft.functions.TarExprs.TarEntries(args.head)),
    ("unzstd_text",
      new ExpressionInfo(classOf[graft.functions.ZstdExprs.UnzstdText].getName, "unzstd_text"),
      (args: Seq[Expression]) => graft.functions.ZstdExprs.UnzstdText(args.head)),
    ("zstd_frame",
      new ExpressionInfo(classOf[graft.functions.ZstdExprs.ZstdFrame].getName, "zstd_frame"),
      (args: Seq[Expression]) => graft.functions.ZstdExprs.ZstdFrame(args.head)),
    ("binary_concat",
      new ExpressionInfo(classOf[graft.functions.ArrayExprs.BinaryConcat].getName,
        "binary_concat"),
      (args: Seq[Expression]) => graft.functions.ArrayExprs.BinaryConcat(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.BinaryType)))),
    // PDF structure decode (PdfExprs — header triage + content-stream text)
    ("pdf_meta",
      new ExpressionInfo(classOf[graft.functions.PdfExprs.PdfMeta].getName, "pdf_meta"),
      (args: Seq[Expression]) => graft.functions.PdfExprs.PdfMeta(args.head)),
    ("pdf_text",
      new ExpressionInfo(classOf[graft.functions.PdfExprs.PdfText].getName, "pdf_text"),
      (args: Seq[Expression]) => graft.functions.PdfExprs.PdfText(args.head)),
    ("encode_pdf",
      new ExpressionInfo(classOf[graft.functions.PdfExprs.EncodePdf].getName, "encode_pdf"),
      (args: Seq[Expression]) => graft.functions.PdfExprs.EncodePdf(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.LongType))),
    ("mojibake_repair",
      new ExpressionInfo(classOf[graft.functions.EncodingExprs.MojibakeRepair].getName,
        "mojibake_repair"),
      (args: Seq[Expression]) => graft.functions.EncodingExprs.MojibakeRepair(args.head)),
    ("control_strip",
      new ExpressionInfo(classOf[graft.functions.EncodingExprs.ControlStrip].getName,
        "control_strip"),
      (args: Seq[Expression]) => graft.functions.EncodingExprs.ControlStrip(args.head)),
    // byte-level BPE over the default (repo-trained) vocab
    ("bpe_tokens",
      new ExpressionInfo(classOf[graft.functions.GraftBpe.BpeTokens].getName, "bpe_tokens"),
      (args: Seq[Expression]) => graft.functions.GraftBpe.BpeTokens(args.head)),
    ("bpe_count",
      new ExpressionInfo(classOf[graft.functions.GraftBpe.BpeCount].getName, "bpe_count"),
      (args: Seq[Expression]) => graft.functions.GraftBpe.BpeCount(args.head)),
    ("bpe_detok",
      new ExpressionInfo(classOf[graft.functions.GraftBpe.BpeDetok].getName, "bpe_detok"),
      (args: Seq[Expression]) => graft.functions.GraftBpe.BpeDetok(args.head)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      ExprBridge.registerFunction(spark, name, info, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}
