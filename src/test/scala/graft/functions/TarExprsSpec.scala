package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** TarExprs: ustar round-trip (incl. multi-byte payloads, empty payloads,
  * exact 512-boundary payloads), header checksum enforcement, salvage on
  * corrupt/truncated tails, non-file-entry skipping, totality on junk, and
  * pack refusal on oversize names. The packed bytes are also verified
  * against a header-field dissection so the octal size/checksum encoding
  * is pinned, not just self-consistent.
  */
class TarExprsSpec extends SparkSpec {
  import spark.implicits._

  private def pack(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val df = Seq(Tuple1(entries)).toDF("es")
      .select(TarExprs.tarPack($"es").as("t"))
    val r = df.head()
    if (r.isNullAt(0)) null else r.getAs[Array[Byte]]("t")
  }

  private def entries(b: Array[Byte]): Option[Seq[(String, Long, Array[Byte])]] = {
    val r = Seq(Tuple1(b)).toDF("b")
      .select(TarExprs.tarEntries($"b").as("es")).head()
    if (r.isNullAt(0)) None
    else Some(r.getSeq[Row](0).map(e =>
      (e.getString(0), e.getLong(1), e.getAs[Array[Byte]](2))))
  }

  test("round-trip: names, declared sizes, payload bytes — incl. multi-byte text") {
    val es = Seq(
      "1.txt" -> "hello tar".getBytes("UTF-8"),
      "1.src" -> "src0".getBytes("UTF-8"),
      "2.txt" -> "日本語テキスト éè€".getBytes("UTF-8"),
      "2.src" -> Array.emptyByteArray)
    val tar = pack(es)
    assert(tar.length % 512 === 0)
    val out = entries(tar).get
    assert(out.map(_._1) === es.map(_._1))
    assert(out.map(_._2) === es.map(_._2.length.toLong))
    out.zip(es).foreach { case ((_, _, p), (_, exp)) => assert(p === exp) }
  }

  test("payload that exactly fills its 512 block needs no padding and still walks") {
    val exact = Array.fill[Byte](512)('x')
    val tar = pack(Seq("a.bin" -> exact, "b.txt" -> "after".getBytes))
    // header + 512 payload + header + 512-padded payload + 2 trailer blocks
    assert(tar.length === 512 + 512 + 512 + 512 + 1024)
    val out = entries(tar).get
    assert(out.map(_._1) === Seq("a.bin", "b.txt"))
    assert(out.head._3 === exact)
  }

  test("header dissection: octal size field and checksum match the spec shape") {
    val tar = pack(Seq("f.txt" -> "abcdefgh".getBytes)) // size 8
    assert(new String(tar, 124, 11, "US-ASCII") === "00000000010") // 8 in octal
    assert(tar(135) === 0)
    assert(new String(tar, 257, 5, "US-ASCII") === "ustar")
    // recompute the checksum with the field as spaces — must equal the field
    val declared = java.lang.Long.parseLong(new String(tar, 148, 6, "US-ASCII"), 8)
    val sum = (0 until 512).map(i =>
      (if (i >= 148 && i < 156) ' '.toByte else tar(i)) & 0xff).sum
    assert(sum.toLong === declared)
  }

  test("single corrupted header byte stops the walk at the damage (salvage prefix)") {
    val tar = pack(Seq("keep.txt" -> "kept".getBytes, "lost.txt" -> "gone".getBytes))
    val corrupted = tar.clone()
    corrupted(1024 + 0) = 'X' // second header starts at 1024 (512 hdr + 512 padded payload)
    val out = entries(corrupted).get
    assert(out.map(_._1) === Seq("keep.txt"))
    assert(new String(out.head._3, "UTF-8") === "kept")
  }

  test("truncated payload after a complete entry keeps the salvage") {
    val tar = pack(Seq("keep.txt" -> "kept".getBytes,
      "cut.txt" -> Array.fill[Byte](300)('y')))
    val truncated = tar.take(1024 + 512 + 100) // second header + 100 of 300 payload bytes
    assert(entries(truncated).get.map(_._1) === Seq("keep.txt"))
  }

  test("non-file entries (directory typeflag) are skipped but advanced over") {
    val tar = pack(Seq("a.txt" -> "A".getBytes, "b.txt" -> "B".getBytes))
    val mut = tar.clone()
    // turn the first entry into a directory: flip typeflag and re-checksum
    mut(156) = '5'
    java.util.Arrays.fill(mut, 148, 156, ' '.toByte)
    val sum = (0 until 512).map(i => mut(i) & 0xff).sum
    val oct = ("000000" + java.lang.Long.toOctalString(sum)).takeRight(6)
    System.arraycopy(oct.getBytes("US-ASCII"), 0, mut, 148, 6)
    mut(154) = 0; mut(155) = ' '
    assert(entries(mut).get.map(_._1) === Seq("b.txt"))
  }

  test("junk, empty input, and a bare zero-block archive") {
    assert(entries("definitely not a tar archive, far too short".getBytes ++
      Array.fill[Byte](600)(7)) === None)
    assert(entries(Array.emptyByteArray) === None)
    assert(entries(Array.fill[Byte](1024)(0)) === Some(Seq())) // valid empty archive
  }

  test("pack refuses oversize and empty names, null payloads") {
    assert(pack(Seq(("x" * 101) -> "p".getBytes)) === null)
    assert(pack(Seq("" -> "p".getBytes)) === null)
    assert(pack(Seq("ok.txt" -> null)) === null)
  }

  /** A hand-built ustar entry (header + padded payload) with a valid
    * checksum — for extension typeflags tarPack never emits. */
  private def rawEntry(name: String, typeflag: Char, payload: Array[Byte]): Array[Byte] = {
    val padded = ((payload.length + 511) / 512) * 512
    val out = new Array[Byte](512 + padded)
    val nb = name.getBytes("UTF-8")
    System.arraycopy(nb, 0, out, 0, nb.length)
    def oct(off: Int, width: Int, v: Long): Unit = {
      var x = v; var i = off + width - 2
      while (i >= off) { out(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
      out(off + width - 1) = 0
    }
    oct(100, 8, 420); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, payload.length.toLong); oct(136, 12, 0)
    out(156) = typeflag.toByte
    System.arraycopy("ustar".getBytes, 0, out, 257, 5)
    out(263) = '0'; out(264) = '0'
    java.util.Arrays.fill(out, 148, 156, ' '.toByte)
    val sum = (0 until 512).map(i => out(i) & 0xff).sum
    oct(148, 7, sum.toLong); out(155) = ' '
    System.arraycopy(payload, 0, out, 512, payload.length)
    out
  }

  test("GNU longname ('L') entry renames the following file entry") {
    val longName = "dir/" + ("a" * 120) + "/sample-000123.txt" // > 100 bytes
    val tar = rawEntry("././@LongLink", 'L', (longName + "\u0000").getBytes("UTF-8")) ++
      pack(Seq(longName.take(100) -> "payload".getBytes))
    val out = entries(tar).get
    assert(out.map(_._1) === Seq(longName))
    assert(new String(out.head._3, "UTF-8") === "payload")
  }

  test("PAX extended header ('x') path record renames the following entry; 'g' does not") {
    val longName = "corpus/" + ("b" * 110) + ".json"
    val rec = s" path=$longName\n"
    val len = (rec.length + 2 + 1) // 2-3 digit length prefix counts itself
    val full = s"$len$rec"
    assert(full.length === len, "PAX record length must self-count")
    val pax = rawEntry("pax_hdr", 'x', full.getBytes("UTF-8"))
    val tar = pax ++ pack(Seq("short.json" -> "J".getBytes))
    assert(entries(tar).get.map(_._1) === Seq(longName))
    // a 'g' global header must NOT rename the next entry
    val g = rawEntry("pax_global", 'g', full.getBytes("UTF-8"))
    val tar2 = g ++ pack(Seq("short.json" -> "J".getBytes))
    assert(entries(tar2).get.map(_._1) === Seq("short.json"))
  }

  test("a non-file entry between extension and file consumes the pending name") {
    val tar0 = pack(Seq("a.txt" -> "A".getBytes))
    // L-entry, then a directory entry, then the file: the dir consumes the name
    val l = rawEntry("././@LongLink", 'L', "renamed.txt\u0000".getBytes)
    val d = rawEntry("somedir/", '5', Array.emptyByteArray)
    assert(entries(l ++ d ++ tar0).get.map(_._1) === Seq("a.txt"))
  }

  test("SQL registration: tar_pack / tar_entries round-trip in pure SQL") {
    graft.ext.GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT e.name, e.size, decode(e.payload, 'UTF-8') AS text
        |FROM (SELECT explode(tar_entries(tar_pack(array(
        |  struct('d1.txt' AS name, encode('alpha', 'UTF-8') AS payload),
        |  struct('d2.txt' AS name, encode('beta', 'UTF-8') AS payload))))) AS e)
        |ORDER BY e.name""".stripMargin).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq(("d1.txt", 5L, "alpha"), ("d2.txt", 4L, "beta")))
  }
}
