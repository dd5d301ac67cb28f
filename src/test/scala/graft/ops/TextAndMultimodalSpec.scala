package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAndMultimodalSpec extends SparkSpec {

  "Text metrics" should "count tokens, punctuation, and stopwords" in {
    import spark.implicits._
    val df = Seq("The data table is big, really big!").toDF("text")
    val r = df.select(
      Text.tokenCount(col("text")).as("ws"),
      Text.alphaTokenCount(col("text")).as("alpha"),
      Text.punctCount(col("text")).as("punct"),
      Text.stopwordCount(col("text"), Text.langMarkers("en")).as("stop"))
      .collect()(0)
    r.getInt(0) shouldBe 7 // whitespace tokens
    r.getInt(1) shouldBe 7 // letter runs
    r.getInt(2) shouldBe 2 // ',' and '!'
    r.getInt(3) shouldBe 4 // the, data, table, is
  }

  "langId" should "pick the marker-heavy language deterministically" in {
    import spark.implicits._
    val (_, guess) = Text.langId(col("text"))
    val out = Seq(
      "the data table is in the database",
      "el datos y la tabla en consulta",
      "no markers whatsoever xyz qqq"
    ).toDF("text").select(guess.as("g")).collect().map(_.getString(0))
    out(0) shouldBe "en"
    out(1) shouldBe "es"
    out(2) shouldBe "de" // all-zero tie → first language alphabetically
  }

  "PII scrubbing" should "count and redact every pattern category" in {
    import spark.implicits._
    val df = Seq(
      "mail a.user+tag@sub.example.org or b@x.co now",
      "call 555-010-0042 or 555.010.9999 today",
      "ssn 123-45-6789 host 10.0.3.1 and 192.168.0.255",
      "no pii here at all").toDF("text")
    val out = df.select(
      (Text.piiCounts(col("text")).map { case (n, c) => c.as(s"n_$n") } :+
        Text.redactPii(col("text")).as("red")): _*).collect()
    // (n_email, n_ssn, n_phone, n_ipv4, redacted)
    out(0).getInt(0) shouldBe 2
    out(0).getString(4) shouldBe "mail <EMAIL> or <EMAIL> now"
    out(1).getInt(2) shouldBe 2
    out(1).getString(4) shouldBe "call <PHONE> or <PHONE> today"
    out(2).getInt(1) shouldBe 1
    out(2).getInt(3) shouldBe 2
    out(2).getString(4) shouldBe "ssn <SSN> host <IPV4> and <IPV4>"
    out(3).getString(4) shouldBe "no pii here at all"
    // redaction is a fixpoint: re-counting on redacted finds nothing
    val resid = df.select(Text.redactPii(col("text")).as("r"))
      .select(Text.piiCounts(col("r")).map(_._2).reduce(_ + _).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    resid shouldBe 0L
  }

  "decontaminate" should "flag exactly the docs sharing an n-gram with the eval set" in {
    import spark.implicits._
    val cands = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 'alpha beta gamma delta'
      (2L, "zeta eta theta iota kappa"),      // clean
      (3L, "one two three four alpha beta gamma delta")) // shares, 1 overlap
      .toDF("doc_id", "text")
    val ev = Seq((100L, "alpha beta gamma delta unrelated tail")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(cands, ev, "text", "doc_id", n = 4)
      .orderBy(col("doc_id")).collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq shouldBe Seq(
      (1L, 1L, true), // shares exactly 'alpha beta gamma delta'
      (2L, 0L, false),
      (3L, 1L, true))
  }

  it should "match the inline path from a persisted eval index, reading only the index" in {
    import spark.implicits._
    val cands = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "one two three four alpha beta gamma delta")).toDF("doc_id", "text")
    val ev = Seq((100L, "alpha beta gamma delta unrelated tail")).toDF("doc_id", "text")
    val idx = tmpDir("decontam-index")
    Dedup.writeEvalShingleIndex(ev, "text", "doc_id", idx)
    val indexed = Dedup.decontaminateIndexed(cands, idx, "text", "doc_id", n = 4)
    indexed.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq shouldBe
      Dedup.decontaminate(cands, ev, "text", "doc_id", n = 4)
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    // the eval side is consulted ONLY through the stored hashes
    indexed.queryExecution.executedPlan.toString should include("decontam-index")
    // index rebuild overwrites the prior epoch cleanly
    Dedup.writeEvalShingleIndex(ev, "text", "doc_id", idx)
    spark.read.parquet(s"$idx/shingles").count() shouldBe 3L // distinct 4-grams of the eval doc
  }

  it should "derive the shingle width from the index meta and reject drift" in {
    import spark.implicits._
    val cands = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val ev = Seq((100L, "alpha beta gamma delta unrelated tail")).toDF("doc_id", "text")
    val idx = tmpDir("decontam-index-meta")
    Dedup.writeEvalShingleIndex(ev, "text", "doc_id", idx, n = 3)
    // width comes from the stored meta, not the callee default of 4
    val derived = Dedup.decontaminateIndexed(cands, idx, "text", "doc_id")
    derived.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq shouldBe
      Dedup.decontaminate(cands, ev, "text", "doc_id", n = 3)
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    // an explicitly-drifted caller width fails loudly
    an[IllegalArgumentException] should be thrownBy
      Dedup.decontaminateIndexed(cands, idx, "text", "doc_id", n = 4)
  }

  "WordShingles" should "agree with the declarative shingle expression" in {
    import spark.implicits._
    graft.functions.WordShingles.register(spark)
    val df = Seq("a b c d e", "one two", " Mixed  CASE   words here ").toDF("text")
    val native = df.select(
      graft.functions.WordShingles.wordShingles("text", 3).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    val declarative = df
      .select(Text.tokens(col("text")).as("w"))
      .select(Text.shinglesFromWords(col("w"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    native.toSeq shouldBe declarative.toSeq
  }

  "WordShingleHashes" should "equal xxhash64 of the string shingles, in order" in {
    import spark.implicits._
    graft.functions.WordShingles.register(spark)
    graft.functions.WordShingleHashes.register(spark)
    val df = Seq(
      "a b c d e", "one two", " Mixed  CASE   words here ",
      "dup dup dup dup dup", "").toDF("text")
    // hashed form must be reproducible from the string form in plain
    // SQL: xxhash64(shingle) element-wise (the audit/migration path)
    val viaStrings = df.selectExpr(
        "transform(word_shingles(text, 3), s -> xxhash64(s)) AS h")
      .collect().map(_.getSeq[Long](0).toList)
    val native = df.selectExpr("word_shingle_hashes(text, 3) AS h")
      .collect().map(_.getSeq[Long](0).toList)
    native.toSeq shouldBe viaStrings.toSeq
    native.head.size shouldBe 3 // "a b c d e" → 3 distinct 3-shingles
  }

  "Multimodal multi-frame codec" should "walk concatenated P6 frames and decode sampled luma" in {
    import spark.implicits._
    // 100 source bytes at 48/frame → 3 frames (48, 48, 4 source
    // bytes); stride 2 samples frames 0 and 2, SKIPPING frame 1's
    // pixel decode (header-only hop)
    val src = Array.tabulate[Byte](100)(i => (i + 1).toByte)
    val blobs = Seq(Multimodal.MediaBlob(1L, "en",
      Multimodal.Ppm.encodeFramesFromBytes(src, 48))).toDS()
    val frames = Multimodal.sampleFrames(spark, blobs, stride = 2)
      .collect().sortBy(_.frame_idx)
    frames.map(_.frame_idx).toSeq shouldBe Seq(0, 2)
    // frame 0: 48 bytes → h = 2 → 16 px; frame 2: 4 bytes → h = 1 → 8 px
    frames(0).n_pixels shouldBe 16L
    frames(1).n_pixels shouldBe 8L
    // frame 2's pixels are the LAST slice's bytes cycled — hand-decode
    val slice = src.drop(96)
    val px = Array.tabulate(8) { j =>
      (299 * (slice((3 * j) % 4) & 0xff) +
        587 * (slice((3 * j + 1) % 4) & 0xff) +
        114 * (slice((3 * j + 2) % 4) & 0xff)) / 1000
    }
    frames(1).sum_gray shouldBe px.map(_.toLong).sum
    frames(1).min_gray shouldBe px.min
    frames(1).max_gray shouldBe px.max
  }

  it should "fail loudly on a truncated final frame" in {
    val full = Multimodal.Ppm.encodeFramesFromBytes(Array.fill[Byte](100)(7), 48)
    val h0 = Multimodal.Ppm.parseHeaderAt(full, 0)
    val o1 = h0.pixelOffset + 3 * h0.width * h0.height
    val h1 = Multimodal.Ppm.parseHeaderAt(full, o1)
    val o2 = h1.pixelOffset + 3 * h1.width * h1.height
    // a demuxer that guesses is worse than one that fails: the third
    // frame's raster is 3 bytes short → parse must throw, not slice
    intercept[IllegalArgumentException](
      Multimodal.Ppm.parseHeaderAt(full.dropRight(3), o2))
  }

  it should "encode empty sources as one black frame" in {
    import spark.implicits._
    val blobs = Seq(Multimodal.MediaBlob(2L, "en",
      Multimodal.Ppm.encodeFramesFromBytes(Array.emptyByteArray, 48))).toDS()
    val frames = Multimodal.sampleFrames(spark, blobs, stride = 2).collect()
    frames.map(f => (f.frame_idx, f.n_pixels, f.sum_gray)).toSeq shouldBe
      Seq((0, 8L, 0L))
  }

  "Text.ngramsAll" should "keep duplicate n-grams (unlike shinglesFromWords)" in {
    import spark.implicits._
    val df = Seq("a b a b a", "x", "").toDF("text")
      .withColumn("ws", Text.tokens(col("text")))
      .select(Text.ngramsAll(col("ws"), 2).as("g2"),
        Text.shinglesFromWords(col("ws"), 2).as("s2"))
    val rows = df.collect().map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    rows(0)._1 shouldBe Seq("a b", "b a", "a b", "b a") // duplicates kept
    rows(0)._2 shouldBe Seq("a b", "b a")               // distinct twin
    rows(1)._1 shouldBe Seq.empty                       // 1 token → no 2-grams
    rows(2)._1 shouldBe Seq.empty                       // "" → [""] → no 2-grams
  }

  "Text.spanCorrupt" should "mask reversibly with dense sentinels" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val originals = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val rows = Text.spanCorrupt(docs, "text", "doc_id", seed = 7L)
      .collect()
    rows.length shouldBe 500
    val sentinel = "<extra_id_(\\d+)>".r
    var masked = 0L
    rows.foreach { r =>
      val (n, nSpans, nMasked) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val corrupted = r.getString(4)
      val target = r.getString(5)
      nMasked should be >= nSpans
      masked += nMasked
      // sentinels are dense 0..n_spans−1 and appear in order in BOTH
      sentinel.findAllMatchIn(corrupted).map(_.group(1).toLong).toSeq shouldBe
        (0L until nSpans)
      sentinel.findAllMatchIn(target).map(_.group(1).toLong).toSeq shouldBe
        (0L until nSpans)
      // RECONSTRUCTION: splicing each sentinel's target span back into
      // the corrupted stream rebuilds the original token stream
      val spans = target.split(" ").filter(_.nonEmpty)
        .foldLeft(Vector.empty[Vector[String]]) { (acc, t) =>
          if (sentinel.pattern.matcher(t).matches()) acc :+ Vector()
          else acc.init :+ (acc.last :+ t)
        }
      val rebuilt = corrupted.split(" ").filter(_.nonEmpty).flatMap { t =>
        sentinel.findFirstMatchIn(t) match {
          case Some(m) => spans(m.group(1).toInt)
          case None => Seq(t)
        }
      }.toSeq
      rebuilt shouldBe originals(r.getLong(0))
      rebuilt.length.toLong shouldBe n
    }
    masked should be > 0L // the draw actually fires on the corpus
    // seed determinism + seed sensitivity
    val again = Text.spanCorrupt(docs, "text", "doc_id", seed = 7L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    Text.spanCorrupt(docs, "text", "doc_id", seed = 7L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq shouldBe again
    Text.spanCorrupt(docs, "text", "doc_id", seed = 8L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq should not be again
  }

  "Multimodal.Wav" should "round-trip encode → chunk walk → PCM decode" in {
    for (n <- Seq(1, 2, 3, 48, 553)) {
      val src = Array.tabulate(n)(i => ((i * 31 + 7) % 128).toByte)
      val payload = Multimodal.Wav.encodeFromBytes(src)
      val hd = Multimodal.Wav.parseHeader(payload)
      val ns = math.max(1, (n + 1) / 2)
      (hd.channels, hd.sampleRate, hd.bitsPerSample) shouldBe ((1, 8000, 16))
      hd.nSamples shouldBe ns
      val s = Multimodal.Wav.samples(payload)
      s.length shouldBe ns
      (0 until ns).foreach { j =>
        val lo = src((2 * j) % n) & 0xff
        val hi = src((2 * j + 1) % n) & 0xff
        s(j) shouldBe (lo | (hi << 8))
      }
    }
    // empty source → one silent sample
    Multimodal.Wav.samples(
      Multimodal.Wav.encodeFromBytes(Array.empty[Byte])).toSeq shouldBe Seq(0)
  }

  it should "decode negative samples via 16-bit sign extension" in {
    // craft a data chunk whose hi byte sets the sign bit
    val src = Array(0x34.toByte, 0xff.toByte) // raw 0xff34 = 65332
    val s = Multimodal.Wav.samples(Multimodal.Wav.encodeFromBytes(src))
    s.toSeq shouldBe Seq(65332 - 65536)
  }

  it should "skip unknown chunks and reject malformed RIFF payloads" in {
    // the encoder plants a 'note' filler chunk between fmt and data —
    // the round-trip above only works if the walker skips it; here a
    // parser that trusted fixed offsets would have failed already.
    val good = Multimodal.Wav.encodeFromBytes(Array[Byte](1, 2, 3, 4))
    Multimodal.Wav.parseHeader(good).nSamples shouldBe 2
    def mutate(bytes: Array[Byte], at: Int, v: Byte) = {
      val c = bytes.clone(); c(at) = v; c
    }
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Wav.parseHeader(mutate(good, 0, 'X'.toByte)) // magic
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Wav.parseHeader(mutate(good, 4, 99.toByte)) // RIFF size lies
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Wav.parseHeader(good.take(20)) // no data chunk reached
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Wav.parseHeader(good.dropRight(1)) // truncated data
  }

  "Multimodal.Ppm" should "round-trip encode → header parse" in {
    for (n <- Seq(1, 23, 24, 25, 240, 577)) {
      val src = Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)
      val payload = Multimodal.Ppm.encodeFromBytes(src)
      val hd = Multimodal.Ppm.parseHeader(payload)
      val h = math.max(1, (n + 23) / 24)
      hd.width shouldBe 8
      hd.height shouldBe h
      hd.maxVal shouldBe 255
      payload.length shouldBe hd.pixelOffset + 24 * h
      // raster = src cycled
      (0 until 24 * h).foreach { k =>
        payload(hd.pixelOffset + k) shouldBe src(k % n)
      }
    }
    // empty source → one black row
    val empty = Multimodal.Ppm.encodeFromBytes(Array.empty[Byte])
    val hd = Multimodal.Ppm.parseHeader(empty)
    (hd.width, hd.height) shouldBe ((8, 1))
    Multimodal.Ppm.grayPixels(empty).toSeq shouldBe Seq.fill(8)(0)
  }

  it should "parse netpbm comments and whitespace runs" in {
    val raster = Array.tabulate(6)(_.toByte)
    val header = "P6\n# a comment\n 2 # trailing\n\t1\r\n255\n"
      .getBytes("US-ASCII")
    val hd = Multimodal.Ppm.parseHeader(header ++ raster)
    (hd.width, hd.height, hd.maxVal) shouldBe ((2, 1, 255))
    hd.pixelOffset shouldBe header.length
  }

  it should "nearest-neighbor resize real rasters pixel-exactly" in {
    import spark.implicits._
    // 8x1 raster whose pixel j is RGB (j, j, j): easy to track samples
    val px = (0 until 8).flatMap(j => Seq(j, j, j)).map(_.toByte).toArray
    val payload = "P6\n8 1\n255\n".getBytes("US-ASCII") ++ px
    val blobs = Seq(Multimodal.MediaBlob(1L, "en", payload)).toDS()
    val out = Multimodal.resizePpm(spark, blobs, newW = 4, newH = 1)
      .collect().head
    val hd = Multimodal.Ppm.parseHeader(out.payload)
    (hd.width, hd.height) shouldBe ((4, 1))
    // output col c samples source col c*8/4 = 2c -> pixels 0,2,4,6
    Multimodal.Ppm.grayPixels(out.payload).toSeq shouldBe Seq(0, 2, 4, 6)
    // upscale is legal too: each source pixel repeats
    val up = Multimodal.resizePpm(spark, blobs, newW = 16, newH = 1)
      .collect().head
    Multimodal.Ppm.grayPixels(up.payload).toSeq shouldBe
      (0 until 16).map(_ / 2)
  }

  it should "decode BT.601 integer luma per RGB triplet" in {
    val px = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30)
      .map(_.toByte)
    val payload = "P6\n4 1\n255\n".getBytes("US-ASCII") ++ px
    Multimodal.Ppm.grayPixels(payload).toSeq shouldBe
      Seq(299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000,
        (299 * 10 + 587 * 20 + 114 * 30) / 1000)
  }

  it should "fail loudly on malformed and hostile payloads" in {
    def p(s: String, raster: Int = 0) =
      s.getBytes("US-ASCII") ++ new Array[Byte](raster)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Ppm.parseHeader(p("P5\n1 1\n255\n", 3)) // wrong magic
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Ppm.parseHeader(p("P6\n1 1\n15\n", 3)) // maxval
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Ppm.parseHeader(p("P6\n0 1\n255\n")) // degenerate
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Ppm.parseHeader(p("P6\n2 1\n255\n", 3)) // truncated
    // header integer past the sane bound fails the PARSE, not the math
    an[IllegalArgumentException] should be thrownBy
      Multimodal.Ppm.parseHeader(p("P6\n99999999999 1\n255\n", 3))
    // w·h·3 overflows Int (1M × 1M within per-dim bound): must be the
    // clean truncation error, never NegativeArraySizeException
    val e = the[IllegalArgumentException] thrownBy
      Multimodal.Ppm.grayPixels(p("P6\n1000000 1000000\n255\n", 3))
    e.getMessage should include("truncated raster")
  }

  "Multimodal real-codec pipelines" should "decode metadata from real P6 containers" in {
    import spark.implicits._
    val docs = Seq((1L, "en", "x" * 47), (2L, "de", "y" * 24))
      .toDF("doc_id", "lang", "text")
    val meta = Multimodal.mediaMetaPipeline(spark, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))).toMap
    // 47 bytes → h=2, container = "P6\n8 2\n255\n"(11) + 48
    meta(1L) shouldBe ((59, 8, 2, "ppm"))
    meta(2L) shouldBe ((35, 8, 1, "ppm"))
  }

  it should "blockhash the decoded luma stream" in {
    import spark.implicits._
    // 48 source bytes → h=2 → 16 gray pixels: first 24 bytes 0x00,
    // last 24 bytes 0xFF → gray = 8×0 then 8×255 (luma weights sum
    // to 1000, so 0xFF triplets decode to exactly 255)
    val src = new Array[Byte](24) ++ Array.fill(24)(0xFF.toByte)
    val blobs = Seq(Multimodal.MediaBlob(7L, "en",
      Multimodal.Ppm.encodeFromBytes(src))).toDS()
    val h = Multimodal.blockhash64Gray(spark, blobs).collect().head.phash
    // 16 pixels → cells 0..63 get ≤1 px (cell = j*64/16 = 4j); dark
    // pixels (0) below mean, bright (255) above → bits 4j for j=8..15
    val expect = (8 until 16).map(j => 1L << (4 * j)).reduce(_ | _)
    h shouldBe expect
  }

  "Multimodal.blockhash64" should "set exactly the above-mean cells" in {
    import spark.implicits._
    // 128 bytes: first half 'a' (97), second half 'z' (122) → 2 bytes
    // per cell, global mean 109.5 → exactly cells 32..63 above mean
    val payload = Array.fill(64)('a'.toByte) ++ Array.fill(64)('z'.toByte)
    val blobs = Seq(Multimodal.MediaBlob(1L, "en", payload)).toDS()
    val h = Multimodal.blockhash64(spark, blobs).collect().head.phash
    h shouldBe 0xFFFFFFFF00000000L
  }

  it should "hash empty and shorter-than-64-byte payloads deterministically" in {
    import spark.implicits._
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "en", Array.empty[Byte]),
      // "ab": byte 0 ('a'=97) → cell 0, byte 1 ('b'=98) → cell 32;
      // global mean 97.5 → only cell 32 above; 62 empty cells stay 0
      Multimodal.MediaBlob(2L, "en", "ab".getBytes("UTF-8"))).toDS()
    val m = Multimodal.blockhash64(spark, blobs)
      .collect().map(p => p.doc_id -> p.phash).toMap
    m(1L) shouldBe 0L
    m(2L) shouldBe (1L << 32)
  }

  it should "mine perceptual near-dup pairs via the banded hamming kernel" in {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val edited = base.replace("quick", "quack")
    val other = "completely different content about spark engines " * 8
    val docs = Seq((1L, base), (2L, edited), (3L, other), (4L, base))
      .toDF("doc_id", "text")
    val blobs = docs
      .select(col("doc_id"), lit("en").as("lang"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Multimodal.MediaBlob]
    val sigs = Multimodal.blockhash64(spark, blobs).toDF()
    val sigMap = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigMap(a) ^ sigMap(b))
    // exact copy → identical hash; light edit → closer than unrelated
    ham(1L, 4L) shouldBe 0
    ham(1L, 2L) should be < ham(1L, 3L)
    // the banded miner returns EXACTLY the brute-force hamming ball
    val pairs = Dedup.hammingNearDups(sigs, "doc_id", "phash", maxHamming = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      a <- sigMap.keys; b <- sigMap.keys
      if a < b && java.lang.Long.bitCount(sigMap(a) ^ sigMap(b)) <= 15
    } yield (a, b)).toSet
    pairs shouldBe brute
    pairs should contain((1L, 4L))
  }

  "Text.chunks" should "produce overlapping windows that cover every token" in {
    import spark.implicits._
    val words113 = (1 to 113).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words113), (2L, "just five little words here")).toDF("doc_id", "text")
    val out = Text.chunks(docs, "text", "doc_id", chunkSize = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // 113 tokens, step 48 → ceil((113-16)/48) = 3 chunks at starts 0/48/96
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    d1.map(_._2).toSeq shouldBe Seq(0, 1, 2)
    d1.map(_._4).toSeq shouldBe Seq(64, 64, 17)
    d1(0)._3.split(" ").head shouldBe "w1"
    d1(1)._3.split(" ").head shouldBe "w49"  // start 48 → token 49
    d1(1)._3.split(" ").take(16).toSeq shouldBe
      d1(0)._3.split(" ").takeRight(16).toSeq // the 16-token overlap
    d1(2)._3.split(" ").last shouldBe "w113"
    // short doc → exactly one whole-doc chunk
    val d2 = out.filter(_._1 == 2L)
    d2.length shouldBe 1
    d2(0)._3 shouldBe "just five little words here"
    d2(0)._4 shouldBe 5
  }

  it should "validate Luhn checksums with length and charset guards" in {
    import spark.implicits._
    val cases = Seq(
      ("4539578763621486", true),   // canonical 16-digit valid
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),  // checksum off by one
      ("79927398713", false),       // Luhn-valid but < 13 digits
      ("4539578763621486123456", false), // > 19 digits
      ("4539a78763621486", false),  // non-digit
      ("", false)
    ).toDF("digits", "want")
    val got = cases.withColumn("ok", Text.luhnValid(col("digits")))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    got.foreach { case (d, want, ok) =>
      withClue(s"'$d': ") { ok shouldBe want }
    }
  }
}
