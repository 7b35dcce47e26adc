package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{GraftStream, SaltedAgg}
import graft.functions.TextFunctions
import graft.functions.expressions.WinnowExpr

/** Property-based checks for the native expressions and algebraic
  * operator identities. */
class PropertySpec extends AnyFunSuite with SparkFixture {

  /** Minimal forAll: evaluate the property on `n` fresh samples. */
  private def forSamples[A](gen: Gen[A], n: Int = 50)(body: A => Unit): Unit =
    (0 until n).foreach(_ => body(gen.sample.get))

  private val word = Gen.stringOfN(4, Gen.alphaLowerChar)
  private val text = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def winnow(s: String, k: Int, w: Int): Set[Long] =
    WinnowExpr(org.apache.spark.sql.catalyst.expressions.Literal(s), k, w)
      .nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map(_.asInstanceOf[Long]).toSet

  test("AVI container round-trip: write(frames) parses back byte-identical") {
    // Odd-length payloads are the interesting case — RIFF word alignment
    // inserts a pad byte after them, the classic parser off-by-one.
    import graft.multimodal.AviMjpegDecoder
    val payload = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))).map(_.toArray)
    val framesGen = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, payload))
    forSamples(framesGen, n = 60) { frames =>
      val parsed = AviMjpegDecoder.framePayloads(AviMjpegDecoder.write(frames))
      assert(parsed.isDefined)
      assert(parsed.get.length == frames.length)
      parsed.get.zip(frames).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), "frame bytes corrupted in round-trip")
      }
    }
    assert(AviMjpegDecoder.framePayloads("RIFFxxxx".getBytes("UTF-8")).isEmpty)
    assert(AviMjpegDecoder.framePayloads(Array[Byte]()).isEmpty)
  }

  test("HLL registers equal a local brute-force construction on random ids") {
    import graft.functions.Sketches
    import spark.implicits._
    val idsGen = Gen.chooseNum(1, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 5000L)))
    // one sampled corpus is enough — the property is per-value determinism
    val ids = idsGen.sample.get
    val got = Sketches.hllRegisters(ids.toDF("v"), Seq.empty, "v")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val expected = ids.map { v =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = Integer.parseInt(hex.substring(0, 2), 16)
      val tail = java.lang.Long.parseLong(hex.substring(2, 16), 16)
      val rank = if (tail == 0L) 57 else 57 - (64 - java.lang.Long.numberOfLeadingZeros(tail))
      (b, rank)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got == expected)
  }

  test("winnow guarantee: a shared substring of length >= w+k-1 yields a shared fingerprint") {
    val k = 8; val w = 12
    forSamples(Gen.zip(text, text, Gen.stringOfN(k + w - 1, Gen.alphaLowerChar))) {
      case (a, b, shared) =>
        val fa = winnow(a + " " + shared, k, w)
        val fb = winnow(shared + " " + b, k, w)
        assert((fa & fb).nonEmpty, "no shared fingerprint for planted substring")
    }
  }

  test("winnow deque selection equals the naive per-window rightmost-min") {
    val k = 4; val w = 5
    forSamples(text, n = 80) { t =>
      val s = t.toLowerCase
      if (s.length >= k) {
        // naive reference: recompute each window's rightmost min
        val B = 1000000007L
        val m = s.length - k + 1
        val hs = new Array[Long](m)
        var pow = 1L
        (1 until k).foreach(_ => pow *= B)
        var h = 0L
        (0 until k).foreach(i => h = h * B + s.charAt(i))
        hs(0) = h
        (1 until m).foreach { i =>
          h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1); hs(i) = h
        }
        val expected =
          if (m <= w) Set(hs.zipWithIndex.minBy { case (v, i) => (v, -i) }._1)
          else (0 to m - w).map { st =>
            (st until st + w).map(j => (hs(j), -j)).min._1
          }.toSet
        assert(winnow(t, k, w) == expected)
      }
    }
  }

  test("winnow is invariant to case (lowercasing is internal)") {
    forSamples(text) { t =>
      assert(winnow(t.toUpperCase, 8, 12) == winnow(t, 8, 12))
    }
  }

  test("ShingleExpr equals the Column-composed wordShingles on random texts") {
    import spark.implicits._
    val samples = Gen.listOfN(60, text).sample.get
    val df = samples.toDF("text")
    val viaExpr = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.ShingleExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(F.col("text")), 3))
    val viaCols = TextFunctions.wordShingles(TextFunctions.tokens(F.col("text")), 3)
    val diff = df.select(viaExpr.as("a"), viaCols.as("b"))
      .filter(F.col("a") =!= F.col("b")).count()
    assert(diff == 0)
  }

  test("TokenTfExpr counts equal the explode+groupBy counts on random texts") {
    import spark.implicits._
    val samples = Gen.listOfN(60, text).sample.get
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val tfArr = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(F.col("text"))))
    val viaExpr = df.select(F.col("id"), F.explode(tfArr).as("tt"))
      .select(F.col("id"), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaAgg = df.select(F.col("id"),
        F.explode(TextFunctions.tokens(F.col("text"))).as("tok"))
      .groupBy("id", "tok").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaExpr == viaAgg)
  }

  test("SortedIntersectCountExpr equals size(array_intersect) on random sorted sets") {
    import graft.functions.expressions.SortedIntersectCountExpr
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val setGen = for {
      n <- Gen.chooseNum(0, 60)
      xs <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    } yield xs.distinct.sorted.toArray
    forSamples(Gen.zip(setGen, setGen), n = 200) { case (a, b) =>
      val expr = SortedIntersectCountExpr(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))
      val got = expr.nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
        .asInstanceOf[Long]
      val want = a.toSet.intersect(b.toSet).size.toLong
      assert(got == want, s"merge count $got != set count $want for ${a.toSeq} ∩ ${b.toSeq}")
    }
  }

  test("SortedPairMinSumExpr equals the brute intersection min-sum on random tf vectors") {
    import graft.functions.expressions.SortedPairMinSumExpr
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    val vecGen = for {
      n <- Gen.chooseNum(0, 40)
      toks <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
      tfs <- Gen.listOfN(n, Gen.chooseNum(1L, 50L))
    } yield toks.distinct.sorted.zip(tfs)
    def arr(v: Seq[(Long, Long)]): GenericArrayData =
      new GenericArrayData(v.map { case (t, f) =>
        InternalRow(t, f): Any
      }.toArray)
    forSamples(Gen.zip(vecGen, vecGen), n = 200) { case (a, b) =>
      val got = SortedPairMinSumExpr.minSum(arr(a), arr(b))
      val bm = b.toMap
      val want = a.collect { case (t, f) if bm.contains(t) => math.min(f, bm(t)) }.sum
      assert(got == want, s"merge min-sum $got != brute $want for $a ∩ $b")
    }
  }

  test("XxHash64ArrayExpr output is sorted and hash-faithful") {
    import graft.functions.expressions.XxHash64ArrayExpr
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.XXH64
    forSamples(Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word)), n = 100) { words =>
      val arr = new GenericArrayData(words.map(w => UTF8String.fromString(w)).toArray[Any])
      val expr = XxHash64ArrayExpr(org.apache.spark.sql.catalyst.expressions.Literal("x"))
      val out = expr.nullSafeEval(arr)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData]
      val got = (0 until out.numElements()).map(out.getLong)
      assert(got == got.sorted, s"unsorted hash output: $got")
      val want = words.map { w =>
        val u = UTF8String.fromString(w)
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }.sorted
      assert(got == want, "hash values diverge from XXH64 seed-42 convention")
    }
  }

  test("dupNgramFraction equals a local brute-force on random corpora") {
    import spark.implicits._
    val corpusGen = Gen.chooseNum(5, 15).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(3, 12).flatMap(m => Gen.listOfN(m,
        Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" ")))))
    forSamples(corpusGen, n = 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.dedup.Dedup.dupNgramFraction(docs, shingleN = 3).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // brute force: distinct 3-gram sets per doc, df over the corpus
      val sets = texts.zipWithIndex.map { case (t, i) =>
        val w = t.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty)
        i.toLong -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
      val df = sets.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
      sets.foreach { case (id, gs) =>
        if (gs.isEmpty) assert(!got.contains(id))
        else {
          val nDup = gs.count(g => df(g) > 1).toLong
          assert(got(id) == ((gs.size.toLong, nDup)),
            s"doc $id: got ${got(id)}, want (${gs.size}, $nDup)")
        }
      }
    }
  }

  test("UnigramLm.score equals a local brute-force on random corpora") {
    import spark.implicits._
    val corpusGen = Gen.chooseNum(4, 10).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(1, 10).flatMap(m => Gen.listOfN(m,
        Gen.oneOf("x", "yy", "zzz", "w")).map(_.mkString(" ")))))
    forSamples(corpusGen, n = 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.functions.UnigramLm.score(docs).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val toks = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
      }.toMap
      val cnt = toks.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size }
      val total = cnt.values.sum.toDouble
      toks.foreach { case (id, ts) =>
        if (ts.isEmpty) assert(!got.contains(id))
        else {
          // decimal-sum replica: per-token tf*ln(p) terms, exact sum
          val tf = ts.groupBy(identity).map { case (t, o) => t -> o.size }
          val sum = tf.map { case (t, f) =>
            BigDecimal(f.toDouble * math.log(cnt(t) / total))
              .setScale(18, BigDecimal.RoundingMode.HALF_UP)
          }.sum
          val want = BigDecimal(sum.toDouble / ts.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(got(id) - want) < 1e-9, s"doc $id: got ${got(id)}, want $want")
        }
      }
    }
  }

  test("dupParagraphFraction equals a local brute-force on random corpora") {
    import spark.implicits._
    val K = 3
    // tiny vocab + short docs => plenty of genuine cross-doc block collisions
    val corpusGen = Gen.chooseNum(4, 10).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(0, 9).flatMap(m => Gen.listOfN(m,
        Gen.oneOf("a", "b", "cc")).map(_.mkString(" ")))))
    forSamples(corpusGen, n = 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.dedup.Dedup.dupParagraphFraction(docs, blockTokens = K)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val blocks = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty)
          .grouped(K).map(_.mkString(" ")).toSeq
      }.toMap
      val docsPerBlock = blocks.toSeq
        .flatMap { case (id, bs) => bs.distinct.map(b => (b, id)) }
        .groupBy(_._1).map { case (b, o) => b -> o.size }
      blocks.foreach { case (id, bs) =>
        if (bs.isEmpty) assert(!got.contains(id))
        else {
          val nDup = bs.count(b => docsPerBlock(b) > 1).toLong
          assert(got(id) == ((bs.size.toLong, nDup)),
            s"doc $id: got ${got(id)}, want (${bs.size}, $nDup)")
        }
      }
    }
  }

  test("UnigramLm.score and tokenEntropy return empty on an all-empty corpus") {
    import spark.implicits._
    // Regression (round-9 ADVICE): sum(tf) over the empty filtered table is
    // null; score must not NPE reading it — it must return zero rows, like
    // tokenEntropy and dupNgramFraction do.
    val docs = Seq((1L, ""), (2L, "   "), (3L, "\t\n")).toDF("doc_id", "text")
    assert(graft.functions.UnigramLm.score(docs).collect().isEmpty)
    assert(graft.functions.UnigramLm.tokenEntropy(docs).collect().isEmpty)
  }

  test("chunk reassembles to the original token stream (minus the overlaps)") {
    import spark.implicits._
    import graft.operators.Packing
    forSamples(Gen.zip(text, Gen.chooseNum(4, 12), Gen.chooseNum(0, 3)), n = 25) {
      case (t, size, overlap) =>
        val docs = Seq((1L, t)).toDF("doc_id", "text")
        val stride = size - overlap
        val chunks = Packing.chunk(docs, size, overlap).collect()
          .sortBy(_.getLong(1))
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        // dropping each chunk's leading overlap (except the first) must
        // reassemble the exact token stream
        val reassembled = chunks.zipWithIndex.flatMap { case (r, i) =>
          val ts = r.getString(2).split(" ").toSeq
          if (i == 0) ts else ts.drop(overlap)
        }.toSeq
        assert(reassembled == toks, s"size=$size overlap=$overlap")
        // every chunk except possibly the last is exactly `size` tokens
        chunks.dropRight(1).foreach(r => assert(r.getLong(3) == size))
    }
  }

  test("asofJoin output equals the brute-force argmax on random event sets") {
    import spark.implicits._
    import graft.operators.TemporalJoins
    val ev = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 1000L))).sample.get
      .zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
    val probe = ev.filter(_._1 % 2 == 0).toDF("pid", "k", "ts")
    val build = ev.filter(_._1 % 2 == 1).toDF("bid", "k", "ts")
    val fast = TemporalJoins.asofJoin(probe, build, Seq("k")).collect()
      .map(r => r.getAs[Long]("pid") -> r.getAs[Long]("r_bid")).toMap
    val brute = ev.filter(_._1 % 2 == 0).flatMap { case (pid, k, ts) =>
      val cands = ev.filter(e => e._1 % 2 == 1 && e._2 == k && !e._3.after(ts))
      // impl tie-break: max payload struct == max (ts, bid) lexicographically
      if (cands.isEmpty) None
      else Some(pid -> cands.maxBy(e => (e._3.getTime, e._1))._1)
    }.toMap
    assert(fast == brute)
  }

  test("KM minhash preserves the MinHash property: band collision rate ~= Jaccard") {
    // The round-10 hash family derives all band hashes from ONE md5 via
    // the Kirsch-Mitzenmacher mix lo + b*hi. This guards its statistical
    // quality: for sets with known Jaccard J, P(band signature collision)
    // must be ~= J per band (the property LSH candidate recall rests on),
    // and no band may be degenerate. Sets are built with EXACT overlap:
    // |A| = |B| = n, |A^B| = s => J = s / (2n - s).
    import spark.implicits._
    val n = 60
    for (targetJ <- Seq(0.2, 0.5, 0.8)) {
      val s = math.round(2 * n * targetJ / (1 + targetJ)).toInt
      val j = s.toDouble / (2 * n - s)
      val nPairs = 120
      val rows = (0 until nPairs).flatMap { p =>
        // disjoint token universes per pair: no cross-pair collisions
        def tok(i: Int) = s"p${p}t$i"
        val a = (0 until n).map(tok)
        val b = (0 until s).map(tok) ++ (n until (2 * n - s)).map(tok)
        Seq((2L * p, a.mkString(" ")), (2L * p + 1, b.mkString(" ")))
      }
      val sigs = graft.dedup.Dedup
        .minhashSignaturesFromDocs(rows.toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 1, bands = 8)
        .collect()
        .groupBy(r => r.getLong(0))
        .view.mapValues(_.map(r => r.getInt(1) -> r.getString(2)).toMap).toMap
      val hitsPerBand = Array.fill(8)(0)
      for (p <- 0 until nPairs; b <- 0 until 8)
        if (sigs(2L * p)(b) == sigs(2L * p + 1)(b)) hitsPerBand(b) += 1
      val rate = hitsPerBand.sum.toDouble / (nPairs * 8)
      // 960 Bernoulli trials: 4 sigma of J=0.5 is ~0.065
      assert(math.abs(rate - j) < 0.07,
        f"collision rate $rate%.3f vs jaccard $j%.3f (target $targetJ)")
      // per-band sanity: no band departs from J by more than noise allows
      // (120 trials/band: 4 sigma ~ 0.19)
      hitsPerBand.zipWithIndex.foreach { case (h, b) =>
        assert(math.abs(h.toDouble / nPairs - j) < 0.2,
          f"band $b degenerate: rate ${h.toDouble / nPairs}%.3f vs jaccard $j%.3f")
      }
    }
  }

  test("GopherStatsExpr equals a naive Scala reference on adversarial random text") {
    import graft.functions.expressions.GopherStatsExpr
    // adversarial alphabet: words, digits, bullets, hashes, dots, tabs,
    // CRLF pieces, the unicode bullet — everything the counters parse
    val piece = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaLowerChar), Gen.const("the"), Gen.const("of"),
      Gen.const("THE"), Gen.const("WiTh"),
      Gen.const("123"), Gen.const("#"), Gen.const("..."), Gen.const("...."),
      Gen.const("-"), Gen.const("*"), Gen.const("•"), Gen.const("a#b"),
      Gen.const("x..."), Gen.const(""))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", " \n ", "\f")
    val textGen = Gen.chooseNum(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.zip(piece, sep))).map(_.map { case (p, s) => p + s }.mkString)
    def naive(raw: String) = {
      val lower = raw.toLowerCase(java.util.Locale.ROOT)
      val words = lower.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val stop = Set("the", "be", "to", "of", "and", "that", "have", "with")
      val lines = {
        // split on \n keeping trailing empties (chr(10) split semantics)
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i <= raw.length) {
          var j = raw.indexOf('\n', i); if (j < 0) j = raw.length
          out += raw.substring(i, j); i = j + 1
        }
        out.toSeq
      }
      def lt(s: String) = s.dropWhile(c => c == ' ' || c == '\t')
      def rt(s: String) = s.reverse.dropWhile(c => c == ' ' || c == '\t').reverse
      val dots = "\\.\\.\\.".r // non-overlapping L-to-R, like the scan
      (words.length,
        words.map(w => w.codePointCount(0, w.length).toLong).sum,
        words.count(_.exists(c => c >= 'a' && c <= 'z')),
        words.filter(stop).toSet.size,
        lines.length,
        lines.map(lt).count(l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•")),
        lines.map(rt).count(_.endsWith("...")),
        raw.count(_ == '#').toLong + dots.findAllIn(raw.replace("#", " ")).length)
    }
    forSamples(textGen, n = 120) { raw =>
      val r = GopherStatsExpr.stats(UTF8String.fromString(raw))
      val got = (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getLong(7))
      assert(got == naive(raw), s"stats diverged on ${raw.replace("\n", "\\n")}")
    }
  }

  test("BloomHitsExpr: zero false negatives, and hits equal a naive bit probe") {
    import graft.functions.expressions.BloomHitsExpr
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val mBits = 1 << 10
    val kHashes = 4
    val shingle = Gen.chooseNum(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    def positions(s: String): Seq[Int] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until kHashes).map(j =>
        (java.lang.Long.parseLong(hex.substring(j * 8, j * 8 + 8), 16) % mBits).toInt)
    }
    forSamples(Gen.zip(
      Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, shingle)), // loaded set
      Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, shingle))  // probe set
    ), n = 60) { case (loaded, probeRaw) =>
      val words = new Array[Long](mBits / 64)
      loaded.foreach(s => positions(s).foreach(p => words(p / 64) |= (1L << (p % 64))))
      val probes = probeRaw ++ loaded.take(3) // guarantee some true members
      val expr = BloomHitsExpr(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), words, mBits, kHashes)
      val got = expr.hits(new GenericArrayData(
        probes.map(s => UTF8String.fromString(s)).toArray[Any]))
      val want = probes.count(s => positions(s).forall(p => (words(p / 64) & (1L << (p % 64))) != 0))
      assert(got == want, s"hit count diverged: $got vs $want")
      // no false negatives: every loaded member that is probed must hit
      assert(got >= probes.count(loaded.toSet), "a loaded member failed its own probe")
    }
  }

  test("unimax closed-form prefix condition equals the iterative water-filling reference") {
    import spark.implicits._
    import graft.operators.Sampling
    // the operator decides the capped set with a single monotone prefix
    // condition; the reference computes it the textbook way — loop:
    // grant the smallest cap if it fits under the current fair share,
    // else split the remainder evenly over everyone left
    def naive(caps: Seq[(String, Long)], budget: Long): Map[String, Double] = {
      var remaining = budget.toDouble
      var left = caps.sortBy { case (s, c) => (c, s) }
      val out = scala.collection.mutable.Map[String, Double]()
      while (left.nonEmpty) {
        val fair = remaining / left.length
        val (s, c) = left.head
        if (c.toDouble <= fair) { out(s) = c.toDouble; remaining -= c.toDouble; left = left.tail }
        else { left.foreach { case (s2, _) => out(s2) = fair }; left = Nil }
      }
      out.toMap
    }
    val corpusGen = for {
      n <- Gen.chooseNum(2, 7)
      sizes <- Gen.listOfN(n, Gen.chooseNum(1, 400))
      budget <- Gen.chooseNum(50L, 5000L)
      epochs <- Gen.chooseNum(1, 5)
    } yield (sizes, budget, epochs)
    forSamples(corpusGen, n = 30) { case (sizes, budget, epochs) =>
      // source s_i holds exactly sizes(i) single-letter tokens
      val docs = sizes.zipWithIndex
        .map { case (sz, i) => (s"s$i", Seq.fill(sz)("x").mkString(" ")) }
        .toDF("source", "text")
      val got = Sampling.unimaxWeights(docs, budgetTokens = budget, maxEpochs = epochs)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      val want = naive(sizes.zipWithIndex.map { case (sz, i) =>
        (s"s$i", sz.toLong * epochs) }, budget)
        .map { case (s, a) => s -> math.round(a) }
      assert(got == want,
        s"sizes=$sizes budget=$budget epochs=$epochs: $got vs $want")
    }
  }

  test("aggSalted equals plain agg for any bucket count (associativity)") {
    import spark.implicits._
    val data = Gen.listOfN(500, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(-1000L, 1000L)))
      .sample.get.toDF("k", "v")
    val plain = GraftStream(data).keyLocal(F.col("k"))
      .agg(F.count(F.lit(1)).as("n"), F.sum("v").as("s"), F.max("v").as("m"))
      .toDF.orderBy("k").collect().toSeq
    for (buckets <- Seq(1, 3, 16)) {
      val salted = GraftStream(data).keyLocal(F.col("k"))
        .aggSalted(buckets,
          SaltedAgg.count("n"), SaltedAgg.sum("s", F.col("v")), SaltedAgg.max("m", F.col("v")))
        .toDF.orderBy("k").collect().toSeq
      assert(salted == plain, s"buckets=$buckets diverged")
    }
  }

  test("count-min: estimates dominate exact counts and pruning is phi-monotone") {
    import graft.functions.Sketches
    import spark.implicits._
    val corpusGen = Gen.chooseNum(50, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 60).map(i => s"k$i")))
    forSamples(corpusGen, n = 8) { keys =>
      val df = keys.toDF("key")
      val d = 3; val w = 64
      val regs = Sketches.cmRegisters(df, "key", d, w).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = df.distinct()
        .withColumn("est", Sketches.cmEstimateCol(F.col("key"), regs, d, w))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      est.foreach { case (k, e) =>
        assert(e >= exact(k), s"$k: CM underestimated $e < " + exact(k))
      }
      // row-0 register sum == stream size (the free-total identity)
      assert(regs.collect { case (0, _, n) => n }.sum == keys.size)
      // phi-monotone: a larger threshold's answer is a subset
      val lo = Sketches.heavyHitters(df, "key", 0.02)
        .collect().map(_.getString(0)).toSet
      val hi = Sketches.heavyHitters(df, "key", 0.1)
        .collect().map(_.getString(0)).toSet
      assert(hi.subsetOf(lo), s"phi=0.1 answer $hi not within phi=0.02 answer $lo")
    }
  }

  test("priority sampling is invariant under uniform weight scaling") {
    import graft.operators.Sampling
    import spark.implicits._
    val rowsGen = Gen.chooseNum(30, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 999L)).map(_.zipWithIndex.map {
        case (w, i) => (i.toLong, w)
      }))
    forSamples(rowsGen, n = 8) { rows =>
      val df = rows.toDF("id", "w")
      def ids(wc: org.apache.spark.sql.Column) =
        Sampling.prioritySample(df, "id", wc, k = 10)
          .collect().map(_.getLong(0)).toSet
      // priorities scale uniformly (w/u is linear in w), so the SELECTED
      // SET is scale-free -- the invariance that makes "weight by tokens"
      // and "weight by kilotokens" the same sample
      assert(ids(F.col("w")) == ids(F.col("w") * 1000))
      // zero-weight rows can never outrank any positive-weight row when
      // k <= positive count (priority 0 sorts last)
      val withZero = (rows.map { case (i, w) => (i, w) } :+ ((100000L, 0L))).toDF("id", "w")
      val sel = Sampling.prioritySample(withZero, "id", F.col("w"), k = math.min(10, rows.size))
        .collect().map(_.getLong(0)).toSet
      assert(!sel.contains(100000L), "zero-weight row outranked positive rows")
    }
  }

  test("domainBlocklist matches a brute-force suffix reference on random hosts") {
    import graft.functions.TextFunctions
    import spark.implicits._
    val label = Gen.oneOf("a", "b", "c", "ads", "www", "x")
    val hostGen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, label)).map(_.mkString("."))
    val trial = for {
      hosts <- Gen.chooseNum(20, 60).flatMap(n => Gen.listOfN(n, hostGen))
      bl <- Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, hostGen))
    } yield (hosts, bl.filter(_.contains(".")).distinct)
    forSamples(trial, n = 10) { case (hosts, bl) =>
      if (bl.nonEmpty) {
        val docs = hosts.zipWithIndex
          .map { case (h, i) => (i.toLong, s"https://$h/p") }.toDF("doc_id", "url")
        val got = TextFunctions.domainBlocklist(docs, "url", bl.toDF("domain"))
          .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
        hosts.zipWithIndex.foreach { case (h, i) =>
          // reference: longest >=2-label dot-suffix present in the list
          val labels = h.split("\\.")
          val suffixes = (0 until labels.length - 1).map(j => labels.drop(j).mkString("."))
          val want = suffixes.filter(bl.contains).sortBy(-_.length).headOption
          assert(got(i.toLong) == want,
            s"host $h bl=$bl: got ${got(i.toLong)}, want $want")
        }
      }
    }
  }
}
