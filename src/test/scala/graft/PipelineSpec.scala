package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Unit tests for the training-data pipeline operators (dedup,
 * similarity, text analysis, multimodal plumbing). */
class PipelineSpec extends SparkSpec {

  lazy val docsFixture: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L), // exact dup of 0
      (2L, "the quick brown fox jumps over the sleepy dog", "en", "s0", 45L), // near dup of 0
      (3L, "der hund und die katze sind nicht ein team", "de", "s0", 42L),
      (4L, "completely different words about spark engines here today", "en", "s1", 57L),
      (5L, "le chat est dans la maison et le jardin pour un moment", "fr", "s1", 54L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("exact dedup groups identical texts, keeper = min doc_id") {
    val r = Dedup.exact(docsFixture).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 5) // 6 docs, one pair collapsed
    val dup = r.filter(_._2 == 2)
    assert(dup.length == 1 && dup.head._3 == 0L)
  }

  test("minhash LSH finds exact and near duplicates, skips unrelated") {
    val pairs = Dedup.minhashPairs(docsFixture, threshold = 0.3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact duplicate pair")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)), "near duplicate pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc has no pair")
  }

  test("simhash: identical texts hash identically; near-dups are close, unrelated far") {
    val h = Dedup.simhash(docsFixture).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(2L)) < hamming(h(0L), h(4L)))
    val pairs = Dedup.simhashPairs(docsFixture, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhashPairs blocking has recall 1 at maxDist beyond the old quarter scheme") {
    // Round-1 shipped 4 fixed quarters (complete only to dist 3) while
    // running maxDist = 8 (advisor finding). The maxDist+1-block scheme
    // must return EXACTLY the brute-force pair set — including pairs
    // at distance 4..8 that quarter-blocking could silently drop.
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank at dawn"
    val words = base.split(" ")
    val docs = (0 until 30).map { i =>
      // vary a couple of word positions per doc → a rich near-dup band
      val mutated = words.zipWithIndex.map { case (w, j) =>
        if ((i + j) % 7 == 0) s"w$i$j" else w
      }.mkString(" ")
      (i.toLong, mutated, "en", "s0", mutated.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val maxDist = 8
    val sig = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sig.keys; b <- sig.keys if a < b
      d = java.lang.Long.bitCount(sig(a) ^ sig(b)) if d <= maxDist
    } yield (a, b, d.toLong)).toSet
    val got = Dedup.simhashPairs(docs, maxDist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(expected.exists(_._3 > 3), "fixture must exercise distances beyond the quarter scheme")
  }

  test("allPairsJoin: prefix filter is lossless vs brute-force Jaccard") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank at dawn"
    val words = base.split(" ")
    val docs = (0 until 30).map { i =>
      // one mutated word per doc → J(0, i) ≈ 11/17 ≈ 0.65 qualifies;
      // J(i, k) for distinct mutation sites ≈ 8/20 = 0.4 does not
      val mutated = words.zipWithIndex.map { case (w, j) =>
        if (i > 0 && j == i % 16) s"w$i$j" else w
      }.mkString(" ")
      (i.toLong, mutated, "en", s"s${i % 3}", mutated.length.toLong)
    } :+ ((99L, base, "en", "s9", base.length.toLong)) // exact dup of doc 0
    val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = docs.map(d => d._1 -> shingleSet(d._2)).toMap
    val tE4 = 5000L
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size.toLong
      u = (sets(a) | sets(b)).size.toLong
      if i * (10000L + tE4) >= tE4 * (sets(a).size + sets(b).size)
    } yield (a, b, (20000L * i + u) / (2L * u))).toSet
    val got = Dedup.allPairsJoin(df, tE4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(expected.nonEmpty && expected.exists(_._3 < 10000L),
      "fixture must exercise non-identical qualifying pairs")
    assert(got.contains((0L, 99L, 10000L)), "exact duplicate pair at jaccard 1")
  }

  test("ngram jaccard within source blocks") {
    val r = Dedup.ngramJaccard(docsFixture).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r((0L, 1L)) == 10000L) // identical → jaccard 1
    assert(r.contains((0L, 2L)) && r((0L, 2L)) > 3000L && r((0L, 2L)) < 10000L)
    assert(!r.keySet.exists { case (a, b) => a == 4L || b == 4L }) // different source block? s1: 4,5 share no shingle
  }

  lazy val embFixture: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // near 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f, 0.0f, 0.0f)) // identical to 0
    ).toDF("vec_id", "embedding")
  }

  test("pq codes: m=1 degenerates to the kmeans assignment; duplicates share codes") {
    val pq1 = Similarity.pqCodes(embFixture, m = 1, k = 2, lloydIters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val km = Similarity.kmeansAssign(embFixture, nlist = 2, lloydIters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pq1 == km, "one whole-vector subspace IS the coarse quantizer")
    val pq2 = Similarity.pqCodes(embFixture, m = 2, k = 2, lloydIters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(pq2.size == 10) // 5 vectors × 2 subspaces
    (0 to 1).foreach { s => // vec 4 ≡ vec 0 → same code and error in every subspace
      assert(pq2((0L, s.toLong)) == pq2((4L, s.toLong)))
    }
  }

  test("bm25: engine equals a BigInt replay of the rational formula") {
    val texts = docsFixture.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").toSeq)
    val n = texts.length.toLong
    val tot = texts.map(_._2.size.toLong).sum
    val tf = texts.flatMap { case (id, ts) => ts.map(id -> _) }
      .groupBy(identity).map { case ((id, t), xs) => (id, t) -> xs.length.toLong }
    val byTerm = tf.groupBy(_._1._2)
    val df = byTerm.map { case (t, m) => t -> m.size.toLong }
    val ctf = byTerm.map { case (t, m) => t -> m.values.sum }
    val q = df.keys.filter(t => df(t) * 4 <= n).toSeq
      .sortBy(t => (-ctf(t), t)).take(2)
    val dl = texts.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val scores = texts.map(_._1).map { id =>
      id -> q.map { t =>
        val f = tf.getOrElse((id, t), 0L)
        if (f == 0) BigInt(0)
        else (BigInt(1000000) * (n - df(t) + 1) * 44 * f * tot) /
          (BigInt(df(t) + 1) * (BigInt(20) * tot * f + BigInt(6) * tot + BigInt(18) * dl(id) * n))
      }.sum
    }.filter { case (id, _) => q.exists(t => tf.contains((id, t))) } // engine scores docs that contain ≥1 query term
    val expected = scores.sortBy { case (id, s) => (-s, id) }.take(6).zipWithIndex
      .map { case ((id, s), i) => (id, s.toLong, (i + 1).toLong) }.toSeq
    val got = Vocab.bm25TopDocs(docsFixture, nQueryTerms = 2, topK = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._3)
    assert(got == expected)
  }

  test("wav decode: parses a ByteBuffer-authored header (independent writer)") {
    import spark.implicits._
    val payload = "hello samples".getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + payload.length); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(2)
    bb.putInt(22050); bb.putInt(22050 * 2 * 2); bb.putShort(4); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(payload.length); bb.put(payload)
    val df = Seq((7L, bb.array())).toDF("media_id", "wav")
    val r = Multimodal.decodeWav(df).collect().head
    assert(r.getLong(1) == 1L, "RIFF/WAVE/fmt magics")
    assert(r.getLong(2) == 2L && r.getLong(3) == 22050L && r.getLong(4) == 88200L)
    assert(r.getLong(5) == 16L && r.getLong(6) == payload.length.toLong)
    assert(r.getLong(7) == payload.length * 1000L / 88200L)
    // round-trip: engine-synthesized blobs parse back to their params
    val docs = Seq((3L, "abc def", "en", "s0", 7L), (4L, "xyz", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rt = Multimodal.decodeWav(Multimodal.wavTable(docs)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(6))))
      .toMap
    assert(rt(3L) == ((1L, 2L, 8000L, 7L))) // 3%3=0 → 8 kHz, 3%2+1 = 2 ch
    assert(rt(4L) == ((1L, 1L, 16000L, 3L)))
  }

  test("word PMI: windowed pairs and integer lift equal the replay") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hot dog hot dog hot dog stand", "en", "s0", 29L),
      (1L, "hot dog cart near the stand", "en", "s0", 27L),
      (2L, "cold cat cold cat cold cat nap", "en", "s0", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val texts = Map(0L -> "hot dog hot dog hot dog stand",
      1L -> "hot dog cart near the stand", 2L -> "cold cat cold cat cold cat nap")
    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }
    val t = toks.values.map(_.size).sum.toLong
    val pairCounts = toks.values.flatMap { ws =>
      for {
        i <- ws.indices; j <- i + 1 to math.min(i + 3, ws.size - 1)
        if ws(i) != ws(j)
      } yield if (ws(i) < ws(j)) (ws(i), ws(j)) else (ws(j), ws(i))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val np = pairCounts.values.sum
    val marg = toks.values.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val expected = pairCounts.filter(_._2 >= 2).toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(100)
      .map { case ((a, b), n) =>
        (a, b, n, (BigInt(n) * 10000 * t * t / (BigInt(np) * marg(a) * marg(b))).toLong)
      }
    val got = Cooccur.wordPmi(docs, window = 3, minSupport = 2, k = 100).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("length outliers: exact k-sigma gate flags the single extreme doc") {
    import spark.implicits._
    val docs = ((0L until 12L).map(i => (i, "x", "en", "s0", 10L)) :+
      ((99L, "x", "en", "s0", 1000L))).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = BigInt(rows.length); val s = BigInt(rows.map(_._2).sum)
    val ssq = rows.map(x => BigInt(x._2) * x._2).sum
    val expected = rows.map { case (id, x) =>
      id -> (if ((n * x - s).pow(2) > 9 * (n * ssq - s * s)) 1L else 0L)
    }.toMap
    val got = TextStats.lengthOutliers(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected)
    assert(got(99L) == 1L && got.values.sum == 1L)
  }

  test("hll pair algebra: union stats equal the register-max replay") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "s0", 22L),
      (1L, "alpha beta gamma delta", "en", "s1", 22L), // s1 ≡ s0 vocab
      (2L, "omega psi chi phi", "en", "s2", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val regs = Sketch.hll(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .groupBy(_._1._1).map { case (s, xs) => s -> xs.map { case ((_, b), v) => b -> v }.toMap }
    def statsOf(m: Map[Long, Long]): (Long, Long) = {
      val zeros = 256L - m.size
      (zeros, m.values.map(r => 1L << (53 - r)).sum + zeros * (1L << 53))
    }
    val got = Sketch.hllPairStats(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val srcs = regs.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      merged = (regs(a).keySet ++ regs(b).keySet).map(k =>
        k -> math.max(regs(a).getOrElse(k, 0L), regs(b).getOrElse(k, 0L))).toMap
    } yield (a, b) -> statsOf(merged)).toMap
    assert(got == expected)
    // identical vocabularies: the union IS each side
    assert(got(("s0", "s1")) == statsOf(regs("s0")))
  }

  test("leakage-safe split: cluster-mates always land on the same side") {
    val r = Dedup.leakageSafeSplit(docsFixture, heldoutPermille = 500).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2))))
    assert(r.length == 6)
    // every member of a cluster carries the cluster's split
    r.groupBy(_._2._1).values.foreach { members =>
      assert(members.map(_._2._2).toSet.size == 1, s"split leak in $members")
    }
    // docs 0 and 1 are exact dups → same cluster by construction
    val byDoc = r.toMap
    assert(byDoc(0L)._1 == byDoc(1L)._1)
    // the split value replays the md5 threshold exactly
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    r.foreach { case (_, (cl, sp)) =>
      val h = java.lang.Long.parseLong(md5hex(s"sp|$cl").take(8), 16)
      assert(sp == (if (h < 4294967296L * 500 / 1000) "heldout" else "train"))
    }
  }

  test("edit-distance pairs: identical docs at 0; every value matches a Scala DP") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = docsFixture.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Dedup.editDistancePairs(docsFixture, maxDist = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 1L)) == 0L, "identical docs hash to identical signatures → dist 0")
    got.foreach { case ((a, b), d) =>
      assert(d == lev(texts(a), texts(b)).toLong && d <= 20, s"pair ($a,$b)")
    }
  }

  test("weighted sampling: priorities replay and favor long docs in expectation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = docsFixture.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = rows.map { case (id, src, nc) =>
      val h = java.lang.Long.parseLong(md5hex(s"ws|$id").take(10), 16)
      (id, src, nc, h * 1000000L / nc)
    }.sortBy(x => (x._4, x._1)).take(3).zipWithIndex
      .map { case ((id, src, nc, p), i) => (id, src, nc, p, (i + 1).toLong) }.toSeq
    val got = Mix.weightedSample(docsFixture, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._5)
    assert(got == expected)
  }

  test("inverted index: positions, tf, and df are exact") {
    val r = Vocab.invertedIndex(docsFixture).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3), x.getString(4)))
      .toMap
    assert(r(("the", 0L)) == ((2L, 3L, "0,6"))) // "the quick ... over the lazy"
    assert(r(("fox", 0L)) == ((1L, 3L, "3")))
    assert(r(("le", 5L))._1 == 2L) // french doc repeats "le"
    // full replay on one doc: every token of doc 3 appears exactly once
    val doc3 = "der hund und die katze sind nicht ein team".split(" ")
    doc3.zipWithIndex.foreach { case (t, i) =>
      assert(r((t, 3L)) == ((1L, 1L, i.toString)), s"term $t")
    }
  }

  test("hybrid RRF: fuses the lexical and semantic pools exactly") {
    val lex = Vocab.bm25TopDocs(docsFixture, nQueryTerms = 2, topK = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val vecs = embFixture.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dotd(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
    val seed = lex.minBy(_._2)._1
    val semRanks: Map[Long, Long] =
      if (!vecs.contains(seed)) Map.empty
      else vecs.toSeq.map { case (id, v) =>
        id -> math.round(dotd(v, vecs(seed)) /
          (math.sqrt(dotd(v, v)) * math.sqrt(dotd(vecs(seed), vecs(seed)))) * 10000)
      }.sortBy { case (id, s) => (-s, id) }.take(6)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val fusedExp = (lex.keySet ++ semRanks.keySet).toSeq.map { id =>
      val lr = lex.getOrElse(id, 0L); val sr = semRanks.getOrElse(id, 0L)
      (id, lr, sr,
        (if (lr > 0) 1000000L / (60 + lr) else 0L) + (if (sr > 0) 1000000L / (60 + sr) else 0L))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(6)
      .zipWithIndex.map { case ((id, lr, sr, s), i) => (id, lr, sr, s, (i + 1).toLong) }
    val got = Similarity.hybridTopDocs(docsFixture, embFixture,
      nQueryTerms = 2, poolK = 6, topK = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._5)
    assert(got == fusedExp)
    assert(semRanks.nonEmpty || !vecs.contains(seed), "pool construction sanity")
  }

  test("brute-force cosine top-k matches a hand computation") {
    val r = Similarity.cosineTopK(embFixture, k = 2).collect()
      .map(x => ((x.getLong(0), x.getInt(3)), (x.getLong(1), x.getLong(2)))).toMap
    // vec 0: rank1 = vec 4 (identical, sim 1.0)
    assert(r((0L, 1)) == (4L, 10000L))
    // vec 0: rank2 = vec 1 (cos = 0.9/sqrt(0.82) ≈ 0.99388 → 9939)
    val (n2, s2) = r((0L, 2))
    assert(n2 == 1L && s2 == 9939L)
  }

  test("LSH-bucketed top-k finds identical vectors (same bucket by construction)") {
    val r = Similarity.lshTopK(embFixture, planes = 4, k = 2).collect()
      .map(x => ((x.getLong(0), x.getInt(3)), x.getLong(1))).toMap
    assert(r.get((0L, 1)).contains(4L) || r.get((4L, 1)).contains(0L))
  }

  test("multi-table LSH: one table equals lshTopK; OR-amplification never loses a candidate") {
    // numTables = 1 uses plane offset 0 = the single-table family →
    // identical pair set, identical deterministic ranking
    val single = Similarity.lshTopK(embFixture, planes = 4, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val one = Similarity.lshTopKMulti(embFixture, planes = 4, k = 2, numTables = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(one == single)
    // more tables = superset candidates ⇒ per-query best sim never drops
    val two = Similarity.lshTopKMulti(embFixture, planes = 4, k = 2, numTables = 2).collect()
      .map(r => ((r.getLong(0), r.getInt(3)), r.getLong(2))).toMap
    single.filter(_._4 == 1).foreach { case (q, _, sim, _) =>
      assert(two((q, 1)) >= sim, s"query $q: top-1 sim dropped with a second table")
    }
    // identical vectors still pair up
    val pairs = two.keySet.map(_._1)
    assert(pairs.contains(0L) || pairs.contains(4L))
  }

  test("IVF with nprobe = nlist degenerates to exact brute force (full pipeline equality)") {
    // probing every inverted list makes IVF search exhaustive, so the
    // result must equal cosineTopK bit-for-bit — this exercises
    // training, assignment, probing, and the ranking window end-to-end
    val ivf = Similarity.ivfTopK(embFixture, nlist = 2, nprobe = 2, k = 2, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val brute = Similarity.cosineTopK(embFixture, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(ivf == brute)
  }

  test("IVF at nprobe = 1: identical vectors share an inverted list and are found") {
    val r = Similarity.ivfTopK(embFixture, nlist = 2, nprobe = 1, k = 2, lloydIters = 2)
      .collect().map(x => ((x.getLong(0), x.getInt(3)), (x.getLong(1), x.getLong(2)))).toMap
    // vec 4 is bit-identical to vec 0 → same centroid at d2 = 0 → same
    // list → rank-1 neighbor with cosine exactly 1
    assert(r((0L, 1)) == (4L, 10000L))
    assert(r((4L, 1)) == (0L, 10000L))
  }

  test("IVF handles nlist close to N and empty-cluster fallback without losing vectors") {
    val r = Similarity.ivfTopK(embFixture, nlist = 4, nprobe = 4, k = 4, lloydIters = 3)
    // exhaustive probing again → every vector sees all 4 others
    assert(r.groupBy("vec_id").count().collect().forall(_.getLong(1) == 4L))
  }

  test("embedding-cosine near-dup pairs: identical vectors found, orthogonal not") {
    val pairs = Similarity.cosineDupPairs(embFixture, planes = 4, simThresholdE4 = 9500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, s) => a == 0L && b == 4L && s == 10000L })
    assert(!pairs.exists { case (a, b, _) => Set(a, b) == Set(2L, 3L) }) // orthogonal
  }

  test("langId: stopword profiles pick the right language, deterministic tie-break") {
    val r = TextStats.langId(docsFixture).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(0L) == "en" && r(3L) == "de" && r(5L) == "fr")
  }

  test("quality + token counts are exact on a hand-checked doc") {
    val q = TextStats.quality(docsFixture).where(col("doc_id") === 0).head()
    def l(r: org.apache.spark.sql.Row, i: Int) = r.getAs[Number](i).longValue()
    assert(l(q, 1) == 43L) // n_chars
    assert(l(q, 2) == 9L) // tokens
    assert(l(q, 4) == 0L) // no punctuation
    val t = TextStats.tokenCounts(docsFixture).where(col("doc_id") === 0).head()
    assert(l(t, 1) == 9L && l(t, 2) == 9L && l(t, 3) == 8L) // 'the' twice
  }

  test("repetition: hand-checked n-gram duplicate and top-gram counts") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b", "en", "s0", 11L), // 2-grams: ab ba ab ba ab → n=5 d=2 top=3
      (1L, "x y z w", "en", "s0", 7L), // all distinct: n=3 d=3 top=1
      (2L, "q", "en", "s0", 1L) // shorter than n: all zero
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextStats.repetition(docs).collect()
      .map(x => x.getLong(0) -> (1 to 6).map(i => x.getAs[Number](i).longValue())).toMap
    assert(r(0L) == Seq(5L, 2L, 3L, 4L, 2L, 2L)) // 3-grams: aba bab aba bab
    assert(r(1L) == Seq(3L, 3L, 1L, 2L, 2L, 1L))
    assert(r(2L) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("vocab top-k: counts, doc frequency, deterministic tie-break") {
    val v = Vocab.topVocab(docsFixture, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 'the' appears 2+2+2+1 = 7 times across docs 0,1,2,5 (fr 'the'? no) — compute: docs 0/1 have 'the' twice each, doc 2 twice, doc 5 none
    assert(v.head._1 == "the")
    assert(v.head._2 == 6L && v.head._3 == 3L)
    // ties broken by term asc ⇒ result is deterministic
    assert(v.length == 3)
  }

  test("tfidf distinctive terms: rare high-tf term outranks common terms") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple apple apple the the", "en", "s0", 1L),
      (1L, "the banana pear", "en", "s0", 1L),
      (2L, "the pear plum", "en", "s0", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = Vocab.distinctiveTerms(docs, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(top(0L) == (("apple", 3L, 1L))) // tf 3, df 1 beats 'the' (tf 2, df 3)
    assert(top(1L) == (("banana", 1L, 1L))) // df tie-break: banana(1) < pear(2) < the(3)
    assert(top(2L) == (("plum", 1L, 1L)))
  }

  test("HLL: estimate within rate bound; registers merge by max across shards") {
    import spark.implicits._
    // 1500 distinct tokens over 50 docs, one source
    val docs = (0 until 50).map { d =>
      (d.toLong, (0 until 30).map(t => s"tok${d * 30 + t}").mkString(" "), "en", "s0", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val regs = Sketch.hll(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    val est = Sketch.estimateHll(regs)
    assert(math.abs(est - 1500.0) / 1500.0 < 0.15, s"estimate $est vs 1500")
    // tiny cardinality → linear counting is near-exact
    val small = Sketch.hll(docsFixture.where(col("doc_id") === 0)).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    val estSmall = Sketch.estimateHll(small)
    assert(math.abs(estSmall - 8.0) < 1.0, s"estimate $estSmall vs 8 distinct") // 8 distinct tokens
    // mergeability: max-merge of two halves == whole
    val h1 = Sketch.hll(docs.where(col("doc_id") < 25)).collect()
    val h2 = Sketch.hll(docs.where(col("doc_id") >= 25)).collect()
    val merged = (h1 ++ h2).map(r => (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (b, v) => (b, v.map(_._2).max) }
    val whole = regs.toMap
    assert(merged == whole)
  }

  test("CMS: point query never under-counts and is exact on the fixture vocab") {
    val cells = Sketch.countMin(docsFixture).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    def cellsOf(src: String) =
      cells.collect { case ((s, r, c), n) if s == src => (r, c) -> n }.toMap
    val s0 = cellsOf("s0")
    // exact counts in source s0: 'the' appears 2+2+2 = 6 times
    assert(Sketch.cmsQuery(s0, "s0", "the") == 6L)
    assert(Sketch.cmsQuery(s0, "s0", "fox") == 3L)
    // a term absent from s0 can only over-count (tiny grid collisions), never under
    assert(Sketch.cmsQuery(s0, "s0", "zzz-not-present") >= 0L)
    // every real token: query >= exact count
    val exact = docsFixture.where(col("source") === "s0")
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (t, n) =>
      assert(Sketch.cmsQuery(s0, "s0", t) >= n, s"under-count for $t")
    }
  }

  test("fingerprint: equal for identical docs, stable, different for different docs") {
    val f = TextStats.fingerprint(docsFixture).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f(0L) == f(1L))
    assert(f(0L) != f(4L))
    assert(f(0L).split(",").length == 3)
  }

  test("multimodal plumbing: decode metadata, features, frame sampling") {
    import spark.implicits._
    val media = docsFixture.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      struct(length(col("text")).as("nbytes"), col("source").as("origin")).as("meta"))
    val dec = Multimodal.decode(media).collect()
    assert(dec.length == 6)
    val img = dec.filter(_.getString(1) == "image")
    assert(img.forall(r => r.getLong(3) >= 32 && r.getLong(3) < 1312)) // width range
    val feats = Multimodal.features(media, dim = 16).collect()
    assert(feats.forall(_.getSeq[Double](1).length == 16))
    assert(feats.forall(_.getSeq[Double](1).forall(v => v >= -1.0 && v <= 1.0)))
    val frames = Multimodal.frameSample(media, n = 4)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty && perVideo.forall(_.getLong(1) == 4L))
    // determinism
    val feats2 = Multimodal.features(media, dim = 16).collect()
    assert(feats.map(_.toString).sorted.sameElements(feats2.map(_.toString).sorted))
  }

  test("curate composes dedup keeper ∩ quality gates ∩ langid") {
    // en-predicted docs: 0, 1, 2 ("the"×2 hits); doc 4 has zero en
    // stopwords → 'und'; 3 is de, 5 is fr. Exact-dup keeper drops 1.
    val kept = Curate.curate(docsFixture, lang = "en",
        minTokens = 5, maxTokens = 100, maxPunctE4 = 10000, minStopE4 = 0)
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(0L, 2L)),
      s"keeper ∩ en ∩ relaxed-quality must be {0, 2}: ${kept.mkString(",")}")

    // tighten the token floor past the fixture's 9-token docs → empty
    val none = Curate.curate(docsFixture, lang = "en",
      minTokens = 10, maxTokens = 100, maxPunctE4 = 10000, minStopE4 = 0)
    assert(none.count() == 0)

    // stopword floor: docs 0/2 have stop_ratio 2/9 ≈ 2222 e4
    val floor = Curate.curate(docsFixture, lang = "en",
        minTokens = 5, maxTokens = 100, maxPunctE4 = 10000, minStopE4 = 2300)
      .collect().map(_.getLong(0))
    assert(floor.isEmpty, s"stop floor 2300 must cut the 2222-e4 docs: ${floor.mkString(",")}")
  }

  test("near-dup clusters: transitive closure over the pair graph, keeper = min") {
    // fixture pairs at threshold 0.5: (0,1) exact, (0,2)/(1,2) near
    // (jaccard 5/9 ≈ 0.556) → one cluster {0,1,2}; 3,4,5 singletons
    val r = Dedup.clusters(docsFixture, numPartitions = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.size == 6, "every document gets a cluster row")
    assert(r(0L) == (0L, 1L) && r(1L) == (0L, 0L) && r(2L) == (0L, 0L),
      s"docs 0,1,2 must collapse to cluster 0 with keeper 0: $r")
    Seq(3L, 4L, 5L).foreach(d =>
      assert(r(d) == (d, 1L), s"singleton $d clusters to itself: ${r(d)}"))
    // keeper set IS the dedup-retained corpus: 0,3,4,5
    assert(r.filter(_._2._2 == 1L).keySet == Set(0L, 3L, 4L, 5L))
  }

  test("decontamination: shared n-grams with the eval doc flag training docs") {
    import spark.implicits._
    // doc 0 is eval (0 % 97 == 0); 1 and 2 share 3-grams with it,
    // 3/4/5 share none
    val r = Decontam.contamination(docsFixture).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(!r.contains(0L), "eval docs are excluded from the report")
    assert(r(1L)._1 == 7L && r(1L)._2 == 1L, s"exact dup shares all 7 shingles: ${r(1L)}")
    assert(r(2L)._1 == 5L && r(2L)._2 == 1L, s"near dup shares 5 shingles: ${r(2L)}")
    Seq(3L, 4L, 5L).foreach(d =>
      assert(r(d) == (0L, 0L), s"clean doc $d must report 0 shared: ${r(d)}"))
  }

  test("stratified sample: deterministic, per-source thresholded, degenerate target keeps all") {
    val s1 = Mix.stratifiedSample(docsFixture, targetPerSource = 1)
      .collect().map(_.getLong(0)).sorted
    val s2 = Mix.stratifiedSample(docsFixture, targetPerSource = 1)
      .collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "hash sampling is deterministic")
    assert(s1.toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L, 5L)))
    // target ≥ source size ⇒ threshold caps at 2^32 ⇒ keep everything
    val all = Mix.stratifiedSample(docsFixture, targetPerSource = 100)
    assert(all.count() == 6)
  }

  test("temperature mix: keep rate prop to 1/isqrt(count), exact hash replay") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 100-doc hub source vs a 4-doc rare source: isq 10 vs 2, tot 12
    val docs = ((0 until 100).map(i => (i.toLong, s"w$i", "big")) ++
      (100 until 104).map(i => (i.toLong, s"w$i", "small")))
      .toDF("doc_id", "text", "source")
    val got = Mix.temperatureMix(docs, totalTarget = 12).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val isq = Map("big" -> 10L, "small" -> 2L)
    val expected = (0 until 104).flatMap { i =>
      val src = if (i < 100) "big" else "small"
      val h = java.lang.Long.parseLong(md5hex(s"t|$src|$i").take(8), 16)
      val thresh = math.min(12L * 4294967296L / (12L * isq(src)), 4294967296L)
      if (h < thresh) Some((i.toLong, src)) else None
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must actually keep something")
    // the flattening property itself: per-doc keep rate of the rare
    // source is ~5x the hub's (1/2 vs 1/10 of the hash space, exact
    // up to the floor in each threshold)
    val (tSmall, tBig) = (12L * 4294967296L / (12L * 2L), 12L * 4294967296L / (12L * 10L))
    assert(tSmall / tBig === 5L && tSmall % tBig < 5L)
  }

  test("pack: concat-then-chunk window assignment with exact offsets") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a b c", "s"), // 3 tokens, cum_before 0 → bin 0 off 0
      (11L, "a b c d", "s"), // 4 tokens, cum 3 → bin 0 off 3
      (12L, "a b c d e", "s"), // 5 tokens, cum 7 → bin 1 off 1
      (20L, "x y", "t") // fresh source restarts at bin 0
    ).toDF("doc_id", "text", "source")
    val r = Mix.pack(docs, capacity = 6).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(10L) == (3L, 0L, 0L) && r(11L) == (4L, 0L, 3L) && r(12L) == (5L, 1L, 1L),
      s"per-source running pack: $r")
    assert(r(20L) == (2L, 0L, 0L))
  }
}
