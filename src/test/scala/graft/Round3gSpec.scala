package graft

import org.apache.spark.sql.functions._

import graft.algos.DegreeStats

/** Round-3g operators: rich-club coefficient, hard-negative mining,
 * segment-level dedup rewrite, BPE merge training. */
class Round3gSpec extends SparkSpec {

  // ---------- rich-club coefficient ----------

  test("richClub: K4 hub club with pendants matches the hand count") {
    // K4 on 1..4; pendants 5,6,7 on vertex 1 → deg(1)=6, deg(2..4)=3,
    // deg(5..7)=1. Club at k∈{1,2}: the K4 (φ = 1); at k=4: only v1.
    val pairs = Seq(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (1, 5), (1, 6), (1, 7))
    val g = graphOf(pairs, symmetric = true)
    val got = DegreeStats.richClub(g, ks = Seq(1L, 2L, 4L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((4L, 6L, 10000L)))
    assert(got(2L) == ((4L, 6L, 10000L)))
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  // ---------- contrastive hard negatives ----------

  test("hardNegatives: nearest DIFFERENT-label neighbor, same-label excluded") {
    import spark.implicits._
    // v0,v1 share label 0 and are nearly parallel; v2 (label 1) is the
    // closest cross-label vector to v0; v3 (label 1) is orthogonal.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.8f, 0.6f), 1),
      (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = pipeline.Similarity.hardNegatives(emb, k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(0L)._1 == 2L) // not v1 despite cos(v0,v1) ≈ 0.994
    assert(got(0L)._2 == 8000L) // cos = 0.8/(1·1) exactly
    assert(got(3L)._1 == 1L) // nearest label-0 vector to v3
  }

  // ---------- BPE merge training ----------

  test("bpe: hand-traced merge trajectory, runs merge greedily, early stop") {
    import spark.implicits._
    // corpus: "aaab" ×2, "ab" ×1
    // r1 pairs: (a,a)=4 [two per aaab], (a,b)=3 → adopt (a,a,4);
    //   greedy on the aaa run merges offset 0 only: aaab → [aa,a,b]
    // r2 pairs: (aa,a)=2, (a,b)=3 → adopt (a,b,3) → [aa,ab] / [ab]
    // r3 pairs: (aa,ab)=2 → adopt → [aaab] / [ab]
    // r4: no adjacent pairs anywhere → stop (3 rows despite rounds=6)
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val got = pipeline.Bpe.train(docs, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L)))
  }

  test("bpe: tie on count breaks by (sym_a, sym_b)") {
    import spark.implicits._
    // "xy" and "yz" both appear twice; (x,y) < (y,z) lexicographically
    val docs = Seq((1L, "xy xy yz yz")).toDF("doc_id", "text")
    val got = pipeline.Bpe.train(docs, rounds = 1).collect()
    assert(got.length == 1)
    assert((got(0).getString(1), got(0).getString(2), got(0).getLong(3)) == (("x", "y", 2L)))
  }

  test("bpe docTokenCounts: document length under the learned vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    // rounds=2: aaab → [aa, ab] (2 tokens), ab → [ab] (1 token)
    val got = pipeline.Bpe.docTokenCounts(docs, rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 4L)), 2L -> ((1L, 1L))))
  }

  test("bpe tokenCensus: counts the corpus under the final vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    // rounds=2 state (see trajectory above): aaab → [aa, ab] ×2, ab → [ab]
    val got = pipeline.Bpe.tokenCensus(docs, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("aa" -> 2L, "ab" -> 3L))
  }

  // ---------- skip-gram pair generation ----------

  test("skipGramPairs: window band over one walk, both directions") {
    import spark.implicits._
    // walk A-B-C-A: window 1 → adjacent ordered pairs only
    val wk = Seq(("r", 0L, "A"), ("r", 1L, "B"), ("r", 2L, "C"), ("r", 3L, "A"))
      .toDF("root_key", "step", "key")
    val got = graft.algos.RandomWalk.skipGramPairs(wk, window = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("A", "B") -> 1L, ("B", "A") -> 1L,
      ("B", "C") -> 1L, ("C", "B") -> 1L,
      ("C", "A") -> 1L, ("A", "C") -> 1L))
  }

  // ---------- graph growth telemetry ----------

  test("growthCensus: first-seen edge/vertex counts land in the right week") {
    import spark.implicits._
    val wkMs = 7L * 86400L * 1000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val rows = Seq(
      // c1: two turns in week 0, one in week 1
      ("c1", 0, "user", "a", None: Option[String], ts(0L)),
      ("c1", 1, "user", "b", None: Option[String], ts(1000L)),
      ("c1", 2, "user", "c", None: Option[String], ts(wkMs + 10000L)),
      // c2: single turn in week 1 with a tool edge
      ("c2", 0, "tool", "d", Some("x"), ts(wkMs + 20000L)))
    val t = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = graft.sources.EdgeBuilder.growthCensus(t)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // week 0: 2 turns, edge (c1#0,c1#1), vertices c1#0 + c1#1
    // week 1: 2 turns, edges (c1#1,c1#2) + (c2#0,T#x), vertices c1#2 + c2#0 + T#x
    assert(got == Map(0L -> ((2L, 1L, 2L)), 1L -> ((2L, 2L, 3L))))
  }

  // ---------- kNN label agreement ----------

  test("labelAgreement: mislabeled duplicate drags its label's agreement down") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(1.0f, 0.0f), 1) // mislabeled copy of v0/v1
    ).toDF("vec_id", "embedding", "label")
    val got = pipeline.Similarity.labelAgreement(emb, k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // v0→v1 agree, v1→v0 agree; v2→v3, v3→v2 agree; v4→v0 (tie-break
    // to the smallest id) disagrees with its own label
    assert(got == Map(0L -> ((2L, 2L)), 1L -> ((3L, 2L))))
  }

  // ---------- SFT echo rate ----------

  test("sftEcho: distinct-token overlap with the as-of prompt, empty response scores 0") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val t = Seq(
      ("c1", 0, "user", "hello world", None: Option[String], ts(0L)),
      ("c1", 1, "assistant", "hello there world again", None: Option[String], ts(1L)),
      ("c1", 2, "user", "next question", None: Option[String], ts(2L)),
      ("c1", 3, "assistant", "", None: Option[String], ts(3L)),
      // assistant with NO earlier user turn → excluded entirely
      ("c2", 0, "assistant", "orphan", None: Option[String], ts(4L)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = pipeline.Extract.sftEcho(t).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // turn 1: resp {hello,there,world,again}=4, echo {hello,world}=2 → 5000
    // turn 3: empty response → 0 tokens, echo_e4 = 0 (no crash)
    assert(got == Map(("c1", 1L) -> ((4L, 2L, 5000L)), ("c1", 3L) -> ((0L, 0L, 0L))))
  }

  // ---------- role-transition census ----------

  test("roleTransitions: per-edge counts and e4 share of the source role") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val t = Seq(
      ("c1", 0, "user", "a", None: Option[String], ts(0L)),
      ("c1", 1, "assistant", "b", None: Option[String], ts(1L)),
      ("c1", 2, "user", "c", None: Option[String], ts(2L)),
      ("c1", 3, "tool", "d", Some("x"), ts(3L)),
      ("c2", 0, "user", "e", None: Option[String], ts(4L)),
      ("c2", 1, "assistant", "f", None: Option[String], ts(5L)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = pipeline.Funnel.roleTransitions(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("user", "assistant") -> ((2L, 6666L)),
      ("user", "tool") -> ((1L, 3333L)),
      ("assistant", "user") -> ((1L, 10000L))))
  }

  // ---------- per-source duplication rollup ----------

  test("dupRateBySource: global keeper counts against the duplicate's source") {
    import spark.implicits._
    val docs = Seq(
      (0L, "crawlA", "the quick brown fox jumps over the lazy dog"),
      (1L, "crawlA", "the quick brown fox jumps over the lazy dog"),
      (2L, "crawlB", "completely unrelated text with no shared shingles at all"))
      .toDF("doc_id", "source", "text")
    val got = pipeline.Dedup.dupRateBySource(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "crawlA" -> ((2L, 1L, 1L, 5000L)),
      "crawlB" -> ((1L, 1L, 1L, 0L))))
  }

  // ---------- integer readability ----------

  test("readability: run counts and floor-div Flesch match the hand computation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "s", "the cat sat. it ran!"),
      (1L, "s", "")).toDF("doc_id", "source", "text")
    val got = pipeline.TextStats.readability(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 0: W=5, S=2, Y=5 → 206835 − ⌊5075/2⌋ − ⌊423000/5⌋ = 119698
    // doc 1: all counts floored to 1 → 206835 − 1015 − 84600 = 121220
    assert(got == Map(
      0L -> ((5L, 2L, 5L, 119698L)),
      1L -> ((1L, 1L, 1L, 121220L))))
  }

  // ---------- language-ID confidence margin ----------

  test("langIdMargin: margin separates confident calls from tie-breaks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the that el"), // en 2, es 1 → margin 1
      (2L, "the el"), // en 1 = es 1 → tie-broken 'en', margin 0
      (3L, "zzz zzz") // no profile hits → 'und', margin 0
    ).toDF("doc_id", "text")
    val got = pipeline.TextStats.langIdMargin(docs)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("en", 2L, 1L)))
    assert(got(2L) == (("en", 1L, 0L)))
    assert(got(3L) == (("und", 0L, 0L)))
  }

  // ---------- Jaccard backbone sparsifier ----------

  test("backbone: k=1 keeps each vertex's best edge; pendant edge survives via its leaf") {
    // K4 on 1..4 plus pendant 5 on vertex 1. Jaccard: edges inside
    // the K4 not touching v1 score 1.0 (union = common = 2); edges to
    // v1 score 2/3 (the pendant pads v1's neighborhood); (1,5) = 0.
    // Top-1 per vertex: v1→(1,2) [its best at 2/3, smallest key],
    // v2→(2,3), v3→(2,3), v4→(2,4), v5→(1,5) (only edge, J = 0).
    val pairs = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
    val g = graphOf(pairs, symmetric = true)
    val got = graft.algos.LinkPredict.backbone(g, k = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      (keyOf(1), keyOf(2)), (keyOf(2), keyOf(3)),
      (keyOf(2), keyOf(4)), (keyOf(1), keyOf(5))))
  }

  // ---------- LSH recall self-evaluation ----------

  test("lshRecall: identical docs are always caught; counts are consistent") {
    import spark.implicits._
    val base = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, base), (2L, base), // identical → true pair, shares every band
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val r = pipeline.Dedup.lshRecall(docs).collect()(0)
    val (nTrue, nCand, nHits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrue == 1L && nHits == 1L)
    assert(nHits <= nCand)
  }

  // ---------- SFT pair extraction (as-of join semantics) ----------

  test("sft extraction: latest earlier user turn becomes the prompt") {
    import spark.implicits._
    val t = Seq(
      ("c1", 0, "assistant", "orphan"), // no earlier user → dropped
      ("c1", 1, "user", "q1"),
      ("c1", 2, "tool", "noise"),
      ("c1", 3, "assistant", "a1"),
      ("c1", 4, "user", "q2"),
      ("c1", 5, "assistant", "a2"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val probes = t.where(col("role") === "assistant")
      .select(col("conv_id"), col("turn_idx"), col("text").as("response"))
    val quotes = t.where(col("role") === "user")
      .select(col("conv_id"), col("turn_idx"), col("text"))
    val got = operators.Temporal.asOfJoin(probes, quotes, "conv_id", "turn_idx", Seq("text"))
      .select(col("turn_idx"), col("asof.text").as("prompt"), col("response"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((3, "q1", "a1"), (5, "q2", "a2")))
  }

  // ---------- per-day n-gram novelty ----------

  test("noveltyByDay: day-1 grams all new; repeats stop counting as new") {
    import spark.implicits._
    val us = 86400000000L
    val rows = Seq(
      // day 0: "a b c" → grams "a b", "b c" (both new)
      ("c1", 0, "user", "a b c", None: Option[String], new java.sql.Timestamp(0L)),
      // day 1: "a b d" → "a b" old, "b d" new
      ("c1", 1, "user", "a b d", None: Option[String], new java.sql.Timestamp(us / 1000L)),
      // day 1: single token → no grams
      ("c1", 2, "user", "x", None: Option[String], new java.sql.Timestamp(us / 1000L)))
    val t = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = pipeline.TextStats.noveltyByDay(t)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(0L -> ((2L, 2L, 2L)), 1L -> ((2L, 1L, 1L))))
  }

  // ---------- agent stuck-loop detection ----------

  test("toolLoops: maximal same-tool runs, interleaved non-tool turns ignored") {
    import spark.implicits._
    val rows = Seq(
      // c1: t_a ×3 with a toolless turn inside the run, then t_b ×2
      ("c1", 0, Some("t_a")), ("c1", 1, Some("t_a")), ("c1", 2, None),
      ("c1", 3, Some("t_a")), ("c1", 4, Some("t_b")), ("c1", 5, Some("t_b")),
      // c2: alternating — no run reaches 2
      ("c2", 0, Some("t_a")), ("c2", 1, Some("t_b")), ("c2", 2, Some("t_a")))
    val t = rows.toDF("conv_id", "turn_idx", "tool")
    val got = pipeline.Funnel.toolLoops(t, minRun = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set(("c1", "t_a", 3L, 0L), ("c1", "t_b", 2L, 4L)))
  }

  // ---------- per-label centroid outliers ----------

  test("centroidOutliers: matches the plain integer replay; farthest ranks first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f), 0),
      (2L, Array(0.0f, 2.0f), 0),
      (3L, Array(1.0f, 1.0f), 1),
      (4L, Array(1.0f, 1.2f), 1))
    // plain replay of the documented contract
    def replay(lab: Int): Seq[(Long, Long)] = {
      val g = vecs.filter(_._3 == lab)
      val n = g.size.toLong
      val qs = g.map { case (id, v, _) => id -> v.map(x => math.round(x.toDouble * 1e6)) }
      val s = qs.map(_._2).transpose.map(_.sum)
      qs.map { case (id, xq) =>
        id -> xq.zip(s).map { case (x, si) => val e = math.abs(n * x - si) / n; e * e }.sum
      }.sortBy { case (id, d2) => (-d2, id) }
    }
    val got = pipeline.Similarity.centroidOutliers(vecs.toDF("vec_id", "embedding", "label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = (0 to 1).flatMap(l =>
      replay(l).zipWithIndex.map { case ((id, d2), i) => (l.toLong, id, d2, i + 1L) })
    assert(got.sortBy(t => (t._1, t._4)).toSeq == want.sortBy(t => (t._1, t._4)))
    // label 0's centroid sits nearer (1,1)-ish vectors than the corners
    assert(got.filter(_._1 == 0L).minBy(_._4)._3 > 0L)
  }

  // ---------- segment-level dedup rewrite ----------

  test("segmentDedup: first occurrence survives, rewrite reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // both segments first → fully kept
      (2L, "a b x y"), // "a b" duplicates doc 1's first segment
      (3L, "c d"), // duplicates doc 1's second segment → empty rewrite
      (4L, "p q r") // trailing short segment kept whole
    ).toDF("doc_id", "text")
    val got = pipeline.Dedup.segmentDedup(docs, segLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((2L, 2L, h("a b c d"))))
    assert(got(2L) == ((2L, 1L, h("x y"))))
    assert(got(3L) == ((1L, 0L, h(""))))
    assert(got(4L) == ((2L, 2L, h("p q r"))))
  }

  test("richClub: thresholds above the max degree give the empty club") {
    val g = graphOf(Seq((1, 2), (2, 3)), symmetric = true)
    val got = DegreeStats.richClub(g, ks = Seq(8L)).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 0L && got.head.getLong(3) == 0L)
  }
}
