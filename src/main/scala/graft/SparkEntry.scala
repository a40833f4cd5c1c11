package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos._
import graft.sources.{EdgeBuilder, Transcripts}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Column-name discipline: every aggregate/computed column is aliased
 * identically in the Spark code and the DuckDB oracle SQL (the
 * driver's compare sorts columns by name before hashing). Floating
 * results are exported as scaled BIGINTs (`rank_e5` etc.) so the
 * hash compare is exact-integer, not bit-pattern-of-double.
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
   * full pipeline — transcripts → edges → PageRank to 1e-6. */
  def entry(spark: SparkSession): DataFrame = {
    val g = Graphs.get(spark, "/root/testdata/sf0.001", symmetric = false)
    val pr = PageRank.run(g, iterations = 0, maxIterations = 50, tol = 1e-6)
    pr.ranks.join(g.vertices, "id")
      .select(col("key"), col("rank"))
      .orderBy(desc("rank")).limit(100)
  }

  /** (id,lbl) labels → (key, component) with component = min KEY in the
   * component (id-assignment-independent, so the DuckDB oracle can
   * reproduce it without knowing our dictionary). */
  private def labelsToKeyed(g: LinkGraph, labels: DataFrame): DataFrame = {
    val keyed = labels.join(g.vertices, "id").select(col("key"), col("lbl"))
    val reps = keyed.groupBy(col("lbl")).agg(min(col("key")).as("component"))
    keyed.join(reps, "lbl").select(col("key"), col("component"))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graphQueries ++ PipelineEntry.queries

  private def graphQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- sources / builders (S1-S3 analogues) ----
    "q_transcripts" -> ((s, dir) =>
      Transcripts.fromEvents(s, dir)
        .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"))),
    "q_edges" -> ((s, dir) =>
      EdgeBuilder.keyEdges(Transcripts.fromEvents(s, dir))
        .select(col("src_key"), col("dst_key"), col("kind"))),
    // §2.1 native-source parity: synthesize the reference's packed
    // LE-uint32 binary edge file from the events table (deterministic
    // capped fixture — the ONE bounded collect this needs), load it
    // back through GeminiEdgeList.load (binaryRecords byte-range
    // split, the MPI-rank analogue of core/graph.hpp:788-795), build
    // the directed LinkGraph, report non-isolated per-vertex degrees.
    // The oracle re-derives the same degrees straight from events —
    // any byte-layout or endianness drift in the codec breaks it.
    "q_gemini_load" -> ((s, dir) => {
      val pairs = s.read.parquet(s"$dir/events.parquet")
        .orderBy(col("event_id")).limit(100000)
        .select(col("user_id").cast("long"), pmod(col("event_id"), lit(997L)))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_gemini_${Integer.toHexString(dir.hashCode)}.bin").getPath
      sources.GeminiEdgeList.writeFixture(pairs, path)
      val g = sources.GeminiEdgeList.load(s, path, 2048L, symmetric = false)
      g.degrees.where(col("out_degree") + col("in_degree") > 0)
        .select(col("id"), col("out_degree"), col("in_degree"))
    }),
    // the incremental (Structured Streaming) builder, executed in
    // batch mode over the same input — same oracle as q_edges, since
    // stream ≡ batch is the operator's contract (StreamingSpec)
    "q_stream_edges" -> ((s, dir) =>
      streaming.EdgeStream.edges(Transcripts.fromEvents(s, dir)).toDF()
        .select(col("src_key"), col("dst_key"), col("kind"))),
    // watermarked tumbling-window tool-invocation counts, batch mode
    // (the watermark node is a no-op on static input — same code path
    // as the streaming leg, StreamingSpec proves the stream semantics)
    "q_tool_windows" -> ((s, dir) =>
      streaming.EdgeStream.toolWindows(Transcripts.fromEvents(s, dir))),
    // hopping-window variant (1 h window / 30 min slide), batch mode
    "q_tool_sliding" -> ((s, dir) =>
      streaming.EdgeStream.toolSliding(Transcripts.fromEvents(s, dir))),
    // session-window sessionization (30-min inactivity gap), batch mode
    "q_conv_sessions" -> ((s, dir) =>
      streaming.EdgeStream.convSessions(Transcripts.fromEvents(s, dir))),
    // stream-stream interval join in batch mode: error turns ⋈ same-conv
    // tool calls within the following 10 minutes (watermark-bounded
    // state on streams; StreamingSpec proves stream ≡ batch)
    "q_err_tools" -> ((s, dir) =>
      streaming.EdgeStream.errorToolJoin(Transcripts.fromEvents(s, dir))),
    // merge as-of join: each tool turn ⋈ the latest strictly-earlier
    // user turn of its conversation (operators.Temporal — one hash
    // shuffle + running max, no nested-loop join)
    "q_asof" -> ((s, dir) => {
      val t = Transcripts.fromEvents(s, dir)
      val probes = t.where(col("role") === "tool")
        .select(col("conv_id"), col("turn_idx"))
      val quotes = t.where(col("role") === "user")
        .select(col("conv_id"), col("turn_idx"), col("text"))
      operators.Temporal.asOfJoin(probes, quotes, "conv_id", "turn_idx", Seq("text"))
        .select(col("conv_id"), col("turn_idx"),
          col("asof.q_turn_idx").as("user_turn_idx"),
          col("asof.text").as("user_text"))
    }),
    // SFT training-pair extraction: every assistant turn paired with
    // the latest strictly-earlier user turn of its conversation (the
    // prompt). Rides the merge as-of join — one hash shuffle, no
    // nested loop; the oracle replays it with an independent
    // join-and-argmax plan
    "q_sft_pairs" -> ((s, dir) => {
      val t = Transcripts.fromEvents(s, dir)
      val probes = t.where(col("role") === "assistant")
        .select(col("conv_id"), col("turn_idx"), col("text").as("response"))
      val quotes = t.where(col("role") === "user")
        .select(col("conv_id"), col("turn_idx"), col("text"))
      operators.Temporal.asOfJoin(probes, quotes, "conv_id", "turn_idx", Seq("text"))
        .select(col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
          col("asof.q_turn_idx").cast("long").as("prompt_turn_idx"),
          col("asof.text").as("prompt"), col("response"))
    }),
    // SFT echo screen: distinct-token overlap of each extracted
    // response with its as-of prompt — flags quote-looping pairs
    "q_echo" -> ((s, dir) =>
      pipeline.Extract.sftEcho(Transcripts.fromEvents(s, dir))),
    // role-transition Markov census: the dialogue-structure
    // fingerprint (per-edge count + e4 share of the source role)
    "q_role_trans" -> ((s, dir) =>
      pipeline.Funnel.roleTransitions(Transcripts.fromEvents(s, dir))),
    // bucketed range join: tool invocations (any conversation) counted
    // into the 10-minute incident window after every error turn — a
    // genuinely keyless interval join, blocked into 5-minute time
    // buckets so every exchange stays an equi-hash shuffle
    "q_range" -> ((s, dir) => {
      val t = Transcripts.fromEvents(s, dir)
      def tsUs = unix_micros(col("ts").cast("timestamp"))
      val incidents = t.where(col("text").startsWith("error"))
        .select(col("conv_id"), col("turn_idx"),
          tsUs.as("t0"), (tsUs + lit(600000000L)).as("t1"))
      val points = t.where(col("tool").isNotNull).select(tsUs.as("tp"))
      operators.Temporal.rangeJoin(points, incidents, "tp", "t0", "t1",
        bucketWidth = 300000000L)
        .groupBy(col("conv_id"), col("turn_idx"))
        .agg(count(lit(1)).as("n_tool_calls"))
    }),
    "q_degrees" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      g.degrees.join(g.vertices, "id")
        .select(col("key"), col("out_degree"), col("in_degree"))
    }),
    // ---- iterative algorithms (A1-A7) ----
    "q_pagerank" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      val pr = PageRank.run(g, iterations = 5)
      pr.ranks.join(g.vertices, "id")
        .select(col("key"),
          round(col("rank") * 100000).cast("long").as("rank_e5"))
    }),
    "q_cc" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      labelsToKeyed(g, ConnectedComponents.run(g).labels)
    }),
    // same fixpoint via O(log|V|)-round star contraction (CCStar) —
    // shares q_cc's independent structural oracle, so a green row is
    // hard evidence both CC algorithms agree at driver scale
    "q_cc_fast" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      labelsToKeyed(g, CCStar.run(g).labels)
    }),
    "q_lp" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      labelsToKeyed(g, LabelPropagation.run(g).labels)
    }),
    // batch PPR: the top-4 hub seeds' personalization vectors in ONE
    // superstep loop (the MSBFS trick — K rides in rows, not jobs)
    "q_ppr_multi" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val seedIds = g.degrees.join(g.vertices, "id")
        .orderBy(desc("out_degree"), col("key"))
        .limit(4).select(col("id"))
        .collect().map(_.getLong(0)).toSeq
      PersonalizedPageRank.runBatch(g, seedIds)
        .join(g.vertices.select(col("id").as("sid"), col("key").as("seed_key")), "sid")
        .join(g.vertices, "id")
        .select(col("seed_key"), col("key"),
          round(col("raw") * 100000).cast("long").as("rank_e5"))
    }),
    // mode-label community detection (Raghavan LP, deterministic
    // fixed-round synchronous variant) — finds communities INSIDE
    // components, unlike min-propagation whose fixpoint is the component
    "q_lp_comm" -> ((s, dir) =>
      LabelPropagation.communities(Graphs.get(s, dir, symmetric = true))),
    // temporal earliest-arrival reachability over time-respecting
    // paths — seeds at every conversation's turn 0, integer epoch-µs
    "q_treach" -> ((s, dir) => {
      val tr = Transcripts.fromEvents(s, dir)
      val te = EdgeBuilder.keyEdgesTemporal(tr)
      val seeds = EdgeBuilder.turnKey(tr).where(col("turn_idx") === 0)
        .select(col("vkey").as("key"),
          unix_micros(col("ts").cast("timestamp")).as("arr"))
      val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      TemporalReach.run(te, seeds, parts).arrivals
    }),
    // Weisfeiler-Lehman color refinement (3 rounds, commutative
    // multiset-sum hash — partially aggregates at hubs, no sorted
    // concat); equal wl ⇔ same 3-hop unfolding tree
    "q_wl" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      WlRefine.run(g, rounds = 3)
        .join(g.vertices, "id")
        .select(col("key"), col("wl"))
    }),
    "q_triangles" -> ((s, dir) => {
      import s.implicits._
      val g = Graphs.get(s, dir, symmetric = true)
      Seq(TriangleCount.count(g)).toDF("n_triangles")
    }),
    // one more rung of the clique ladder (kClist k=4): oriented
    // triangle table extended through the apex's DAG out-edges
    "q_4clique" -> ((s, dir) => {
      import s.implicits._
      val g = Graphs.get(s, dir, symmetric = true)
      Seq(TriangleCount.countFourCliques(g)).toDF("n_4cliques")
    }),
    // Same 5-iteration PageRank but FORCING the salted two-level
    // gather (saltBuckets = 4) — shares q_pagerank's DuckDB oracle, so
    // a green row is hard evidence the skew path computes identical
    // messages (round-1 verdict: salting was dead code).
    "q_pagerank_salted" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      val pr = PageRank.run(g, iterations = 5, saltBuckets = 4)
      pr.ranks.join(g.vertices, "id")
        .select(col("key"),
          round(col("rank") * 100000).cast("long").as("rank_e5"))
    }),
    // Weighted PageRank: rank drains along tool-call edges (w=2.0)
    // twice as fast as the conversation spine (w=1.0). The +1e-6
    // (in e5 units) nudge dodges exact .5 rounding boundaries: small
    // rational weights make ranks like 0.228625 land EXACTLY on a
    // half, where 1-ulp cross-engine noise flips round() — the same
    // nudge in the oracle keeps both engines on the same side.
    "q_pagerank_w" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      WeightedPageRank.run(g, iterations = 5).ranks.join(g.vertices, "id")
        .select(col("key"),
          round(col("rank") * 100000 + lit(1e-6)).cast("long").as("rank_e5"))
    }),
    // Time-decayed (recency-weighted) PageRank: edge weight =
    // 2^-⌊age/3 days⌋ of the source turn — temporal link analysis on
    // the same WeightedPageRank machinery. The decay arithmetic is
    // dyadic-exact (integer age buckets, shift-and-divide), so the
    // oracle replays it bit-for-bit.
    "q_pagerank_decay" -> ((s, dir) => {
      val ke = EdgeBuilder.keyEdgesDecayed(Transcripts.fromEvents(s, dir))
      val g = LinkGraph.fromKeyEdges(ke, symmetric = false, Graphs.shufflePartitions(s))
      WeightedPageRank.run(g, iterations = 5).ranks.join(g.vertices, "id")
        .select(col("key"),
          round(col("rank") * 100000 + lit(1e-6)).cast("long").as("rank_e5"))
    }),
    "q_pagerank_conv" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      val pr = PageRank.run(g, iterations = 0, maxIterations = 100, tol = 1e-6)
      pr.ranks.join(g.vertices, "id")
        .select(col("key"),
          round(col("rank") * 100000).cast("long").as("rank_e5"))
    }),
    // Personalized PageRank seeded at the busiest tool hub on the
    // symmetric graph: mass radiates from the seed (support 1 →
    // thousands over 5 hops), so early supersteps exercise the
    // sparse/push path vs global PageRank's always-dense gathers
    "q_ppr" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val r = PersonalizedPageRank.run(g, Seq(rootId(g)), iterations = 5)
      g.vertices.join(r.scores, Seq("id"), "left")
        .select(col("key"),
          round(coalesce(col("score"), lit(0.0)) * 100000).cast("long").as("rank_e5"))
    }),
    // PPR sweep cut (PageRank-Nibble): conductance profile of the
    // degree-normalized PPR order around the hub seed — the local
    // community detector; integer-exact order + difference-array cuts
    "q_sweep" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val r = PersonalizedPageRank.run(g, Seq(rootId(g)), iterations = 5)
      SweepCut.run(g, r.scores, k = 100)
    }),
    // HITS hubs/authorities on the directed graph — unnormalized
    // fixed-iteration variant keeps scores exact integers, so the
    // oracle compare has zero floating-point surface
    "q_hits" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      Hits.run(g, iterations = 4).scores.join(g.vertices, "id")
        .select(col("key"), col("auth"), col("hub"))
    }),
    // SALSA authorities/hubs — HITS's degree-normalized sibling;
    // integer floor-division walk replayed exactly by the oracle
    "q_salsa" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      Salsa.run(g, iterations = 4).scores.join(g.vertices, "id")
        .select(col("key"), col("auth"), col("hub"))
    }),
    // linear-threshold influence cascade from the 4 busiest hubs on
    // the directed graph: md5-derived integer thresholds, monotone
    // frontier rounds — (key, activation round)
    "q_cascade" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      Cascade.run(g, rootIds(g, 4), maxRounds = 8)
        .join(g.vertices, "id")
        .select(col("key"), col("act_round"))
    }),
    // 2-core of the symmetric graph (iterative peeling; chains braided
    // by shared tools survive, pure linear conversations peel away)
    "q_kcore" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      KCore.run(g, k = 2).core.join(g.vertices, "id")
        .select(col("key"), col("core_degree"))
    }),
    // full core decomposition — per-vertex max-k membership
    "q_coreness" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      KCore.coreness(g).join(g.vertices, "id")
        .select(col("key"), col("coreness"))
    }),
    // 3-truss: edges surviving the triangle-support peel, with their
    // fixpoint support (cohesion one notch above k-core)
    "q_truss" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Truss.keyed(g, k = 3)
    }),
    // FULL truss decomposition — per-edge max-k membership (the edge
    // twin of q_coreness): increasing-k peels, each from the previous
    // truss fixpoint (trusses nest)
    "q_trussness" -> ((s, dir) =>
      Truss.trussnessKeyed(Graphs.get(s, dir, symmetric = true))),
    "q_bfs" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Bfs.run(g, rootId(g)).tree.join(g.vertices, "id")
        .select(col("key"), col("level").cast("long").as("level"))
    }),
    "q_sssp" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Sssp.run(g, rootId(g)).distances.join(g.vertices, "id")
        .select(col("key"), round(col("dist") * 1000).cast("long").as("dist_e3"))
    }),
    // same distances via delta-stepping's bucketed schedule (the
    // long-weighted-diameter scale path) — shares q_sssp's oracle
    "q_sssp_delta" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      DeltaStepping.run(g, rootId(g), delta = 2.0).distances.join(g.vertices, "id")
        .select(col("key"), round(col("dist") * 1000).cast("long").as("dist_e3"))
    }),
    "q_bc" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Betweenness.run(g, rootId(g)).bc.join(g.vertices, "id")
        .select(col("key"), col("sigma").cast("long").as("sigma"),
          round(col("bc") * 1000).cast("long").as("bc_e3"))
    }),
    // Edge betweenness from the same root (Girvan-Newman scoring):
    // pure composition of the vertex Brandes pass + BFS levels + one
    // co-partitioned edge join — no new frontier machinery
    "q_ebc" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val sk = g.vertices.select(col("id").as("src"), col("key").as("src_key"))
      val dk = g.vertices.select(col("id").as("dst"), col("key").as("dst_key"))
      EdgeBetweenness.run(g, rootId(g))
        .join(sk, "src").join(dk, "dst")
        .select(col("src_key"), col("dst_key"),
          round(col("ebc") * 1000).cast("long").as("ebc_e3"))
    }),
    // Multi-source BFS: the 4 busiest hubs searched in ONE frontier
    // loop (K landmarks at O(diameter) total jobs — the batched form
    // the per-root reference loop can't express)
    "q_msbfs" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      MultiSourceBfs.run(g, rootIds(g, 4)).dists
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .join(g.vertices, "id")
        .select(col("root_key"), col("key"), col("dist").cast("long").as("level"))
    }),
    // bidirectional s-t BFS between the two busiest hubs (radii-
    // certified early stop; -1 when disconnected)
    "q_bidir" -> ((s, dir) => {
      import s.implicits._
      val g = Graphs.get(s, dir, symmetric = true)
      val ids = rootIds(g, 2)
      val keyOf = g.vertices.where(col("id").isin(ids: _*)).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("key")).toMap
      val r = BidirBfs.dist(g, ids(0), ids(1))
      Seq((keyOf(ids(0)), keyOf(ids(1)), r.dist)).toDF("s_key", "t_key", "dist")
    }),
    // deterministic R-MAT generator source: 20k edges over 2^12
    // vertices, pure function of (seed, i) — engine-replayable
    "q_rmat" -> ((s, _) => sources.RMat.edges(s, n = 20000L, scale = 12)),
    // generator → engine roundtrip: the R-MAT multigraph through the
    // dedup/self-loop-drop build, out-degree power-law histogram
    "q_rmat_degs" -> ((s, _) => {
      import graft.syntax._
      val e = sources.RMat.edges(s, n = 20000L, scale = 12)
      val g = LinkGraph.fromIdEdges(e.select(col("src"), col("dst")),
        1L << 12, symmetric = false, Graphs.shufflePartitions(s))
      val out = DegreeStats.histogram(g).graftCut
      g.unpersist()
      out
    }),
    // Broder bow-tie decomposition of the tool-transition digraph
    // (CORE = largest SCC, IN/OUT via two frontier closures over the
    // O(1) transpose)
    "q_bowtie" -> ((s, dir) => {
      val tt = EdgeBuilder.toolTransitions(Transcripts.fromEvents(s, dir))
      val g = LinkGraph.fromKeyEdges(tt, symmetric = false,
        Graphs.shufflePartitions(s))
      BowTie.census(g)
    }),
    // directed in/out-degree correlation sufficient statistics (one
    // exact-integer row; Pearson r is the consumer's one float div)
    // PageRank-vs-degree Pearson sufficient statistics: exact integer
    // sums over (out_degree, rank_e5) — the "is PageRank ≈ degree on
    // this graph" readout (assemble r from the six sums downstream)
    "q_pr_deg_corr" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      val pr = PageRank.run(g, iterations = 5).ranks
        .select(col("id"), round(col("rank") * 100000).cast("long").as("r"))
      g.degrees.select(col("id"), col("out_degree").as("d"))
        .join(pr, "id")
        .agg(count(lit(1)).as("n"),
          sum(col("d")).as("s_d"), sum(col("r")).as("s_r"),
          sum(col("d") * col("d")).as("ss_d"),
          sum(col("r") * col("r")).as("ss_r"),
          sum(col("d") * col("r")).as("s_dr"))
    }),
    "q_deg_corr" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      g.degrees.agg(
        count(lit(1)).as("n"),
        sum(col("out_degree")).as("s_out"),
        sum(col("in_degree")).as("s_in"),
        sum(col("out_degree") * col("out_degree")).as("ss_out"),
        sum(col("in_degree") * col("in_degree")).as("ss_in"),
        sum(col("in_degree") * col("out_degree")).as("s_io"))
    }),
    // per-tool distinctive terms (integer lift vs the corpus token
    // distribution — "what is this tool used for")
    "q_topic_tools" -> ((s, dir) =>
      pipeline.Cooccur.toolTopTerms(Transcripts.fromEvents(s, dir))),
    // hashing-trick conversation featurizer (signed md5 buckets,
    // long-format exact integers)
    "q_hashfeat" -> ((s, dir) =>
      pipeline.Extract.hashFeatures(Transcripts.fromEvents(s, dir))),
    // landmark distance-oracle estimates between the top-6 hub pairs
    // (min over landmarks of d(a,l)+d(l,b) — the scalable approximate
    // point-to-point distance technique)
    "q_dist_oracle" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      // hubs restricted to the GIANT component (size desc, min key —
      // same pick as KCenter) so every pair has a defined estimate
      val lk = Graphs.ccLabels(s, dir).join(g.vertices, "id")
      val giantLbl = lk.groupBy(col("lbl"))
        .agg(count(lit(1)).as("sz"), min(col("key")).as("mk"))
        .orderBy(desc("sz"), asc("mk")).limit(1)
        .first().getLong(0)
      val hubs = g.degrees
        .join(lk.where(col("lbl") === giantLbl).select(col("id"), col("key")), "id")
        .orderBy(desc("out_degree"), asc("key"))
        .limit(6).select(col("id")).collect().map(_.getLong(0)).toSeq
      val dists = MultiSourceBfs.run(g, hubs.take(4)).dists
      val pairs = for { i <- hubs.indices; j <- i + 1 until hubs.length }
        yield (hubs(i), hubs(j))
      MultiSourceBfs.distOracle(dists, g.vertices, pairs)
    }),
    // sequential patterns: tool a → b ordered support per conversation
    // (PrefixSpan length-2 core; first_pos(a) < last_pos(b))
    "q_seq_mining" -> ((s, dir) =>
      pipeline.Cooccur.toolSeqPatterns(Transcripts.fromEvents(s, dir))),
    // stale-tool deprecation screen (last-used UTC day vs corpus max)
    "q_stale_tools" -> ((s, dir) =>
      pipeline.Cooccur.staleTools(Transcripts.fromEvents(s, dir))),
    // second-order tool-transition trigram census (order-2 Markov
    // fingerprint with conditional share vs the bigram prefix)
    "q_markov2" -> ((s, dir) =>
      pipeline.Funnel.toolMarkov2(Transcripts.fromEvents(s, dir))),
    // δ-windowed temporal motif census over consecutive tool-call
    // triples (retry ping-pong vs pipeline, within a 2-day span)
    "q_temporal_motifs" -> ((s, dir) =>
      pipeline.Funnel.temporalMotifs(Transcripts.fromEvents(s, dir))),
    // per-tool burstiness: Fano factor of daily call counts over the
    // active lifetime (Poisson ≈ 10⁴, batchy ≫ 10⁴)
    "q_burstiness" -> ((s, dir) =>
      pipeline.Funnel.toolBurstiness(Transcripts.fromEvents(s, dir))),
    // inter-turn gap histogram, power-of-two µs buckets (latency
    // distribution shape)
    "q_gap_hist" -> ((s, dir) =>
      pipeline.Funnel.gapHistogram(Transcripts.fromEvents(s, dir))),
    // landmark distance-distribution census: (root, vertex) pairs per
    // hop distance — the small-world curve from the MSBFS state
    "q_dist_census" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      MultiSourceBfs.distCensus(MultiSourceBfs.run(g, rootIds(g, 4)).dists)
    }),
    // ingestion-volume anomaly days: integer k-sigma spike/drop flags
    // on the per-UTC-day turn volume
    "q_anomaly_days" -> ((s, dir) =>
      pipeline.Profile.dailyAnomalies(Transcripts.fromEvents(s, dir))),
    // conversation topic drift: first-half vs second-half distinct-
    // token Jaccard (whole-conv complement of TextTiling segments)
    "q_drift" -> ((s, dir) =>
      pipeline.Segment.halfDrift(Transcripts.fromEvents(s, dir))),
    // Per-vertex triangle counts + degree (local clustering coefficient
    // = 2t/d(d-1), derivable from the integer pair)
    "q_clustering" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      TriangleCount.perVertex(g).join(g.vertices, "id")
        .select(col("key"), col("degree"), col("triangles"))
    }),
    // OddBall ego-net anomaly features (Akoglu et al. 2010): ego
    // nodes/edges from the shared triangle table + the near-clique
    // density ratio — near-cliques ≈ 10⁴, near-stars ≈ 2·10⁴/n_ego
    "q_oddball" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      TriangleCount.perVertex(g).join(g.vertices, "id")
        .select(col("key"),
          (col("degree") + 1).as("n_ego"),
          (col("degree") + col("triangles")).as("e_ego"),
          when(col("degree") < 2, 10000L)
            .otherwise(
              expr("(2 * (degree + triangles) * 10000) div ((degree + 1) * degree)"))
            .as("clique_e4"))
    }),
    // Luby MIS with fixed md5-key priorities (lexicographically-first
    // MIS of that order — deterministic, so oracle-checkable)
    "q_mis" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Mis.run(g).mis.join(g.vertices, "id")
        .select(col("key"), col("round").cast("long").as("round"))
    }),
    // Double-sweep diameter lower bound (2 BFS runs, O(2·diameter) jobs)
    "q_diameter" -> ((s, dir) => {
      import s.implicits._
      val g = Graphs.get(s, dir, symmetric = true)
      val r = Diameter.run(g, rootId(g))
      Seq((r.startKey, r.farKey, r.eccStart, r.far2Key, r.eccFar))
        .toDF("start_key", "far_key", "ecc_start", "far2_key", "ecc_far")
    }),
    // Harmonic closeness of the same 4 landmark roots (integer-exact
    // Σ floor(1e4/d) export)
    "q_closeness" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      MultiSourceBfs.harmonicCloseness(MultiSourceBfs.run(g, rootIds(g, 4)).dists)
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .select(col("root_key"), col("n_reached"), col("harmonic_e4"))
    }),
    // the dual: landmark-sampled harmonic-centrality ESTIMATE for
    // every vertex (the affordable form of per-vertex closeness at
    // scale — exact needs all-pairs distances)
    "q_closeness_all" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      MultiSourceBfs.landmarkCloseness(MultiSourceBfs.run(g, rootIds(g, 4)).dists)
        .join(g.vertices, "id")
        .select(col("key"), col("n_landmarks"), col("harmonic_e4"))
    }),
    // Deterministic random walks (DeepWalk-style corpus sampling) from
    // the 4 busiest hubs: step t moves to argmin md5(cur|t|nbr) — an
    // md5-uniform but replayable choice, so the walk set is exact
    "q_walks" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      RandomWalk.run(g, rootIds(g, 4), steps = 8).walks
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .join(g.vertices, "id")
        .select(col("root_key"), col("step").cast("long").as("step"), col("key"))
    }),
    // Skip-gram (center, context) training pairs from the q_walks
    // sequences, window 2 — the DeepWalk data-generation step
    "q_sgpairs" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val wk = RandomWalk.run(g, rootIds(g, 4), steps = 8).walks
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .join(g.vertices, "id")
        .select(col("root_key"), col("step").cast("long").as("step"), col("key"))
      RandomWalk.skipGramPairs(wk, window = 2)
    }),
    // Weight-proportional walks (node2vec-style bias): the hash picks
    // a slot on the cumulative integer-weight line — exact + replayable
    "q_walks_w" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      RandomWalk.run(g, rootIds(g, 4), steps = 8, weighted = true).walks
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .join(g.vertices, "id")
        .select(col("root_key"), col("step").cast("long").as("step"), col("key"))
    }),
    // node2vec second-order biased walks (return/neighbor/far bias
    // 2:4:1 ≙ p=2, q=4) — same exact cumulative-slot replay contract
    "q_walks_n2v" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      RandomWalk.runNode2vec(g, rootIds(g, 4), steps = 8).walks
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .join(g.vertices, "id")
        .select(col("root_key"), col("step").cast("long").as("step"), col("key"))
    }),
    // Degree histogram in power-of-two buckets (exact bit-length
    // bucketing, no float log)
    "q_deg_hist" -> ((s, dir) =>
      DegreeStats.histogram(Graphs.get(s, dir, symmetric = true))),
    // Rich-club coefficient: hub-club density per degree threshold
    // (one edge pass grouped by min endpoint degree; thresholds join
    // the tiny aggregate — cost independent of |ks|)
    "q_richclub" -> ((s, dir) =>
      DegreeStats.richClub(Graphs.get(s, dir, symmetric = true))),
    // Link prediction: resource-allocation neighborhood overlap of
    // non-adjacent pairs (wedge-center degree cap, integer-exact RA)
    "q_linkpred" -> ((s, dir) =>
      LinkPredict.topOverlap(Graphs.get(s, dir, symmetric = true), k = 100)),
    // Per-edge neighborhood Jaccard (structural near-dup signal;
    // triangles-per-edge via the degree-oriented wedge join, no cap)
    "q_edge_jaccard" -> ((s, dir) =>
      LinkPredict.edgeJaccard(Graphs.get(s, dir, symmetric = true))),
    // backbone sparsifier at k = 1 (the "best-friend" graph): keep an
    // edge iff it is SOME endpoint's single most-embedded edge —
    // retained size ≤ |V| under any degree skew (k = 3 keeps every
    // edge on this mostly-chain topology, so the driver query runs
    // the setting that demonstrably trims)
    "q_backbone" -> ((s, dir) =>
      LinkPredict.backbone(Graphs.get(s, dir, symmetric = true), k = 1)),
    // Component-size census (giant-component check) over the CC labels
    // size census over the star-contraction labels (same min-id
    // fixpoint as HashMin, O(log|V|) rounds — see CCStar)
    "q_cc_sizes" -> ((s, dir) =>
      DegreeStats.sizeHistogram(Graphs.ccLabels(s, dir))),
    // Tool co-occurrence lift over conversations (association mining
    // on the transcript table; integer-exact ⌊10⁴·lift⌋ export)
    "q_tool_lift" -> ((s, dir) =>
      pipeline.Cooccur.toolLift(Transcripts.fromEvents(s, dir))),
    // A-priori frequent tool itemsets (1-3) with a relative support
    // threshold; downward-closure pruning keeps the mine linear
    "q_itemsets" -> ((s, dir) =>
      pipeline.Cooccur.frequentItemsets(Transcripts.fromEvents(s, dir))),
    // ordered tool funnel s1→s2→s3 (top-3 tools by conv usage), each
    // step strictly after the previous — per-conv depth + completion
    "q_funnel" -> ((s, dir) =>
      pipeline.Funnel.toolFunnel(Transcripts.fromEvents(s, dir))),
    // Morton/Z-order layout key over (user, hour) — two-dimensional
    // file pruning for the snapshot-table layout story
    "q_zorder" -> ((s, dir) =>
      operators.ZOrder.eventsZOrder(s.read.parquet(s"$dir/events.parquet"))),
    // Holland-Leinhardt triad census of the antisymmetric
    // tool-transition digraph (closed forms + two triangle joins)
    "q_triads" -> ((s, dir) =>
      TriadCensus.run(EdgeBuilder.toolTransitions(Transcripts.fromEvents(s, dir)))),
    // Holland-Leinhardt dyad census (mutual/asym/null) of the RAW
    // transition digraph — the reciprocity readout under q_triads
    "q_dyads" -> ((s, dir) =>
      TriadCensus.dyads(EdgeBuilder.toolTransitionCounts(Transcripts.fromEvents(s, dir)))),
    // greedy maximal coverage (12 picks): which conversations cover
    // the most not-yet-covered tools — the coreset-selection greedy
    "q_cover" -> ((s, dir) =>
      pipeline.Cover.greedyCover(Transcripts.fromEvents(s, dir))),
    // Gini concentration of tool usage (integer rank form) — the
    // skew-planning readout: near-1 = hub mitigation mandatory
    "q_gini" -> ((s, dir) =>
      pipeline.Cooccur.toolGini(Transcripts.fromEvents(s, dir))),
    // per-conversation latency profile (integer µs; value-at-rank median)
    "q_latency" -> ((s, dir) =>
      pipeline.Funnel.latency(Transcripts.fromEvents(s, dir))),
    // per-tool response-latency profile (gap to the next turn after
    // each tool call; integer µs, value-at-rank median per tool)
    "q_tool_latency" -> ((s, dir) =>
      pipeline.Funnel.toolLatency(Transcripts.fromEvents(s, dir))),
    // conversation-length census in power-of-two buckets (bit-length
    // bucketing — the packing/sessionization sizing readout)
    "q_conv_hist" -> ((s, dir) =>
      pipeline.Funnel.convHistogram(Transcripts.fromEvents(s, dir))),
    // Heaps'-law vocabulary growth: per-day token volume, first-seen
    // word types, and running totals (integer UTC days)
    "q_heaps" -> ((s, dir) =>
      pipeline.TextStats.heapsCurve(Transcripts.fromEvents(s, dir))),
    // chat-format lint: per-conv structural flags (opens-with-user,
    // has-assistant, role fragmentation) an SFT pipeline gates on
    "q_chatlint" -> ((s, dir) =>
      pipeline.Funnel.chatLint(Transcripts.fromEvents(s, dir))),
    // context-budget truncation census: leading turns that fit a
    // 256-token window + head-truncation token loss per conversation
    "q_ctx_budget" -> ((s, dir) =>
      pipeline.Funnel.ctxBudget(Transcripts.fromEvents(s, dir))),
    // boilerplate-turn detection: texts recurring across ≥2 distinct
    // conversations (greeting/template mass), top-100 deterministic
    "q_boilerplate" -> ((s, dir) =>
      pipeline.TextStats.boilerplate(Transcripts.fromEvents(s, dir))),
    // graph evolution telemetry: per-week turn volume + first-seen
    // edge/vertex counts (growth + densification curve)
    "q_graph_growth" -> ((s, dir) =>
      EdgeBuilder.growthCensus(Transcripts.fromEvents(s, dir))),
    // corpus freshness: per-day n-gram novelty curve (new-gram mass
    // per UTC day — integer day arithmetic, no timezone)
    "q_novelty" -> ((s, dir) =>
      pipeline.TextStats.noveltyByDay(Transcripts.fromEvents(s, dir))),
    // agent stuck-loop census: maximal same-tool runs ≥ 3 across a
    // conversation's tool-bearing turns (gaps-and-islands, per-conv
    // windows only)
    "q_toolloops" -> ((s, dir) =>
      pipeline.Funnel.toolLoops(Transcripts.fromEvents(s, dir))),
    // streaming decayed trending scores, batch mode (dyadic-exact
    // decay makes the stateful operator oracle-checkable)
    "q_trending" -> ((s, dir) => {
      val tr = Transcripts.fromEvents(s, dir)
      val refTs = tr.agg(max(unix_micros(col("ts").cast("timestamp"))))
        .first().getLong(0)
      streaming.ToolTrendStream.trending(tr, refTs).toDF()
    }),
    // densest-subgraph peel (Charikar greedy, Bahmani ε=½ parallel
    // rounds): per-round census + exact-rational best-round flag
    "q_densest" -> ((s, dir) =>
      Densest.run(Graphs.get(s, dir, symmetric = true), gateNum = 1, gateDen = 1)),
    // TextTiling-style lexical segmentation: boundary where adjacent
    // turns' distinct-token Jaccard dips below 0.30 (integer gate;
    // this corpus' overlaps cluster at {0.2, 0.5, 1.0})
    "q_segments" -> ((s, dir) =>
      pipeline.Segment.lexical(Transcripts.fromEvents(s, dir), thrE4 = 3000)),
    // TextRank turn salience: integer-exact weighted PageRank on the
    // per-conversation shared-token turn graph, top-3 turns per conv
    // (the extractive-summarization primitive for excerpt curation)
    "q_textrank" -> ((s, dir) =>
      pipeline.TextRank.turnSalience(Transcripts.fromEvents(s, dir))),
    // degree-assortativity sufficient statistics (exact integer sums)
    "q_assort" -> ((s, dir) =>
      DegreeStats.assortativity(Graphs.get(s, dir, symmetric = true))),
    // friendship-paradox readout: mean degree vs size-biased mean
    // neighbor degree (exact integer sums + floor-scaled means)
    "q_friendship" -> ((s, dir) =>
      DegreeStats.friendshipParadox(Graphs.get(s, dir, symmetric = true))),
    // deterministic parallel MAX-CUT local search: hash 2-coloring +
    // alternating-parity gain flips (monotone cut improvement)
    "q_maxcut" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      MaxCut.run(g, rounds = 4).join(g.vertices, "id")
        .select(col("key"), col("side"))
    }),
    // dominating-set election: each vertex's max-(deg,key) closed
    // neighbor — the cluster-head heuristic, hub-concentrated
    "q_domset" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      DegreeStats.dominatorElection(g).join(g.vertices, "id")
        .select(col("key"), col("dom_key"))
    }),
    // k_nn(k) degree-correlation curve: mean neighbor degree per
    // degree class (the functional form behind q_assort's scalar)
    "q_knn_curve" -> ((s, dir) =>
      DegreeStats.knnCurve(Graphs.get(s, dir, symmetric = true))),
    // ACL forward-push approximate PPR from the busiest hub: bulk
    // integer pushes, residual-thresholded frontier — work O(1/ε),
    // independent of graph size
    "q_ppr_push" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      PprPush.run(g, rootId(g), rounds = 6).state
        .join(g.vertices, "id")
        .select(col("key"), col("p"), col("r"))
    }),
    // INCREMENTAL PageRank (warm-start signed residual push): 10 cold
    // rounds on the adjacency-only subgraph simulate the pre-existing
    // batch, then the tool edges "arrive" — retraction un-absorbs the
    // affected sources and retracts their historical deliveries, and
    // 6 signed-push rounds repair the estimate on the full graph.
    // Exact ×2^40 integer trajectory; the oracle replays all 17 bulk
    // ops bit-for-bit (the q_ppr_push contract — a float fixpoint is
    // trajectory-dependent and could not be hash-checked).
    "q_pagerank_inc" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      PageRankInc.run(g, col("weight") === 2.0).state
        .join(g.vertices, "id")
        .select(col("key"), col("p"), col("r"))
    }),
    // GraphSAGE mean-pool layer (no learned weights): per (vertex,
    // dim) own feature + floored neighbor mean, long format so one
    // edge join serves all dims
    "q_sage" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Sage.meanPoolLayer(g).join(g.vertices, "id")
        .select(col("key"), col("dim"), col("own"), col("nbr_mean"))
    }),
    // deterministic maximal matching (md5-priority parallel greedy)
    "q_matching" -> ((s, dir) =>
      Matching.run(Graphs.get(s, dir, symmetric = true)).matching),
    // Preis locally-heaviest matching (1/2-approx max-weight) on the
    // hashed-capacity graph — min-priority == max weight, MSF tie-break
    "q_matching_w" -> ((s, dir) =>
      Matching.runWeighted(Graphs.getCapacity(s, dir)).matching),
    // one METIS-style coarsening level over that matching
    "q_coarsen" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Matching.coarsen(g, Matching.run(g).matching)
    }),
    // 2-approximate vertex cover = the matching's endpoints
    "q_vcover" -> ((s, dir) =>
      Matching.vertexCover(
        Matching.run(Graphs.get(s, dir, symmetric = true)).matching)),
    // incremental connectivity: components of the adjacency-only edge
    // set first (phase 1), then the tool edges "arrive" (weight 2.0 on
    // the symmetric graph — tool/turn vertex pairs are disjoint from
    // adjacency pairs, EdgeBuilder) and only their endpoints wake.
    // Shares q_cc's independent structural oracle: a green row is hard
    // evidence warm-start maintenance reaches the cold fixpoint.
    "q_cc_inc" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      labelsToKeyed(g,
        ConnectedComponents.incremental(g, col("weight") === 2.0).labels)
    }),
    // graph-Voronoi partition: every reached vertex assigned to its
    // nearest of the 4 landmark hubs (tie-break min seed key) — the
    // landmark-sharding operator, derived from the one-loop MSBFS state
    "q_voronoi" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val rootKeys = g.vertices.select(col("id").as("root"), col("key").as("root_key"))
      MultiSourceBfs.voronoi(MultiSourceBfs.run(g, rootIds(g, 4)).dists, rootKeys)
        .join(g.vertices, "id")
        .select(col("key"), col("seed_key"), col("dist"))
    }),
    // DAG longest-path depth (critical path): only the tree-contracted
    // schedule rides the driver map — the uncontracted per-level
    // baseline (DagDepth.run) returns the SAME fixpoint ~19× slower
    // (O(depth) cut jobs vs O(log L)) and lives on as the sbt-tested
    // reference schedule (PropertySpec DP equivalence + Round3bSpec
    // resume), not a timed duplicate in the 220-query sweep.
    // Pointer-jumping resolves the in-degree-1 forest in O(log L)
    // rounds, max-plus relaxes only the contracted roots.
    "q_critpath_fast" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      DagDepth.runContracted(g).depth.join(g.vertices, "id")
        .select(col("key"), col("d").as("depth"))
    }),
    // strongly connected components (distributed forward-backward
    // coloring) on the dominant-direction tool-transition digraph —
    // the derived graph with genuine cycles (the turn graph is a DAG
    // by construction, where every SCC would be a singleton)
    // truncated absorbing-walk hitting time to the tool vertices:
    // per-turn "expected turns until the next tool interaction"
    // (integer value iteration, 5 rounds, oracle replays them)
    "q_hitting" -> ((s, dir) =>
      HittingTime.run(Graphs.get(s, dir, symmetric = true),
        absorbing = col("key").startsWith("T#"))
        .select(col("key"), col("h_e4"))),
    // non-induced 4-node graphlet census: closed-form motif counts
    // (wedges/claws/paths/tailed/C4/diamond/K4) from one shared
    // codegree table — the motif fingerprint of the link graph
    "q_graphlets" -> ((s, dir) =>
      Graphlets.census4(Graphs.get(s, dir, symmetric = true))),
    // SimRank structural similarity on the dominant-direction tool
    // digraph: "similar tools follow similar tools" (integer-exact
    // 3-round fixpoint, diagonal pinned, oracle replays the rounds)
    "q_simrank" -> ((s, dir) =>
      algos.SimRank.run(EdgeBuilder.toolTransitions(Transcripts.fromEvents(s, dir)))),
    "q_scc" -> ((s, dir) => {
      val tt = EdgeBuilder.toolTransitions(Transcripts.fromEvents(s, dir))
      val g = LinkGraph.fromKeyEdges(tt, symmetric = false, Graphs.shufflePartitions(s))
      val lab = Scc.run(g).sccs.join(g.vertices, "id").select(col("key"), col("scc"))
      val reps = lab.groupBy(col("scc")).agg(min(col("key")).as("scc_key"))
      lab.join(reps, "scc").select(col("key"), col("scc_key"))
    }),
    // condensation DAG of the SCCs: cross-component edge census over
    // the same dominant-direction tool digraph (the component-level
    // workflow structure; provably acyclic)
    "q_scc_dag" -> ((s, dir) => {
      val tt = EdgeBuilder.toolTransitions(Transcripts.fromEvents(s, dir))
      val g = LinkGraph.fromKeyEdges(tt, symmetric = false, Graphs.shufflePartitions(s))
      val lab = Scc.run(g).sccs.join(g.vertices, "id")
      val reps = lab.groupBy(col("scc")).agg(min(col("key")).as("scc_key"))
      val lk = lab.join(reps, "scc").select(col("id"), col("scc_key"))
      g.edgesBySrc
        .join(lk.withColumnRenamed("id", "src").withColumnRenamed("scc_key", "comp_a"), "src")
        .join(lk.withColumnRenamed("id", "dst").withColumnRenamed("scc_key", "comp_b"), "dst")
        .where(col("comp_a") =!= col("comp_b"))
        .groupBy(col("comp_a"), col("comp_b")).agg(count(lit(1)).as("n_edges"))
    }),
    // Katz centrality, truncated at 5 walk lengths, α = 1/8 — exported
    // as the exact scaled integer 8⁵·katz (walk counts are integers,
    // the attenuation is dyadic)
    "q_katz" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      Katz.run(g, iterations = 5).katz.join(g.vertices, "id")
        .select(col("key"), col("katz_x"))
    }),
    // eigenvector centrality: integer power iteration, 6 rounds with
    // L∞ floor renormalization — bit-replayable in any engine
    "q_eigen" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      EigenCentrality.run(g, iterations = 6).eigen.join(g.vertices, "id")
        .select(col("key"), col("eigen_x"))
    }),
    // Wyllie list ranking over the conversation chains: distance to
    // the conversation's last turn in O(log L) pointer-doubling rounds
    // (vs O(L) frontier supersteps — the chain-scale primitive)
    "q_listrank" -> ((s, dir) => {
      val succ = EdgeBuilder.turnSuccessors(Transcripts.fromEvents(s, dir))
      ListRank.run(succ, Graphs.shufflePartitions(s)).ranks
        .select(col("id").as("key"), col("rank").as("rank_to_end"))
    }),
    // Newman-modularity sufficient statistics of the mode-LP
    // communities: per community (members, intra-edges, degree sum) —
    // Q·4m² = Σ_c (4m·e_c − d_c²) assembles from these in pure integers
    "q_modularity" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      LabelPropagation.communityStats(g, LabelPropagation.communities(g))
    }),
    // landmark eccentricities from the one-loop MSBFS state: max(ecc)
    // lower-bounds the diameter, min(ecc) upper-bounds the radius
    "q_ecc" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      MultiSourceBfs.eccentricity(MultiSourceBfs.run(g, rootIds(g, 4)).dists)
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .select(col("root_key"), col("ecc"), col("n_reached"))
    }),
    // GNN-style 2-hop neighborhood aggregation with the degree as the
    // seed feature — the message-passing feature-engineering primitive
    "q_khop" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      DegreeStats.khopDegreeSums(g).join(g.vertices, "id")
        .select(col("key"), col("h1"), col("h2"))
    }),
    // structured-metadata extraction: get_json_object over the JSON
    // payload of every turn, aggregated per conversation
    "q_extract" -> ((s, dir) =>
      pipeline.Extract.convMetadata(Transcripts.fromEvents(s, dir))),
    // deterministic GraphSAGE-style neighbor sampling (md5 top-s per
    // vertex on the symmetric graph) — the GNN mini-batch primitive
    "q_nbrsample" -> ((s, dir) =>
      NeighborSample.sample(Graphs.get(s, dir, symmetric = true), s = 3)),
    // bipartite (two-mode) projection: conversations sharing tools →
    // weighted one-mode co-use edges (hub-cap guard sbt-tested;
    // uncapped here — the tool degrees are bounded by construction)
    "q_biproj" -> ((s, dir) => {
      val m = Transcripts.fromEvents(s, dir)
        .where(col("tool").isNotNull)
        .select(col("conv_id").as("entity"), col("tool").as("group"))
      operators.Bipartite.project(m)
        .select(col("a").as("conv_a"), col("b").as("conv_b"), col("shared"))
    }),
    // butterfly (bipartite 4-cycle) counting on the tool–conversation
    // graph: per tool pair, shared-conversation count c and C(c,2)
    // butterflies — the bipartite cohesion motif (entity-side wedge
    // generator, so hub TOOLS cost nothing; see Bipartite.butterflies)
    "q_butterflies" -> ((s, dir) => {
      val m = Transcripts.fromEvents(s, dir)
        .where(col("tool").isNotNull)
        .select(col("conv_id").as("entity"), col("tool").as("group"))
      operators.Bipartite.butterflies(m)
        .select(col("group_a").as("tool_a"), col("group_b").as("tool_b"),
          col("n_shared"), col("n_bf"))
    }),
    // hop-bounded widest path (max-bottleneck routing) from the
    // busiest hub over hashed integer capacities — the max-min dual
    // of q_sssp; the hop bound (12) keeps the superstep count a query
    // constant (the unbounded variant walks the max spanning tree,
    // Θ(|V|) hops — see algos.WidestPath)
    "q_widest" -> ((s, dir) => {
      val g = Graphs.getCapacity(s, dir)
      WidestPath.run(g, rootId(g), maxHops = 12).caps.join(g.vertices, "id")
        .select(col("key"), col("cap").cast("long").as("cap"))
    }),
    // Borůvka minimum spanning forest over the hashed capacities —
    // O(log V) contraction rounds; the (w, akey, bkey) total order
    // makes the MSF unique, so the oracle's entirely different merge
    // schedule (one-hop label merging) must emit the identical edges
    "q_msf" -> ((s, dir) => {
      val g = Graphs.getCapacity(s, dir)
      Msf.run(g).forest
        .select(col("a_key"), col("b_key"), col("w").cast("long").as("w"))
    }),
    // Jones–Plassmann greedy coloring by md5 priority: color(v) =
    // mex of higher-priority neighbor colors — schedule-independent
    // (equals sequential greedy in decreasing priority order), so the
    // oracle's round replay must match without sharing engine detail
    "q_coloring" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Coloring.run(g).colors.join(g.vertices, "id")
        .select(col("key"), col("colr"))
    }),
    // SCAN structural clustering (ε=0.6, μ=3): neighborhood-agreement
    // communities plus the hub/outlier triage LP and modularity lack;
    // σ rides the degree-oriented triangle machinery, clusters ride
    // star-contraction CC (O(log n) rounds on the long thin σ-chains)
    "q_scan" -> ((s, dir) =>
      Scan.run(Graphs.get(s, dir, symmetric = true)).assign),
    // Eulerian circuit/trail census per component (Hierholzer degree
    // parity over the CCStar labels — one aggregate, no iteration)
    "q_euler" -> ((s, dir) =>
      DegreeStats.eulerCensus(
        Graphs.get(s, dir, symmetric = true), Graphs.ccLabels(s, dir))),
    // bipartiteness / odd-cycle census: parity BFS from every
    // component's min-key vertex at once (DataFrame seeds — no
    // driver root list), conflict edges certify odd cycles
    "q_bipartite" -> ((s, dir) =>
      OddCycle.run(
        Graphs.get(s, dir, symmetric = true), Graphs.ccLabels(s, dir)).census),
    // exact distributed bridge (cut-edge) finding: BFS forest +
    // pointer-doubled ancestor closure + symmetric-difference
    // coverage — bridge ⇔ tree edge covered by zero non-tree edges.
    // Engine tree uses min-ID parents, oracle min-KEY parents: the
    // matching output is itself evidence bridges are tree-independent
    "q_bridges" -> ((s, dir) =>
      Bridges.run(Graphs.get(s, dir, symmetric = true),
        Some(Graphs.ccLabels(s, dir))).bridges),
    // bond-percolation census at p=0.7 (deterministic md5 coins):
    // the random-failure dual of q_bridges' targeted-failure view
    // targeted hub-removal robustness census (attack-tolerance dual
    // of percolation: delete top-20 degree hubs, census the shards)
    "q_attack" -> ((s, dir) =>
      Attack.census(Graphs.get(s, dir, symmetric = true), k = 20)),
    "q_percolation" -> ((s, dir) =>
      Percolation.census(Graphs.get(s, dir, symmetric = true))),
    // 2-edge-connected components: delete the bridges, CC the rest —
    // every block survives any single link failure
    "q_2ecc" -> ((s, dir) =>
      Bridges.blocks(Graphs.get(s, dir, symmetric = true),
        Some(Graphs.ccLabels(s, dir)))),
    // Gonzalez greedy k-center (k=3) in the giant component —
    // adaptive farthest-first seeds, one BFS pass per round
    "q_kcenter" -> ((s, dir) =>
      KCenter.run(Graphs.get(s, dir, symmetric = true), Graphs.ccLabels(s, dir))),
    // PII-style pattern scrub over every turn: digit runs → '<N>'
    // (count + redacted text; the pattern is a parameter — see
    // pipeline.Redact for the email/phone production classes)
    "q_redact" -> ((s, dir) =>
      pipeline.Redact.scrub(Transcripts.fromEvents(s, dir))),
    // batched multi-root Brandes: the 4 landmark hubs' σ/dependency
    // pairs in ONE forward/backward pass (the sampled-approximate-BC
    // building block — K roots at O(diameter) jobs total)
    "q_bc_multi" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Betweenness.runBatch(g, rootIds(g, 4)).bc
        .join(g.vertices.select(col("id").as("root"), col("key").as("root_key")), "root")
        .join(g.vertices, "id")
        .select(col("root_key"), col("key"),
          col("sigma").cast("long").as("sigma"),
          round(col("bc") * 1000).cast("long").as("bc_e3"))
    }),
    // Brandes-Pich sampled approximate BC: est(v) = |V|/K · Σ over the
    // K sampled roots of δ_root(v). Per-root dependencies are rounded
    // to e3 BEFORE the sum, so the estimator is pure integer
    // arithmetic from there — deterministic across engines.
    "q_bc_approx" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val k = 4
      Betweenness.runBatch(g, rootIds(g, k)).bc
        .select(col("id"), round(col("bc") * 1000).cast("long").as("bc_e3"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_samples"), sum(col("bc_e3")).as("bc_sum_e3"))
        .join(g.vertices, "id")
        .select(col("key"), col("n_samples"), col("bc_sum_e3"),
          expr(s"bc_sum_e3 * ${g.numVertices}L div ${k}L").as("est_e3"))
    }),
    // HyperANF (Boldi-Rosa-Vigna): per-vertex HLL ball sketches after
    // 6 register-union supersteps — the web-scale distance-distribution
    // primitive. Integer-exact per-vertex register summary exported;
    // the float N(t) estimator stays driver-side (sbt-tested).
    "q_anf" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      Anf.perVertexSummary(Anf.run(g, iterations = 6).registers)
        .join(g.vertices, "id")
        .select(col("key"), col("reg_sum"), col("nz"))
    })
  )

  /** Deterministic, non-degenerate root: the max-degree vertex
   * (tie-break: minimum key). On the symmetric graph this lands on the
   * busiest tool hub, whose component covers ~7% of vertices at every
   * sf — vs the old min-key root, a directed SINK that exercised
   * nothing (round-1 verdict "What's wrong" #1). */
  private def rootId(g: LinkGraph): Long = rootIds(g, 1).head

  /** Top-k roots by (out_degree desc, key asc) — the k busiest hubs,
   * deterministic. */
  private def rootIds(g: LinkGraph, k: Int): Seq[Long] =
    g.degrees.join(g.vertices, "id")
      .orderBy(desc("out_degree"), asc("key"))
      .select(col("id")).limit(k).collect().toSeq.map(_.getLong(0))

  // ------------------------------------------------------------------
  // DuckDB oracle SQL. Shared CTE prefix derives the transcript table
  // and edge set from `events` with expressions that evaluate
  // identically in Spark and DuckDB (see sources/Transcripts.scala).
  // ------------------------------------------------------------------

  // NB: DuckDB 1.0 applies recursive-UNION semantics (no dedup) to
  // every CTE in a `WITH RECURSIVE` list, so the shared prefix avoids
  // relying on UNION-dedup anywhere: UNION ALL on provably disjoint
  // branches + explicit DISTINCT for the vertex set.
  //
  // Every prefix CTE is AS MATERIALIZED: DuckDB inlines plain CTEs per
  // REFERENCE, and a recursive oracle references the edge set once per
  // recursion step — without materialization each step re-derives the
  // whole transcript table (measured: BC oracle 55 s inlined → 1 s
  // materialized at sf0.01).
  private val prefixBody: String =
    """t AS MATERIALIZED (
      |  SELECT concat('c', cast(user_id AS varchar)) AS conv_id,
      |         cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS int) AS turn_idx,
      |         CASE WHEN event_type IN ('click','view') THEN 'user'
      |              WHEN event_type = 'signup' THEN 'assistant'
      |              ELSE 'tool' END AS role,
      |         concat(event_type, ' ', props) AS text,
      |         CASE WHEN event_type IN ('purchase','error')
      |              THEN concat('tool_', cast(cast(floor(user_id/10.0)*5 + ((cast(floor(value) AS bigint)%5)+5)%5 AS bigint) AS varchar))
      |              ELSE NULL END AS tool,
      |         ts
      |  FROM events
      |), k AS MATERIALIZED (
      |  SELECT conv_id, turn_idx, concat(conv_id, '#', cast(turn_idx AS varchar)) AS vkey, tool FROM t
      |), e AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT vkey AS src_key,
      |           lead(vkey) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_key,
      |           'adj' AS kind
      |    FROM k) x WHERE dst_key IS NOT NULL
      |  UNION ALL
      |  SELECT vkey, concat('T#', tool), 'tool' FROM k WHERE tool IS NOT NULL
      |), v AS MATERIALIZED (
      |  SELECT DISTINCT key FROM (
      |    SELECT src_key AS key FROM e UNION ALL SELECT dst_key FROM e) u
      |)""".stripMargin

  private val prefix: String = "WITH " + prefixBody

  /** Symmetrized weighted edge set + deterministic root (max degree,
   * tie-break min key) — mirrors LinkGraph.fromKeyEdges(symmetric) +
   * SparkEntry.rootId exactly. */
  private val symBody: String =
    """, esw AS MATERIALIZED (
      |  SELECT src_key, dst_key, min(w) AS w FROM (
      |    SELECT src_key, dst_key, CASE WHEN kind = 'adj' THEN 1.0 ELSE 2.0 END AS w FROM e
      |    UNION ALL
      |    SELECT dst_key, src_key, CASE WHEN kind = 'adj' THEN 1.0 ELSE 2.0 END AS w FROM e
      |  ) u WHERE src_key <> dst_key GROUP BY 1, 2
      |), rt AS MATERIALIZED (
      |  SELECT src_key AS rkey FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 1
      |)""".stripMargin

  /** CC/LP oracle: the engine runs general HashMin, but THIS graph's
   * components are derivable in SQL — conversations are chains
   * (always internally connected), so components of the full graph =
   * components of the tiny conversation-level graph (convs linked by
   * shared tools), expanded back to turn/tool vertices. An
   * independent structural check, not a re-implementation. */
  private val ccBody: String =
    """, tooluse AS (
      |  SELECT DISTINCT conv_id, concat('T#', tool) AS tkey FROM k WHERE tool IS NOT NULL
      |), convedge AS (
      |  SELECT DISTINCT a.conv_id AS ca, b.conv_id AS cb
      |  FROM tooluse a JOIN tooluse b ON a.tkey = b.tkey
      |), r(c, l) AS (
      |  SELECT conv_id, conv_id FROM (SELECT DISTINCT conv_id FROM k) z(conv_id)
      |  UNION
      |  SELECT ce.cb, r.l FROM r JOIN convedge ce ON ce.ca = r.c WHERE r.l < ce.cb
      |), lab AS (
      |  SELECT c, min(l) AS lc FROM r GROUP BY c
      |), vc AS (
      |  SELECT DISTINCT key, lc FROM (
      |    SELECT k.vkey AS key, lab.lc FROM k JOIN lab ON lab.c = k.conv_id
      |    UNION ALL
      |    SELECT tu.tkey AS key, lab.lc FROM tooluse tu JOIN lab ON lab.c = tu.conv_id
      |  ) u JOIN v USING (key)
      |), rep AS (
      |  SELECT lc, min(key) AS component FROM vc GROUP BY lc
      |)""".stripMargin

  private val ccSql: String = "WITH RECURSIVE " + prefixBody + ccBody +
    "\nSELECT vc.key AS key, rep.component AS component FROM vc JOIN rep USING (lc)"

  /** Component-size histogram in power-of-two buckets (same exact
   * bit-length bucketing as [[degHistSql]]). */
  private val ccSizesSql: String = "WITH RECURSIVE " + prefixBody + ccBody +
    """, szs AS (
      |  SELECT lc, count(*) AS sz FROM vc GROUP BY lc
      |)
      |SELECT cast(length(bin(sz)) AS bigint) AS bucket,
      |       cast(count(*) AS bigint) AS n_components,
      |       cast(min(sz) AS bigint) AS min_size,
      |       cast(max(sz) AS bigint) AS max_size
      |FROM szs GROUP BY 1""".stripMargin

  /** 5 unrolled PageRank iterations ending in `p5(key, raw, v)` plus
   * the `deg(key, o)` out-degree CTE — shared by the per-vertex
   * export ([[pagerankSql]]) and the degree-correlation sufficient
   * statistics ([[prDegCorrSql]]). */
  private val pagerankBody: String = {
    val iter = (i: Int) =>
      s""", s$i AS (
         |  SELECT e.dst_key AS key, sum(p${i - 1}.v) AS s
         |  FROM e JOIN p${i - 1} ON p${i - 1}.key = e.src_key GROUP BY 1
         |), p$i AS (
         |  SELECT deg.key,
         |         0.15 + 0.85*coalesce(s$i.s, 0) AS raw,
         |         CASE WHEN deg.o > 0 THEN (0.15 + 0.85*coalesce(s$i.s, 0)) / deg.o
         |              ELSE 0.15 + 0.85*coalesce(s$i.s, 0) END AS v
         |  FROM deg LEFT JOIN s$i ON s$i.key = deg.key
         |)""".stripMargin
    prefix +
      """, od AS (SELECT src_key AS key, count(*) AS o FROM e GROUP BY 1)
        |, deg AS (SELECT v.key, coalesce(od.o, 0) AS o FROM v LEFT JOIN od ON od.key = v.key)
        |, p0 AS (SELECT key, CASE WHEN o > 0 THEN 1.0/o ELSE 1.0 END AS v FROM deg)""".stripMargin +
      (1 to 5).map(iter).mkString
  }

  private val pagerankSql: String = pagerankBody +
    "\nSELECT key, cast(round(raw*100000) AS bigint) AS rank_e5 FROM p5"

  /** PageRank-vs-degree Pearson sufficient statistics ("does PageRank
   * just recover degree here?") — exact integer sums over the SAME
   * rounded rank_e5 both engines agree on (q_pagerank is hash-green),
   * the [[q_deg_corr]] pattern on a computed score. */
  private val prDegCorrSql: String = pagerankBody +
    """
      |SELECT count(*) AS n,
      |       cast(sum(o) AS bigint) AS s_d,
      |       cast(sum(r) AS bigint) AS s_r,
      |       cast(sum(o * o) AS bigint) AS ss_d,
      |       cast(sum(r * r) AS bigint) AS ss_r,
      |       cast(sum(o * r) AS bigint) AS s_dr
      |FROM (
      |  SELECT deg.o AS o, cast(round(p5.raw*100000) AS bigint) AS r
      |  FROM p5 JOIN deg USING (key)) x""".stripMargin

  /** Weighted-PageRank oracle builder (5 unrolled iterations, flow ∝
   * w / Σ out-w): the caller supplies the `ew(src_key, dst_key, w)`
   * CTE defining the weighting scheme. */
  private def weightedPrSql(ewBody: String): String = {
    val iter = (i: Int) =>
      s""", s$i AS (
         |  SELECT ew.dst_key AS key, sum(p${i - 1}.vv * ew.w) AS s
         |  FROM ew JOIN p${i - 1} ON p${i - 1}.key = ew.src_key GROUP BY 1
         |), p$i AS (
         |  SELECT deg.key,
         |         (1.0 - 0.85) + 0.85 * coalesce(s$i.s, 0) AS raw,
         |         CASE WHEN deg.o > 0
         |              THEN ((1.0 - 0.85) + 0.85 * coalesce(s$i.s, 0)) / deg.o
         |              ELSE (1.0 - 0.85) + 0.85 * coalesce(s$i.s, 0) END AS vv
         |  FROM deg LEFT JOIN s$i ON s$i.key = deg.key
         |)""".stripMargin
    prefix + ewBody +
      """
        |, od AS (SELECT src_key AS key, sum(w) AS o FROM ew GROUP BY 1)
        |, deg AS (SELECT v.key, coalesce(od.o, 0) AS o FROM v LEFT JOIN od ON od.key = v.key)
        |, p0 AS (SELECT key, 1.0 AS raw, CASE WHEN o > 0 THEN 1.0/o ELSE 1.0 END AS vv FROM deg)""".stripMargin +
      (1 to 5).map(iter).mkString +
      "\nSELECT key, cast(round(raw*100000 + 0.000001) AS bigint) AS rank_e5 FROM p5"
  }

  /** Weighted PageRank, weights from the directed edge kinds
   * (adj 1.0 / tool 2.0). */
  private val pagerankWSql: String = weightedPrSql(
    ", ew AS (SELECT src_key, dst_key, CASE WHEN kind = 'adj' THEN 1.0 ELSE 2.0 END AS w FROM e)")

  /** Time-decayed PageRank replay — mirrors EdgeBuilder.keyEdgesDecayed
   * exactly: integer-µs age buckets (3-day), w = 2^-min(bucket, 40)
   * via shift-and-divide (dyadic-exact in both engines). */
  private val pagerankDecaySql: String = weightedPrSql(
    """, mx AS MATERIALIZED (SELECT max(epoch_us(ts)) AS m FROM t
      |), tsrc AS MATERIALIZED (
      |  SELECT concat(conv_id, '#', cast(turn_idx AS varchar)) AS vkey, epoch_us(ts) AS tus FROM t
      |), ew AS MATERIALIZED (
      |  SELECT e.src_key, e.dst_key,
      |         1.0 / cast(1::BIGINT << cast(least((mx.m - s.tus) // 259200000000, 40) AS int) AS double) AS w
      |  FROM e JOIN tsrc s ON s.vkey = e.src_key CROSS JOIN mx
      |)""".stripMargin)

  /** Personalized PageRank, 5 unrolled iterations on the SYMMETRIC
   * graph from the max-degree seed (symBody's rt, same as q_bfs).
   * `(1.0 - 0.85)` is spelled as the same subtraction the Scala side
   * computes (`lit(1.0 - d)`) so both engines produce the
   * bit-identical IEEE constant. */
  private val pprCtes: String = {
    val tele = "CASE WHEN deg.key = (SELECT rkey FROM rt) THEN 1.0 ELSE 0.0 END"
    val iter = (i: Int) =>
      s""", s$i AS (
         |  SELECT esw.dst_key AS key, sum(p${i - 1}.vv) AS s
         |  FROM esw JOIN p${i - 1} ON p${i - 1}.key = esw.src_key GROUP BY 1
         |), p$i AS (
         |  SELECT deg.key,
         |         (1.0 - 0.85) * $tele + 0.85 * coalesce(s$i.s, 0) AS raw,
         |         CASE WHEN deg.o > 0
         |              THEN ((1.0 - 0.85) * $tele + 0.85 * coalesce(s$i.s, 0)) / deg.o
         |              ELSE (1.0 - 0.85) * $tele + 0.85 * coalesce(s$i.s, 0) END AS vv
         |  FROM deg LEFT JOIN s$i ON s$i.key = deg.key
         |)""".stripMargin
    "WITH " + prefixBody + symBody +
      """, od AS (SELECT src_key AS key, count(*) AS o FROM esw GROUP BY 1)
        |, deg AS (SELECT v.key, coalesce(od.o, 0) AS o FROM v LEFT JOIN od ON od.key = v.key)
        |, p0 AS (
        |  SELECT deg.key,
        |         CASE WHEN deg.key = (SELECT rkey FROM rt) THEN 1.0 ELSE 0.0 END AS raw,
        |         CASE WHEN deg.key = (SELECT rkey FROM rt)
        |              THEN CASE WHEN deg.o > 0 THEN 1.0 / deg.o ELSE 1.0 END
        |              ELSE 0.0 END AS vv
        |  FROM deg)""".stripMargin +
      (1 to 5).map(iter).mkString
  }

  private val pprSql: String =
    pprCtes + "\nSELECT key, cast(round(raw*100000) AS bigint) AS rank_e5 FROM p5"

  /** Sweep-cut replay over the p5 PPR scores: identical integer order
   * key (p_e5·10⁶ div deg, ties by key), difference-array cut counts,
   * window prefix sums — zero float comparisons anywhere. */
  private val sweepSql: String = pprCtes +
    """, sc AS (SELECT p5.key, cast(round(raw*100000) AS bigint) AS p_e5 FROM p5)
      |, dgs AS (SELECT src_key AS key, count(*) AS deg FROM esw GROUP BY 1)
      |, rk AS (
      |  SELECT sc.key, dgs.deg, (p_e5 * 1000000) // dgs.deg AS sweep
      |  FROM sc JOIN dgs ON dgs.key = sc.key
      |), tp AS (
      |  SELECT * FROM (
      |    SELECT key, deg, row_number() OVER (ORDER BY sweep DESC, key) AS r
      |    FROM rk) x WHERE r <= 100
      |), eu AS (SELECT src_key AS a, dst_key AS b FROM esw WHERE src_key < dst_key
      |), ce AS (
      |  SELECT least(coalesce(ta.r, 101), coalesce(tb.r, 101)) AS lo,
      |         greatest(coalesce(ta.r, 101), coalesce(tb.r, 101)) AS hi
      |  FROM eu LEFT JOIN tp ta ON ta.key = eu.a LEFT JOIN tp tb ON tb.key = eu.b
      |), lc AS (SELECT lo AS r, count(*) AS nlo FROM ce WHERE lo <= 100 GROUP BY 1
      |), hc AS (SELECT hi AS r, count(*) AS nhi FROM ce WHERE hi <= 100 GROUP BY 1
      |), m AS (SELECT count(*) AS tot FROM esw)
      |SELECT tp.r AS k, tp.key,
      |       cast(sum(tp.deg) OVER w AS bigint) AS vol,
      |       cast(sum(coalesce(lc.nlo, 0) - coalesce(hc.nhi, 0)) OVER w AS bigint) AS cut,
      |       cast((10000 * sum(coalesce(lc.nlo, 0) - coalesce(hc.nhi, 0)) OVER w)
      |            // least(sum(tp.deg) OVER w, (SELECT tot FROM m) - sum(tp.deg) OVER w) AS bigint) AS phi_e4
      |FROM tp LEFT JOIN lc ON lc.r = tp.r LEFT JOIN hc ON hc.r = tp.r
      |WINDOW w AS (ORDER BY tp.r ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** HITS, 4 unrolled iterations — pure BIGINT arithmetic end to end
   * (see algos.Hits: unnormalized scores are integer-exact). */
  private val hitsSql: String = {
    val iter = (i: Int) =>
      s""", a$i AS (
         |  SELECT v.key, coalesce(s.s, 0) AS v FROM v LEFT JOIN (
         |    SELECT e.dst_key AS key, sum(h${i - 1}.v) AS s
         |    FROM e JOIN h${i - 1} ON h${i - 1}.key = e.src_key GROUP BY 1) s ON s.key = v.key
         |), h$i AS (
         |  SELECT v.key, coalesce(s.s, 0) AS v FROM v LEFT JOIN (
         |    SELECT e.src_key AS key, sum(a$i.v) AS s
         |    FROM e JOIN a$i ON a$i.key = e.dst_key GROUP BY 1) s ON s.key = v.key
         |)""".stripMargin
    prefix +
      ", h0 AS (SELECT key, cast(1 AS bigint) AS v FROM v)" +
      (1 to 4).map(iter).mkString +
      """
        |SELECT a4.key AS key, cast(a4.v AS bigint) AS auth, cast(h4.v AS bigint) AS hub
        |FROM a4 JOIN h4 ON h4.key = a4.key""".stripMargin
  }

  /** SALSA, 4 unrolled iterations — per-edge BIGINT floor division
   * (DuckDB `//` ≡ Spark `div` on nonnegative longs), exact replay of
   * algos.Salsa. */
  private val salsaSql: String = {
    val iter = (i: Int) =>
      s""", a$i AS (
         |  SELECT v.key, coalesce(s.s, 0) AS v FROM v LEFT JOIN (
         |    SELECT e.dst_key AS key, sum(h${i - 1}.v // od.o) AS s
         |    FROM e JOIN h${i - 1} ON h${i - 1}.key = e.src_key
         |           JOIN od ON od.key = e.src_key GROUP BY 1) s ON s.key = v.key
         |), h$i AS (
         |  SELECT v.key, coalesce(s.s, 0) AS v FROM v LEFT JOIN (
         |    SELECT e.src_key AS key, sum(a$i.v // ind.i) AS s
         |    FROM e JOIN a$i ON a$i.key = e.dst_key
         |           JOIN ind ON ind.key = e.dst_key GROUP BY 1) s ON s.key = v.key
         |)""".stripMargin
    prefix +
      """, od AS MATERIALIZED (SELECT src_key AS key, count(*) AS o FROM e GROUP BY 1)
        |, ind AS MATERIALIZED (SELECT dst_key AS key, count(*) AS i FROM e GROUP BY 1)
        |, h0 AS (SELECT key, cast(1000000000000 AS bigint) AS v FROM v)""".stripMargin +
      (1 to 4).map(iter).mkString +
      """
        |SELECT a4.key AS key, cast(a4.v AS bigint) AS auth, cast(h4.v AS bigint) AS hub
        |FROM a4 JOIN h4 ON h4.key = a4.key""".stripMargin
  }

  /** Linear-threshold cascade, 8 unrolled monotone rounds from the
   * max-out-degree directed root; md5-derived thresholds evaluate
   * identically in both engines (algos.Cascade). */
  private val cascadeSql: String = {
    val round = (i: Int) =>
      s""", a$i AS MATERIALIZED (
         |  SELECT key, r FROM a${i - 1}
         |  UNION ALL
         |  SELECT th.key, $i AS r FROM th
         |  JOIN (SELECT e.dst_key AS key, count(*) AS c
         |        FROM e JOIN a${i - 1} p ON p.key = e.src_key GROUP BY 1) c
         |    ON c.key = th.key
         |  WHERE c.c >= th.th AND th.key NOT IN (SELECT key FROM a${i - 1})
         |)""".stripMargin
    prefix +
      """, th AS MATERIALIZED (
        |  SELECT dst_key AS key,
        |         1 + (('0x' || substr(md5('lt|' || dst_key), 1, 10))::BIGINT % count(*)) AS th
        |  FROM e GROUP BY dst_key
        |), rtd AS MATERIALIZED (
        |  SELECT src_key AS rkey FROM e GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 4
        |), a0 AS (SELECT rkey AS key, 0 AS r FROM rtd)""".stripMargin +
      (1 to 8).map(round).mkString +
      """
        |SELECT key, cast(r AS int) AS act_round FROM a8""".stripMargin
  }

  /** ACL forward-push PPR, 6 unrolled synchronized rounds — exact
   * integer replay of algos.PprPush (scale 2^40, α = 1/4, threshold
   * 2^20 per unit degree, floor leftovers held in place). */
  private val pprPushSql: String = {
    val round = (i: Int) =>
      s""", a$i AS MATERIALIZED (
         |  SELECT s.key, s.p, s.r, d.d,
         |         s.p + s.r // 4 AS p2,
         |         (s.r - s.r // 4) // d.d AS share,
         |         (s.r - s.r // 4) - ((s.r - s.r // 4) // d.d) * d.d AS lft
         |  FROM s${i - 1} s JOIN dg d ON d.key = s.key
         |  WHERE s.r >= 1048576 * d.d
         |), g$i AS MATERIALIZED (
         |  SELECT esw.dst_key AS key, sum(a.share) AS m
         |  FROM a$i a JOIN esw ON esw.src_key = a.key GROUP BY 1
         |), s$i AS MATERIALIZED (
         |  SELECT coalesce(b.key, g.key) AS key,
         |         coalesce(CASE WHEN a.key IS NOT NULL THEN a.p2 ELSE b.p END, 0) AS p,
         |         coalesce(CASE WHEN a.key IS NOT NULL THEN a.lft ELSE b.r END, 0)
         |           + coalesce(g.m, 0) AS r
         |  FROM s${i - 1} b
         |  LEFT JOIN a$i a ON a.key = b.key
         |  FULL JOIN g$i g ON g.key = b.key
         |)""".stripMargin
    "WITH " + prefixBody + symBody +
      """
        |, dg AS MATERIALIZED (SELECT src_key AS key, count(*) AS d FROM esw GROUP BY 1)
        |, s0 AS MATERIALIZED (
        |  SELECT rkey AS key, cast(0 AS bigint) AS p,
        |         cast(1099511627776 AS bigint) AS r FROM rt)""".stripMargin +
      (1 to 6).map(round).mkString +
      """
        |SELECT key, cast(p AS bigint) AS p, cast(r AS bigint) AS r FROM s6""".stripMargin
  }

  /** Incremental-PageRank replay (algos.PageRankInc): 10 unrolled
   * cold push rounds on the adjacency-only subgraph, the retraction
   * bulk op, then 6 signed push rounds on the full graph — every
   * division sign-split so `//` (floor) only ever sees nonnegative
   * operands and agrees with Spark's truncating `div`. */
  private val pagerankIncSql: String = {
    // one bulk push round: prev state -> s$i over edges $ed / degrees $dg
    val round = (i: Int, ed: String, dg: String) =>
      s""", a$i AS MATERIALIZED (
         |  SELECT s.key, s.p + s.r AS p2, x2.share,
         |         x1.rem - x2.share * d.d AS lft,
         |         s.sent + x2.share AS sent2
         |  FROM s${i - 1} s JOIN $dg d ON d.key = s.key,
         |       LATERAL (SELECT CASE WHEN s.r >= 0 THEN (17 * s.r) // 20
         |                            ELSE -((17 * (-s.r)) // 20) END AS rem) x1,
         |       LATERAL (SELECT CASE WHEN x1.rem >= 0 THEN x1.rem // d.d
         |                            ELSE -((-x1.rem) // d.d) END AS share) x2
         |  WHERE d.d > 0 AND abs(s.r) >= 1048576 * d.d
         |        AND (s.r >= 0 OR $i > 11)
         |), g$i AS MATERIALIZED (
         |  SELECT $ed.dst_key AS key, sum(a.share) AS m
         |  FROM a$i a JOIN $ed ON $ed.src_key = a.key GROUP BY 1
         |), s$i AS MATERIALIZED (
         |  SELECT s.key,
         |         CASE WHEN a.key IS NOT NULL THEN a.p2
         |              WHEN d.d = 0 AND abs(s.r) >= 1048576
         |                   AND (s.r >= 0 OR $i > 11) THEN s.p + s.r
         |              ELSE s.p END AS p,
         |         (CASE WHEN a.key IS NOT NULL THEN a.lft
         |               WHEN d.d = 0 AND abs(s.r) >= 1048576
         |                    AND (s.r >= 0 OR $i > 11) THEN 0
         |               ELSE s.r END) + coalesce(g.m, 0) AS r,
         |         CASE WHEN a.key IS NOT NULL THEN a.sent2 ELSE s.sent END AS sent
         |  FROM s${i - 1} s
         |  JOIN $dg d ON d.key = s.key
         |  LEFT JOIN a$i a ON a.key = s.key
         |  LEFT JOIN g$i g ON g.key = s.key
         |)""".stripMargin
    prefix +
      """, eold AS MATERIALIZED (SELECT src_key, dst_key FROM e WHERE kind = 'adj')
        |, dgo AS MATERIALIZED (
        |  SELECT v.key, coalesce(o.c, 0) AS d FROM v LEFT JOIN (
        |    SELECT src_key AS key, count(*) AS c FROM eold GROUP BY 1) o ON o.key = v.key
        |), dgn AS MATERIALIZED (
        |  SELECT v.key, coalesce(o.c, 0) AS d FROM v LEFT JOIN (
        |    SELECT src_key AS key, count(*) AS c FROM e GROUP BY 1) o ON o.key = v.key
        |), s0 AS MATERIALIZED (
        |  SELECT key, cast(0 AS bigint) AS p, cast(164926744166 AS bigint) AS r,
        |         cast(0 AS bigint) AS sent FROM v)""".stripMargin +
      (1 to 10).map(round(_, "eold", "dgo")).mkString +
      // retraction: affected sources un-absorb + retract deliveries
      """, aff AS MATERIALIZED (SELECT DISTINCT src_key AS key FROM e WHERE kind = 'tool')
        |, ret AS MATERIALIZED (
        |  SELECT eold.dst_key AS key, sum(-s.sent) AS m
        |  FROM s10 s JOIN aff ON aff.key = s.key JOIN eold ON eold.src_key = s.key
        |  GROUP BY 1
        |), s11 AS MATERIALIZED (
        |  SELECT s.key,
        |         CASE WHEN aff.key IS NOT NULL THEN 0 ELSE s.p END AS p,
        |         (CASE WHEN aff.key IS NOT NULL THEN s.r + s.p ELSE s.r END)
        |           + coalesce(ret.m, 0) AS r,
        |         CASE WHEN aff.key IS NOT NULL THEN 0 ELSE s.sent END AS sent
        |  FROM s10 s LEFT JOIN aff ON aff.key = s.key LEFT JOIN ret ON ret.key = s.key
        |)""".stripMargin +
      (12 to 17).map(round(_, "e", "dgn")).mkString +
      "\nSELECT key, cast(p AS bigint) AS p, cast(r AS bigint) AS r FROM s17"
  }

  /** MAX-CUT local search, 4 unrolled independent-flip rounds —
   * exact replay of algos.MaxCut (md5 side + fixed-width priority
   * string; a positive-gain candidate flips iff its π beats every
   * candidate neighbor's). */
  private val maxcutSql: String = {
    val round = (r: Int) =>
      s""", m$r AS MATERIALIZED (
         |  SELECT esw.src_key AS key, sum(c.side) AS s1
         |  FROM esw JOIN c${r - 1} c ON c.key = esw.dst_key GROUP BY 1
         |), cd$r AS MATERIALIZED (
         |  SELECT c.key, substr(md5('mx|' || c.key), 1, 10) || '|' || c.key AS pi
         |  FROM c${r - 1} c JOIN dg d ON d.key = c.key
         |  LEFT JOIN m$r m ON m.key = c.key
         |  WHERE (CASE WHEN c.side = 1 THEN coalesce(m.s1, 0)
         |              ELSE d.d - coalesce(m.s1, 0) END) * 2 > d.d
         |), nm$r AS MATERIALIZED (
         |  SELECT esw.src_key AS key, min(cd.pi) AS mpi
         |  FROM cd$r cd JOIN esw ON esw.dst_key = cd.key GROUP BY 1
         |), c$r AS MATERIALIZED (
         |  SELECT c.key,
         |         CASE WHEN cd.key IS NOT NULL AND (nm.mpi IS NULL OR cd.pi < nm.mpi)
         |              THEN 1 - c.side ELSE c.side END AS side
         |  FROM c${r - 1} c
         |  LEFT JOIN cd$r cd ON cd.key = c.key
         |  LEFT JOIN nm$r nm ON nm.key = c.key
         |)""".stripMargin
    "WITH " + prefixBody + symBody +
      """
        |, dg AS MATERIALIZED (SELECT src_key AS key, count(*) AS d FROM esw GROUP BY 1)
        |, c0 AS MATERIALIZED (
        |  SELECT key,
        |         ('0x' || substr(md5('mc|' || key), 1, 10))::BIGINT % 2 AS side
        |  FROM v)""".stripMargin +
      (1 to 4).map(round).mkString +
      """
        |SELECT key, cast(side AS bigint) AS side FROM c4""".stripMargin
  }

  /** PageRank to 1e-6 convergence (reference delta semantics,
   * pagerank.cpp:86-98): a recursive CTE carrying the FULL rank state
   * per iteration; the recursion stops when the previous iteration's
   * delta = Σ dterm / |V| drops to tol. Validated: converges in the
   * same 32 iterations as the Scala loop at sf0.01, all 10,075
   * rank_e5 values exact. */
  private val pagerankConvSql: String = "WITH RECURSIVE " + prefixBody +
    """, deg AS MATERIALIZED (
      |  SELECT v.key, coalesce(od.o, 0) AS o FROM v LEFT JOIN (
      |    SELECT src_key AS key, count(*) AS o FROM e GROUP BY 1) od ON od.key = v.key
      |), nv AS MATERIALIZED (SELECT count(*) AS n FROM v
      |), pr(key, vv, raw, dterm, it) AS (
      |  SELECT key, CASE WHEN o > 0 THEN 1.0/o ELSE 1.0 END, cast(0.0 AS double), cast(1.0 AS double), 0
      |  FROM deg
      |  UNION ALL
      |  SELECT d.key,
      |         CASE WHEN d.o > 0 THEN nraw/d.o ELSE nraw END,
      |         nraw,
      |         CASE WHEN d.o > 0 THEN abs(nraw/d.o - old.vv) * d.o ELSE abs(nraw - old.vv) END,
      |         old.it + 1
      |  FROM deg d
      |  JOIN pr old ON old.key = d.key
      |  LEFT JOIN (
      |    SELECT e.dst_key AS key, sum(p.vv) AS s
      |    FROM pr p JOIN e ON e.src_key = p.key GROUP BY 1
      |  ) s ON s.key = d.key,
      |  LATERAL (SELECT 0.15 + 0.85*coalesce(s.s, 0) AS nraw) x
      |  WHERE (SELECT sum(p2.dterm) FROM pr p2) / (SELECT n FROM nv) > 1e-6
      |)
      |SELECT key, cast(round(raw*100000) AS bigint) AS rank_e5
      |FROM pr WHERE it = (SELECT max(p3.it) FROM pr p3)""".stripMargin

  /** BFS levels from the max-degree root on the symmetric graph.
   * Step-capped label-correcting recursion: each step relaxes the
   * previous step's frontier (per-dst min), final answer = min level
   * per key. Cap 60 ≫ measured eccentricity 9 at sf0.01; junk rows
   * beyond the true level are absorbed by the final min. */
  private val bfsSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, r(key, lvl) AS (
      |  SELECT rkey, 0 FROM rt
      |  UNION ALL
      |  SELECT esw.dst_key, min(r.lvl) + 1 FROM r JOIN esw ON esw.src_key = r.key
      |  WHERE r.lvl < 60 GROUP BY esw.dst_key
      |)
      |SELECT key, cast(min(lvl) AS bigint) AS level FROM r GROUP BY key""".stripMargin

  /** SSSP distances (weighted: adj 1.0 / tool 2.0), same pattern as
   * [[bfsSql]] with min(dist + w) relaxation; hop cap 80 bounds the
   * label-correcting recursion (all weights ≥ 1 ⇒ shortest paths have
   * ≤ 2·eccentricity hops ≪ 80). */
  private val ssspSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, r(key, dist, i) AS (
      |  SELECT rkey, cast(0.0 AS double), 0 FROM rt
      |  UNION ALL
      |  SELECT esw.dst_key, min(r.dist + cast(esw.w AS double)), min(r.i) + 1
      |  FROM r JOIN esw ON esw.src_key = r.key
      |  WHERE r.i < 80 GROUP BY esw.dst_key
      |)
      |SELECT key, cast(round(min(dist)*1000) AS bigint) AS dist_e3 FROM r GROUP BY key""".stripMargin

  /** Multi-source BFS levels from the 4 busiest hubs (rootIds(g, 4))
   * on the symmetric graph — the [[bfsSql]] label-correcting capped
   * recursion, carrying the root key through the expansion. */
  private val msbfsBody: String =
    """, rt4 AS MATERIALIZED (
      |  SELECT src_key AS rkey FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 4
      |), r(root, key, lvl) AS (
      |  SELECT rkey, rkey, 0 FROM rt4
      |  UNION ALL
      |  SELECT r.root, esw.dst_key, min(r.lvl) + 1 FROM r JOIN esw ON esw.src_key = r.key
      |  WHERE r.lvl < 60 GROUP BY r.root, esw.dst_key
      |)""".stripMargin

  private val msbfsSql: String = "WITH RECURSIVE " + prefixBody + symBody + msbfsBody +
    "\nSELECT root AS root_key, key, cast(min(lvl) AS bigint) AS level FROM r GROUP BY 1, 2"

  /** Per-vertex landmark closeness estimate (the dual grouping of
   * [[closenessSql]]). */
  private val closenessAllSql: String = "WITH RECURSIVE " + prefixBody + symBody + msbfsBody +
    """, d AS (
      |  SELECT root, key, min(lvl) AS dd FROM r GROUP BY 1, 2
      |)
      |SELECT key, cast(count(*) AS bigint) AS n_landmarks,
      |       cast(sum(10000 // dd) AS bigint) AS harmonic_e4
      |FROM d WHERE dd > 0 GROUP BY 1""".stripMargin

  /** Harmonic closeness of the 4 landmark roots: integer-exact
   * Σ (10000 // dist) over the reached set. */
  private val closenessSql: String = "WITH RECURSIVE " + prefixBody + symBody + msbfsBody +
    """, d AS (
      |  SELECT root, key, min(lvl) AS dd FROM r GROUP BY 1, 2
      |)
      |SELECT root AS root_key, cast(count(*) AS bigint) AS n_reached,
      |       cast(sum(10000 // dd) AS bigint) AS harmonic_e4
      |FROM d WHERE dd > 0 GROUP BY 1""".stripMargin

  /** Deterministic random-walk replay, 8 unrolled steps: wᵗ picks per
   * walker the neighbor with minimum (md5(cur|t|nbr), nbr) — mirrors
   * algos.RandomWalk exactly (same seed string, same tie-break). */
  private val walksSql: String = {
    val step = (t: Int) =>
      s""", w$t AS (
         |  SELECT root, key FROM (
         |    SELECT w.root, e.dst_key AS key,
         |           row_number() OVER (PARTITION BY w.root
         |             ORDER BY md5(concat(w.key, '|', '$t', '|', e.dst_key)), e.dst_key) AS rn
         |    FROM w${t - 1} w JOIN esw e ON e.src_key = w.key) x
         |  WHERE rn = 1
         |)""".stripMargin
    prefix + symBody +
      """, rt4 AS MATERIALIZED (
        |  SELECT src_key AS rkey FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 4
        |), w0 AS (
        |  SELECT rkey AS root, rkey AS key FROM rt4
        |)""".stripMargin +
      (1 to 8).map(step).mkString + "\n" + walksUnion
  }

  private lazy val walksUnion: String = (0 to 8).map(t =>
    s"SELECT root AS root_key, cast($t AS bigint) AS step, key FROM w$t")
    .mkString("\nUNION ALL\n")

  /** Skip-gram (center, context) pair census over the q_walks walk
   * sequences, window 2 — the DeepWalk/node2vec TRAINING-DATA
   * generation step downstream of the walk sampler. */
  private val sgpairsSql: String =
    walksSql.stripSuffix(walksUnion) +
      ", wk AS (\n" + walksUnion + "\n)" +
      """
        |SELECT a.key AS center, b.key AS context, cast(count(*) AS bigint) AS n
        |FROM wk a JOIN wk b
        |  ON b.root_key = a.root_key AND b.step <> a.step
        | AND abs(b.step - a.step) <= 2
        |GROUP BY 1, 2""".stripMargin

  /** Weight-proportional walk replay: at step t, walker at `key`
   * draws h = 60-bit md5(key|t) and takes the neighbor whose slot on
   * the key-ordered cumulative integer-weight line contains
   * h mod Σwq — mirrors algos.RandomWalk(weighted = true) exactly. */
  private val walksWSql: String = {
    val step = (t: Int) =>
      s""", q$t AS (
         |  SELECT w.root, e.dst_key,
         |         sum(cast(round(e.w * 1000) AS bigint))
         |           OVER (PARTITION BY w.root ORDER BY e.dst_key) AS cum,
         |         sum(cast(round(e.w * 1000) AS bigint))
         |           OVER (PARTITION BY w.root) AS tot,
         |         ('0x' || substr(md5(concat(w.key, '|', '$t')), 1, 15))::BIGINT AS h
         |  FROM w${t - 1} w JOIN esw e ON e.src_key = w.key
         |), w$t AS (
         |  SELECT root, key FROM (
         |    SELECT root, dst_key AS key,
         |           row_number() OVER (PARTITION BY root ORDER BY cum, dst_key) AS rn
         |    FROM q$t WHERE cum > h % tot) x
         |  WHERE rn = 1
         |)""".stripMargin
    val union = (0 to 8).map(t =>
      s"SELECT root AS root_key, cast($t AS bigint) AS step, key FROM w$t")
      .mkString("\nUNION ALL\n")
    prefix + symBody +
      """, rt4 AS MATERIALIZED (
        |  SELECT src_key AS rkey FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 4
        |), w0 AS (
        |  SELECT rkey AS root, rkey AS key FROM rt4
        |)""".stripMargin +
      (1 to 8).map(step).mkString + "\n" + union
  }

  /** node2vec walk replay — walksWSql plus the prev column and the
   * 2:4:1 second-order bias CASE (same order as the engine: return
   * first, then prev-adjacency, else far). */
  private val walksN2vSql: String = {
    val step = (t: Int) =>
      s""", q$t AS (
         |  SELECT w.root, w.key AS cur_key, e.dst_key,
         |         cast(round(e.w * 1000) AS bigint) *
         |           (CASE WHEN e.dst_key = w.prev THEN 2
         |                 WHEN pe.src_key IS NOT NULL THEN 4 ELSE 1 END) AS wq,
         |         ('0x' || substr(md5(concat('n2', '|', w.key, '|', '$t')), 1, 15))::BIGINT AS h
         |  FROM w${t - 1} w JOIN esw e ON e.src_key = w.key
         |  LEFT JOIN esw pe ON pe.src_key = w.prev AND pe.dst_key = e.dst_key
         |), qq$t AS (
         |  SELECT root, cur_key, dst_key,
         |         sum(wq) OVER (PARTITION BY root ORDER BY dst_key) AS cum,
         |         sum(wq) OVER (PARTITION BY root) AS tot, h
         |  FROM q$t
         |), w$t AS (
         |  SELECT root, key, prev FROM (
         |    SELECT root, dst_key AS key, cur_key AS prev,
         |           row_number() OVER (PARTITION BY root ORDER BY cum, dst_key) AS rn
         |    FROM qq$t WHERE cum > h % tot) x
         |  WHERE rn = 1
         |)""".stripMargin
    val union = (0 to 8).map(t =>
      s"SELECT root AS root_key, cast($t AS bigint) AS step, key FROM w$t")
      .mkString("\nUNION ALL\n")
    prefix + symBody +
      """, rt4 AS MATERIALIZED (
        |  SELECT src_key AS rkey FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 4
        |), w0 AS (
        |  SELECT rkey AS root, rkey AS key, cast(NULL AS varchar) AS prev FROM rt4
        |)""".stripMargin +
      (1 to 8).map(step).mkString + "\n" + union
  }

  /** Power-of-two degree histogram — bucket = minimal binary width of
   * the symmetric degree (bin() ↔ Spark conv(d,10,2)). */
  private val degHistSql: String = prefix + symBody +
    """, od AS (
      |  SELECT src_key, count(*) AS d FROM esw GROUP BY 1
      |)
      |SELECT cast(length(bin(d)) AS bigint) AS bucket,
      |       cast(count(*) AS bigint) AS n_vertices,
      |       cast(min(d) AS bigint) AS min_degree,
      |       cast(max(d) AS bigint) AS max_degree
      |FROM od GROUP BY 1""".stripMargin

  /** RA link prediction replay — wedge centers capped at degree 64,
   * slot = 10^6 div deg(z), key-oriented pairs, anti-join vs esw;
   * mirrors algos.LinkPredict.topOverlap exactly. */
  private val linkpredSql: String = prefix + symBody +
    """, dgc AS (
      |  SELECT src_key AS z, 1000000 // count(*) AS slot, count(*) AS d
      |  FROM esw GROUP BY 1
      |), zn AS (
      |  SELECT e.src_key AS z, dgc.slot, e.dst_key AS nk
      |  FROM esw e JOIN dgc ON dgc.z = e.src_key WHERE dgc.d BETWEEN 2 AND 64
      |), sc AS (
      |  SELECT l.nk AS u_key, r.nk AS v_key,
      |         count(*) AS common_nbrs, sum(l.slot) AS ra
      |  FROM zn l JOIN zn r ON l.z = r.z AND l.nk < r.nk
      |  GROUP BY 1, 2
      |), na AS (
      |  SELECT sc.* FROM sc LEFT JOIN esw e
      |    ON e.src_key = sc.u_key AND e.dst_key = sc.v_key
      |  WHERE e.src_key IS NULL
      |)
      |SELECT u_key, v_key, cast(common_nbrs AS bigint) AS common_nbrs,
      |       cast(ra AS bigint) AS ra_e6
      |FROM na ORDER BY ra DESC, u_key, v_key LIMIT 100""".stripMargin

  /** Per-edge neighborhood Jaccard replay — common = neighbor-set
   * intersection per key-oriented edge, union = du+dv−2−common,
   * jaccard_e6 = 10⁶·common // union; mirrors LinkPredict.edgeJaccard. */
  private val edgeJaccardBody: String =
    """, eo AS (
      |  SELECT src_key AS u, dst_key AS v FROM esw WHERE src_key < dst_key
      |), dg AS (
      |  SELECT src_key AS k, count(*) AS d FROM esw GROUP BY 1
      |), tc AS (
      |  SELECT eo.u, eo.v, count(*) AS c
      |  FROM eo
      |  JOIN esw a ON a.src_key = eo.u
      |  JOIN esw b ON b.src_key = eo.v AND b.dst_key = a.dst_key
      |  GROUP BY 1, 2
      |), ejf AS (
      |  SELECT eo.u AS u_key, eo.v AS v_key,
      |         cast(coalesce(tc.c, 0) AS bigint) AS common_nbrs,
      |         cast(du.d + dv.d - 2 - coalesce(tc.c, 0) AS bigint) AS union_nbrs,
      |         cast(CASE WHEN du.d + dv.d - 2 - coalesce(tc.c, 0) > 0
      |              THEN 1000000 * coalesce(tc.c, 0) // (du.d + dv.d - 2 - coalesce(tc.c, 0))
      |              ELSE 0 END AS bigint) AS jaccard_e6
      |  FROM eo
      |  LEFT JOIN tc ON tc.u = eo.u AND tc.v = eo.v
      |  JOIN dg du ON du.k = eo.u
      |  JOIN dg dv ON dv.k = eo.v
      |)""".stripMargin

  private val edgeJaccardSql: String = prefix + symBody + edgeJaccardBody +
    "\nSELECT u_key, v_key, common_nbrs, union_nbrs, jaccard_e6 FROM ejf"

  /** Backbone sparsifier replay: an edge survives iff it is in either
   * endpoint's top-3 by (jaccard_e6 desc, neighbor key). */
  private val backboneSql: String = prefix + symBody + edgeJaccardBody +
    """, dirn AS (
      |  SELECT u_key AS a, v_key AS b, jaccard_e6 FROM ejf
      |  UNION ALL
      |  SELECT v_key, u_key, jaccard_e6 FROM ejf
      |), kept AS (
      |  SELECT DISTINCT least(a, b) AS u_key, greatest(a, b) AS v_key FROM (
      |    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY jaccard_e6 DESC, b) AS rn
      |    FROM dirn) x
      |  WHERE rn <= 1
      |)
      |SELECT e.u_key, e.v_key, e.jaccard_e6
      |FROM ejf e JOIN kept k ON k.u_key = e.u_key AND k.v_key = e.v_key""".stripMargin

  /** Tool co-occurrence lift over conversations — mirrors
   * pipeline.Cooccur.toolLift (integer floor division, hugeint-lifted
   * so the oracle cannot overflow where the engine's long would not). */
  private val toolLiftSql: String = prefix +
    """, ct AS MATERIALIZED (
      |  SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL
      |), nc AS (
      |  SELECT count(DISTINCT conv_id) AS n FROM t
      |), marg AS (
      |  SELECT tool, count(*) AS n FROM ct GROUP BY 1
      |), pr AS (
      |  SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS n_ab
      |  FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
      |  GROUP BY 1, 2
      |)
      |SELECT pr.tool_a, pr.tool_b, cast(pr.n_ab AS bigint) AS n_ab,
      |       cast(ma.n AS bigint) AS n_a, cast(mb.n AS bigint) AS n_b,
      |       cast((pr.n_ab::HUGEINT * 10000 * nc.n) // (ma.n::HUGEINT * mb.n) AS bigint) AS lift_e4
      |FROM pr
      |JOIN marg ma ON ma.tool = pr.tool_a
      |JOIN marg mb ON mb.tool = pr.tool_b
      |CROSS JOIN nc""".stripMargin

  /** Mirrors Cooccur.frequentItemsets: support counted over the
   * distinct (conv, tool) set; threshold = max(2, ⌊nConvs/30⌋). The
   * oracle mines WITHOUT a-priori pruning — downward closure makes
   * the pruned engine plan exact, so results must coincide. */
  private val itemsetsSql: String = prefix +
    """, ct AS MATERIALIZED (
      |  SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL
      |), ms AS (
      |  SELECT greatest(2, count(DISTINCT conv_id) // 30) AS m FROM t
      |), f1 AS (
      |  SELECT tool, count(*) AS support FROM ct GROUP BY 1
      |  HAVING count(*) >= (SELECT m FROM ms)
      |), f2 AS (
      |  SELECT a.tool AS ta, b.tool AS tb, count(*) AS support
      |  FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
      |  GROUP BY 1, 2 HAVING count(*) >= (SELECT m FROM ms)
      |), f3 AS (
      |  SELECT a.tool AS ta, b.tool AS tb, c.tool AS tc, count(*) AS support
      |  FROM ct a
      |  JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
      |  JOIN ct c ON b.conv_id = c.conv_id AND b.tool < c.tool
      |  GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT m FROM ms)
      |)
      |SELECT tool AS itemset, cast(1 AS bigint) AS sz,
      |       cast(support AS bigint) AS support FROM f1
      |UNION ALL
      |SELECT concat(ta, ',', tb), 2, support FROM f2
      |UNION ALL
      |SELECT concat(ta, ',', tb, ',', tc), 3, support FROM f3""".stripMargin

  /** Luby MIS replay: one recursion step = one round; a row is
   * (key, state, round) with state 'a'ctive or 'm'ember. Winners =
   * active local minima of (md5-hash, key) among active neighbors;
   * their neighbors drop out (simply not re-emitted); members copy
   * forward until the cap. Mirrors algos.Mis exactly (same priority
   * hash, same tie-break). Cap 60 ≫ the O(log|V|) round count. */
  private val misSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, pri AS MATERIALIZED (
      |  SELECT key, ('0x' || substr(md5(key), 1, 15))::BIGINT AS h FROM v
      |), r(key, st, it) AS (
      |  SELECT key, 'a', 0 FROM v
      |  UNION ALL
      |  SELECT a.key,
      |    CASE WHEN a.st = 'm' THEN 'm'
      |         WHEN NOT EXISTS (
      |           SELECT 1 FROM r b JOIN esw e ON e.src_key = a.key AND e.dst_key = b.key
      |           JOIN pri pb ON pb.key = b.key JOIN pri pa ON pa.key = a.key
      |           WHERE b.it = a.it AND b.st = 'a'
      |             AND (pb.h < pa.h OR (pb.h = pa.h AND b.key < a.key)))
      |         THEN 'm' ELSE 'a' END,
      |    a.it + 1
      |  FROM r a
      |  WHERE a.it < 60 AND (
      |    a.st = 'm'
      |    OR NOT EXISTS (
      |      SELECT 1 FROM r b JOIN esw e ON e.src_key = a.key AND e.dst_key = b.key
      |      JOIN pri pb ON pb.key = b.key JOIN pri pa ON pa.key = a.key
      |      WHERE b.it = a.it AND b.st = 'a'
      |        AND (pb.h < pa.h OR (pb.h = pa.h AND b.key < a.key)))
      |    OR NOT EXISTS (
      |      SELECT 1 FROM r b JOIN esw e ON e.src_key = a.key AND e.dst_key = b.key
      |      WHERE b.it = a.it AND b.st = 'a'
      |        AND NOT EXISTS (
      |          SELECT 1 FROM r c JOIN esw e2 ON e2.src_key = b.key AND e2.dst_key = c.key
      |          JOIN pri pc ON pc.key = c.key JOIN pri pb2 ON pb2.key = b.key
      |          WHERE c.it = b.it AND c.st = 'a'
      |            AND (pc.h < pb2.h OR (pc.h = pb2.h AND c.key < b.key)))))
      |)
      |SELECT key, cast(min(it) AS bigint) AS round FROM r WHERE st = 'm' GROUP BY key""".stripMargin

  /** Double-sweep diameter: two chained capped BFS recursions;
   * farthest-vertex selection (max level, min key) mirrors
   * Diameter.farthest. */
  private val diameterSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, r1(key, lvl) AS (
      |  SELECT rkey, 0 FROM rt
      |  UNION ALL
      |  SELECT esw.dst_key, min(r1.lvl) + 1 FROM r1 JOIN esw ON esw.src_key = r1.key
      |  WHERE r1.lvl < 60 GROUP BY esw.dst_key
      |), l1 AS MATERIALIZED (
      |  SELECT key, min(lvl) AS lvl FROM r1 GROUP BY key
      |), far1 AS MATERIALIZED (
      |  SELECT key, lvl FROM l1 ORDER BY lvl DESC, key LIMIT 1
      |), r2(key, lvl) AS (
      |  SELECT key, 0 FROM far1
      |  UNION ALL
      |  SELECT esw.dst_key, min(r2.lvl) + 1 FROM r2 JOIN esw ON esw.src_key = r2.key
      |  WHERE r2.lvl < 60 GROUP BY esw.dst_key
      |), l2 AS (
      |  SELECT key, min(lvl) AS lvl FROM r2 GROUP BY key
      |), far2 AS (
      |  SELECT key, lvl FROM l2 ORDER BY lvl DESC, key LIMIT 1
      |)
      |SELECT (SELECT rkey FROM rt) AS start_key, (SELECT key FROM far1) AS far_key,
      |       cast((SELECT lvl FROM far1) AS bigint) AS ecc_start,
      |       (SELECT key FROM far2) AS far2_key,
      |       cast((SELECT lvl FROM far2) AS bigint) AS ecc_far""".stripMargin

  /** 2-core by capped peeling recursion: each DuckDB recursion step
   * sees only the previous generation (the working table), so one
   * step = one peel round (keep vertices with ≥ k alive neighbors).
   * A fixpoint reproduces itself until the cap (cheap copies); the
   * final `cd` filter re-applies the degree test once so an
   * extinction tail (last nonempty generation all-under-k) still
   * yields the empty core. Cap 120 ≫ measured peel depth 15 at
   * sf0.01. */
  private val kcoreSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, r(key, it) AS (
      |  SELECT key, 0 FROM v
      |  UNION ALL
      |  SELECT a.key, a.it + 1
      |  FROM r a JOIN esw e ON e.src_key = a.key
      |           JOIN r b ON b.key = e.dst_key
      |  WHERE a.it < 120
      |  GROUP BY a.key, a.it
      |  HAVING count(*) >= 2
      |), last AS MATERIALIZED (
      |  SELECT key FROM r WHERE it = (SELECT max(x.it) FROM r x)
      |), cd AS (
      |  SELECT l.key, count(*) AS deg
      |  FROM last l JOIN esw e ON e.src_key = l.key JOIN last b ON b.key = e.dst_key
      |  GROUP BY l.key
      |)
      |SELECT key, cast(deg AS bigint) AS core_degree FROM cd WHERE deg >= 2""".stripMargin

  /** Coreness replay: one kcoreSql-style recursion per k = 2..4
   * (degeneracy here is 2; l3/l4 stay empty, proving the ceiling),
   * membership CASE downward; every vertex has degree ≥ 1 so the
   * floor is 1. */
  private val corenessSql: String = {
    val peel = (k: Int) =>
      s""", r$k(key, it) AS (
         |  SELECT key, 0 FROM v
         |  UNION ALL
         |  SELECT a.key, a.it + 1
         |  FROM r$k a JOIN esw e ON e.src_key = a.key
         |            JOIN r$k b ON b.key = e.dst_key AND b.it = a.it
         |  WHERE a.it < 120
         |  GROUP BY a.key, a.it
         |  HAVING count(*) >= $k
         |), l$k AS MATERIALIZED (
         |  -- it = CAP, not max(it): an EMPTY k-core kills the recursion
         |  -- mid-peel and max(it) would select the last non-empty
         |  -- (non-core) survivor set; only a true fixpoint plateaus to
         |  -- the cap (q_kcore can use max(it) because its 2-core is
         |  -- provably non-empty)
         |  SELECT key FROM r$k WHERE it = 120
         |)""".stripMargin
    "WITH RECURSIVE " + prefixBody + symBody +
      (2 to 4).map(peel).mkString +
      """
        |SELECT v.key,
        |       cast(CASE WHEN l4.key IS NOT NULL THEN 4
        |                 WHEN l3.key IS NOT NULL THEN 3
        |                 WHEN l2.key IS NOT NULL THEN 2
        |                 ELSE 1 END AS bigint) AS coreness
        |FROM v
        |LEFT JOIN l2 ON l2.key = v.key
        |LEFT JOIN l3 ON l3.key = v.key
        |LEFT JOIN l4 ON l4.key = v.key""".stripMargin
  }

  /** Batch-PPR replay: pprSql generalized over the top-4 hub seeds —
   * the per-iteration frame is deg × seeds, messages group by
   * (seed, dst). Same float-constant spelling as pprSql so the e5
   * rounding agrees bit-for-bit. */
  private val pprMultiSql: String = {
    val tele = "(CASE WHEN b.key = b.seed THEN 1.0 ELSE 0.0 END)"
    val iter = (i: Int) =>
      s""", s$i AS (
         |  SELECT p.seed, esw.dst_key AS key, sum(p.vv) AS s
         |  FROM esw JOIN p${i - 1} p ON p.key = esw.src_key GROUP BY 1, 2
         |), p$i AS (
         |  SELECT b.seed, b.key,
         |         (1.0 - 0.85) * $tele + 0.85 * coalesce(s$i.s, 0) AS raw,
         |         CASE WHEN b.o > 0
         |              THEN ((1.0 - 0.85) * $tele + 0.85 * coalesce(s$i.s, 0)) / b.o
         |              ELSE (1.0 - 0.85) * $tele + 0.85 * coalesce(s$i.s, 0) END AS vv
         |  FROM bse b LEFT JOIN s$i ON s$i.seed = b.seed AND s$i.key = b.key
         |)""".stripMargin
    "WITH " + prefixBody + symBody +
      """, rt4m AS MATERIALIZED (
        |  SELECT src_key AS seed FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 4
        |), od AS (SELECT src_key AS key, count(*) AS o FROM esw GROUP BY 1)
        |, deg AS (SELECT v.key, coalesce(od.o, 0) AS o FROM v LEFT JOIN od ON od.key = v.key)
        |, bse AS (SELECT r.seed, deg.key, deg.o AS o FROM deg CROSS JOIN rt4m r)
        |, p0 AS (
        |  SELECT seed, key,
        |         CASE WHEN key = seed THEN 1.0 ELSE 0.0 END AS raw,
        |         CASE WHEN key = seed THEN (CASE WHEN o > 0 THEN 1.0 / o ELSE 1.0 END)
        |              ELSE 0.0 END AS vv
        |  FROM bse)""".stripMargin +
      (1 to 5).map(iter).mkString +
      "\nSELECT seed AS seed_key, key, cast(round(raw*100000) AS bigint) AS rank_e5 FROM p5"
  }

  /** Mode-LP community replay: 4 unrolled synchronous rounds; top-1 =
   * row_number over (cnt desc, label) ↔ the engine's
   * min(struct(−cnt, label)) aggregate. */
  private val lpCommCtes: String = {
    val round = (t: Int) =>
      s""", c$t AS (
         |  SELECT e.dst_key, l.community, count(*) AS cnt
         |  FROM esw e JOIN l${t - 1} l ON l.key = e.src_key
         |  GROUP BY 1, 2
         |), t$t AS (
         |  SELECT dst_key AS key, community,
         |         row_number() OVER (PARTITION BY dst_key ORDER BY cnt DESC, community) AS rn
         |  FROM c$t
         |), l$t AS (
         |  SELECT v.key, coalesce(t.community, v.key) AS community
         |  FROM v LEFT JOIN (SELECT key, community FROM t$t WHERE rn = 1) t USING (key)
         |)""".stripMargin
    "WITH " + prefixBody + symBody +
      ", l0 AS (SELECT key, key AS community FROM v)" +
      (1 to 4).map(round).mkString
  }

  private val lpCommSql: String = lpCommCtes + "\nSELECT key, community FROM l4"

  /** Densest-peel replay: recursive rounds with the 2·d·nv > 3·se
   * survival gate evaluated via window aggregates inside the
   * recursive term; per-round census re-joined from r; best round by
   * HUGEINT cross-multiplication with the earliest-round tie rule. */
  private val densestSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, r(key, it) AS (
      |  SELECT DISTINCT src_key, 0 FROM esw
      |  UNION ALL
      |  SELECT key, it + 1 FROM (
      |    SELECT a.key, a.it, count(*) AS d,
      |           count(*) OVER (PARTITION BY a.it) AS nv,
      |           sum(count(*)) OVER (PARTITION BY a.it) AS se
      |    FROM r a JOIN esw e ON e.src_key = a.key
      |             JOIN r b ON b.key = e.dst_key AND b.it = a.it
      |    WHERE a.it < 999
      |    GROUP BY a.key, a.it) x
      |  WHERE d * nv > se
      |), ds AS MATERIALIZED (
      |  SELECT a.it AS round, count(DISTINCT a.key) AS nv, count(*) AS se
      |  FROM r a JOIN esw e ON e.src_key = a.key
      |           JOIN r b ON b.key = e.dst_key AND b.it = a.it
      |  GROUP BY 1
      |)
      |SELECT cast(round AS bigint) AS round,
      |       cast(nv AS bigint) AS n_vertices,
      |       cast(se // 2 AS bigint) AS n_edges,
      |       cast(10000 * (se // 2) // nv AS bigint) AS dens_e4,
      |       cast(CASE WHEN NOT EXISTS (
      |         SELECT 1 FROM ds o
      |         WHERE o.se::HUGEINT * ds.nv > ds.se::HUGEINT * o.nv
      |            OR (o.se::HUGEINT * ds.nv = ds.se::HUGEINT * o.nv AND o.round < ds.round)
      |       ) THEN 1 ELSE 0 END AS bigint) AS is_best
      |FROM ds""".stripMargin

  /** Segmentation replay: same distinct-token consecutive-turn
   * intersection, integer boundary gate, window prefix-sum seg ids. */
  /** TextRank replay: the same integer power iteration as the engine
   * (10⁶ scale, 17/20 damping, floor at every division), unrolled as
   * 4 chained CTE rounds over the shared-token turn graph — the
   * [[eigenSql]] pattern on a per-conversation graph. */
  private val textrankSql: String = {
    val round = (k: Int) =>
      s""", tr$k AS (
         |  SELECT en.conv_id, en.dst AS id,
         |         150000 + (17 * sum((p.score * en.w) // en.wtot)) // 20 AS score
         |  FROM en JOIN tr${k - 1} p ON p.conv_id = en.conv_id AND p.id = en.src
         |  GROUP BY 1, 2
         |)""".stripMargin
    prefix +
      """, ttk AS MATERIALIZED (
        |  SELECT DISTINCT conv_id, turn_idx, unnest(string_split(lower(text), ' ')) AS tok FROM t
        |), tpe AS MATERIALIZED (
        |  SELECT a.conv_id AS conv_id, a.turn_idx AS i, b.turn_idx AS j, count(*) AS w
        |  FROM ttk a JOIN ttk b ON b.conv_id = a.conv_id
        |    AND b.turn_idx > a.turn_idx AND b.tok = a.tok
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |), ted AS MATERIALIZED (
        |  SELECT conv_id, i AS src, j AS dst, w FROM tpe
        |  UNION ALL
        |  SELECT conv_id, j, i, w FROM tpe
        |), en AS MATERIALIZED (
        |  SELECT ted.conv_id, ted.src, ted.dst, ted.w, ws.wtot
        |  FROM ted JOIN (
        |    SELECT conv_id, src, sum(w) AS wtot FROM ted GROUP BY 1, 2) ws
        |    USING (conv_id, src)
        |), tr0 AS (
        |  SELECT DISTINCT conv_id, src AS id, cast(1000000 AS bigint) AS score FROM ted
        |)""".stripMargin +
      (1 to 4).map(round).mkString +
      """
        |SELECT conv_id, cast(id AS bigint) AS turn_idx,
        |       cast(score AS bigint) AS score, cast(rn AS bigint) AS rnk
        |FROM (SELECT conv_id, id, score,
        |             row_number() OVER (PARTITION BY conv_id ORDER BY score DESC, id) AS rn
        |      FROM tr4) x
        |WHERE rn <= 3""".stripMargin
  }

  private val segmentsSql: String = prefix +
    """, tok AS (
      |  SELECT DISTINCT conv_id, turn_idx, unnest(string_split(lower(text), ' ')) AS tok FROM t
      |), szs AS (
      |  SELECT conv_id, turn_idx, count(*) AS sz FROM tok GROUP BY 1, 2
      |), intr AS (
      |  SELECT a.conv_id, b.turn_idx, count(*) AS i
      |  FROM tok a JOIN tok b ON b.conv_id = a.conv_id
      |    AND b.turn_idx = a.turn_idx + 1 AND b.tok = a.tok
      |  GROUP BY 1, 2
      |), fl AS (
      |  SELECT s.conv_id, s.turn_idx, s.sz,
      |         lag(s.sz) OVER (PARTITION BY s.conv_id ORDER BY s.turn_idx) AS prev_sz,
      |         coalesce(i.i, 0) AS i
      |  FROM szs s LEFT JOIN intr i ON i.conv_id = s.conv_id AND i.turn_idx = s.turn_idx
      |), fb AS (
      |  SELECT conv_id, turn_idx,
      |         CASE WHEN prev_sz IS NULL THEN 0
      |              WHEN 10000 * i < 3000 * (prev_sz + sz - i) THEN 1 ELSE 0 END AS boundary
      |  FROM fl
      |), sg AS (
      |  SELECT conv_id, turn_idx,
      |         sum(boundary) OVER (PARTITION BY conv_id ORDER BY turn_idx
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
      |  FROM fb
      |)
      |SELECT conv_id, cast(seg_id AS bigint) AS seg_id,
      |       cast(min(turn_idx) AS bigint) AS start_turn, count(*) AS n_turns
      |FROM sg GROUP BY 1, 2""".stripMargin

  /** Triad-census replay: same closed forms over the identical
   * dominant-direction arc set (te); hub products lift to HUGEINT. */
  /** Mirrors pipeline.Cover.greedyCover (k=12): the adaptive greedy
   * trajectory as 12 mechanically chained CTE steps — step i picks
   * argmax (new-coverage, conv_id) against u(i-1), u(i) strips the
   * pick's tools. Early completion leaves later steps empty (LIMIT 1
   * of an empty aggregate), matching the engine's early stop. */
  private val coverSql: String = {
    val k = 12
    val steps = (1 to k).map { i =>
      val prevU = s"u${i - 1}"
      s""", p$i AS MATERIALIZED (
         |  SELECT conv_id, count(*) AS n FROM ct JOIN $prevU USING (tool)
         |  GROUP BY 1 ORDER BY n DESC, conv_id LIMIT 1
         |), u$i AS MATERIALIZED (
         |  SELECT tool FROM $prevU
         |  WHERE tool NOT IN (SELECT ct.tool FROM ct JOIN p$i USING (conv_id))
         |)""".stripMargin
    }.mkString
    val sel = (1 to k).map(i =>
      s"SELECT cast($i AS bigint) AS pick, conv_id, cast(n AS bigint) AS n_new FROM p$i")
      .mkString("\nUNION ALL\n")
    prefix +
      """, ct AS MATERIALIZED (
        |  SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL
        |), u0 AS MATERIALIZED (
        |  SELECT DISTINCT tool FROM ct
        |)""".stripMargin + steps + "\n" + sel
  }

  /** Mirrors Cooccur.toolGini: ascending (count, tool) ranks, exact
   * integer rank-form Gini. */
  private val giniSql: String = prefix +
    """, cnt AS (
      |  SELECT tool, count(*) AS c FROM t WHERE tool IS NOT NULL GROUP BY 1
      |), rk AS (
      |  SELECT c, row_number() OVER (ORDER BY c ASC, tool ASC) AS i FROM cnt
      |)
      |SELECT cast(count(*) AS bigint) AS n_tools,
      |       cast(sum(c) AS bigint) AS total_uses,
      |       cast((1000000 * (2 * sum(i * c) - (count(*) + 1) * sum(c)))
      |            // (count(*) * sum(c)) AS bigint) AS gini_e6
      |FROM rk""".stripMargin

  /** Mirrors TriadCensus.dyads over the raw transition counts. */
  private val dyadsSql: String = prefix +
    """, tseq AS (
      |  SELECT tool, lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
      |  FROM t WHERE tool IS NOT NULL
      |), tcnt AS MATERIALIZED (
      |  SELECT tool AS src, nxt AS dst FROM tseq
      |  WHERE nxt IS NOT NULL AND nxt <> tool GROUP BY 1, 2
      |), und AS (
      |  SELECT least(src, dst) AS u, greatest(src, dst) AS v2, count(*) AS dirs
      |  FROM tcnt GROUP BY 1, 2
      |), nt AS (
      |  SELECT count(DISTINCT k) AS n FROM (
      |    SELECT src AS k FROM tcnt UNION ALL SELECT dst FROM tcnt) x
      |)
      |SELECT cast(nt.n AS bigint) AS n_tools,
      |       cast(coalesce(sum(CASE WHEN dirs = 2 THEN 1 END), 0) AS bigint) AS mutual,
      |       cast(coalesce(sum(CASE WHEN dirs = 1 THEN 1 END), 0) AS bigint) AS asym,
      |       cast(nt.n * (nt.n - 1) // 2 - count(*) AS bigint) AS nulls
      |FROM und CROSS JOIN nt GROUP BY nt.n""".stripMargin

  private val triadsSql: String = prefix +
    """, tseq AS (
      |  SELECT tool, lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
      |  FROM t WHERE tool IS NOT NULL
      |), tcnt AS (
      |  SELECT tool AS src, nxt AS dst, count(*) AS c FROM tseq
      |  WHERE nxt IS NOT NULL AND nxt <> tool GROUP BY 1, 2
      |), te AS MATERIALIZED (
      |  SELECT a.src, a.dst FROM tcnt a
      |  LEFT JOIN tcnt b ON b.src = a.dst AND b.dst = a.src
      |  WHERE a.c > coalesce(b.c, 0)
      |), od AS (SELECT src AS v, count(*) AS o FROM te GROUP BY 1
      |), idg AS (SELECT dst AS v, count(*) AS i FROM te GROUP BY 1
      |), dg AS (
      |  SELECT coalesce(od.o, 0) AS o, coalesce(idg.i, 0) AS i
      |  FROM od FULL OUTER JOIN idg ON idg.v = od.v
      |), pp AS (SELECT coalesce(sum(i::HUGEINT * o), 0) AS p FROM dg
      |), ddo AS (SELECT coalesce(sum(o::HUGEINT * (o - 1) // 2), 0) AS x FROM dg
      |), ddi AS (SELECT coalesce(sum(i::HUGEINT * (i - 1) // 2), 0) AS x FROM dg
      |), tt AS (
      |  SELECT count(*) AS t FROM te e1
      |  JOIN te e2 ON e2.src = e1.dst
      |  JOIN te e3 ON e3.src = e1.src AND e3.dst = e2.dst
      |), cc3 AS (
      |  SELECT count(*) // 3 AS c FROM te e1
      |  JOIN te e2 ON e2.src = e1.dst
      |  JOIN te e3 ON e3.src = e2.dst AND e3.dst = e1.src
      |)
      |SELECT '021D' AS triad_type, cast(ddo.x - tt.t AS bigint) AS n FROM ddo, tt
      |UNION ALL SELECT '021U', cast(ddi.x - tt.t AS bigint) FROM ddi, tt
      |UNION ALL SELECT '021C', cast(pp.p - tt.t - 3 * cc3.c AS bigint) FROM pp, tt, cc3
      |UNION ALL SELECT '030T', cast(tt.t AS bigint) FROM tt
      |UNION ALL SELECT '030C', cast(cc3.c AS bigint) FROM cc3""".stripMargin

  /** Funnel replay: identical step derivation (top-3 tools by
   * distinct-conv usage, ties by name) and strictly-after step
   * minima. */
  private val funnelSql: String = prefix +
    """, tl AS (
      |  SELECT conv_id, tool, epoch_us(ts) AS tus FROM t WHERE tool IS NOT NULL
      |), steps AS (
      |  SELECT tool, stp FROM (
      |    SELECT tool, row_number() OVER (ORDER BY nc DESC, tool) AS stp
      |    FROM (SELECT tool, count(DISTINCT conv_id) AS nc FROM tl GROUP BY 1) x) y
      |  WHERE stp <= 3
      |), f1 AS (
      |  SELECT tl.conv_id, min(tus) AS t1 FROM tl
      |  JOIN steps s ON s.tool = tl.tool AND s.stp = 1 GROUP BY 1
      |), f2 AS (
      |  SELECT tl.conv_id, min(tus) AS t2 FROM tl
      |  JOIN steps s ON s.tool = tl.tool AND s.stp = 2
      |  JOIN f1 ON f1.conv_id = tl.conv_id
      |  WHERE tl.tus > f1.t1 GROUP BY 1
      |), f3 AS (
      |  SELECT tl.conv_id, min(tus) AS t3 FROM tl
      |  JOIN steps s ON s.tool = tl.tool AND s.stp = 3
      |  JOIN f2 ON f2.conv_id = tl.conv_id
      |  WHERE tl.tus > f2.t2 GROUP BY 1
      |), cv AS (SELECT DISTINCT conv_id FROM t)
      |SELECT cv.conv_id,
      |       cast(CASE WHEN f3.t3 IS NOT NULL THEN 3
      |                 WHEN f2.t2 IS NOT NULL THEN 2
      |                 WHEN f1.t1 IS NOT NULL THEN 1 ELSE 0 END AS bigint) AS depth,
      |       cast(coalesce(f3.t3, f2.t2, f1.t1, -1) AS bigint) AS done_us
      |FROM cv LEFT JOIN f1 USING (conv_id) LEFT JOIN f2 USING (conv_id)
      |LEFT JOIN f3 USING (conv_id)""".stripMargin

  /** Temporal reachability replay: recursive label-correcting over
   * the same symmetric temporal edge table (edge time = lead ts for
   * adjacency, turn ts for tool edges, min per pair). r carries every
   * (key, feasible-arrival) pair — finite (arrivals ⊆ edge times), so
   * UNION-dedup recursion terminates; min per key = earliest. */
  private val treachSql: String = "WITH RECURSIVE " + prefixBody +
    """, kt AS MATERIALIZED (
      |  SELECT concat(conv_id, '#', cast(turn_idx AS varchar)) AS vkey,
      |         epoch_us(ts) AS tus, conv_id, turn_idx, tool
      |  FROM t
      |), ted AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT vkey AS src_key,
      |           lead(vkey) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_key,
      |           lead(tus) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tt
      |    FROM kt) x WHERE dst_key IS NOT NULL
      |  UNION ALL
      |  SELECT vkey, concat('T#', tool), tus FROM kt WHERE tool IS NOT NULL
      |), tes AS MATERIALIZED (
      |  SELECT src_key, dst_key, min(tt) AS tt FROM (
      |    SELECT src_key, dst_key, tt FROM ted
      |    UNION ALL
      |    SELECT dst_key, src_key, tt FROM ted
      |  ) u WHERE src_key <> dst_key GROUP BY 1, 2
      |), r(key, arr) AS (
      |  SELECT vkey, tus FROM kt WHERE turn_idx = 0
      |  UNION
      |  SELECT e.dst_key, e.tt FROM r JOIN tes e ON e.src_key = r.key AND e.tt >= r.arr
      |)
      |SELECT key, min(arr) AS arr FROM r GROUP BY 1""".stripMargin

  /** WL refinement replay: same multiset-sum hash as the engine —
   * Σ 32-bit md5 prefixes of neighbor labels (DuckDB sums BIGINT into
   * HUGEINT, matching the engine's exact decimal(38,0) sum) mod
   * 2^61−1, re-hashed with the previous label. */
  private val wlSql: String = {
    val round = (t: Int) =>
      s""", m$t AS (
         |  SELECT e.dst_key AS key,
         |         cast(cast(sum(('0x' || substr(md5(p.wl), 1, 8))::BIGINT) AS HUGEINT)
         |              % 2305843009213693951 AS varchar) AS h
         |  FROM esw e JOIN w${t - 1} p ON p.key = e.src_key
         |  GROUP BY 1
         |), w$t AS (
         |  SELECT v.key, md5(concat(p.wl, '|', coalesce(m$t.h, ''))) AS wl
         |  FROM v JOIN w${t - 1} p USING (key) LEFT JOIN m$t USING (key)
         |)""".stripMargin
    "WITH " + prefixBody + symBody +
      ", w0 AS (SELECT src_key AS key, cast(count(*) AS varchar) AS wl FROM esw GROUP BY 1)" +
      (1 to 3).map(round).mkString +
      "\nSELECT key, wl FROM w3"
  }

  /** Modularity statistics over the l4 communities: intra-edge count
   * on the undirected unique pairs, member count + degree sum from the
   * symmetric edge table — all exact integers (casts pin DuckDB's
   * HUGEINT sums back to the engine's BIGINT). */
  private val modularitySql: String = lpCommCtes +
    """, eu AS (SELECT src_key, dst_key FROM esw WHERE src_key < dst_key
      |), intra AS (
      |  SELECT la.community, count(*) AS intra_edges
      |  FROM eu
      |  JOIN l4 la ON la.key = eu.src_key
      |  JOIN l4 lb ON lb.key = eu.dst_key
      |  WHERE la.community = lb.community
      |  GROUP BY 1
      |), degsum AS (
      |  SELECT l4.community, count(*) AS n_members,
      |         cast(sum(d.deg) AS bigint) AS degree_sum
      |  FROM (SELECT src_key AS key, count(*) AS deg FROM esw GROUP BY 1) d
      |  JOIN l4 ON l4.key = d.key
      |  GROUP BY 1
      |)
      |SELECT degsum.community, n_members,
      |       cast(coalesce(intra_edges, 0) AS bigint) AS intra_edges, degree_sum
      |FROM degsum LEFT JOIN intra USING (community)""".stripMargin

  /** Maximal-matching replay: the recursive CTE carries the live edge
   * set; an edge matches when its md5 priority is the min at BOTH
   * endpoints (per-vertex minima = the doubly-referenced working-table
   * group-by); survivors are edges with no matched endpoint. Matched
   * rows freeze (emitted once with matched = true, never re-expanded),
   * so the final SELECT just collects them across iterations. */
  private val matchingCtes: String = {
    val minsSub =
      """(SELECT x, min(p) AS mp FROM (
        |          SELECT a AS x, p FROM r WHERE NOT matched
        |          UNION ALL SELECT b, p FROM r WHERE NOT matched) u GROUP BY x)""".stripMargin
    "WITH RECURSIVE " + prefixBody + symBody +
      s""", e0 AS (
         |  SELECT src_key AS a, dst_key AS b,
         |         ('0x' || substr(md5(concat(src_key, '|', dst_key)), 1, 15))::BIGINT AS p
         |  FROM esw WHERE src_key < dst_key
         |), r(a, b, p, it, matched) AS (
         |  SELECT a, b, p, 0, false FROM e0
         |  UNION ALL
         |  SELECT e.a, e.b, e.p, e.it + 1,
         |         (mva.mp = e.p AND mvb.mp = e.p)
         |  FROM r e
         |  JOIN $minsSub mva ON mva.x = e.a
         |  JOIN $minsSub mvb ON mvb.x = e.b
         |  WHERE NOT e.matched AND e.it < 40
         |    AND NOT EXISTS (
         |      SELECT 1 FROM r m
         |      JOIN $minsSub ka ON ka.x = m.a AND ka.mp = m.p
         |      JOIN $minsSub kb ON kb.x = m.b AND kb.mp = m.p
         |      WHERE NOT m.matched AND (m.a IN (e.a, e.b) OR m.b IN (e.a, e.b))
         |            AND NOT (m.a = e.a AND m.b = e.b)
         |    )
         |)""".stripMargin
  }

  private val matchingSql: String = matchingCtes +
    "\nSELECT a AS u_key, b AS v_key, cast(it AS bigint) AS mround FROM r WHERE matched"

  /** Preis locally-heaviest replay (mirrors Matching.runWeighted):
   * identical round structure to [[matchingCtes]], priority
   * (97−w)·2⁴⁰ + 40-bit md5 so min-priority ⇔ max capacity with the
   * MSF tie-break; w rides along into the output. */
  private val matchingWSql: String = {
    val minsSub =
      """(SELECT x, min(p) AS mp FROM (
        |          SELECT a AS x, p FROM rw WHERE NOT matched
        |          UNION ALL SELECT b, p FROM rw WHERE NOT matched) u GROUP BY x)""".stripMargin
    "WITH RECURSIVE " + prefixBody + symBody +
      s""", e0 AS (
         |  SELECT a, b, w,
         |         (97 - w) * (1::BIGINT << 40) +
         |         ('0x' || substr(md5(concat(a, '|', b)), 1, 10))::BIGINT AS p
         |  FROM (
         |    SELECT src_key AS a, dst_key AS b,
         |           1 + ('0x' || substr(md5(concat('cap|', src_key, '|', dst_key)), 1, 10))::BIGINT % 97 AS w
         |    FROM esw WHERE src_key < dst_key) x
         |), rw(a, b, w, p, it, matched) AS (
         |  SELECT a, b, w, p, 0, false FROM e0
         |  UNION ALL
         |  SELECT e.a, e.b, e.w, e.p, e.it + 1,
         |         (mva.mp = e.p AND mvb.mp = e.p)
         |  FROM rw e
         |  JOIN $minsSub mva ON mva.x = e.a
         |  JOIN $minsSub mvb ON mvb.x = e.b
         |  WHERE NOT e.matched AND e.it < 60
         |    AND NOT EXISTS (
         |      SELECT 1 FROM rw m
         |      JOIN $minsSub ka ON ka.x = m.a AND ka.mp = m.p
         |      JOIN $minsSub kb ON kb.x = m.b AND kb.mp = m.p
         |      WHERE NOT m.matched AND (m.a IN (e.a, e.b) OR m.b IN (e.a, e.b))
         |            AND NOT (m.a = e.a AND m.b = e.b)
         |    )
         |)
         |SELECT a AS u_key, b AS v_key, cast(w AS bigint) AS w,
         |       cast(it AS bigint) AS mround FROM rw WHERE matched""".stripMargin
  }

  /** Coarsening replay: supervertex = matched-pair min key (or self),
   * contracted parallel edges merge counts + exact weight mass. */
  private val coarsenSql: String = matchingCtes +
    """, mm AS (SELECT a, b FROM r WHERE matched)
      |, vmp AS (
      |  SELECT v.key, coalesce(p.sup, v.key) AS sup FROM v
      |  LEFT JOIN (SELECT b AS key, a AS sup FROM mm
      |             UNION ALL SELECT a, a FROM mm) p USING (key)
      |), ce AS (
      |  SELECT least(va.sup, vb.sup) AS su_key,
      |         greatest(va.sup, vb.sup) AS sv_key, e.w
      |  FROM (SELECT src_key, dst_key, w FROM esw WHERE src_key < dst_key) e
      |  JOIN vmp va ON va.key = e.src_key
      |  JOIN vmp vb ON vb.key = e.dst_key
      |  WHERE va.sup <> vb.sup
      |)
      |SELECT su_key, sv_key, cast(count(*) AS bigint) AS n_edges,
      |       cast(round(sum(w) * 1000) AS bigint) AS tot_w_e3
      |FROM ce GROUP BY 1, 2""".stripMargin

  /** 3-truss peel replay. The recursive CTE carries the full surviving
   * SYMMETRIC edge set per iteration; support(a,b) = common neighbors
   * z via a double self-join of the working table (same multi-ref
   * trick as kcoreSql). The final row set is taken at it = 11 EXACTLY:
   * a nonempty fixpoint plateaus up to the cap (rows at 11 = fixpoint),
   * while an empty truss kills the recursion early (no rows at 11 =
   * empty result) — matching Truss.run's converged set either way. */
  private val trussSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, r(a, b, it) AS (
      |  SELECT src_key, dst_key, 0 FROM esw
      |  UNION ALL
      |  SELECT e.a, e.b, e.it + 1
      |  FROM r e
      |  JOIN r w1 ON w1.a = e.a AND w1.it = e.it
      |  JOIN r w2 ON w2.a = e.b AND w2.b = w1.b AND w2.it = e.it
      |  WHERE e.it < 11
      |  GROUP BY e.a, e.b, e.it
      |  HAVING count(*) >= 1
      |), lastt AS MATERIALIZED (
      |  SELECT a, b FROM r WHERE it = 11
      |), fsup AS (
      |  SELECT e.a, e.b, count(*) AS sup
      |  FROM lastt e
      |  JOIN lastt w1 ON w1.a = e.a
      |  JOIN lastt w2 ON w2.a = e.b AND w2.b = w1.b
      |  GROUP BY 1, 2
      |)
      |SELECT a AS u_key, b AS v_key, cast(sup AS bigint) AS support
      |FROM fsup WHERE a < b""".stripMargin

  /** Full truss-decomposition replay: one trussSql-style peel per
   * k = 3..4 (the 3-core is empty here — corenessSql proves the
   * ceiling — so every 4-truss edge would need a 3-core and l4 stays
   * empty, proving trussness ≤ 3), each peel starting from the
   * previous truss fixpoint exactly as the engine's nested peel;
   * membership CASE downward, floor 2. Fixpoint-or-empty at the it
   * cap, the corenessSql/trussSql convention. */
  private val trussnessSql: String = {
    val peel = (k: Int, base: String) =>
      s""", r$k(a, b, it) AS (
         |  SELECT a, b, 0 FROM $base
         |  UNION ALL
         |  SELECT e.a, e.b, e.it + 1
         |  FROM r$k e
         |  JOIN r$k w1 ON w1.a = e.a AND w1.it = e.it
         |  JOIN r$k w2 ON w2.a = e.b AND w2.b = w1.b AND w2.it = e.it
         |  WHERE e.it < 11
         |  GROUP BY e.a, e.b, e.it
         |  HAVING count(*) >= ${k - 2}
         |), l$k AS MATERIALIZED (
         |  SELECT a, b FROM r$k WHERE it = 11
         |)""".stripMargin
    "WITH RECURSIVE " + prefixBody + symBody +
      ", l2 AS MATERIALIZED (SELECT src_key AS a, dst_key AS b FROM esw)" +
      peel(3, "l2") + peel(4, "l3") +
      """
        |SELECT e.a AS u_key, e.b AS v_key,
        |       cast(CASE WHEN l4.a IS NOT NULL THEN 4
        |                 WHEN l3.a IS NOT NULL THEN 3
        |                 ELSE 2 END AS bigint) AS trussness
        |FROM l2 e
        |LEFT JOIN l3 ON l3.a = e.a AND l3.b = e.b
        |LEFT JOIN l4 ON l4.a = e.a AND l4.b = e.b
        |WHERE e.a < e.b""".stripMargin
  }

  /** Betweenness from the max-degree root (bc.cpp:24-196 semantics):
   * forward = ONE level-synchronous recursion carrying the full
   * (key, lvl, σ) state per step — NOT EXISTS against the carried
   * state keeps expansion junk-free, so it terminates naturally;
   * backward = per-level recursion over the shortest-path DAG
   * computing dep(v) = 1/σ(v) + Σ dep(children); bc = dep·σ − 1. */
  /** Shared Brandes CTE chain (forward σ levels, shortest-path DAG,
   * backward dependency recursion) — the body of [[bcSql]], reused by
   * the edge-betweenness oracle. */
  private val bcCtes: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, fw(key, lvl, sigma) AS (
      |  SELECT rkey, 0, cast(1.0 AS double) FROM rt
      |  UNION ALL
      |  SELECT nxt.key, nxt.lvl, nxt.sigma FROM (
      |    SELECT r0.key, r0.lvl, r0.sigma FROM fw r0
      |    UNION ALL
      |    SELECT esw.dst_key, min(f.lvl) + 1, sum(f.sigma)
      |    FROM fw f JOIN esw ON esw.src_key = f.key
      |    WHERE f.lvl = (SELECT max(m.lvl) FROM fw m)
      |      AND NOT EXISTS (SELECT 1 FROM fw x WHERE x.key = esw.dst_key)
      |    GROUP BY esw.dst_key
      |  ) nxt
      |  WHERE EXISTS (
      |    SELECT 1 FROM fw f JOIN esw ON esw.src_key = f.key
      |    WHERE f.lvl = (SELECT max(m.lvl) FROM fw m)
      |      AND NOT EXISTS (SELECT 1 FROM fw x WHERE x.key = esw.dst_key))
      |), sg AS MATERIALIZED (
      |  SELECT DISTINCT key, lvl, sigma FROM fw
      |), dag AS MATERIALIZED (
      |  SELECT esw.src_key, esw.dst_key, a.lvl AS slvl
      |  FROM esw JOIN sg a ON a.key = esw.src_key JOIN sg b ON b.key = esw.dst_key
      |  WHERE b.lvl = a.lvl + 1
      |), dp(key, dep, lvl) AS (
      |  SELECT key, 1.0/sigma, lvl FROM sg WHERE lvl = (SELECT max(s2.lvl) FROM sg s2)
      |  UNION ALL
      |  SELECT s.key, 1.0/s.sigma + coalesce(ch.su, 0), s.lvl
      |  FROM sg s
      |  LEFT JOIN (
      |    SELECT dag.src_key AS key, sum(d.dep) AS su
      |    FROM dp d JOIN dag ON dag.dst_key = d.key AND dag.slvl = d.lvl - 1
      |    GROUP BY 1
      |  ) ch ON ch.key = s.key
      |  WHERE s.lvl = (SELECT min(d2.lvl) FROM dp d2) - 1 AND (SELECT min(d3.lvl) FROM dp d3) > 0
      |)""".stripMargin

  private val bcSql: String = bcCtes +
    """
      |SELECT sg.key AS key, cast(sg.sigma AS bigint) AS sigma,
      |       cast(round((dp.dep * sg.sigma - 1.0)*1000) AS bigint) AS bc_e3
      |FROM sg JOIN dp ON dp.key = sg.key""".stripMargin

  /** Edge betweenness over the shortest-path DAG: per-edge credit
   * σ(src) · dep(dst) — algos.EdgeBetweenness, same rounding as bc. */
  private val ebcSql: String = bcCtes +
    """
      |SELECT dag.src_key AS src_key, dag.dst_key AS dst_key,
      |       cast(round(a.sigma * dp.dep * 1000) AS bigint) AS ebc_e3
      |FROM dag JOIN sg a ON a.key = dag.src_key
      |         JOIN dp ON dp.key = dag.dst_key""".stripMargin

  /** Voronoi assignment replay: per reached key, the (min level, min
   * root) seed over the msbfs recursion — the same argmin the engine's
   * `min(struct(dist, root_key))` aggregate computes. */
  private val voronoiSql: String = "WITH RECURSIVE " + prefixBody + symBody + msbfsBody +
    """, d AS (
      |  SELECT root, key, min(lvl) AS dd FROM r GROUP BY 1, 2
      |)
      |SELECT key, root AS seed_key, cast(dd AS bigint) AS dist FROM (
      |  SELECT key, root, dd,
      |         row_number() OVER (PARTITION BY key ORDER BY dd, root) AS rn
      |  FROM d) x
      |WHERE rn = 1""".stripMargin

  /** DAG longest-path replay: step t of the grouped max-relax
   * recursion produces exactly the vertices with a t-edge path, at
   * value t; on the (acyclic) transcript graph the recursion dies at
   * the longest path length, so the cap never binds. */
  private val critpathSql: String = "WITH RECURSIVE " + prefixBody +
    """, r(key, d) AS (
      |  SELECT key, 0 FROM v
      |  UNION ALL
      |  SELECT e.dst_key, max(r.d) + 1 FROM r JOIN e ON e.src_key = r.key
      |  WHERE r.d < 200 GROUP BY e.dst_key
      |)
      |SELECT key, cast(max(d) AS bigint) AS depth FROM r GROUP BY key""".stripMargin

  /** SCC replay: dominant-direction tool transitions (mirrors
   * EdgeBuilder.toolTransitions), then mutual reachability via ONE
   * recursive closure joined to itself reversed — scc_key = min key
   * among mutually reachable vertices, exactly the engine's
   * re-canonicalized export. */
  /** Hitting-time replay: the engine's 5 truncated value-iteration
   * rounds (10⁴-scaled, floor division, tools pinned at 0) as
   * chained CTEs over the symmetric edge set. */
  private val hittingSql: String = {
    val round = (k: Int) =>
      s""", h$k AS (
         |  SELECT ab.key,
         |         CASE WHEN ab.absorb THEN 0
         |              ELSE 10000 + coalesce(s.m, 0) // dgs.d END AS h
         |  FROM ab JOIN dgs USING (key)
         |  LEFT JOIN (
         |    SELECT esw.dst_key AS key, sum(p.h) AS m
         |    FROM esw JOIN h${k - 1} p ON p.key = esw.src_key GROUP BY 1) s
         |    USING (key)
         |)""".stripMargin
    "WITH " + prefixBody + symBody +
      """, dgs AS (
        |  SELECT src_key AS key, count(*) AS d FROM esw GROUP BY 1
        |), ab AS (
        |  SELECT key, (key LIKE 'T#%') AS absorb FROM v
        |), h0 AS (
        |  SELECT key, cast(0 AS bigint) AS h FROM v
        |)""".stripMargin +
      (1 to 5).map(round).mkString +
      "\nSELECT key, cast(h AS bigint) AS h_e4 FROM h5"
  }

  /** Graphlet-census replay: the same closed forms over the
   * symmetric edge set — one wedge/codegree CTE feeds C4, the
   * adjacent restriction (t_e) feeds triangles/diamond/tailed, and
   * K4 is the q_4clique 6-join. Per-row C(n,k) floors are exact
   * (numerators divisible by k!). */
  private val graphletsSql: String = "WITH " + prefixBody + symBody +
    """, ud AS MATERIALIZED (
      |  SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b FROM e
      |  WHERE src_key <> dst_key
      |), dgs AS (
      |  SELECT src_key AS k, count(*) AS d FROM esw GROUP BY 1
      |), wdg AS MATERIALIZED (
      |  SELECT x.dst_key AS u, y.dst_key AS v, count(*) AS c
      |  FROM esw x JOIN esw y ON y.src_key = x.src_key AND x.dst_key < y.dst_key
      |  GROUP BY 1, 2
      |), teq AS MATERIALIZED (
      |  SELECT wdg.u, wdg.v, wdg.c FROM wdg JOIN ud ON ud.a = wdg.u AND ud.b = wdg.v
      |), tvq AS (
      |  SELECT k, sum(c) // 2 AS t FROM (
      |    SELECT u AS k, c FROM teq UNION ALL SELECT v, c FROM teq) x GROUP BY 1
      |), p3 AS (
      |  SELECT coalesce(sum((da.d - 1) * (db.d - 1)), 0) AS s
      |  FROM ud JOIN dgs da ON da.k = ud.a JOIN dgs db ON db.k = ud.b
      |), k4q AS (
      |  SELECT count(*) AS n
      |  FROM ud e1
      |  JOIN ud e2 ON e2.a = e1.b
      |  JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b
      |  JOIN ud e4 ON e4.a = e2.b
      |  JOIN ud e5 ON e5.a = e1.a AND e5.b = e4.b
      |  JOIN ud e6 ON e6.a = e1.b AND e6.b = e4.b
      |)
      |SELECT
      |  (SELECT count(*) FROM ud) AS n_edges,
      |  cast((SELECT coalesce(sum(d * (d - 1) // 2), 0) FROM dgs) AS bigint) AS n_wedges,
      |  cast((SELECT coalesce(sum(d * (d - 1) * (d - 2) // 6), 0) FROM dgs) AS bigint) AS n_claws,
      |  cast((SELECT coalesce(sum(c), 0) // 3 FROM teq) AS bigint) AS n_triangles,
      |  cast((SELECT s FROM p3) - (SELECT coalesce(sum(c), 0) FROM teq) AS bigint) AS n_paths3,
      |  cast((SELECT coalesce(sum(tvq.t * (dgs.d - 2)), 0) FROM tvq JOIN dgs USING (k)) AS bigint) AS n_tailed,
      |  cast((SELECT coalesce(sum(c * (c - 1) // 2), 0) // 2 FROM wdg) AS bigint) AS n_c4,
      |  cast((SELECT coalesce(sum(c * (c - 1) // 2), 0) FROM teq) AS bigint) AS n_diamonds,
      |  cast((SELECT n FROM k4q) AS bigint) AS n_k4""".stripMargin

  /** SimRank replay — the engine's 3 integer rounds as chained CTEs
   * over the same dominant-direction tool digraph as [[sccSql]]:
   * s' = ⌊4·Σs / (5·indeg_a·indeg_b)⌋, diagonal pinned at 10⁶,
   * rows < 1 pruned each round (mirrors SimRank.run minS). */
  private val simrankSql: String = {
    val round = (k: Int) =>
      s""", sr$k AS (
         |  SELECT a, b, s FROM (
         |    SELECT ea.dst AS a, eb.dst AS b,
         |           (4 * sum(p.s)) // (5 * ia.deg * ib.deg) AS s
         |    FROM sr${k - 1} p
         |    JOIN te ea ON ea.src = p.a
         |    JOIN te eb ON eb.src = p.b
         |    JOIN ind ia ON ia.dst = ea.dst
         |    JOIN ind ib ON ib.dst = eb.dst
         |    WHERE ea.dst <> eb.dst
         |    GROUP BY ea.dst, eb.dst, ia.deg, ib.deg) x
         |  WHERE s >= 1
         |  UNION ALL
         |  SELECT n AS a, n AS b, cast(1000000 AS bigint) AS s FROM tv
         |)""".stripMargin
    prefix +
      """, tseq AS (
        |  SELECT tool, lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
        |  FROM t WHERE tool IS NOT NULL
        |), tcnt AS (
        |  SELECT tool AS src, nxt AS dst, count(*) AS c FROM tseq
        |  WHERE nxt IS NOT NULL AND nxt <> tool GROUP BY 1, 2
        |), te AS MATERIALIZED (
        |  SELECT a.src, a.dst FROM tcnt a
        |  LEFT JOIN tcnt b ON b.src = a.dst AND b.dst = a.src
        |  WHERE a.c > coalesce(b.c, 0)
        |), tv AS MATERIALIZED (
        |  SELECT DISTINCT n FROM (SELECT src AS n FROM te UNION ALL SELECT dst FROM te) u
        |), ind AS (
        |  SELECT dst, count(*) AS deg FROM te GROUP BY 1
        |), sr0 AS (
        |  SELECT n AS a, n AS b, cast(1000000 AS bigint) AS s FROM tv
        |)""".stripMargin +
      (1 to 3).map(round).mkString +
      """
        |SELECT a AS tool_a, b AS tool_b, cast(s AS bigint) AS simrank_e6
        |FROM sr3 WHERE a < b""".stripMargin
  }

  private val sccSql: String = "WITH RECURSIVE " + prefixBody +
    """, tseq AS (
      |  SELECT tool, lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
      |  FROM t WHERE tool IS NOT NULL
      |), tcnt AS (
      |  SELECT tool AS src, nxt AS dst, count(*) AS c FROM tseq
      |  WHERE nxt IS NOT NULL AND nxt <> tool GROUP BY 1, 2
      |), te AS MATERIALIZED (
      |  SELECT a.src, a.dst FROM tcnt a
      |  LEFT JOIN tcnt b ON b.src = a.dst AND b.dst = a.src
      |  WHERE a.c > coalesce(b.c, 0)
      |), tv AS MATERIALIZED (
      |  SELECT DISTINCT k FROM (SELECT src AS k FROM te UNION ALL SELECT dst FROM te) u
      |), reach(s, d) AS (
      |  SELECT k, k FROM tv
      |  UNION
      |  SELECT r.s, te.dst FROM reach r JOIN te ON te.src = r.d
      |)
      |SELECT a.s AS key, min(a.d) AS scc_key
      |FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
      |GROUP BY a.s""".stripMargin

  /** Bow-tie replay: the [[sccSql]] reach fixpoint, core = largest
   * SCC (ties by min key — id order is key order), IN/OUT from the
   * same closure read backward/forward. */
  private val bowtieSql: String = sccSql.replace(
    """SELECT a.s AS key, min(a.d) AS scc_key
      |FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
      |GROUP BY a.s""".stripMargin,
    """, scc AS MATERIALIZED (
      |  SELECT a.s AS key, min(a.d) AS scc_key
      |  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
      |  GROUP BY a.s
      |), core AS MATERIALIZED (
      |  SELECT scc_key FROM (
      |    SELECT scc_key, count(*) AS sz FROM scc GROUP BY 1) x
      |  ORDER BY sz DESC, scc_key LIMIT 1
      |), coremem AS (
      |  SELECT key FROM scc WHERE scc_key = (SELECT scc_key FROM core)
      |), fwd AS (
      |  SELECT DISTINCT r.d AS key FROM reach r JOIN coremem c ON r.s = c.key
      |), bwd AS (
      |  SELECT DISTINCT r.s AS key FROM reach r JOIN coremem c ON r.d = c.key
      |), cls AS (
      |  SELECT s.key,
      |         CASE WHEN s.scc_key = (SELECT scc_key FROM core) THEN 'core'
      |              WHEN b.key IS NOT NULL AND f.key IS NULL THEN 'in'
      |              WHEN f.key IS NOT NULL AND b.key IS NULL THEN 'out'
      |              ELSE 'other' END AS cls
      |  FROM scc s LEFT JOIN fwd f ON f.key = s.key
      |             LEFT JOIN bwd b ON b.key = s.key
      |)
      |SELECT cls, cast(count(*) AS bigint) AS n,
      |       min(key) AS min_key, max(key) AS max_key
      |FROM cls GROUP BY 1""".stripMargin)

  /** Condensation edge census: same reach fixpoint, then distinct
   * dominant-direction edges grouped by (component, component). */
  private val sccDagSql: String = sccSql.replace(
    """SELECT a.s AS key, min(a.d) AS scc_key
      |FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
      |GROUP BY a.s""".stripMargin,
    """, scc AS (
      |  SELECT a.s AS key, min(a.d) AS scc_key
      |  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
      |  GROUP BY a.s
      |)
      |SELECT sa.scc_key AS comp_a, sb.scc_key AS comp_b,
      |       cast(count(*) AS bigint) AS n_edges
      |FROM te e JOIN scc sa ON sa.key = e.src
      |          JOIN scc sb ON sb.key = e.dst
      |WHERE sa.scc_key <> sb.scc_key
      |GROUP BY 1, 2""".stripMargin)

  /** Katz replay: 5 unrolled walk-count rounds (integer sums over
   * in-edges), assembled with the dyadic 8^(5-k) weights. */
  private val katzSql: String = {
    val round = (k: Int) =>
      s""", p$k AS (
         |  SELECT v.key, coalesce(s.c, 0) AS c
         |  FROM v LEFT JOIN (
         |    SELECT e.dst_key AS key, sum(p.c) AS c
         |    FROM e JOIN p${k - 1} p ON p.key = e.src_key GROUP BY 1
         |  ) s USING (key)
         |)""".stripMargin
    prefix + ", p0 AS (SELECT key, cast(1 AS bigint) AS c FROM v)" +
      (1 to 5).map(round).mkString +
      """
        |SELECT p1.key,
        |       cast(p1.c*4096 + p2.c*512 + p3.c*64 + p4.c*8 + p5.c AS bigint) AS katz_x
        |FROM p1 JOIN p2 USING (key) JOIN p3 USING (key)
        |     JOIN p4 USING (key) JOIN p5 USING (key)""".stripMargin
  }

  /** Eigenvector-centrality replay: 6 integer power-iteration rounds
   * over the symmetric edge set, each round a gather-sum + a scalar
   * max + floor renormalization — the same exact-integer dynamic the
   * engine runs. */
  private val eigenSql: String = {
    val round = (k: Int) =>
      s""", r$k AS (
         |  SELECT v.key, coalesce(s.s, 0) AS s
         |  FROM v LEFT JOIN (
         |    SELECT esw.dst_key AS key, sum(x.x) AS s
         |    FROM esw JOIN x${k - 1} x ON x.key = esw.src_key GROUP BY 1
         |  ) s USING (key)
         |), x$k AS (
         |  SELECT key, cast((s * 1000000) // (SELECT max(s) FROM r$k) AS bigint) AS x
         |  FROM r$k
         |)""".stripMargin
    prefix + symBody +
      ", x0 AS (SELECT key, cast(1000000 AS bigint) AS x FROM v)" +
      (1 to 6).map(round).mkString +
      "\nSELECT key, x AS eigen_x FROM x6"
  }

  /** List-rank replay: the chain is the conversation itself, so the
   * distance to the last turn is max(turn_idx) − turn_idx — an
   * independent closed form, not a re-implementation of the pointer
   * doubling. */
  private val listrankSql: String = prefix +
    """
      |SELECT vkey AS key, cast(mx - turn_idx AS bigint) AS rank_to_end
      |FROM (SELECT vkey, turn_idx,
      |             max(turn_idx) OVER (PARTITION BY conv_id) AS mx FROM k) x""".stripMargin

  /** Landmark-eccentricity replay over the [[msbfsBody]] state. */
  private val eccSql: String = "WITH RECURSIVE " + prefixBody + symBody + msbfsBody +
    """, d AS (SELECT root, key, min(lvl) AS dd FROM r GROUP BY 1, 2)
      |SELECT root AS root_key, cast(max(dd) AS bigint) AS ecc,
      |       count(*) AS n_reached
      |FROM d GROUP BY 1""".stripMargin

  /** 2-hop degree-sum replay: two unrolled neighbor aggregations over
   * the symmetric edge set. */
  private val khopSql: String = prefix + symBody +
    """, dg AS (SELECT src_key AS key, count(*) AS deg FROM esw GROUP BY 1
      |), h1 AS (
      |  SELECT esw.src_key AS key, sum(dg.deg) AS h
      |  FROM esw JOIN dg ON dg.key = esw.dst_key GROUP BY 1
      |), h2 AS (
      |  SELECT esw.src_key AS key, sum(h1.h) AS h
      |  FROM esw JOIN h1 ON h1.key = esw.dst_key GROUP BY 1
      |)
      |SELECT dg.key, cast(h1.h AS bigint) AS h1, cast(h2.h AS bigint) AS h2
      |FROM dg JOIN h1 USING (key) JOIN h2 USING (key)""".stripMargin

  /** HyperANF replay: 6 unrolled register-union rounds. Same md5
   * register derivation as [[Anf]] (bucket = low 4 bits, rho =
   * 57 − bitlen of the upper 56); max is idempotent, so the unrolled
   * union replays the engine's fixed-T fixpoint exactly. */
  private val anfSql: String = {
    val round = (k: Int) =>
      s""", r$k AS MATERIALIZED (
         |  SELECT key, bucket, max(rho) AS rho FROM (
         |    SELECT esw.dst_key AS key, r.bucket, r.rho
         |    FROM esw JOIN r${k - 1} r ON r.key = esw.src_key
         |    UNION ALL SELECT key, bucket, rho FROM r${k - 1}
         |  ) u GROUP BY 1, 2
         |)""".stripMargin
    prefix + symBody +
      """, h0 AS (
        |  SELECT key, ('0x' || substr(md5(key), 1, 15))::BIGINT AS h FROM v
        |), r0 AS (
        |  SELECT key, h % 16 AS bucket,
        |         CASE WHEN h // 16 = 0 THEN 57 ELSE 57 - length(bin(h // 16)) END AS rho
        |  FROM h0
        |)""".stripMargin +
      (1 to 6).map(round).mkString +
      """
        |SELECT key, cast(sum(rho) AS bigint) AS reg_sum, count(*) AS nz
        |FROM r6 GROUP BY 1""".stripMargin
  }

  /** Metadata-extraction replay: DuckDB's json_extract_string over
   * the same after-the-first-space JSON payload. */
  private val extractSql: String = prefix +
    """, kvx AS (
      |  SELECT conv_id,
      |         cast(json_extract_string(substr(text, strpos(text, ' ') + 1), '$.k') AS bigint) AS kv
      |  FROM t
      |)
      |SELECT conv_id, count(*) AS n_vals, cast(sum(kv) AS bigint) AS k_sum,
      |       cast(min(kv) AS bigint) AS k_min, cast(max(kv) AS bigint) AS k_max
      |FROM kvx WHERE kv IS NOT NULL GROUP BY 1""".stripMargin

  /** Butterfly counts per tool pair: shared-conversation count c ≥ 2
   * and C(c,2) — plain pair aggregation, mirrors
   * Bipartite.butterflies (uncapped). */
  private val butterfliesSql: String = prefix +
    """, tu AS (
      |  SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL
      |)
      |SELECT a.tool AS tool_a, b.tool AS tool_b,
      |       cast(count(*) AS bigint) AS n_shared,
      |       cast(count(*) * (count(*) - 1) // 2 AS bigint) AS n_bf
      |FROM tu a JOIN tu b ON a.conv_id = b.conv_id AND a.tool < b.tool
      |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** Hop-bounded (12) widest-path capacities from the max-degree root
   * over the hashed [1,97] edge capacities — max(least) label-
   * correcting recursion: step h's rows cover all ≤h-hop paths
   * (frontier Bellman-Ford), final answer = max per key. Mirrors
   * EdgeBuilder.keyEdgesCapacity + algos.WidestPath exactly. */
  private val widestSql: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, esc AS MATERIALIZED (
      |  SELECT src_key, dst_key,
      |         1 + ('0x' || substr(md5(concat('cap|', least(src_key, dst_key), '|', greatest(src_key, dst_key))), 1, 10))::BIGINT % 97 AS w
      |  FROM esw
      |), r(key, cap, i) AS (
      |  SELECT rkey, cast(1e18 AS double), 0 FROM rt
      |  UNION ALL
      |  SELECT esc.dst_key, max(least(r.cap, cast(esc.w AS double))), min(r.i) + 1
      |  FROM r JOIN esc ON esc.src_key = r.key
      |  WHERE r.i < 12 GROUP BY esc.dst_key
      |)
      |SELECT key, cast(max(cap) AS bigint) AS cap FROM r GROUP BY key""".stripMargin

  /** The unique MSF over the hashed capacities, via a schedule the
   * engine does NOT run: each step every label group picks its
   * (w,a,b)-minimum crossing edge (an MSF edge for ANY vertex set, by
   * the cut property), labels merge ONE hop along just-chosen edges
   * (groups stay chosen-connected — merging along arbitrary crossing
   * edges would break completeness), and chosen edges accumulate.
   * At the plateau the chosen set spans every component: a spanning
   * subset of a forest IS the forest, so the output equals the
   * engine's Borůvka result row-for-row. `it = cap` selects the
   * fixpoint (plateau re-emits to the cap; one-hop merging converges
   * in ≪ cap steps — validated against the engine at sf0.01 by the
   * driver's correctness gate, where a too-low cap would hash-miss). */
  private val msfSql: String = {
    val cap = 100
    val chosen =
      s"""(SELECT x.it, x.g, x.h, x.a, x.b, x.w,
         |        row_number() OVER (PARTITION BY x.g ORDER BY x.w, x.a, x.b) AS rn
         | FROM (
         |   SELECT la.it,
         |          CASE f.flip WHEN 0 THEN la.b ELSE lb.b END AS g,
         |          CASE f.flip WHEN 0 THEN lb.b ELSE la.b END AS h,
         |          em.w, em.a, em.b
         |   FROM em
         |   JOIN r la ON la.typ = 'L' AND la.a = em.a
         |   JOIN r lb ON lb.typ = 'L' AND lb.a = em.b
         |   CROSS JOIN (VALUES (0), (1)) f(flip)
         |   WHERE la.b <> lb.b AND la.it < $cap
         | ) x)""".stripMargin
    "WITH RECURSIVE " + prefixBody +
      s""", em AS MATERIALIZED (
         |  SELECT a, b, 1 + ('0x' || substr(md5(concat('cap|', a, '|', b)), 1, 10))::BIGINT % 97 AS w
         |  FROM (SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b
         |        FROM e WHERE src_key <> dst_key) u
         |), r(it, typ, a, b, w) AS (
         |  SELECT 0, 'L', key, key, cast(0 AS bigint) FROM v
         |  UNION ALL
         |  SELECT * FROM (
         |    SELECT r.it + 1, 'E', r.a, r.b, r.w FROM r WHERE r.typ = 'E' AND r.it < $cap
         |    UNION ALL
         |    SELECT c.it + 1, 'E', c.a, c.b, c.w FROM $chosen c WHERE c.rn = 1
         |    UNION ALL
         |    SELECT l.it + 1, 'L', l.a, least(l.b, coalesce(mm.mn, l.b)), cast(0 AS bigint)
         |    FROM r l LEFT JOIN (
         |      SELECT c2.g, min(c2.h) AS mn FROM $chosen c2 WHERE c2.rn = 1 GROUP BY c2.g
         |    ) mm ON mm.g = l.b
         |    WHERE l.typ = 'L' AND l.it < $cap
         |  ) step
         |)
         |SELECT DISTINCT a AS a_key, b AS b_key, w
         |FROM r WHERE typ = 'E' AND it = $cap""".stripMargin
  }

  /** Jones–Plassmann replay: priorities = 60-bit md5(key) (ties by
   * key), `hi` orients each undirected edge higher→lower. Base =
   * vertices with no higher neighbor (color 0); each step colors the
   * uncolored vertices whose higher neighbors are ALL colored, via
   * the sorted-gap mex (first i where the i-th distinct used color ≠
   * i-1, else the count). The recursive working table carries the
   * full colored set forward each step; plateau re-emits to the cap.
   * Round count = longest priority-decreasing path (≈ O(log n) for
   * hash priorities) ≪ cap. */
  private val coloringSql: String = {
    val cap = 60
    "WITH RECURSIVE " + prefixBody + symBody +
      s""", pr AS MATERIALIZED (
         |  SELECT key, ('0x' || substr(md5(key), 1, 15))::BIGINT AS p FROM v
         |), hi AS MATERIALIZED (
         |  SELECT e.src_key AS u, e.dst_key AS vv
         |  FROM esw e JOIN pr a ON a.key = e.src_key JOIN pr b ON b.key = e.dst_key
         |  WHERE (a.p > b.p) OR (a.p = b.p AND e.src_key > e.dst_key)
         |), degh AS MATERIALIZED (
         |  SELECT vv, count(*) AS nh FROM hi GROUP BY vv
         |), r(it, key, colr) AS (
         |  SELECT 0, key, cast(0 AS bigint) FROM v
         |  WHERE key NOT IN (SELECT vv FROM hi)
         |  UNION ALL
         |  SELECT * FROM (
         |    SELECT r.it + 1, r.key, r.colr FROM r WHERE r.it < $cap
         |    UNION ALL
         |    SELECT q.kit + 1, q.v,
         |           coalesce(min(CASE WHEN q.colr <> q.rn - 1 THEN q.rn - 1 END),
         |                    max(q.nc))
         |    FROM (
         |      SELECT w.v, w.kit, uu.colr,
         |             row_number() OVER (PARTITION BY w.v ORDER BY uu.colr) AS rn,
         |             count(*) OVER (PARTITION BY w.v) AS nc
         |      FROM (
         |        SELECT hi.vv AS v, min(rc.it) AS kit
         |        FROM hi
         |        JOIN r rc ON rc.key = hi.u
         |        JOIN degh d ON d.vv = hi.vv
         |        LEFT JOIN r self ON self.key = hi.vv
         |        WHERE self.key IS NULL AND rc.it < $cap
         |        GROUP BY hi.vv
         |        HAVING count(*) = min(d.nh)
         |      ) w
         |      JOIN (
         |        SELECT DISTINCT hi2.vv AS v, rc2.colr
         |        FROM hi hi2 JOIN r rc2 ON rc2.key = hi2.u
         |      ) uu ON uu.v = w.v
         |    ) q GROUP BY q.v, q.kit
         |  ) step
         |)
         |SELECT key, colr FROM r WHERE it = $cap""".stripMargin
  }

  /** SCAN replay (mirrors algos.Scan at ε²·10⁴ = 3600, μ = 3):
   * per-edge common-neighbor counts over the symmetrized key graph,
   * integer σ test, ε-degree(+self) core gate, HashMin-on-keys over
   * the core-core ε-subgraph (plateau-to-cap — cluster label IS the
   * min member key, which equals the engine's min(key)-per-component
   * naming), min-cluster member attach, ≥2-distinct-neighbor-cluster
   * hub test. Cap 100 ≫ the longest σ-chain (fixpoint verified at 99
   * on sf0.01). */
  private val scanSql: String = {
    val cap = 100
    "WITH RECURSIVE " + prefixBody + symBody +
      s""", degk AS MATERIALIZED (
         |  SELECT src_key AS key, count(*) AS d FROM esw GROUP BY 1
         |), ed AS MATERIALIZED (
         |  SELECT src_key AS u, dst_key AS v FROM esw WHERE src_key < dst_key
         |), cm AS MATERIALIZED (
         |  SELECT a.src_key AS u, b.src_key AS v, count(*) AS c
         |  FROM esw a JOIN esw b ON a.dst_key = b.dst_key AND a.src_key < b.src_key
         |  JOIN ed ON ed.u = a.src_key AND ed.v = b.src_key
         |  GROUP BY 1, 2
         |), epse AS MATERIALIZED (
         |  SELECT ed.u, ed.v
         |  FROM ed LEFT JOIN cm ON cm.u = ed.u AND cm.v = ed.v
         |  JOIN degk du ON du.key = ed.u JOIN degk dv ON dv.key = ed.v
         |  WHERE 10000 * (coalesce(cm.c, 0) + 2) * (coalesce(cm.c, 0) + 2)
         |        >= 3600 * (du.d + 1) * (dv.d + 1)
         |), nd AS (
         |  SELECT key, count(*) + 1 AS ne FROM (
         |    SELECT u AS key FROM epse UNION ALL SELECT v FROM epse) x GROUP BY 1
         |), cores AS MATERIALIZED (
         |  SELECT key FROM nd WHERE ne >= 3
         |), cee AS MATERIALIZED (
         |  SELECT e1.u, e1.v FROM epse e1
         |  JOIN cores ca ON ca.key = e1.u JOIN cores cb ON cb.key = e1.v
         |  UNION ALL
         |  SELECT e1.v, e1.u FROM epse e1
         |  JOIN cores ca ON ca.key = e1.u JOIN cores cb ON cb.key = e1.v
         |), r(it, key, lbl) AS (
         |  SELECT 0, key, key FROM cores
         |  UNION ALL
         |  SELECT r.it + 1, r.key, least(r.lbl, coalesce(min(r2.lbl), r.lbl))
         |  FROM r LEFT JOIN cee ON cee.u = r.key LEFT JOIN r r2 ON r2.key = cee.v
         |  WHERE r.it < $cap
         |  GROUP BY r.it, r.key, r.lbl
         |), fin AS MATERIALIZED (
         |  SELECT key, lbl AS cluster FROM r WHERE it = $cap
         |), members AS MATERIALIZED (
         |  SELECT key, min(cluster) AS cluster FROM (
         |    SELECT e1.v AS key, f.cluster FROM epse e1 JOIN fin f ON f.key = e1.u
         |    UNION ALL
         |    SELECT e1.u, f.cluster FROM epse e1 JOIN fin f ON f.key = e1.v) x
         |  WHERE key NOT IN (SELECT key FROM cores)
         |  GROUP BY 1
         |), clustered AS MATERIALIZED (
         |  SELECT key, cluster, 'core' AS role FROM fin
         |  UNION ALL
         |  SELECT key, cluster, 'member' AS role FROM members
         |), nbrc AS (
         |  SELECT esw.src_key AS key, count(DISTINCT c.cluster) AS nc
         |  FROM esw JOIN clustered c ON c.key = esw.dst_key
         |  GROUP BY 1
         |)
         |SELECT v.key, coalesce(c.cluster, '-') AS cluster,
         |       coalesce(c.role, CASE WHEN nbrc.nc >= 2 THEN 'hub' ELSE 'outlier' END) AS role
         |FROM v LEFT JOIN clustered c ON c.key = v.key
         |LEFT JOIN nbrc ON nbrc.key = v.key""".stripMargin
  }

  /** Mirrors DegreeStats.eulerCensus: Hierholzer degree-parity per
   * component; component naming + membership from the conversation-
   * level CC trick (ccBody). */
  private val eulerSql: String = "WITH RECURSIVE " + prefixBody + symBody + ccBody +
    """, degk AS (
      |  SELECT src_key AS key, count(*) AS d FROM esw GROUP BY 1
      |)
      |SELECT rep.component,
      |       cast(count(*) AS bigint) AS n_vertices,
      |       cast(sum(d) // 2 AS bigint) AS n_edges,
      |       cast(sum(d % 2) AS bigint) AS n_odd,
      |       CASE WHEN sum(d % 2) = 0 THEN 'circuit'
      |            WHEN sum(d % 2) = 2 THEN 'trail' ELSE 'none' END AS euler
      |FROM vc JOIN degk USING (key) JOIN rep USING (lc)
      |GROUP BY 1""".stripMargin

  /** Mirrors algos.OddCycle: min-dist parity levels seeded at each
   * component's min key (bfsSql's label-correcting capped recursion,
   * seeds = rep), conflict edges counted once per undirected edge.
   * Components partition the graph, so each key is reached only by
   * its own component's seed. */
  private val bipartiteSql: String = "WITH RECURSIVE " + prefixBody + symBody + ccBody +
    """, pb(key, lvl) AS (
      |  SELECT component, 0 FROM rep
      |  UNION ALL
      |  SELECT esw.dst_key, min(pb.lvl) + 1 FROM pb JOIN esw ON esw.src_key = pb.key
      |  WHERE pb.lvl < 60 GROUP BY esw.dst_key
      |), lev AS MATERIALIZED (
      |  SELECT key, min(lvl) AS l FROM pb GROUP BY key
      |), confl AS (
      |  SELECT vc.lc, count(*) AS n_conflicts
      |  FROM esw
      |  JOIN lev a ON a.key = esw.src_key
      |  JOIN lev b ON b.key = esw.dst_key
      |  JOIN vc ON vc.key = esw.src_key
      |  WHERE esw.src_key < esw.dst_key AND (a.l + b.l) % 2 = 0
      |  GROUP BY 1
      |), nv AS (
      |  SELECT lc, count(*) AS n_vertices FROM vc GROUP BY 1
      |)
      |SELECT rep.component, cast(nv.n_vertices AS bigint) AS n_vertices,
      |       cast(coalesce(confl.n_conflicts, 0) AS bigint) AS n_conflicts,
      |       cast(CASE WHEN coalesce(confl.n_conflicts, 0) = 0 THEN 1 ELSE 0 END AS bigint) AS bipartite
      |FROM rep JOIN nv USING (lc) LEFT JOIN confl USING (lc)""".stripMargin

  /** Mirrors algos.Bridges via a DIFFERENT spanning tree (min-KEY
   * parents vs the engine's min-ID parents) — agreement doubles as
   * evidence the bridge set is tree-independent. Levels from each
   * component's min key (cap 60), parent = min neighbor key one
   * level up, linear ancestor recursion (stops at roots), coverage
   * = |Anc(u) ⊕ Anc(v)| per tree edge over non-tree edges. */
  private val bridgesSql: String = "WITH RECURSIVE " + prefixBody + symBody + ccBody +
    """, pb(key, lvl) AS (
      |  SELECT component, 0 FROM rep
      |  UNION ALL
      |  SELECT esw.dst_key, min(pb.lvl) + 1 FROM pb JOIN esw ON esw.src_key = pb.key
      |  WHERE pb.lvl < 60 GROUP BY esw.dst_key
      |), lev AS MATERIALIZED (
      |  SELECT key, min(lvl) AS l FROM pb GROUP BY key
      |), par AS MATERIALIZED (
      |  SELECT lv.key AS v, min(b.key) AS p
      |  FROM lev lv JOIN esw ON esw.src_key = lv.key
      |  JOIN lev b ON b.key = esw.dst_key AND b.l = lv.l - 1
      |  GROUP BY 1
      |), anc(v, a) AS (
      |  SELECT key, key FROM lev
      |  UNION ALL
      |  SELECT anc.v, par.p FROM anc JOIN par ON par.v = anc.a
      |), tp AS MATERIALIZED (
      |  SELECT least(v, p) AS u, greatest(v, p) AS v2 FROM par
      |), nt AS MATERIALIZED (
      |  SELECT e1.src_key AS u, e1.dst_key AS v
      |  FROM esw e1 LEFT JOIN tp ON tp.u = e1.src_key AND tp.v2 = e1.dst_key
      |  WHERE e1.src_key < e1.dst_key AND tp.u IS NULL
      |), su AS MATERIALIZED (
      |  SELECT nt.u, nt.v, anc.a AS c FROM nt JOIN anc ON anc.v = nt.u
      |), tv AS MATERIALIZED (
      |  SELECT nt.u, nt.v, anc.a AS c FROM nt JOIN anc ON anc.v = nt.v
      |), cov AS (
      |  SELECT c, count(*) AS n FROM (
      |    SELECT u, v, c FROM su UNION ALL SELECT u, v, c FROM tv
      |    ) x
      |  GROUP BY c
      |), covb AS (
      |  SELECT su.c, count(*) AS nb FROM su JOIN tv USING (u, v, c) GROUP BY 1
      |)
      |SELECT least(vc2.key, pk.key) AS u_key, greatest(vc2.key, pk.key) AS v_key
      |FROM par
      |JOIN v vc2 ON vc2.key = par.v JOIN v pk ON pk.key = par.p
      |LEFT JOIN cov ON cov.c = par.v
      |LEFT JOIN covb ON covb.c = par.v
      |WHERE coalesce(cov.n, 0) - 2 * coalesce(covb.nb, 0) = 0""".stripMargin

  /** Shared CTE chain of [[bridgesSql]] up to cov/covb (everything
   * before the final SELECT), for the 2ecc oracle to extend. */
  private val bridgesBody: String = bridgesSql.substring(
    0, bridgesSql.indexOf("\nSELECT least(vc2.key"))

  /** Mirrors algos.Bridges.blocks: bridges out, HashMin (plateau to
   * cap 80) over the remaining edges — on KEYS, so the fixpoint label
   * IS the block's min member key. Singleton blocks fall out of the
   * all-vertices base. */
  private val twoEccSql: String = bridgesBody +
    """, brg AS MATERIALIZED (
      |  SELECT least(par.v, par.p) AS u, greatest(par.v, par.p) AS v2
      |  FROM par
      |  LEFT JOIN cov ON cov.c = par.v
      |  LEFT JOIN covb ON covb.c = par.v
      |  WHERE coalesce(cov.n, 0) - 2 * coalesce(covb.nb, 0) = 0
      |), nbsw AS MATERIALIZED (
      |  SELECT e1.src_key AS u, e1.dst_key AS v
      |  FROM esw e1 LEFT JOIN brg
      |    ON brg.u = least(e1.src_key, e1.dst_key)
      |   AND brg.v2 = greatest(e1.src_key, e1.dst_key)
      |  WHERE brg.u IS NULL
      |), r2(it, key, lbl) AS (
      |  SELECT 0, key, key FROM v
      |  UNION ALL
      |  SELECT r2.it + 1, r2.key, least(r2.lbl, coalesce(min(rr.lbl), r2.lbl))
      |  FROM r2 LEFT JOIN nbsw ON nbsw.u = r2.key LEFT JOIN r2 rr ON rr.key = nbsw.v
      |  WHERE r2.it < 80 GROUP BY r2.it, r2.key, r2.lbl
      |)
      |SELECT key, lbl AS block FROM r2 WHERE it = 80""".stripMargin

  /** Mirrors algos.Percolation at p=0.7: same md5 coin per undirected
   * key pair, generic HashMin plateau-to-cap CC over survivors (sizes
   * are label-agnostic, so HashMin vs the engine's star contraction
   * need only agree on the partition). Cap 80 ≫ sampled diameter
   * (plateau verified at 60 on sf0.01); singletons fall out of the
   * all-vertices base. */
  /** Attack-census replay via the SAME structural shortcut as
   * [[ccBody]] (conversation chains stay internally connected, so
   * components = conv-level components), valid because every top-20
   * hub on this graph is a TOOL vertex (turn vertices max out at
   * degree 3: prev + next + one tool edge; the 20th tool's degree is
   * an order of magnitude above that at every SF) — deleting hubs
   * therefore only removes tool link vertices, never splits a chain.
   * Depth-safe: the conv-level recursion's diameter is tiny, unlike a
   * HashMin replay over raw turn chains. */
  private val attackSql: String =
    "WITH RECURSIVE " + prefixBody + symBody +
      """, hubs AS MATERIALIZED (
        |  SELECT src_key AS hk FROM esw GROUP BY src_key
        |  ORDER BY count(*) DESC, src_key LIMIT 20
        |), tooluse AS (
        |  SELECT DISTINCT conv_id, concat('T#', tool) AS tkey FROM k
        |  WHERE tool IS NOT NULL
        |    AND concat('T#', tool) NOT IN (SELECT hk FROM hubs)
        |), convedge AS (
        |  SELECT DISTINCT a.conv_id AS ca, b.conv_id AS cb
        |  FROM tooluse a JOIN tooluse b ON a.tkey = b.tkey
        |), r(c, l) AS (
        |  SELECT conv_id, conv_id FROM (SELECT DISTINCT conv_id FROM k) z(conv_id)
        |  UNION
        |  SELECT ce.cb, r.l FROM r JOIN convedge ce ON ce.ca = r.c WHERE r.l < ce.cb
        |), lab AS (
        |  SELECT c, min(l) AS lc FROM r GROUP BY c
        |), vc AS (
        |  SELECT DISTINCT key, lc FROM (
        |    SELECT k.vkey AS key, lab.lc FROM k JOIN lab ON lab.c = k.conv_id
        |    UNION ALL
        |    SELECT tu.tkey AS key, lab.lc FROM tooluse tu JOIN lab ON lab.c = tu.conv_id
        |  ) u JOIN v USING (key)
        |  WHERE key NOT IN (SELECT hk FROM hubs)
        |), szs AS (
        |  SELECT lc, count(*) AS sz FROM vc GROUP BY 1
        |)
        |SELECT cast(length(bin(sz)) AS bigint) AS bucket,
        |       cast(count(*) AS bigint) AS n_components,
        |       cast(min(sz) AS bigint) AS min_size,
        |       cast(max(sz) AS bigint) AS max_size
        |FROM szs GROUP BY 1""".stripMargin

  private val percolationSql: String = {
    val cap = 80
    "WITH RECURSIVE " + prefixBody + symBody +
      s""", pe AS MATERIALIZED (
         |  SELECT src_key AS u, dst_key AS v FROM esw
         |  WHERE src_key < dst_key
         |    AND 10000 * ('0x' || substr(md5(concat(src_key, '|', dst_key)), 1, 10))::BIGINT
         |        < 7000 * (1::BIGINT << 40)
         |), pesw AS MATERIALIZED (
         |  SELECT u, v FROM pe UNION ALL SELECT v, u FROM pe
         |), r(it, key, lbl) AS (
         |  SELECT 0, key, key FROM v
         |  UNION ALL
         |  SELECT r.it + 1, r.key, least(r.lbl, coalesce(min(r2.lbl), r.lbl))
         |  FROM r LEFT JOIN pesw ON pesw.u = r.key LEFT JOIN r r2 ON r2.key = pesw.v
         |  WHERE r.it < $cap GROUP BY r.it, r.key, r.lbl
         |), fin AS (
         |  SELECT key, lbl FROM r WHERE it = $cap
         |), szs AS (
         |  SELECT lbl, count(*) AS sz FROM fin GROUP BY 1
         |)
         |SELECT cast(length(bin(sz)) AS bigint) AS bucket,
         |       cast(count(*) AS bigint) AS n_components,
         |       cast(min(sz) AS bigint) AS min_size,
         |       cast(max(sz) AS bigint) AS max_size
         |FROM szs GROUP BY 1""".stripMargin
  }

  /** Mirrors algos.KCenter (k=3): giant component by (size, min key),
   * seed = min key, then twice "farthest by current min-dist, ties by
   * key" — three chained label-correcting BFS recursions (cap 60)
   * replaying the exact adaptive trajectory; assignment = min
   * (dist, center) per vertex. */
  private val kcenterSql: String = "WITH RECURSIVE " + prefixBody + symBody + ccBody +
    """, gl AS (
      |  SELECT lc FROM (
      |    SELECT lc, count(*) AS sz, min(key) AS mk FROM vc GROUP BY lc) x
      |  ORDER BY sz DESC, mk LIMIT 1
      |), gset AS MATERIALIZED (
      |  SELECT key FROM vc JOIN gl USING (lc)
      |), c1 AS MATERIALIZED (
      |  SELECT min(key) AS ck FROM gset
      |), b1(key, lvl) AS (
      |  SELECT ck, 0 FROM c1
      |  UNION ALL
      |  SELECT esw.dst_key, min(b1.lvl) + 1 FROM b1 JOIN esw ON esw.src_key = b1.key
      |  WHERE b1.lvl < 60 GROUP BY esw.dst_key
      |)
      |, d1 AS MATERIALIZED (SELECT key, min(lvl) AS d FROM b1 GROUP BY 1)
      |, c2 AS MATERIALIZED (
      |  SELECT g.key AS ck FROM gset g JOIN d1 ON d1.key = g.key
      |  ORDER BY d1.d DESC, g.key LIMIT 1
      |), b2(key, lvl) AS (
      |  SELECT ck, 0 FROM c2
      |  UNION ALL
      |  SELECT esw.dst_key, min(b2.lvl) + 1 FROM b2 JOIN esw ON esw.src_key = b2.key
      |  WHERE b2.lvl < 60 GROUP BY esw.dst_key
      |)
      |, d2 AS MATERIALIZED (SELECT key, min(lvl) AS d FROM b2 GROUP BY 1)
      |, c3 AS MATERIALIZED (
      |  SELECT g.key AS ck FROM gset g
      |  JOIN d1 ON d1.key = g.key JOIN d2 ON d2.key = g.key
      |  ORDER BY least(d1.d, d2.d) DESC, g.key LIMIT 1
      |), b3(key, lvl) AS (
      |  SELECT ck, 0 FROM c3
      |  UNION ALL
      |  SELECT esw.dst_key, min(b3.lvl) + 1 FROM b3 JOIN esw ON esw.src_key = b3.key
      |  WHERE b3.lvl < 60 GROUP BY esw.dst_key
      |)
      |, d3 AS MATERIALIZED (SELECT key, min(lvl) AS d FROM b3 GROUP BY 1)
      |, cand AS (
      |  SELECT g.key, d1.d AS dist, (SELECT ck FROM c1) AS center
      |  FROM gset g JOIN d1 ON d1.key = g.key
      |  UNION ALL
      |  SELECT g.key, d2.d, (SELECT ck FROM c2)
      |  FROM gset g JOIN d2 ON d2.key = g.key
      |  UNION ALL
      |  SELECT g.key, d3.d, (SELECT ck FROM c3)
      |  FROM gset g JOIN d3 ON d3.key = g.key
      |), pick AS (
      |  SELECT key, dist, center,
      |         row_number() OVER (PARTITION BY key ORDER BY dist, center) AS rn
      |  FROM cand
      |)
      |SELECT center, cast(count(*) AS bigint) AS n_assigned,
      |       cast(max(dist) AS bigint) AS radius
      |FROM pick WHERE rn = 1 GROUP BY 1""".stripMargin

  /** Digit-run scrub replay: RE2's `[0-9]+` ≡ Java's on this corpus
   * (plain character class — the portability contract of
   * pipeline.Redact). */
  private val redactSql: String = prefix +
    """
      |SELECT conv_id, turn_idx,
      |       cast(len(regexp_extract_all(text, '[0-9]+')) AS bigint) AS n_matches,
      |       regexp_replace(text, '[0-9]+', '<N>', 'g') AS red_text
      |FROM t""".stripMargin

  /** Multi-root [[bcSql]]: the forward recursion carries (root, key,
   * lvl, σ) with all 4 searches advancing in lockstep by GLOBAL level
   * (exactly the engine's batched schedule); the backward sweep steps
   * global levels deepest-first — a shallower root's leaves enter at
   * their own level with no children, which the coalesce(…, 0)
   * handles as Brandes' base case. */
  private val bcMultiCtes: String = "WITH RECURSIVE " + prefixBody + symBody +
    """, rt4 AS MATERIALIZED (
      |  SELECT src_key AS rkey FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 4
      |), fw(root, key, lvl, sigma) AS (
      |  SELECT rkey, rkey, 0, cast(1.0 AS double) FROM rt4
      |  UNION ALL
      |  SELECT nxt.root, nxt.key, nxt.lvl, nxt.sigma FROM (
      |    SELECT r0.root, r0.key, r0.lvl, r0.sigma FROM fw r0
      |    UNION ALL
      |    SELECT f.root, esw.dst_key, min(f.lvl) + 1, sum(f.sigma)
      |    FROM fw f JOIN esw ON esw.src_key = f.key
      |    WHERE f.lvl = (SELECT max(m.lvl) FROM fw m)
      |      AND NOT EXISTS (SELECT 1 FROM fw x WHERE x.root = f.root AND x.key = esw.dst_key)
      |    GROUP BY f.root, esw.dst_key
      |  ) nxt
      |  WHERE EXISTS (
      |    SELECT 1 FROM fw f JOIN esw ON esw.src_key = f.key
      |    WHERE f.lvl = (SELECT max(m.lvl) FROM fw m)
      |      AND NOT EXISTS (SELECT 1 FROM fw x WHERE x.root = f.root AND x.key = esw.dst_key))
      |), sg AS MATERIALIZED (
      |  SELECT DISTINCT root, key, lvl, sigma FROM fw
      |), dag AS MATERIALIZED (
      |  SELECT a.root, esw.src_key, esw.dst_key, a.lvl AS slvl
      |  FROM esw JOIN sg a ON a.key = esw.src_key
      |           JOIN sg b ON b.root = a.root AND b.key = esw.dst_key
      |  WHERE b.lvl = a.lvl + 1
      |), dp(root, key, dep, lvl) AS (
      |  SELECT root, key, 1.0/sigma, lvl FROM sg WHERE lvl = (SELECT max(s2.lvl) FROM sg s2)
      |  UNION ALL
      |  SELECT s.root, s.key, 1.0/s.sigma + coalesce(ch.su, 0), s.lvl
      |  FROM sg s
      |  LEFT JOIN (
      |    SELECT d.root, dag.src_key AS key, sum(d.dep) AS su
      |    FROM dp d JOIN dag ON dag.root = d.root AND dag.dst_key = d.key AND dag.slvl = d.lvl - 1
      |    GROUP BY 1, 2
      |  ) ch ON ch.root = s.root AND ch.key = s.key
      |  WHERE s.lvl = (SELECT min(d2.lvl) FROM dp d2) - 1 AND (SELECT min(d3.lvl) FROM dp d3) > 0
      |)""".stripMargin

  private val bcMultiSql: String = bcMultiCtes +
    """
      |SELECT sg.root AS root_key, sg.key AS key, cast(sg.sigma AS bigint) AS sigma,
      |       cast(round((dp.dep * sg.sigma - 1.0)*1000) AS bigint) AS bc_e3
      |FROM sg JOIN dp ON dp.root = sg.root AND dp.key = sg.key""".stripMargin

  /** Brandes-Pich sampled-BC estimator replay: per-(root, vertex)
   * dependencies rounded to e3 FIRST (integer thereafter — no float
   * sum crosses engines), then est = Σ·|V| // K. */
  private val bcApproxSql: String = bcMultiCtes +
    """
      |, per AS (
      |  SELECT sg.key AS key,
      |         cast(round((dp.dep * sg.sigma - 1.0)*1000) AS bigint) AS bc_e3
      |  FROM sg JOIN dp ON dp.root = sg.root AND dp.key = sg.key
      |)
      |SELECT key, cast(count(*) AS bigint) AS n_samples,
      |       cast(sum(bc_e3) AS bigint) AS bc_sum_e3,
      |       cast(sum(bc_e3) * (SELECT count(*) FROM v) // 4 AS bigint) AS est_e3
      |FROM per GROUP BY key""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_pagerank_salted" -> pagerankSql,
    "q_pagerank_conv" -> pagerankConvSql,
    "q_bfs" -> bfsSql,
    "q_msbfs" -> msbfsSql,
    "q_bidir" -> ("WITH RECURSIVE " + prefixBody + symBody +
      """, rt2 AS MATERIALIZED (
        |  SELECT src_key AS rkey,
        |         row_number() OVER (ORDER BY count(*) DESC, src_key) AS rn
        |  FROM esw GROUP BY src_key ORDER BY count(*) DESC, src_key LIMIT 2
        |), r(key, lvl) AS (
        |  SELECT rkey, 0 FROM rt2 WHERE rn = 1
        |  UNION ALL
        |  SELECT esw.dst_key, min(r.lvl) + 1 FROM r JOIN esw ON esw.src_key = r.key
        |  WHERE r.lvl < 60 GROUP BY 1
        |)
        |SELECT (SELECT rkey FROM rt2 WHERE rn = 1) AS s_key,
        |       (SELECT rkey FROM rt2 WHERE rn = 2) AS t_key,
        |       cast(coalesce((SELECT min(r.lvl) FROM r JOIN rt2
        |                      ON rt2.rkey = r.key AND rt2.rn = 2), -1) AS bigint) AS dist""".stripMargin),
    "q_rmat" ->
      """WITH g AS (SELECT range AS i FROM range(20000)),
        |lv AS (SELECT g.i, r.l FROM g, range(12) r(l)),
        |h AS (
        |  SELECT i, l,
        |         ('0x' || substr(md5('rmat|' || i || '|' || l), 1, 4))::BIGINT AS h
        |  FROM lv
        |)
        |SELECT i,
        |       cast(sum(CASE WHEN h >= 49152 THEN 1 << (11 - l) ELSE 0 END) AS bigint) AS src,
        |       cast(sum(CASE WHEN (h >= 36864 AND h < 49152) OR h >= 61440
        |                     THEN 1 << (11 - l) ELSE 0 END) AS bigint) AS dst
        |FROM h GROUP BY i""".stripMargin,
    "q_rmat_degs" ->
      """WITH g AS (SELECT range AS i FROM range(20000)),
        |lv AS (SELECT g.i, r.l FROM g, range(12) r(l)),
        |h AS (
        |  SELECT i, l,
        |         ('0x' || substr(md5('rmat|' || i || '|' || l), 1, 4))::BIGINT AS h
        |  FROM lv
        |), e AS (
        |  SELECT i,
        |         sum(CASE WHEN h >= 49152 THEN 1 << (11 - l) ELSE 0 END) AS src,
        |         sum(CASE WHEN (h >= 36864 AND h < 49152) OR h >= 61440
        |                   THEN 1 << (11 - l) ELSE 0 END) AS dst
        |  FROM h GROUP BY i
        |), d AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
        |od AS (SELECT src, count(*) AS dg FROM d GROUP BY 1)
        |SELECT cast(length(bin(dg)) AS bigint) AS bucket,
        |       cast(count(*) AS bigint) AS n_vertices,
        |       cast(min(dg) AS bigint) AS min_degree,
        |       cast(max(dg) AS bigint) AS max_degree
        |FROM od GROUP BY 1""".stripMargin,
    "q_topic_tools" -> (prefix +
      """, tok AS (
        |  SELECT tool, w FROM (
        |    SELECT tool, unnest(string_split(lower(text), ' ')) AS w FROM t) x
        |  WHERE w <> ''
        |), nn AS (SELECT count(*) AS n FROM tok),
        |gw AS (SELECT w, count(*) AS n_w FROM tok GROUP BY 1),
        |tt AS (
        |  SELECT tool, w, count(*) AS n_tw FROM tok
        |  WHERE tool IS NOT NULL GROUP BY 1, 2
        |), nt AS (SELECT tool, sum(n_tw) AS n_t FROM tt GROUP BY 1),
        |sc AS (
        |  SELECT tt.tool, tt.w, tt.n_tw,
        |         (cast(tt.n_tw AS hugeint) * (SELECT n FROM nn) * 10000)
        |           // (cast(nt.n_t AS hugeint) * gw.n_w) AS lift_e4
        |  FROM tt JOIN nt ON nt.tool = tt.tool JOIN gw ON gw.w = tt.w
        |  WHERE tt.n_tw >= 3
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY tool
        |            ORDER BY lift_e4 DESC, n_tw DESC, w) AS rank
        |  FROM sc
        |)
        |SELECT tool, w AS term, cast(n_tw AS bigint) AS n_tw,
        |       cast(lift_e4 AS bigint) AS lift_e4, cast(rank AS bigint) AS rank
        |FROM rk WHERE rank <= 3""".stripMargin),
    "q_hashfeat" -> (prefix +
      """, tok AS (
        |  SELECT conv_id, w FROM (
        |    SELECT conv_id, unnest(string_split(lower(text), ' ')) AS w FROM t) x
        |  WHERE w <> ''
        |)
        |SELECT conv_id,
        |       ('0x' || substr(md5(w), 1, 4))::BIGINT % 16 AS dim,
        |       cast(count(*) AS bigint) AS n_toks,
        |       cast(sum(CASE WHEN ('0x' || substr(md5(w), 5, 1))::BIGINT % 2 = 0
        |                     THEN 1 ELSE -1 END) AS bigint) AS feat
        |FROM tok GROUP BY 1, 2""".stripMargin),
    "q_dist_oracle" -> ("WITH RECURSIVE " + prefixBody + symBody + ccBody +
      """, gl AS (
        |  SELECT lc FROM (
        |    SELECT lc, count(*) AS sz, min(key) AS mk FROM vc GROUP BY lc) x
        |  ORDER BY sz DESC, mk LIMIT 1
        |), gset AS MATERIALIZED (
        |  SELECT key FROM vc JOIN gl USING (lc)
        |), dgr AS (
        |  SELECT src_key AS key, count(*) AS dg FROM esw GROUP BY 1
        |), rt6 AS MATERIALIZED (
        |  SELECT d.key AS hkey,
        |         row_number() OVER (ORDER BY d.dg DESC, d.key) AS rn
        |  FROM dgr d JOIN gset g ON g.key = d.key
        |  ORDER BY d.dg DESC, d.key LIMIT 6
        |), r6(root, key, lvl) AS (
        |  SELECT hkey, hkey, 0 FROM rt6 WHERE rn <= 4
        |  UNION ALL
        |  SELECT r6.root, esw.dst_key, min(r6.lvl) + 1
        |  FROM r6 JOIN esw ON esw.src_key = r6.key
        |  WHERE r6.lvl < 60 GROUP BY r6.root, esw.dst_key
        |), d AS (
        |  SELECT root, key, min(lvl) AS dd FROM r6 GROUP BY 1, 2
        |), pr AS (
        |  SELECT a.hkey AS ak, b.hkey AS bk FROM rt6 a JOIN rt6 b ON a.rn < b.rn
        |), est AS (
        |  SELECT pr.ak, pr.bk, min(da.dd + db.dd) AS est
        |  FROM pr
        |  JOIN d da ON da.key = pr.ak
        |  JOIN d db ON db.key = pr.bk AND db.root = da.root
        |  GROUP BY 1, 2
        |)
        |SELECT least(ak, bk) AS a_key, greatest(ak, bk) AS b_key,
        |       cast(est AS bigint) AS est
        |FROM est""".stripMargin),
    "q_seq_mining" -> (prefix +
      """, pos AS (
        |  SELECT conv_id, tool, min(turn_idx) AS minp, max(turn_idx) AS maxp
        |  FROM t WHERE tool IS NOT NULL GROUP BY 1, 2
        |), sup AS (
        |  SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS n_convs
        |  FROM pos a JOIN pos b ON b.conv_id = a.conv_id
        |   AND b.tool <> a.tool AND a.minp < b.maxp
        |  GROUP BY 1, 2
        |)
        |SELECT tool_a, tool_b, cast(n_convs AS bigint) AS n_convs
        |FROM sup WHERE n_convs >= 2
        |ORDER BY n_convs DESC, tool_a, tool_b LIMIT 50""".stripMargin),
    "q_stale_tools" -> (prefix +
      """, uses AS (
        |  SELECT tool, epoch_us(ts) // 86400000000 AS day
        |  FROM t WHERE tool IS NOT NULL
        |), mx AS (SELECT max(day) AS m FROM uses)
        |SELECT tool, cast(max(day) AS bigint) AS last_day,
        |       cast((SELECT m FROM mx) - max(day) AS bigint) AS age_days,
        |       cast(count(*) AS bigint) AS n_uses,
        |       cast(CASE WHEN (SELECT m FROM mx) - max(day) > 7
        |                 THEN 1 ELSE 0 END AS bigint) AS stale
        |FROM uses GROUP BY 1""".stripMargin),
    "q_markov2" -> (prefix +
      """, ts3 AS (
        |  SELECT conv_id, turn_idx, tool,
        |         lead(tool, 1) OVER win AS b, lead(tool, 2) OVER win AS c
        |  FROM t WHERE tool IS NOT NULL
        |  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)
        |), cnt AS (
        |  SELECT tool AS tool_a, b AS tool_b, c AS tool_c, count(*) AS n
        |  FROM ts3 WHERE c IS NOT NULL GROUP BY 1, 2, 3
        |), marg AS (
        |  SELECT tool_a, tool_b, sum(n) AS n_ab FROM cnt GROUP BY 1, 2
        |)
        |SELECT c.tool_a, c.tool_b, c.tool_c, cast(c.n AS bigint) AS n,
        |       cast(c.n * 10000 // m.n_ab AS bigint) AS share_e4
        |FROM cnt c JOIN marg m ON m.tool_a = c.tool_a AND m.tool_b = c.tool_b""".stripMargin),
    "q_burstiness" -> (prefix +
      """, dx AS (
        |  SELECT tool, epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM t WHERE tool IS NOT NULL GROUP BY 1, 2
        |), ag AS (
        |  SELECT tool, sum(x) AS n_calls, count(*) AS n_days_active,
        |         max(day) - min(day) + 1 AS span_days, sum(x*x) AS sx2
        |  FROM dx GROUP BY 1
        |)
        |SELECT tool, cast(n_calls AS bigint) AS n_calls,
        |       cast(n_days_active AS bigint) AS n_days_active,
        |       cast(span_days AS bigint) AS span_days,
        |       cast(10000 * (span_days * sx2 - n_calls * n_calls)
        |            // (span_days * n_calls) AS bigint) AS fano_e4
        |FROM ag""".stripMargin),
    "q_temporal_motifs" -> (prefix +
      """, tm3 AS (
        |  SELECT tool AS t1, lead(tool, 1) OVER win AS t2, lead(tool, 2) OVER win AS t3,
        |         lead(epoch_us(ts), 2) OVER win - epoch_us(ts) AS span
        |  FROM t WHERE tool IS NOT NULL
        |  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)
        |)
        |SELECT CASE WHEN t1 = t2 AND t2 = t3 THEN 'aaa'
        |            WHEN t1 = t3 AND t1 <> t2 THEN 'aba'
        |            WHEN t1 = t2 THEN 'aab'
        |            WHEN t2 = t3 THEN 'abb'
        |            ELSE 'abc' END AS pattern,
        |       count(*) AS n_motifs
        |FROM tm3 WHERE t3 IS NOT NULL AND span <= 172800000000
        |GROUP BY 1""".stripMargin),
    "q_gap_hist" -> (prefix +
      """, g AS (
        |  SELECT epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        |  FROM t
        |)
        |SELECT cast(CASE WHEN gap = 0 THEN 0 ELSE length(bin(gap)) END AS bigint) AS bucket,
        |       cast(count(*) AS bigint) AS n_gaps,
        |       cast(min(gap) AS bigint) AS min_gap_us,
        |       cast(max(gap) AS bigint) AS max_gap_us
        |FROM g WHERE gap IS NOT NULL GROUP BY 1""".stripMargin),
    "q_dist_census" -> ("WITH RECURSIVE " + prefixBody + symBody + msbfsBody +
      """, d AS (
        |  SELECT root, key, min(lvl) AS dd FROM r GROUP BY 1, 2
        |)
        |SELECT cast(dd AS bigint) AS dist, cast(count(*) AS bigint) AS n_pairs
        |FROM d GROUP BY 1""".stripMargin),
    "q_anomaly_days" -> (prefix +
      """, dd AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_turns
        |  FROM t GROUP BY 1
        |), st AS (
        |  SELECT count(*) AS n, sum(n_turns) AS s,
        |         sum(n_turns * n_turns) AS ssq
        |  FROM dd
        |)
        |SELECT cast(day AS bigint) AS day, cast(n_turns AS bigint) AS n_turns,
        |       cast(CASE WHEN (cast(n AS hugeint) * n_turns - s)
        |                    * (cast(n AS hugeint) * n_turns - s)
        |                  > 4 * (cast(n AS hugeint) * ssq - cast(s AS hugeint) * s)
        |                  AND cast(n AS hugeint) * n_turns > s
        |                 THEN 1 ELSE 0 END AS bigint) AS is_spike,
        |       cast(CASE WHEN (cast(n AS hugeint) * n_turns - s)
        |                    * (cast(n AS hugeint) * n_turns - s)
        |                  > 4 * (cast(n AS hugeint) * ssq - cast(s AS hugeint) * s)
        |                  AND cast(n AS hugeint) * n_turns < s
        |                 THEN 1 ELSE 0 END AS bigint) AS is_drop
        |FROM dd, st""".stripMargin),
    "q_drift" -> (prefix +
      """, cn AS (
        |  SELECT conv_id, count(*) AS n FROM t GROUP BY 1
        |), tk AS (
        |  SELECT DISTINCT conv_id, fh, tok FROM (
        |    SELECT t.conv_id, (t.turn_idx * 2 < cn.n) AS fh,
        |           unnest(string_split(lower(t.text), ' ')) AS tok
        |    FROM t JOIN cn ON cn.conv_id = t.conv_id) x
        |  WHERE tok <> ''
        |), ag AS (
        |  SELECT conv_id, tok, count(*) AS halves FROM tk GROUP BY 1, 2
        |)
        |SELECT conv_id,
        |       cast(sum(CASE WHEN halves = 2 THEN 1 ELSE 0 END) AS bigint) AS n_inter,
        |       cast(count(*) AS bigint) AS n_union,
        |       cast(sum(CASE WHEN halves = 2 THEN 1 ELSE 0 END) * 10000 // count(*) AS bigint) AS jaccard_e4
        |FROM ag GROUP BY 1""".stripMargin),
    "q_closeness" -> closenessSql,
    "q_closeness_all" -> closenessAllSql,
    "q_walks" -> walksSql,
    "q_walks_w" -> walksWSql,
    "q_walks_n2v" -> walksN2vSql,
    "q_sgpairs" -> sgpairsSql,
    "q_deg_hist" -> degHistSql,
    "q_richclub" -> ("WITH " + prefixBody + symBody +
      """
        |, od AS (SELECT src_key, count(*) AS d FROM esw GROUP BY 1)
        |, em AS (
        |  SELECT least(a.d, b.d) AS mm, count(*) AS cnt
        |  FROM esw e JOIN od a ON a.src_key = e.src_key
        |             JOIN od b ON b.src_key = e.dst_key
        |  GROUP BY 1
        |), ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k)
        |SELECT cast(k AS bigint) AS k,
        |       cast(n_k AS bigint) AS n_k,
        |       cast(e_dir // 2 AS bigint) AS e_k,
        |       cast(CASE WHEN n_k >= 2 THEN (10000 * e_dir) // (n_k * (n_k - 1))
        |                 ELSE 0 END AS bigint) AS phi_e4
        |FROM (
        |  SELECT k,
        |         (SELECT coalesce(sum(vn), 0) FROM
        |            (SELECT d, count(*) AS vn FROM od GROUP BY 1) dc WHERE dc.d > ks.k) AS n_k,
        |         (SELECT coalesce(sum(cnt), 0) FROM em WHERE em.mm > ks.k) AS e_dir
        |  FROM ks) x""".stripMargin),
    "q_assort" -> ("WITH " + prefixBody + symBody +
      """
        |, od AS (SELECT src_key, count(*) AS d FROM esw GROUP BY 1)
        |SELECT cast(count(*) AS bigint) AS m,
        |       cast(sum(a.d * b.d) AS bigint) AS sxy,
        |       cast(sum(a.d) AS bigint) AS sx,
        |       cast(sum(a.d * a.d) AS bigint) AS sx2
        |FROM esw e JOIN od a ON a.src_key = e.src_key
        |           JOIN od b ON b.src_key = e.dst_key""".stripMargin),
    "q_sage" -> ("WITH " + prefixBody + symBody +
      """
        |, dg AS (SELECT src_key AS key, count(*) AS d FROM esw GROUP BY 1)
        |, ft AS (
        |  SELECT key, 0 AS dim, d AS f FROM dg
        |  UNION ALL SELECT key, 1, CASE WHEN key LIKE 'T#%' THEN 1 ELSE 0 END FROM dg
        |  UNION ALL SELECT key, 2, length(bin(d)) FROM dg
        |), ns AS (
        |  SELECT esw.src_key AS key, ft.dim, sum(ft.f) AS s
        |  FROM esw JOIN ft ON ft.key = esw.dst_key GROUP BY 1, 2
        |)
        |SELECT ft.key AS key, cast(ft.dim AS int) AS dim,
        |       cast(ft.f AS bigint) AS own,
        |       cast(coalesce(ns.s, 0) // dg.d AS bigint) AS nbr_mean
        |FROM ft JOIN dg ON dg.key = ft.key
        |        LEFT JOIN ns ON ns.key = ft.key AND ns.dim = ft.dim""".stripMargin),
    "q_friendship" -> ("WITH " + prefixBody + symBody +
      """
        |, dg AS (SELECT src_key, count(*) AS d FROM esw GROUP BY 1)
        |, s AS (SELECT count(*) AS n, sum(d) AS sd, sum(d*d) AS sd2 FROM dg)
        |SELECT cast(n AS bigint) AS n, cast(sd AS bigint) AS sd,
        |       cast(sd2 AS bigint) AS sd2,
        |       cast(sd * 10000 // n AS bigint) AS mean_deg_e4,
        |       cast(sd2 * 10000 // sd AS bigint) AS mean_nbr_deg_e4
        |FROM s""".stripMargin),
    "q_linkpred" -> linkpredSql,
    "q_edge_jaccard" -> edgeJaccardSql,
    "q_backbone" -> backboneSql,
    "q_cc_sizes" -> ccSizesSql,
    "q_tool_lift" -> toolLiftSql,
    "q_itemsets" -> itemsetsSql,
    "q_diameter" -> diameterSql,
    "q_mis" -> misSql,
    "q_sssp" -> ssspSql,
    "q_sssp_delta" -> ssspSql,
    "q_bc" -> bcSql,
    "q_ebc" -> ebcSql,
    "q_cc_fast" -> ccSql,
    "q_err_tools" -> (prefix +
      """
        |SELECT e.conv_id, e.turn_idx AS err_turn, p.turn_idx AS tool_turn, p.tool
        |FROM t e JOIN t p ON p.conv_id = e.conv_id
        |  AND epoch_us(p.ts) >= epoch_us(e.ts)
        |  AND epoch_us(p.ts) < epoch_us(e.ts) + 600000000
        |WHERE e.text LIKE 'error%' AND p.tool IS NOT NULL""".stripMargin),
    // as-of join: latest strictly-earlier user turn per tool turn,
    // then join back for its text ((conv, turn) rows are unique)
    "q_sft_pairs" -> (prefix +
      """, ast AS (
        |  SELECT conv_id, turn_idx, text AS response FROM t WHERE role = 'assistant'
        |), usr AS (
        |  SELECT conv_id, turn_idx AS u_idx, text FROM t WHERE role = 'user'
        |), pick AS (
        |  SELECT a.conv_id, a.turn_idx, max(u.u_idx) AS p_idx
        |  FROM ast a JOIN usr u ON u.conv_id = a.conv_id AND u.u_idx < a.turn_idx
        |  GROUP BY 1, 2
        |)
        |SELECT p.conv_id, cast(p.turn_idx AS bigint) AS turn_idx,
        |       cast(p.p_idx AS bigint) AS prompt_turn_idx,
        |       u.text AS prompt, a.response
        |FROM pick p
        |JOIN usr u ON u.conv_id = p.conv_id AND u.u_idx = p.p_idx
        |JOIN ast a ON a.conv_id = p.conv_id AND a.turn_idx = p.turn_idx""".stripMargin),
    "q_echo" -> (prefix +
      """, ast AS (
        |  SELECT conv_id, turn_idx, text AS response FROM t WHERE role = 'assistant'
        |), usr AS (
        |  SELECT conv_id, turn_idx AS u_idx, text FROM t WHERE role = 'user'
        |), pick AS (
        |  SELECT a.conv_id, a.turn_idx, a.response, max(u.u_idx) AS p_idx
        |  FROM ast a JOIN usr u ON u.conv_id = a.conv_id AND u.u_idx < a.turn_idx
        |  GROUP BY 1, 2, 3
        |), pairs AS (
        |  SELECT p.conv_id, p.turn_idx, u.text AS prompt, p.response
        |  FROM pick p JOIN usr u ON u.conv_id = p.conv_id AND u.u_idx = p.p_idx
        |), rt AS (
        |  SELECT DISTINCT conv_id, turn_idx, tok FROM (
        |    SELECT conv_id, turn_idx,
        |           unnest(string_split(lower(response), ' ')) AS tok FROM pairs) x
        |  WHERE tok <> ''
        |), pt AS (
        |  SELECT DISTINCT conv_id, turn_idx, tok FROM (
        |    SELECT conv_id, turn_idx,
        |           unnest(string_split(lower(prompt), ' ')) AS tok FROM pairs) x
        |  WHERE tok <> ''
        |), nr AS (
        |  SELECT conv_id, turn_idx, count(*) AS n FROM rt GROUP BY 1, 2
        |), ne AS (
        |  SELECT r.conv_id, r.turn_idx, count(*) AS n
        |  FROM rt r JOIN pt p ON p.conv_id = r.conv_id
        |   AND p.turn_idx = r.turn_idx AND p.tok = r.tok
        |  GROUP BY 1, 2
        |)
        |SELECT pr.conv_id, cast(pr.turn_idx AS bigint) AS turn_idx,
        |       cast(coalesce(nr.n, 0) AS bigint) AS n_resp_toks,
        |       cast(coalesce(ne.n, 0) AS bigint) AS n_echo,
        |       cast(CASE WHEN coalesce(nr.n, 0) = 0 THEN 0
        |                 ELSE coalesce(ne.n, 0) * 10000 // nr.n END AS bigint) AS echo_e4
        |FROM pairs pr
        |LEFT JOIN nr ON nr.conv_id = pr.conv_id AND nr.turn_idx = pr.turn_idx
        |LEFT JOIN ne ON ne.conv_id = pr.conv_id AND ne.turn_idx = pr.turn_idx""".stripMargin),
    "q_role_trans" -> (prefix +
      """, rp AS (
        |  SELECT role AS role_a,
        |         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS role_b
        |  FROM t
        |), cnt AS (
        |  SELECT role_a, role_b, count(*) AS n FROM rp
        |  WHERE role_b IS NOT NULL GROUP BY 1, 2
        |), marg AS (
        |  SELECT role_a, sum(n) AS n_out FROM cnt GROUP BY 1
        |)
        |SELECT c.role_a, c.role_b, cast(c.n AS bigint) AS n,
        |       cast(c.n * 10000 // m.n_out AS bigint) AS share_e4
        |FROM cnt c JOIN marg m ON m.role_a = c.role_a""".stripMargin),
    "q_asof" -> (prefix +
      """
        |SELECT x.conv_id, x.turn_idx, x.user_turn_idx, q.text AS user_text
        |FROM (
        |  SELECT p.conv_id, p.turn_idx, max(u.turn_idx) AS user_turn_idx
        |  FROM t p JOIN t u ON u.conv_id = p.conv_id AND u.role = 'user'
        |                   AND u.turn_idx < p.turn_idx
        |  WHERE p.role = 'tool'
        |  GROUP BY 1, 2) x
        |JOIN t q ON q.conv_id = x.conv_id AND q.turn_idx = x.user_turn_idx""".stripMargin),
    // range join: tool calls inside [error ts, +10 min) across ALL
    // conversations — the plain inequality-join spelling the bucketed
    // engine plan must reproduce exactly
    "q_range" -> (prefix +
      """
        |, errw AS (
        |  SELECT conv_id, turn_idx, epoch_us(ts) AS t0 FROM t WHERE text LIKE 'error%'
        |), pts AS (
        |  SELECT epoch_us(ts) AS tp FROM t WHERE tool IS NOT NULL
        |)
        |SELECT e.conv_id, e.turn_idx, cast(count(*) AS bigint) AS n_tool_calls
        |FROM errw e JOIN pts p ON p.tp >= e.t0 AND p.tp < e.t0 + 600000000
        |GROUP BY 1, 2""".stripMargin),
    "q_transcripts" -> (prefix + "\nSELECT conv_id, turn_idx, role, text, tool FROM t"),
    "q_edges" -> (prefix + "\nSELECT src_key, dst_key, kind FROM e"),
    // replay of the binary edge-list round-trip: the fixture is a pure
    // function of events (capped, ordered), the loader dedupes (src,
    // dst) and drops self-loops (finishBuild), degrees count both legs
    "q_gemini_load" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id AS src, event_id % 997 AS dst
        |  FROM (SELECT * FROM events ORDER BY event_id LIMIT 100000)
        |  WHERE user_id <> event_id % 997
        |), od AS (SELECT src AS id, count(*) AS c FROM e GROUP BY 1
        |), idg AS (SELECT dst AS id, count(*) AS c FROM e GROUP BY 1)
        |SELECT coalesce(od.id, idg.id) AS id,
        |       cast(coalesce(od.c, 0) AS bigint) AS out_degree,
        |       cast(coalesce(idg.c, 0) AS bigint) AS in_degree
        |FROM od FULL JOIN idg ON od.id = idg.id""".stripMargin,
    "q_stream_edges" -> (prefix + "\nSELECT src_key, dst_key, kind FROM e"),
    // Spark's window() and DuckDB's time_bucket both align tumbling
    // hour windows on hour boundaries; epoch seconds make the compare
    // timezone/format-exact
    "q_tool_windows" -> (prefix +
      "\nSELECT cast(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS bigint) AS w_start," +
      " tool, count(*) AS n FROM t WHERE tool IS NOT NULL GROUP BY 1, 2"),
    // a 1h/30min hopping window holds ts iff its start is one of the
    // two 30-min buckets at or before ts — exactly len/slide = 2 rows
    "q_tool_sliding" -> (prefix +
      """
        |, tw AS (
        |  SELECT tool, cast(epoch(time_bucket(INTERVAL 30 MINUTE, ts)) AS bigint) AS tb
        |  FROM t WHERE tool IS NOT NULL
        |)
        |SELECT w_start, tool, count(*) AS n FROM (
        |  SELECT tool, unnest([tb - 1800, tb]) AS w_start FROM tw) u
        |GROUP BY 1, 2""".stripMargin),
    // gaps-and-islands = session_window: a new session starts when the
    // gap to the previous turn is >= 30 min (Spark merges sessions
    // only while next.ts < prev.ts + gap — strict inequality on both
    // sides agrees); epoch_us ↔ unix_micros is integer-exact
    "q_conv_sessions" -> (prefix +
      """
        |, sb AS (
        |  SELECT conv_id, ts, turn_idx,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
        |), sg AS (
        |  SELECT conv_id, ts,
        |         sum(brk) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM sb
        |)
        |SELECT conv_id, epoch_us(min(ts)) AS sess_start, count(*) AS n_turns
        |FROM sg GROUP BY conv_id, sid""".stripMargin),
    "q_degrees" -> (prefix +
      """, od AS (SELECT src_key AS key, count(*) AS o FROM e GROUP BY 1)
        |, id2 AS (SELECT dst_key AS key, count(*) AS i FROM e GROUP BY 1)
        |SELECT v.key AS key, coalesce(od.o, 0) AS out_degree, coalesce(id2.i, 0) AS in_degree
        |FROM v LEFT JOIN od ON od.key = v.key LEFT JOIN id2 ON id2.key = v.key""".stripMargin),
    "q_pagerank" -> pagerankSql,
    "q_pr_deg_corr" -> prDegCorrSql,
    "q_hits" -> hitsSql,
    "q_salsa" -> salsaSql,
    "q_cascade" -> cascadeSql,
    "q_ppr_push" -> pprPushSql,
    "q_pagerank_inc" -> pagerankIncSql,
    "q_maxcut" -> maxcutSql,
    "q_domset" -> ("WITH " + prefixBody + symBody +
      """
        |, dgk AS (
        |  SELECT src_key AS key, lpad(cast(count(*) AS varchar), 12, '0') || '|' || src_key AS pi
        |  FROM esw GROUP BY src_key
        |), nb AS (
        |  SELECT esw.src_key AS key, max(d.pi) AS mpi
        |  FROM esw JOIN dgk d ON d.key = esw.dst_key GROUP BY 1
        |)
        |SELECT dgk.key AS key,
        |       substr(greatest(dgk.pi, coalesce(nb.mpi, dgk.pi)), 14) AS dom_key
        |FROM dgk LEFT JOIN nb ON nb.key = dgk.key""".stripMargin),
    "q_knn_curve" -> ("WITH " + prefixBody + symBody +
      """
        |, od AS (SELECT src_key, count(*) AS d FROM esw GROUP BY 1)
        |SELECT a.d AS k, cast(count(*) AS bigint) AS n_edges,
        |       cast(sum(b.d) AS bigint) AS s_nbr,
        |       cast(sum(b.d) * 10000 // count(*) AS bigint) AS knn_e4
        |FROM esw e JOIN od a ON a.src_key = e.src_key
        |           JOIN od b ON b.src_key = e.dst_key
        |GROUP BY 1""".stripMargin),
    "q_kcore" -> kcoreSql,
    "q_coreness" -> corenessSql,
    "q_truss" -> trussSql,
    "q_trussness" -> trussnessSql,
    "q_matching" -> matchingSql,
    "q_matching_w" -> matchingWSql,
    "q_coarsen" -> coarsenSql,
    "q_lp_comm" -> lpCommSql,
    "q_wl" -> wlSql,
    "q_treach" -> treachSql,
    "q_funnel" -> funnelSql,
    "q_triads" -> triadsSql,
    "q_dyads" -> dyadsSql,
    "q_cover" -> coverSql,
    "q_gini" -> giniSql,
    "q_segments" -> segmentsSql,
    "q_textrank" -> textrankSql,
    "q_graph_growth" -> (prefix +
      """, kt AS (
        |  SELECT conv_id, turn_idx,
        |         concat(conv_id, '#', cast(turn_idx AS varchar)) AS vkey,
        |         tool, epoch_us(ts) AS tus
        |  FROM t
        |), adjt AS (
        |  SELECT * FROM (
        |    SELECT vkey AS src_key,
        |           lead(vkey) OVER win AS dst_key,
        |           lead(tus) OVER win AS tt
        |    FROM kt WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)) x
        |  WHERE dst_key IS NOT NULL
        |), toolt AS (
        |  SELECT vkey AS src_key, concat('T#', tool) AS dst_key, tus AS tt
        |  FROM kt WHERE tool IS NOT NULL
        |), dirt AS (
        |  SELECT src_key, dst_key, tt
        |  FROM (SELECT * FROM adjt UNION ALL SELECT * FROM toolt) u
        |  WHERE src_key <> dst_key
        |), symt AS (
        |  SELECT src_key, dst_key, min(tt) AS tt FROM (
        |    SELECT src_key, dst_key, tt FROM dirt
        |    UNION ALL
        |    SELECT dst_key, src_key, tt FROM dirt) u
        |  GROUP BY 1, 2
        |), wt AS (
        |  SELECT epoch_us(ts) // 604800000000 AS week, count(*) AS n_turns FROM t GROUP BY 1
        |), we AS (
        |  SELECT tt // 604800000000 AS week, count(*) AS new_edges
        |  FROM symt WHERE src_key < dst_key GROUP BY 1
        |), wv AS (
        |  SELECT ft // 604800000000 AS week, count(*) AS new_vertices FROM (
        |    SELECT src_key, min(tt) AS ft FROM symt GROUP BY 1) v GROUP BY 1
        |)
        |SELECT cast(wt.week AS bigint) AS week,
        |       cast(wt.n_turns AS bigint) AS n_turns,
        |       cast(coalesce(we.new_edges, 0) AS bigint) AS new_edges,
        |       cast(coalesce(wv.new_vertices, 0) AS bigint) AS new_vertices
        |FROM wt
        |LEFT JOIN we ON we.week = wt.week
        |LEFT JOIN wv ON wv.week = wt.week""".stripMargin),
    "q_novelty" -> (prefix +
      """, tok AS (
        |  SELECT conv_id, turn_idx, epoch_us(ts) // 86400000000 AS day,
        |         unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM t
        |), gr AS (
        |  SELECT day,
        |         concat(tok, ' ', lead(tok) OVER win) AS gram,
        |         lead(tok) OVER win AS nxt
        |  FROM tok WINDOW win AS (PARTITION BY conv_id, turn_idx ORDER BY pos)
        |), bgd AS (
        |  SELECT gram, day, count(*) AS c FROM gr WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), fst AS (
        |  SELECT gram, min(day) AS fday FROM bgd GROUP BY 1
        |)
        |SELECT b.day AS day, cast(sum(c) AS bigint) AS n_occ,
        |       cast(sum(CASE WHEN b.day = f.fday THEN c ELSE 0 END) AS bigint) AS new_occ,
        |       cast(sum(CASE WHEN b.day = f.fday THEN 1 ELSE 0 END) AS bigint) AS new_grams
        |FROM bgd b JOIN fst f ON f.gram = b.gram GROUP BY 1""".stripMargin),
    "q_toolloops" -> (prefix +
      """, tt AS (SELECT conv_id, turn_idx, tool FROM t WHERE tool IS NOT NULL)
        |, g AS (
        |  SELECT conv_id, turn_idx, tool,
        |         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
        |       - row_number() OVER (PARTITION BY conv_id, tool ORDER BY turn_idx) AS grp
        |  FROM tt
        |)
        |SELECT conv_id, tool, cast(count(*) AS bigint) AS run_len,
        |       cast(min(turn_idx) AS bigint) AS start_turn
        |FROM g GROUP BY conv_id, tool, grp HAVING count(*) >= 3""".stripMargin),
    "q_latency" -> (prefix +
      """, g AS (
        |  SELECT conv_id, turn_idx, epoch_us(ts) AS tus,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        |  FROM t
        |), st AS (
        |  SELECT conv_id, count(*) AS n_turns,
        |         max(tus) - min(tus) AS span_us,
        |         coalesce(max(gap), -1) AS max_gap_us
        |  FROM g GROUP BY 1
        |), md AS (
        |  SELECT conv_id, gap AS median_gap_us FROM (
        |    SELECT conv_id, gap,
        |           row_number() OVER (PARTITION BY conv_id ORDER BY gap, turn_idx) AS rn,
        |           count(*) OVER (PARTITION BY conv_id) AS m
        |    FROM g WHERE gap IS NOT NULL) x
        |  WHERE rn = (m + 1) // 2
        |)
        |SELECT st.conv_id, cast(n_turns AS bigint) AS n_turns,
        |       cast(span_us AS bigint) AS span_us,
        |       cast(max_gap_us AS bigint) AS max_gap_us,
        |       cast(coalesce(md.median_gap_us, -1) AS bigint) AS median_gap_us
        |FROM st LEFT JOIN md ON md.conv_id = st.conv_id""".stripMargin),
    "q_tool_latency" -> (prefix +
      """, g AS (
        |  SELECT conv_id, turn_idx, tool,
        |         lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) - epoch_us(ts) AS gap
        |  FROM t
        |), tg AS (
        |  SELECT tool, conv_id, turn_idx, gap FROM g
        |  WHERE tool IS NOT NULL AND gap IS NOT NULL
        |), st AS (
        |  SELECT tool, count(*) AS n_calls, min(gap) AS min_gap_us,
        |         max(gap) AS max_gap_us
        |  FROM tg GROUP BY 1
        |), rk AS (
        |  SELECT tool, gap,
        |         row_number() OVER (PARTITION BY tool ORDER BY gap, conv_id, turn_idx) AS rn,
        |         count(*) OVER (PARTITION BY tool) AS m
        |  FROM tg
        |)
        |SELECT s.tool, cast(s.n_calls AS bigint) AS n_calls,
        |       cast(s.min_gap_us AS bigint) AS min_gap_us,
        |       cast(s.max_gap_us AS bigint) AS max_gap_us,
        |       cast(r.gap AS bigint) AS median_gap_us
        |FROM st s JOIN rk r ON r.tool = s.tool AND r.rn = (r.m + 1) // 2""".stripMargin),
    "q_conv_hist" -> (prefix +
      """, cl AS (
        |  SELECT conv_id, count(*) AS n FROM t GROUP BY 1
        |)
        |SELECT cast(length(bin(n)) AS bigint) AS bucket,
        |       cast(count(*) AS bigint) AS n_convs,
        |       cast(min(n) AS bigint) AS min_turns,
        |       cast(max(n) AS bigint) AS max_turns
        |FROM cl GROUP BY 1""".stripMargin),
    "q_heaps" -> (prefix +
      """, tok AS (
        |  SELECT day, w FROM (
        |    SELECT epoch_us(ts) // 86400000000 AS day,
        |           unnest(string_split(lower(text), ' ')) AS w
        |    FROM t) x
        |  WHERE w <> ''
        |), pd AS (
        |  SELECT day, count(*) AS n_tokens FROM tok GROUP BY 1
        |), fs AS (
        |  SELECT min(day) AS day FROM tok GROUP BY w
        |), nt AS (
        |  SELECT day, count(*) AS new_types FROM fs GROUP BY 1
        |)
        |SELECT cast(p.day AS bigint) AS day,
        |       cast(p.n_tokens AS bigint) AS n_tokens,
        |       cast(coalesce(n.new_types, 0) AS bigint) AS new_types,
        |       cast(sum(p.n_tokens) OVER (ORDER BY p.day) AS bigint) AS cum_tokens,
        |       cast(sum(coalesce(n.new_types, 0)) OVER (ORDER BY p.day) AS bigint) AS cum_types
        |FROM pd p LEFT JOIN nt n ON n.day = p.day""".stripMargin),
    "q_chatlint" -> (prefix +
      """, rr AS (
        |  SELECT conv_id, turn_idx, role, tool,
        |         CASE WHEN lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
        |                   IS DISTINCT FROM role THEN 1 ELSE 0 END AS brk
        |  FROM t
        |), agg AS (
        |  SELECT conv_id,
        |         arg_min(role, turn_idx) AS first_role,
        |         arg_max(role, turn_idx) AS last_role,
        |         max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS has_assistant,
        |         max(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS has_tool,
        |         sum(brk) AS n_role_runs
        |  FROM rr GROUP BY 1
        |)
        |SELECT conv_id, first_role, last_role,
        |       cast(has_assistant AS bigint) AS has_assistant,
        |       cast(has_tool AS bigint) AS has_tool,
        |       cast(n_role_runs AS bigint) AS n_role_runs,
        |       cast(CASE WHEN first_role = 'user' AND has_assistant = 1
        |                 THEN 1 ELSE 0 END AS bigint) AS lint_ok
        |FROM agg""".stripMargin),
    "q_ctx_budget" -> (prefix +
      """, nt AS (
        |  SELECT conv_id, turn_idx, len(string_split(text, ' ')) AS nt,
        |         sum(len(string_split(text, ' ')))
        |           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS cum
        |  FROM t
        |)
        |SELECT conv_id, cast(count(*) AS bigint) AS n_turns,
        |       cast(sum(nt) AS bigint) AS total_tokens,
        |       cast(sum(CASE WHEN cum <= 256 THEN 1 ELSE 0 END) AS bigint) AS fit_turns,
        |       cast(sum(CASE WHEN cum > 256 THEN nt ELSE 0 END) AS bigint) AS lost_tokens
        |FROM nt GROUP BY 1""".stripMargin),
    "q_boilerplate" -> (prefix +
      """
        |SELECT md5(text) AS text_md5,
        |       cast(count(DISTINCT conv_id) AS bigint) AS n_convs,
        |       cast(count(*) AS bigint) AS n_occ
        |FROM t GROUP BY 1
        |HAVING count(DISTINCT conv_id) >= 2
        |ORDER BY n_convs DESC, n_occ DESC, text_md5 ASC
        |LIMIT 100""".stripMargin),
    "q_densest" -> densestSql,
    "q_trending" -> (prefix +
      """, mx AS (SELECT max(epoch_us(ts)) AS m FROM t)
        |SELECT tool,
        |       cast(sum(1::BIGINT << (40 - least(((SELECT m FROM mx) - epoch_us(ts)) // 259200000000, 40))) AS bigint) AS score_scaled
        |FROM t WHERE tool IS NOT NULL
        |GROUP BY 1""".stripMargin),
    "q_zorder" -> {
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((u >> $i) & 1) << ${2 * i})", s"(((tb >> $i) & 1) << ${2 * i + 1})"))
        .mkString(" + ")
      s"""WITH ev AS (
         |  SELECT event_id, user_id & 65535 AS u,
         |         ((epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events)) // 3600000000) & 65535 AS tb
         |  FROM events
         |)
         |SELECT event_id, zval, zval // 268435456 AS file_bucket FROM (
         |  SELECT event_id, cast($terms AS bigint) AS zval FROM ev) x""".stripMargin
    },
    "q_ppr_multi" -> pprMultiSql,
    // DuckDB 1.0: UNION-dedup misbehaves in WITH RECURSIVE lists —
    // UNION ALL + explicit DISTINCT (SURVEY §7 gotcha)
    "q_vcover" -> (matchingCtes +
      """
        |SELECT DISTINCT key FROM (
        |  SELECT a AS key FROM r WHERE matched
        |  UNION ALL SELECT b FROM r WHERE matched) u""".stripMargin),
    "q_ppr" -> pprSql,
    "q_sweep" -> sweepSql,
    "q_pagerank_w" -> pagerankWSql,
    "q_pagerank_decay" -> pagerankDecaySql,
    "q_cc" -> ccSql,
    "q_cc_inc" -> ccSql,
    "q_lp" -> ccSql,
    "q_voronoi" -> voronoiSql,
    "q_critpath_fast" -> critpathSql,
    "q_scc" -> sccSql,
    "q_simrank" -> simrankSql,
    "q_graphlets" -> graphletsSql,
    "q_hitting" -> hittingSql,
    "q_bowtie" -> bowtieSql,
    "q_deg_corr" -> (prefix +
      """, od AS (SELECT src_key AS key, count(*) AS o FROM e GROUP BY 1)
        |, id2 AS (SELECT dst_key AS key, count(*) AS i FROM e GROUP BY 1)
        |, dg AS (
        |  SELECT v.key, coalesce(od.o, 0) AS o, coalesce(id2.i, 0) AS i
        |  FROM v LEFT JOIN od ON od.key = v.key LEFT JOIN id2 ON id2.key = v.key
        |)
        |SELECT cast(count(*) AS bigint) AS n,
        |       cast(sum(o) AS bigint) AS s_out,
        |       cast(sum(i) AS bigint) AS s_in,
        |       cast(sum(o * o) AS bigint) AS ss_out,
        |       cast(sum(i * i) AS bigint) AS ss_in,
        |       cast(sum(i * o) AS bigint) AS s_io
        |FROM dg""".stripMargin),
    "q_scc_dag" -> sccDagSql,
    "q_katz" -> katzSql,
    "q_eigen" -> eigenSql,
    "q_listrank" -> listrankSql,
    "q_modularity" -> modularitySql,
    "q_ecc" -> eccSql,
    "q_khop" -> khopSql,
    "q_anf" -> anfSql,
    "q_extract" -> extractSql,
    "q_nbrsample" -> (prefix + symBody +
      """, pri AS (
        |  SELECT src_key, dst_key,
        |         ('0x' || substr(md5(concat(src_key, '|', dst_key)), 1, 15))::BIGINT AS p
        |  FROM esw
        |), rk AS (
        |  SELECT src_key, dst_key,
        |         row_number() OVER (PARTITION BY src_key ORDER BY p, dst_key) AS r
        |  FROM pri
        |)
        |SELECT src_key, dst_key, cast(r AS bigint) AS r FROM rk WHERE r <= 3""".stripMargin),
    "q_biproj" -> (prefix +
      """, m AS (SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL)
        |SELECT a.conv_id AS conv_a, b.conv_id AS conv_b, count(*) AS shared
        |FROM m a JOIN m b ON a.tool = b.tool AND a.conv_id < b.conv_id
        |GROUP BY 1, 2""".stripMargin),
    "q_butterflies" -> butterfliesSql,
    "q_widest" -> widestSql,
    "q_msf" -> msfSql,
    "q_coloring" -> coloringSql,
    "q_scan" -> scanSql,
    "q_euler" -> eulerSql,
    "q_bipartite" -> bipartiteSql,
    "q_bridges" -> bridgesSql,
    "q_attack" -> attackSql,
    "q_percolation" -> percolationSql,
    "q_2ecc" -> twoEccSql,
    "q_kcenter" -> kcenterSql,
    "q_redact" -> redactSql,
    "q_bc_multi" -> bcMultiSql,
    "q_bc_approx" -> bcApproxSql,
    "q_triangles" -> (prefix +
      """, ud AS (
        |  SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b FROM e
        |)
        |SELECT count(*) AS n_triangles
        |FROM ud e1 JOIN ud e2 ON e2.a = e1.b JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin),
    // key-ordered brute 4-clique: a<b<c<d with all six edges present —
    // orientation-independent, so it checks the engine's degree-ordered
    // DAG ladder from the outside
    "q_4clique" -> (prefix +
      """, ud AS (
        |  SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b FROM e
        |)
        |SELECT count(*) AS n_4cliques
        |FROM ud e1
        |JOIN ud e2 ON e2.a = e1.b
        |JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b
        |JOIN ud e4 ON e4.a = e2.b
        |JOIN ud e5 ON e5.a = e1.a AND e5.b = e4.b
        |JOIN ud e6 ON e6.a = e1.b AND e6.b = e4.b""".stripMargin),
    // per-vertex: the triangle SET is orientation-independent, so the
    // key-ordered ud join reproduces the engine's degree-ordered count
    "q_clustering" -> ("WITH " + prefixBody + symBody +
      """, ud AS (
        |  SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b FROM e
        |), tri AS (
        |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM ud e1 JOIN ud e2 ON e2.a = e1.b JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b
        |), cnt AS (
        |  SELECT key, count(*) AS triangles FROM (
        |    SELECT a AS key FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) u
        |  GROUP BY 1
        |), dg AS (
        |  SELECT src_key AS key, count(*) AS degree FROM esw GROUP BY 1
        |)
        |SELECT dg.key AS key, cast(dg.degree AS bigint) AS degree,
        |       cast(coalesce(cnt.triangles, 0) AS bigint) AS triangles
        |FROM dg LEFT JOIN cnt ON cnt.key = dg.key""".stripMargin),
    // OddBall ego-net features: same triangle/degree body, plus the
    // ego edge count and the near-clique density ratio
    "q_oddball" -> ("WITH " + prefixBody + symBody +
      """, ud AS (
        |  SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b FROM e
        |), tri AS (
        |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM ud e1 JOIN ud e2 ON e2.a = e1.b JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b
        |), cnt AS (
        |  SELECT key, count(*) AS triangles FROM (
        |    SELECT a AS key FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) u
        |  GROUP BY 1
        |), dg AS (
        |  SELECT src_key AS key, count(*) AS degree FROM esw GROUP BY 1
        |), f AS (
        |  SELECT dg.key, dg.degree AS d, coalesce(cnt.triangles, 0) AS t
        |  FROM dg LEFT JOIN cnt ON cnt.key = dg.key
        |)
        |SELECT key, cast(d + 1 AS bigint) AS n_ego,
        |       cast(d + t AS bigint) AS e_ego,
        |       cast(CASE WHEN d < 2 THEN 10000
        |                 ELSE (2 * (d + t) * 10000) // ((d + 1) * d) END AS bigint)
        |         AS clique_e4
        |FROM f""".stripMargin)
  ) ++ PipelineEntry.oracleSql
}
