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
    "q_lp" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      labelsToKeyed(g, LabelPropagation.run(g).labels)
    }),
    "q_triangles" -> ((s, dir) => {
      import s.implicits._
      val g = Graphs.get(s, dir, symmetric = true)
      Seq(TriangleCount.count(g)).toDF("n_triangles")
    }),
    "q_bfs" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val root = rootId(g)
      Bfs.run(g, root).tree.join(g.vertices, "id").select(col("key"), col("level"))
    }),
    "q_sssp" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = true)
      val root = rootId(g)
      Sssp.run(g, root).distances.join(g.vertices, "id")
        .select(col("key"), round(col("dist") * 1000).cast("long").as("dist_e3"))
    }),
    "q_bc" -> ((s, dir) => {
      val g = Graphs.get(s, dir, symmetric = false)
      val root = rootId(g)
      Betweenness.run(g, root).bc.join(g.vertices, "id")
        .select(col("key"), round(col("bc") * 1000).cast("long").as("bc_e3"))
    })
  )

  /** Deterministic root: vertex with the minimum key. */
  private def rootId(g: LinkGraph): Long =
    g.vertices.orderBy(col("key")).select(col("id")).head().getLong(0)

  // ------------------------------------------------------------------
  // DuckDB oracle SQL. Shared CTE prefix derives the transcript table
  // and edge set from `events` with expressions that evaluate
  // identically in Spark and DuckDB (see sources/Transcripts.scala).
  // ------------------------------------------------------------------

  // NB: DuckDB 1.0 applies recursive-UNION semantics (no dedup) to
  // every CTE in a `WITH RECURSIVE` list, so the shared prefix avoids
  // relying on UNION-dedup anywhere: UNION ALL on provably disjoint
  // branches + explicit DISTINCT for the vertex set. Only the CC
  // oracle uses RECURSIVE (on the genuinely recursive member).
  private val prefixBody: String =
    """t AS (
      |  SELECT concat('c', cast(user_id AS varchar)) AS conv_id,
      |         cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS int) AS turn_idx,
      |         CASE WHEN event_type IN ('click','view') THEN 'user'
      |              WHEN event_type = 'signup' THEN 'assistant'
      |              ELSE 'tool' END AS role,
      |         concat(event_type, ' ', props) AS text,
      |         CASE WHEN event_type IN ('purchase','error')
      |              THEN concat('tool_', cast(cast(floor(user_id/10.0)*5 + cast(floor(value) AS bigint)%5 AS bigint) AS varchar))
      |              ELSE NULL END AS tool
      |  FROM events
      |), k AS (
      |  SELECT conv_id, turn_idx, concat(conv_id, '#', cast(turn_idx AS varchar)) AS vkey, tool FROM t
      |), e AS (
      |  SELECT * FROM (
      |    SELECT vkey AS src_key,
      |           lead(vkey) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_key,
      |           'adj' AS kind
      |    FROM k) x WHERE dst_key IS NOT NULL
      |  UNION ALL
      |  SELECT vkey, concat('T#', tool), 'tool' FROM k WHERE tool IS NOT NULL
      |), v AS (
      |  SELECT DISTINCT key FROM (
      |    SELECT src_key AS key FROM e UNION ALL SELECT dst_key FROM e) u
      |)""".stripMargin

  private val prefix: String = "WITH " + prefixBody

  /** CC/LP oracle: the engine runs general HashMin, but THIS graph's
   * components are derivable in SQL — conversations are chains
   * (always internally connected), so components of the full graph =
   * components of the tiny conversation-level graph (convs linked by
   * shared tools), expanded back to turn/tool vertices. An
   * independent structural check, not a re-implementation. */
  private val ccSql: String = "WITH RECURSIVE " + prefixBody +
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
      |)
      |SELECT vc.key AS key, rep.component AS component FROM vc JOIN rep USING (lc)""".stripMargin

  private val pagerankSql: String = {
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
      (1 to 5).map(iter).mkString +
      "\nSELECT key, cast(round(raw*100000) AS bigint) AS rank_e5 FROM p5"
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_transcripts" -> (prefix + "\nSELECT conv_id, turn_idx, role, text, tool FROM t"),
    "q_edges" -> (prefix + "\nSELECT src_key, dst_key, kind FROM e"),
    "q_degrees" -> (prefix +
      """, od AS (SELECT src_key AS key, count(*) AS o FROM e GROUP BY 1)
        |, id2 AS (SELECT dst_key AS key, count(*) AS i FROM e GROUP BY 1)
        |SELECT v.key AS key, coalesce(od.o, 0) AS out_degree, coalesce(id2.i, 0) AS in_degree
        |FROM v LEFT JOIN od ON od.key = v.key LEFT JOIN id2 ON id2.key = v.key""".stripMargin),
    "q_pagerank" -> pagerankSql,
    "q_cc" -> ccSql,
    "q_lp" -> ccSql,
    "q_triangles" -> (prefix +
      """, ud AS (
        |  SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b FROM e
        |)
        |SELECT count(*) AS n_triangles
        |FROM ud e1 JOIN ud e2 ON e2.a = e1.b JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin)
  ) ++ PipelineEntry.oracleSql
}
