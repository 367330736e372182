package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle census over an undirected simple graph, by
  * degree-ordered orientation — the construction that makes triangle
  * counting feasible on power-law graphs at scale: orienting every
  * edge from its (degree, id)-smaller endpoint to its larger one
  * turns the graph into a DAG whose max out-degree is O(√m) no matter
  * how skewed the degree distribution (a node of degree d only keeps
  * out-edges to HIGHER-degree neighbors, and there can be at most
  * ~√(2m) of those), so the wedge join — the quadratic step — is
  * bounded by Σ C(outdeg, 2) ≤ m·√(2m)/2 instead of the hub node's
  * C(d, 2) blowing up alone. Every triangle {a,b,c} ordered
  * a < b < c by the total order appears exactly once: as the wedge
  * (a→b, a→c) closed by the oriented edge b→c.
  *
  * Everything is edge- or node-keyed shuffles (degree aggregate, two
  * co-keyed joins, a semi-join); no windows, no driver state. The
  * companion metric, global clustering (closed wedges / all wedges),
  * is reported in integer basis points — `3·triangles·10⁴ div
  * wedges` — so the output stays hash-exact across engines.
  */
object Triangles {

  /** One-row census `(n_edges, n_wedges, n_triangles, closure_bp)` of
    * the undirected graph `edges(uCol, vCol)` — rows must be
    * normalized (u < v, distinct); wedges = Σ_node C(deg, 2).
    */
  def audit(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    // the edge table feeds degree, orientation, AND the edge count —
    // and its producer may be arbitrarily expensive (q98's is the
    // whole AllPairs chain): compute it exactly once
    val e = graft.dedup.Dedup.materialize(
      edges.select(col(uCol).as("u"), col(vCol).as("v")))
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))

    // three consumers (both wedge sides + the closing-edge probe)
    val oriented = graft.dedup.Dedup.materialize(orientedEdges(e, deg))

    // wedge (src→a, src→b) with a before b in the SAME total order ⇒
    // the closing edge of any triangle is oriented a→b, so one
    // semi-join probe per wedge decides it
    val oa = oriented.select(col("src"), col("dst").as("a"), col("ddeg").as("da"))
    val ob = oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("db"))
    val wedges = oa.join(ob, "src")
      .filter(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")))
      .select(col("a"), col("b"))
    val closed = wedges.join(
      oriented.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"), "left_semi")

    val nE = e.agg(count(lit(1)).as("n_edges"))
    val nW = deg.agg(coalesce(sum(expr("d * (d - 1) DIV 2")), lit(0L)).as("n_wedges"))
    val nT = closed.agg(count(lit(1)).as("n_triangles"))
    nE.crossJoin(broadcast(nW)).crossJoin(broadcast(nT))
      .withColumn("closure_bp",
        when(col("n_wedges") > 0,
          expr("3 * n_triangles * 10000 DIV n_wedges")).otherwise(0L))
  }

  /** Per-node census: `(node, degree, n_triangles, coeff_bp)` where
    * `coeff_bp` is the LOCAL clustering coefficient
    * `2·triangles / (deg·(deg−1))` in integer basis points — the
    * per-node density signal (a doc whose neighborhood is a clique is
    * the core of a duplicate cluster; a high-degree node with low
    * closure is a template bridging unrelated groups). Same
    * degree-ordered orientation and wedge join as [[audit]], but the
    * closing-edge probe is an inner join and each found triangle
    * fans out to its three endpoints (×3 rows, still edge-bounded)
    * for a node-keyed count.
    */
  def perNode(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = graft.dedup.Dedup.materialize(
      edges.select(col(uCol).as("u"), col(vCol).as("v")))
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val oriented = graft.dedup.Dedup.materialize(
      orientedEdges(e, deg.select(col("node"), col("degree").as("d"))))
    val oa = oriented.select(col("src"), col("dst").as("a"), col("ddeg").as("da"))
    val ob = oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("db"))
    val wedges = oa.join(ob, "src")
      .filter(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")))
      .select(col("src"), col("a"), col("b"))
    val tris = wedges
      .join(oriented.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"))
      .select(explode(array(col("src"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("t"))
    deg.join(tris, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("t"), lit(0L)))
      .withColumn("coeff_bp", when(col("degree") >= 2,
        expr("2 * n_triangles * 10000 DIV (degree * (degree - 1))")).otherwise(lit(0L)))
      .select("node", "degree", "n_triangles", "coeff_bp")
  }

  /** Orient `e(u, v)` by (degree, id): src is the smaller endpoint
    * under the total order, `ddeg` carries the dst side's degree for
    * the wedge ordering. Package-private so the spec asserts the
    * out-degree bound on the SHIPPED orientation, not a copy.
    */
  private[graft] def orientedEdges(e: DataFrame, deg: DataFrame): DataFrame = {
    val du = deg.select(col("node").as("u"), col("d").as("du"))
    val dv = deg.select(col("node").as("v"), col("d").as("dv"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    e.join(du, "u").join(dv, "v")
      .select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"),
        when(fwd, col("dv")).otherwise(col("du")).as("ddeg"))
  }
}
