package graft.tools

import org.apache.spark.sql.functions._

/** Densification evidence for the co-purchase graph behind
  * `q_triangles` — the artifact that adjudicates its cross-decade wall
  * ratio (is a ~6× decade the GRAPH getting denser, or a plan that
  * needs the skew treatment?). Prints one JSON line per run with the
  * exact quantities the triangle plan's cost is proportional to:
  *
  *  - `nodes` / `edges`: unique items and unique undirected pairs;
  *  - `wedges_oriented`: Σ C(outdeg, 2) over the DEGREE-ORDERED
  *    orientation — the actual wedge work `triangleCounts` does;
  *  - `wedges_id`: Σ C(deg, 2) over the raw degrees — the work an
  *    unoriented node-iterator would do (the contrast that shows the
  *    orientation's skew bound biting, or not);
  *  - `max_deg` / `max_outdeg`: the hub the orientation caps.
  *
  * If `wedges_oriented` grows ~K× across a decade whose wall grew ~K×,
  * the ratio is the graph (baskets overlap more at replica density);
  * if the wedges stay flat while the wall climbs, the plan regressed.
  */
object GraphDensity {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val ue = graft.operators.Graph
      .coPurchaseEdges(graft.sources.Tables.lineitem(spark, sfDir))
      .filter(col("src") < col("dst"))
      .localCheckpoint()
    val edges = ue.count()
    val deg = ue.select(col("src").as("node"))
      .unionByName(ue.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .localCheckpoint()
    // the same (degree, id) orientation triangleCounts uses
    val outdeg = ue
      .join(deg.select(col("node").as("src"), col("degree").as("ds")), "src")
      .join(deg.select(col("node").as("dst"), col("degree").as("dd")), "dst")
      .select(
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
          col("src")).otherwise(col("dst")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("od"))
    // C(d,2) in pure integer arithmetic (d·(d−1) is always even);
    // coalesce(0) so an empty/edgeless graph reports zeros instead of
    // NPE-ing on NULL sums
    val stats = deg.agg(
      count(lit(1)).as("nodes"),
      coalesce(sum(col("degree") * (col("degree") - 1)), lit(0L)).as("w2"),
      coalesce(max(col("degree")), lit(0L)).as("max_deg")).collect()(0)
    val ostats = outdeg.agg(
      coalesce(sum(col("od") * (col("od") - 1)), lit(0L)).as("w2"),
      coalesce(max(col("od")), lit(0L)).as("max_outdeg")).collect()(0)
    val wedgesId = stats.getLong(1) / 2
    val wedgesOriented = ostats.getLong(0) / 2
    val line =
      s"""{"metric":"graph_density","sf":"$sfDir","nodes":${stats.getLong(0)},""" +
        s""""edges":$edges,"wedges_id":$wedgesId,""" +
        s""""wedges_oriented":$wedgesOriented,""" +
        s""""max_deg":${stats.getLong(2)},"max_outdeg":${ostats.getLong(1)}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
