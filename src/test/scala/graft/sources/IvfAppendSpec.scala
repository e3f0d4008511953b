package graft.sources

import graft.SparkSpecBase
import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF index rollover ([[IvfIndexStore.append]]): the quantizer stays
  * frozen across an append, delta vectors land by the stored-centroid
  * d2 argmin, the stored centroids (not a retrain) drive the
  * assignment, and the appended codes obey the frozen grid's int8 law.
  */
class IvfAppendSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ivfapp_$tag").toString

  private def emb: DataFrame = Tables.embeddings(spark, sfDir)
  private def base: DataFrame = emb.filter(col("vec_id") % 5 =!= 4)
  private def delta: DataFrame = emb.filter(col("vec_id") % 5 === 4)

  /** The append-time assignment law, recomputed independently of the
    * store: 4-dp-rounded squared distance to each stored centroid,
    * argmin with ties on cell asc.
    */
  private def lawAssign(rows: DataFrame, cents: DataFrame): DataFrame =
    rows.filter(col("embedding").isNotNull)
      .select(col("vec_id"), VF.asDouble(col("embedding")).as("x"),
        VF.dot(col("embedding"), col("embedding")).as("xx"))
      .crossJoin(broadcast(
        cents.withColumn("cc", VF.dot(col("cvec"), col("cvec")))))
      .select(col("vec_id"),
        round(col("xx") - lit(2.0) * VF.dot(col("x"), col("cvec"))
          + col("cc"), 4).as("d2"), col("cell"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"))

  test("append never moves the quantizer: centroids and grid identical") {
    val path = freshPath("frozen")
    IvfIndexStore.build(base, path)
    def snap(sub: String): Seq[String] =
      spark.read.parquet(s"$path/$sub").collect().map(_.toString).toSeq.sorted
    val centsBefore = snap("centroids")
    val gridBefore = snap("grid")
    IvfIndexStore.append(spark, delta, path)
    assert(snap("centroids") == centsBefore)
    assert(snap("grid") == gridBefore)
  }

  test("rolled cells = base Lloyd assignment plus frozen-centroid delta argmin") {
    val path = freshPath("cells")
    IvfIndexStore.build(base, path)
    IvfIndexStore.append(spark, delta, path)
    val got = IvfIndexStore.cellsTable(spark, path)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val baseAssign = Similarity.kmeansAssign(base)
      .select(col("vec_id"), col("cluster").as("cell"))
    val deltaAssign = lawAssign(delta, IvfIndexStore.centroidsTable(spark, path))
    val want = baseAssign.unionByName(deltaAssign)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
    // the drop must actually spread over more than one stored cell for
    // the assignment law to be exercised
    assert(got.filter(_._1 % 5 == 4).map(_._2).distinct.size > 1)
  }

  test("stored centroids drive the append: tampering changes the assignment") {
    val path = freshPath("tamper")
    IvfIndexStore.build(base, path)
    // overwrite the stored quantizer with a single decoy cell — a
    // retraining append would ignore it; honoring the store means
    // EVERY delta vector now lands in the decoy cell
    val dim = Similarity.embeddingDim(emb)
    val decoy = Seq((424242L, Array.fill(dim)(0.0)))
      .toDF("cell", "cvec")
    val tmp = freshPath("tamper_cent")
    decoy.write.mode("overwrite").parquet(tmp)
    // two-step swap: the centroids dir can't be overwritten from a
    // frame that reads it
    spark.read.parquet(tmp).write.mode("overwrite")
      .parquet(s"$path/centroids")
    IvfIndexStore.append(spark, delta, path)
    val deltaCells = IvfIndexStore.cellsTable(spark, path)
      .filter(col("vec_id") % 5 === 4)
      .select(col("cell")).distinct()
      .as[Long].collect().toSeq
    assert(deltaCells == Seq(424242L))
  }

  test("appended codes obey the frozen grid law with the int8 clamp") {
    val path = freshPath("codes")
    IvfIndexStore.build(base, path)
    IvfIndexStore.append(spark, delta, path)
    val grid = spark.read.parquet(s"$path/grid")
      .orderBy("pos").as[(Int, Double, Double)].collect()
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") % 5 === 4)
      .select(col("vec_id"), col("codes")).as[(Long, Seq[Int])]
      .collect().toMap
    assert(codes.nonEmpty)
    val deltaVecs = delta.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    deltaVecs.foreach { case (id, xs) =>
      val want = xs.zip(grid).map { case (x, (_, mn, mx)) =>
        if (mx == mn) 0
        else {
          val c = math.floor((x.toDouble - mn) / ((mx - mn) / 255d) + 0.5d).toInt
          math.max(0, math.min(255, c))
        }
      }
      assert(codes(id) == want, s"vec $id")
      assert(codes(id).forall(c => c >= 0 && c <= 255))
    }
  }

  test("retrain loop: trigger fires on the measured drift and recall recovers") {
    val path = freshPath("retrain")
    IvfIndexStore.ensureRetrained(spark, base, delta, path)
    val (rolledRecall, fired) = IvfIndexStore.retrainDecision(spark, path)
    // the committed drift number: the frozen-quantizer roll sits below
    // the 0.95 trigger on this corpus, so the rebuild MUST have fired —
    // if testdata ever changes so the roll stays healthy, this surfaces
    // it instead of the gate silently serving the rolled index
    assert(rolledRecall < 0.95, s"rolled recall $rolledRecall")
    assert(fired)
    // recall recovers: the retrained serve beats the rolled serve
    val union = base.unionByName(delta)
    val probes = union.filter(col("vec_id") < 8)
    def meanRecall(sub: String): Double = Similarity.recallOf(
        Similarity.bruteForceTopK(union, col("vec_id") < 8),
        IvfIndexStore.servedTopK(spark, s"$path/$sub", probes), 5)
      .agg(avg(col("recall_at_5"))).head().getDouble(0)
    val recovered = meanRecall("full")
    assert(recovered > rolledRecall,
      s"retrained recall $recovered vs rolled $rolledRecall")
    // the served-after-retrain plan reads the retrained index
    val served = IvfIndexStore.servedAfterRetrain(spark, path, probes)
    served.collect()
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("full"), p.take(2000))
    // and a healthy roll (threshold below the measured recall) keeps
    // serving the rolled index without building a second quantizer
    val path2 = freshPath("retrain_lo")
    IvfIndexStore.ensureRetrained(spark, base, delta, path2,
      threshold = rolledRecall - 0.01)
    val (_, fired2) = IvfIndexStore.retrainDecision(spark, path2)
    assert(!fired2)
    assert(!new java.io.File(s"$path2/full").exists())
  }
}
