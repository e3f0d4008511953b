package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shape test for the Airflow orchestration artifact
  * (`dags/graft_daily_dag.py`) — no Airflow install needed: the DAG is
  * plain text whose task ids and `>>` edges this spec parses and checks
  * against [[Pipeline.StageNames]] and the dependency contract
  * (raw → 4 parallel dims, d_event → f_events, f_events → 4 views).
  * Keeps the python file and the Scala per-stage CLI in lockstep.
  */
class DagShapeSpec extends AnyFunSuite {

  private lazy val dagSource: String = {
    val p = java.nio.file.Paths.get("dags/graft_daily_dag.py")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private lazy val declaredStages: Seq[String] =
    """"([a-z_]+)",""".r.findAllMatchIn(
      dagSource.split("STAGES = \\[")(1).split("\\]")(0))
      .map(_.group(1)).toSeq

  private lazy val edges: Seq[(String, String)] =
    """tasks\["([a-z_]+)"\]\s*>>\s*tasks\["([a-z_]+)"\]""".r
      .findAllMatchIn(dagSource).map(m => (m.group(1), m.group(2))).toSeq

  test("DAG task ids equal Pipeline.StageNames exactly") {
    assert(declaredStages == Pipeline.StageNames)
  }

  test("every stage passes itself to the per-stage spark-submit CLI") {
    assert(dagSource.contains("--class graft.Pipeline"))
    assert(dagSource.contains("bash_command=spark_submit(stage)"))
    assert(dagSource.contains("task_id=stage"))
  }

  test("dependency edges: raw fans out to the dims, d_event gates the fact, fact gates the views") {
    val dims = Seq("d_event", "d_user", "d_parameter", "d_item")
    dims.foreach(d => assert(edges.contains(("event_raw", d)), d))
    assert(edges.contains(("d_event", "f_events")))
    val views = Seq("view_yearly_counts", "view_item_rank",
      "view_top_item", "view_top_platform")
    views.foreach(v => assert(edges.contains(("f_events", v)), v))
    assert(edges.size == dims.size + 1 + views.size) // no stray edges
    // acyclic by construction: every edge goes strictly forward in
    // stage order
    val idx = Pipeline.StageNames.zipWithIndex.toMap
    edges.foreach { case (a, b) => assert(idx(a) < idx(b), s"$a >> $b") }
  }

  test("every task publishes a Dataset outlet (data-aware scheduling surface)") {
    assert(dagSource.contains("outlets=[Dataset("))
    assert(dagSource.contains("graft://warehouse/"))
  }

  // ---- the corpus-curation twin (dags/graft_corpus_dag.py) ----

  private lazy val corpusDagSource: String = {
    val p = java.nio.file.Paths.get("dags/graft_corpus_dag.py")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private lazy val corpusStages: Seq[String] =
    """"([a-z_]+)",""".r.findAllMatchIn(
      corpusDagSource.split("STAGES = \\[")(1).split("\\]")(0))
      .map(_.group(1)).toSeq

  private lazy val corpusEdges: Seq[(String, String)] =
    """tasks\["([a-z_]+)"\]\s*>>\s*tasks\["([a-z_]+)"\]""".r
      .findAllMatchIn(corpusDagSource).map(m => (m.group(1), m.group(2))).toSeq

  test("corpus DAG task ids equal CorpusPipeline.StageNames exactly") {
    assert(corpusStages == CorpusPipeline.StageNames)
  }

  test("corpus DAG submits the per-stage CorpusPipeline CLI") {
    assert(corpusDagSource.contains("--class graft.CorpusPipeline"))
    assert(corpusDagSource.contains("bash_command=spark_submit(stage)"))
    assert(corpusDagSource.contains("task_id=stage"))
  }

  test("corpus DAG is the strict linear chain the data dependencies demand") {
    val want = CorpusPipeline.StageNames.sliding(2)
      .map(p => (p.head, p.last)).toSeq
    assert(corpusEdges == want) // exactly the chain, no stray edges
  }

  test("corpus DAG tasks publish graft://corpus Dataset outlets") {
    assert(corpusDagSource.contains("outlets=[Dataset("))
    assert(corpusDagSource.contains("graft://corpus/"))
  }
}
