"""Corpus-curation run for the graft Spark library, as one Airflow DAG.

The LLM-training-data twin of `graft_daily_dag.py`: where the daily
load mirrors the reference's seven chained DAGs (astro-sdk-tutorial/
dags/*.py), this DAG orchestrates the five-stage curation chain the
library gates as `pipeline_corpus` — quality gate -> exact dedup ->
near-dup keep-best canonicalization -> content-hash split -> train-only
pack manifest. The chain is strictly LINEAR by data dependency (every
stage reads its predecessor's materialized table), so the DAG is a
chain, unlike the daily load's raw -> 4-parallel-dims fan-out.

Every task is one spark-submit of `graft.CorpusPipeline <src> <out>
<stage>` — the per-stage CLI (`CorpusPipeline.runStage`), so the
orchestrator owns ordering/retries and the library owns the data
semantics (each stage is a deterministic overwrite of its table; a
retried task rewrites the same state). Dataset outlets mirror the
reference's data-aware scheduling surface: a downstream training job
can schedule on `graft://corpus/corpus_pack` instead of cron.

Pure Airflow-core API (DAG, BashOperator, Dataset) — no provider
packages; shape-tested by DagShapeSpec without an Airflow install.
"""

from datetime import datetime
import os

from airflow import DAG, Dataset
from airflow.operators.bash import BashOperator

SRC_DIR = os.environ.get("GRAFT_CORPUS_SRC_DIR", "/data/corpus/raw")
OUT_DIR = os.environ.get("GRAFT_CORPUS_OUT_DIR", "/data/corpus/curated")
GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft.jar")

# task id == graft.CorpusPipeline stage name
# (CorpusPipeline.StageNames): the Scala side rejects unknown stage
# arguments, and DagShapeSpec keeps this list in lockstep
STAGES = [
    "corpus_quality",
    "corpus_canonical",
    "corpus_clean",
    "corpus_split",
    "corpus_pack",
]


def spark_submit(stage: str) -> str:
    return (
        "spark-submit --class graft.CorpusPipeline "
        f"{GRAFT_JAR} {SRC_DIR} {OUT_DIR} {stage}"
    )


with DAG(
    dag_id="graft_corpus_curation",
    start_date=datetime(2024, 1, 12),
    schedule="@daily",
    catchup=False,
) as dag:
    tasks = {
        stage: BashOperator(
            task_id=stage,
            bash_command=spark_submit(stage),
            outlets=[Dataset(f"graft://corpus/{stage}")],
        )
        for stage in STAGES
    }

    # strictly linear: each stage consumes its predecessor's table
    tasks["corpus_quality"] >> tasks["corpus_canonical"]
    tasks["corpus_canonical"] >> tasks["corpus_clean"]
    tasks["corpus_clean"] >> tasks["corpus_split"]
    tasks["corpus_split"] >> tasks["corpus_pack"]
