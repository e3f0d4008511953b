"""Daily warehouse load for the graft Spark library, as one Airflow DAG.

The reference pipeline chains seven DAGs with TriggerDagRunOperator
(raw ingest -> d_event -> d_item -> d_parameter -> d_user -> f_events
-> aggregated views; reference: astro-sdk-tutorial/dags/*.py, each
ending in `trigger_dependent_dag`). This DAG expresses the SAME load as
its true data dependencies: the four dimension merges only need the raw
drop, so they fan out in parallel; the fact build reads the merged
d_event (its surrogate source); the four views rebuild last, matching
the reference's `aggregated_views` position.

Every task is one spark-submit of `graft.Pipeline <src> <warehouse>
<stage>` — the per-stage CLI (`Pipeline.runStage`), so the orchestrator
owns ordering/retries and the library owns the data semantics (each
stage is idempotent; a retried task re-merges to the same table state).
Dataset outlets/inlets mirror the reference's data-aware scheduling
surface (`from airflow import Dataset` in every reference DAG): a
downstream consumer can schedule on `graft://warehouse/<table>` instead
of cron.

Pure Airflow-core API (DAG, BashOperator, Dataset) — no provider
packages; shape-tested by DagShapeSpec without an Airflow install.
"""

from datetime import datetime
import os

from airflow import DAG, Dataset
from airflow.operators.bash import BashOperator

SRC_DIR = os.environ.get("GRAFT_SRC_DIR", "/data/drops/today")
WAREHOUSE_DIR = os.environ.get("GRAFT_WAREHOUSE_DIR", "/data/warehouse")
GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft.jar")

# task id == graft.Pipeline stage name (Pipeline.StageNames): the
# Scala side rejects unknown stage arguments, and DagShapeSpec keeps
# this list in lockstep with the library
STAGES = [
    "event_raw",
    "d_event",
    "d_user",
    "d_parameter",
    "d_item",
    "f_events",
    "view_yearly_counts",
    "view_item_rank",
    "view_top_item",
    "view_top_platform",
]


def spark_submit(stage: str) -> str:
    return (
        "spark-submit --class graft.Pipeline "
        f"{GRAFT_JAR} {SRC_DIR} {WAREHOUSE_DIR} {stage}"
    )


with DAG(
    dag_id="graft_daily_load",
    start_date=datetime(2024, 1, 12),
    schedule="@daily",
    catchup=False,
) as dag:
    tasks = {
        stage: BashOperator(
            task_id=stage,
            bash_command=spark_submit(stage),
            outlets=[Dataset(f"graft://warehouse/{stage}")],
        )
        for stage in STAGES
    }

    # raw drop lands first; the four dim merges need only the drop
    tasks["event_raw"] >> tasks["d_event"]
    tasks["event_raw"] >> tasks["d_user"]
    tasks["event_raw"] >> tasks["d_parameter"]
    tasks["event_raw"] >> tasks["d_item"]
    # the fact build reads the MERGED d_event for its surrogate keys
    tasks["d_event"] >> tasks["f_events"]
    # views rebuild after the fact lands (the reference's
    # aggregated_views position in the chain)
    tasks["f_events"] >> tasks["view_yearly_counts"]
    tasks["f_events"] >> tasks["view_item_rank"]
    tasks["f_events"] >> tasks["view_top_item"]
    tasks["f_events"] >> tasks["view_top_platform"]
