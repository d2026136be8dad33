"""Deploy surface tests (reference ``pipelines/deploy/databricks.py``):
the Databricks Jobs-2.1 body renderer + idempotent reset-by-name semantics
over a fake workspace client, and the native Ray Jobs submission arm.
"""

import json

import pytest

from core_ray.deploy import (
    AutoScale,
    ClusterSpec,
    CreateJob,
    DatabricksSDKDeploy,
    JobCluster,
    MavenLibrary,
    NotebookTask,
    PyPiLibrary,
    RayJobDeploy,
    SparkPythonTask,
    Task,
    collect_libraries,
)
from core_ray.pipelines.converters import PipelineJobFromJsonConverter
from core_ray.pipelines.framework import (
    PipelineJob,
    PipelineStep,
    SourceComponent,
)


class FakeWorkspaceClient:
    def __init__(self, existing_jobs=()):
        self.uploads = {}
        self.mkdirs = []
        self.jobs = {j["name"]: j for j in existing_jobs}
        self.resets = []
        self.creates = []
        self.runs = []
        self._next_id = 100

    def workspace_mkdirs(self, path):
        self.mkdirs.append(path)

    def workspace_upload(self, path, content, overwrite=False):
        self.uploads[path] = (content, overwrite)

    def jobs_list(self, name=None):
        return [j for j in self.jobs.values() if name in (None, j["name"])]

    def jobs_reset(self, job_id, body):
        self.resets.append((job_id, body))

    def jobs_create(self, body):
        self._next_id += 1
        self.jobs[body["name"]] = {"job_id": self._next_id,
                                   "name": body["name"]}
        self.creates.append(body)
        return self._next_id

    def jobs_run_now(self, job_id):
        self.runs.append(job_id)
        return {"run_id": job_id * 10}


class LibDeclaringSource(SourceComponent):
    def libraries(self):
        return {
            "pypi": [PyPiLibrary("httpx", "0.27.0")],
            "maven": [
                MavenLibrary("io.delta", "delta-core_2.12", "2.4.0"),
                MavenLibrary("org.example", "widget", "1.0"),
            ],
            "whl": ["dbfs:/libs/custom.whl"],
        }

    def settings(self):
        return {"spark.sql.shuffle.partitions": "64"}

    def read_batch(self):  # pragma: no cover - never executed here
        raise NotImplementedError


@pytest.fixture()
def pipeline_job():
    return PipelineJob(
        name="lib-job",
        steps=[PipelineStep(name="read", component=LibDeclaringSource())],
    )


@pytest.fixture()
def databricks_job(tmp_path):
    script = tmp_path / "pipeline_main.py"
    script.write_text("print('run')\n")
    cluster = JobCluster(
        job_cluster_key="c1",
        new_cluster=ClusterSpec(
            node_type_id="Standard_E4ds_v5",
            spark_version="13.2.x-scala2.12",
            autoscale=AutoScale(1, 3),
        ),
    )
    task = Task(
        task_key="t1",
        job_cluster_key="c1",
        spark_python_task=SparkPythonTask(python_file=str(script)),
    )
    return CreateJob(name="test_job", job_clusters=[cluster], tasks=[task])


def test_collect_libraries_walks_job(pipeline_job):
    libs, conf = collect_libraries(pipeline_job)
    assert [p.to_string() for p in libs["pypi"]] == ["httpx==0.27.0"]
    assert len(libs["maven"]) == 2
    assert conf == {"spark.sql.shuffle.partitions": "64"}


def test_deploy_create_renders_jobs_21_body(databricks_job, pipeline_job):
    client = FakeWorkspaceClient()
    deploy = DatabricksSDKDeploy(
        databricks_job, host="https://ws", token="t",
        pipeline_job=pipeline_job, workspace_client=client,
    )
    assert deploy.deploy() is True
    body = client.creates[0]
    # file uploaded into the workspace dir and the task repointed
    dest = "/core-ray/pipeline_main.py"
    assert dest in client.uploads
    task = body["tasks"][0]
    assert task["spark_python_task"]["python_file"] == dest
    # libraries: pypi kept, io.delta maven EXCLUDED, other maven kept,
    # wheel kept, engine package appended last
    libs = task["libraries"]
    assert {"pypi": {"package": "httpx==0.27.0"}} in libs
    coords = [l["maven"]["coordinates"] for l in libs if "maven" in l]
    assert coords == ["org.example:widget:1.0"]
    assert {"whl": "dbfs:/libs/custom.whl"} in libs
    assert libs[-1] == {"pypi": {"package": "core-ray[pipelines]"}}
    # settings merged into the referenced job cluster's conf
    jc = body["job_clusters"][0]["new_cluster"]
    assert jc["spark_conf"] == {"spark.sql.shuffle.partitions": "64"}
    # empty optionals omitted from the body (shallow-dict contract)
    assert "tags" not in body and "schedule" not in body


def test_deploy_resets_existing_job_by_name(databricks_job):
    client = FakeWorkspaceClient(
        existing_jobs=[{"job_id": 7, "name": "test_job"}]
    )
    DatabricksSDKDeploy(
        databricks_job, host="h", token="t", workspace_client=client
    ).deploy()
    assert client.creates == []
    job_id, body = client.resets[0]
    assert job_id == 7 and body["name"] == "test_job"


def test_deploy_validation_errors(tmp_path, databricks_job):
    with pytest.raises(ValueError):
        DatabricksSDKDeploy(
            CreateJob(name=""), host="h", token="t",
            workspace_client=FakeWorkspaceClient(),
        )
    bare = CreateJob(name="x", tasks=[Task(task_key="t")])
    with pytest.raises(ValueError, match="Notebook or Spark Python"):
        DatabricksSDKDeploy(
            bare, host="h", token="t",
            workspace_client=FakeWorkspaceClient(),
        ).deploy()
    script = tmp_path / "s.py"
    script.write_text("pass\n")
    no_cluster = CreateJob(
        name="x",
        tasks=[Task(task_key="t",
                    spark_python_task=SparkPythonTask(str(script)))],
    )
    with pytest.raises(ValueError, match="Cluster"):
        DatabricksSDKDeploy(
            no_cluster, host="h", token="t",
            workspace_client=FakeWorkspaceClient(),
        ).deploy()


def test_launch_run_now(databricks_job, tmp_path):
    client = FakeWorkspaceClient(
        existing_jobs=[{"job_id": 9, "name": "test_job"}]
    )
    deploy = DatabricksSDKDeploy(
        databricks_job, host="h", token="t", workspace_client=client
    )
    assert deploy.launch() == [{"run_id": 90}]
    assert client.runs == [9]
    missing = DatabricksSDKDeploy(
        CreateJob(name="ghost", tasks=databricks_job.tasks,
                  job_clusters=databricks_job.job_clusters),
        host="h", token="t", workspace_client=FakeWorkspaceClient(),
    )
    with pytest.raises(ValueError, match="ghost"):
        missing.launch()


class FakeJobClient:
    def __init__(self, existing=()):
        self.existing = [{"submission_id": s} for s in existing]
        self.submitted = []
        self.stopped = []
        self.deleted = []

    def list_jobs(self):
        return self.existing

    def submit_job(self, **body):
        self.submitted.append(body)
        return body["submission_id"]

    def stop_job(self, sid):
        self.stopped.append(sid)

    def delete_job(self, sid):
        self.deleted.append(sid)

    def get_job_status(self, sid):
        return f"RUNNING:{sid}"


def _pipeline_json(tmp_path):
    return json.dumps(
        {
            "name": "corpus-clean",
            "task_list": [
                {
                    "name": "t",
                    "step_list": [
                        {
                            "name": "read",
                            "component": "ParquetSource",
                            "component_parameters": {
                                "path": str(tmp_path / "in.parquet")
                            },
                        }
                    ],
                }
            ],
        }
    )


def test_ray_job_deploy_renders_submission(tmp_path, pipeline_job):
    client = FakeJobClient()
    deploy = RayJobDeploy(
        pipeline_job,
        pip=["pandas==2.0.0"],
        env_vars={"STAGE": "prod"},
        client=client,
    )
    body = deploy.render()
    assert body["submission_id"] == "core-ray-lib-job"
    env = body["runtime_env"]
    # component-declared pypi libraries merged after explicit pins, deduped
    assert env["pip"] == ["pandas==2.0.0", "httpx==0.27.0"]
    assert env["env_vars"]["STAGE"] == "prod"
    # component settings become env vars; pipeline JSON rides the env
    assert env["env_vars"]["spark.sql.shuffle.partitions"] == "64"
    spec = json.loads(env["env_vars"]["CORE_RAY_PIPELINE_JSON"])
    assert spec["name"] == "lib-job"
    assert body["metadata"]["name"] == "lib-job"
    assert deploy.deploy() is True
    assert client.submitted[0]["submission_id"] == "core-ray-lib-job"
    assert client.stopped == []


def test_ray_job_deploy_idempotent_and_from_json(tmp_path):
    client = FakeJobClient(existing=["core-ray-corpus-clean"])
    deploy = RayJobDeploy(_pipeline_json(tmp_path), client=client)
    assert deploy.name == "corpus-clean"
    assert deploy.deploy() is True
    # duplicate submission id was stopped + deleted before resubmit
    assert client.stopped == ["core-ray-corpus-clean"]
    assert client.deleted == ["core-ray-corpus-clean"]
    assert client.submitted[0]["submission_id"] == "core-ray-corpus-clean"
    assert deploy.launch() == "RUNNING:core-ray-corpus-clean"


def test_ray_job_deploy_json_roundtrips_to_runnable_job(tmp_path):
    spec = _pipeline_json(tmp_path)
    job = PipelineJobFromJsonConverter(spec).convert()
    assert isinstance(job, PipelineJob) and job.name == "corpus-clean"
