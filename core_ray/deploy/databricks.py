"""Databricks Workflows deploy without the vendor SDK.

Reference ``pipelines/deploy/databricks.py:287`` (``DatabricksSDKDeploy``)
drives ``databricks.sdk.WorkspaceClient``; here the same deploy semantics
are implemented over an INJECTABLE workspace client speaking the public
Jobs REST API 2.1 body shapes:

- each task must carry a notebook or spark-python task
  (reference ``databricks.py:389-393``),
- the task's pipeline file is uploaded into ``workspace_directory`` and the
  task repointed at the uploaded path (``:401-433``),
- libraries declared by the pipeline's components are attached to the task
  (pypi / maven with the reference's io.delta + org.apache.spark exclusion
  / wheels, ``:436-455``) plus this engine's own package (``:457-469``),
- component settings are merged into the task's cluster conf
  (``:471-500``),
- deploy is idempotent BY JOB NAME: an existing job with the same name is
  reset with the new settings, otherwise the job is created (``:502-516``),
- ``launch()`` is Run-Now by name (``:520-534``).

The client contract is three callables (``workspace_mkdirs``,
``workspace_upload``, plus a ``jobs`` trio ``list/reset/create/run_now``) —
a real deployment binds them to ``databricks-sdk`` (import-gated in
:func:`default_workspace_client`); tests bind a fake and assert the
rendered Jobs-2.1 body.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from .interfaces import DeployInterface

ENGINE_PACKAGE = "core-ray[pipelines]"
_EXCLUDED_MAVEN_GROUPS = ("io.delta", "org.apache.spark")


def _strip_nones(d: dict) -> dict:
    return {k: v for k, v in d.items() if v not in (None, [], {})}


@dataclass
class PyPiLibrary:
    name: str
    version: str | None = None
    repo: str | None = None

    def to_string(self) -> str:
        return f"{self.name}=={self.version}" if self.version else self.name


@dataclass
class MavenLibrary:
    group_id: str
    artifact_id: str
    version: str
    repo: str | None = None

    def to_string(self) -> str:
        return f"{self.group_id}:{self.artifact_id}:{self.version}"


@dataclass
class AutoScale:
    min_workers: int
    max_workers: int

    def as_dict(self) -> dict:
        return {"min_workers": self.min_workers,
                "max_workers": self.max_workers}


@dataclass
class ClusterSpec:
    node_type_id: str
    spark_version: str
    num_workers: int | None = None
    autoscale: AutoScale | None = None
    data_security_mode: str | None = None
    runtime_engine: str | None = None
    spark_conf: dict[str, str] | None = None

    def as_dict(self) -> dict:
        return _strip_nones(
            {
                "node_type_id": self.node_type_id,
                "spark_version": self.spark_version,
                "num_workers": self.num_workers,
                "autoscale": self.autoscale.as_dict() if self.autoscale else None,
                "data_security_mode": self.data_security_mode,
                "runtime_engine": self.runtime_engine,
                "spark_conf": self.spark_conf,
            }
        )


@dataclass
class JobCluster:
    job_cluster_key: str
    new_cluster: ClusterSpec

    def as_dict(self) -> dict:
        return {"job_cluster_key": self.job_cluster_key,
                "new_cluster": self.new_cluster.as_dict()}


@dataclass
class NotebookTask:
    notebook_path: str

    def as_dict(self) -> dict:
        return {"notebook_path": self.notebook_path}


@dataclass
class SparkPythonTask:
    python_file: str
    parameters: list[str] = field(default_factory=list)

    def as_dict(self) -> dict:
        return _strip_nones({"python_file": self.python_file,
                             "parameters": self.parameters})


@dataclass
class Task:
    task_key: str
    notebook_task: NotebookTask | None = None
    spark_python_task: SparkPythonTask | None = None
    job_cluster_key: str | None = None
    new_cluster: ClusterSpec | None = None
    depends_on: list[str] = field(default_factory=list)
    libraries: list[dict] = field(default_factory=list)

    def as_dict(self) -> dict:
        return _strip_nones(
            {
                "task_key": self.task_key,
                "notebook_task": (
                    self.notebook_task.as_dict() if self.notebook_task else None
                ),
                "spark_python_task": (
                    self.spark_python_task.as_dict()
                    if self.spark_python_task
                    else None
                ),
                "job_cluster_key": self.job_cluster_key,
                "new_cluster": (
                    self.new_cluster.as_dict() if self.new_cluster else None
                ),
                "depends_on": [{"task_key": k} for k in self.depends_on],
                "libraries": self.libraries,
            }
        )


@dataclass
class CreateJob:
    """Jobs-API-2.1 create body (the reference's ``CreateJob`` shallow-dict
    shape, ``databricks.py:231-284`` — Nones/empties are omitted)."""

    name: str
    tasks: list[Task] = field(default_factory=list)
    job_clusters: list[JobCluster] = field(default_factory=list)
    tags: dict[str, str] | None = None
    schedule: dict | None = None
    max_concurrent_runs: int | None = None
    timeout_seconds: int | None = None

    def as_dict(self) -> dict:
        return _strip_nones(
            {
                "name": self.name,
                "tasks": [t.as_dict() for t in self.tasks],
                "job_clusters": [c.as_dict() for c in self.job_clusters],
                "tags": self.tags,
                "schedule": self.schedule,
                "max_concurrent_runs": self.max_concurrent_runs,
                "timeout_seconds": self.timeout_seconds,
            }
        )


def collect_libraries(obj: Any) -> tuple[dict, dict]:
    """Reference ``PipelineComponentsGetUtility``: walk the pipeline's
    components for their declared ``libraries()`` and ``settings()``.

    Accepts a ``PipelineJob`` (walks each step's component) or any object
    exposing the hooks directly.  ``libraries()`` may return a dict with
    ``pypi`` / ``maven`` / ``whl`` lists; ``settings()`` a flat conf dict.
    Components without the hooks contribute nothing.
    """
    from ..pipelines.framework import PipelineJob

    libs: dict = {"pypi": [], "maven": [], "whl": []}
    conf: dict = {}
    targets = (
        [s.component for s in obj.steps]
        if isinstance(obj, PipelineJob)
        else [obj]
    )
    for comp in targets:
        get_libs = getattr(comp, "libraries", None)
        if callable(get_libs):
            declared = get_libs() or {}
            for key in libs:
                libs[key].extend(declared.get(key) or [])
        get_settings = getattr(comp, "settings", None)
        if callable(get_settings):
            conf.update(get_settings() or {})
    return libs, conf


def default_workspace_client(host, token):  # pragma: no cover
    """Real arm: bind to databricks-sdk when installed (not in-sandbox)."""
    try:
        from databricks.sdk import WorkspaceClient
        from databricks.sdk.config import Config
    except ImportError as e:
        raise ImportError(
            "databricks-sdk is not installed; pass workspace_client="
        ) from e
    return WorkspaceClient(
        config=Config(product="core-ray", host=host, token=token,
                      auth_type="pat")
    )


class DatabricksSDKDeploy(DeployInterface):
    """Deploy a pipeline job to Databricks Workflows (reference
    ``databricks.py:287``), client injectable."""

    def __init__(
        self,
        databricks_job: CreateJob,
        host: str,
        token: str,
        workspace_directory: str = "/core-ray",
        pipeline_job=None,
        workspace_client=None,
    ):
        if not databricks_job.name:
            raise ValueError("databricks_job.name cannot be empty")
        self.databricks_job = databricks_job
        self.host = host
        self.token = token
        self.workspace_directory = workspace_directory.rstrip("/")
        self.pipeline_job = pipeline_job
        self._client = workspace_client or default_workspace_client(
            host, token
        )

    # -- helpers --------------------------------------------------------

    def _task_file(self, task: Task) -> str:
        if task.notebook_task is not None:
            return task.notebook_task.notebook_path
        return task.spark_python_task.python_file

    def _repoint(self, task: Task, new_path: str) -> None:
        if task.notebook_task is not None:
            task.notebook_task.notebook_path = new_path
        else:
            task.spark_python_task.python_file = new_path

    def _render_libraries(self, libs: dict) -> list[dict]:
        out: list[dict] = []
        for py in libs.get("pypi", []):
            out.append(
                {"pypi": _strip_nones({"package": py.to_string(),
                                       "repo": py.repo})}
            )
        for mv in libs.get("maven", []):
            # Spark/Delta jars ship with the Databricks runtime — attaching
            # them duplicates classes (reference ``databricks.py:445``)
            if mv.group_id in _EXCLUDED_MAVEN_GROUPS:
                continue
            out.append(
                {"maven": _strip_nones({"coordinates": mv.to_string(),
                                        "repo": mv.repo})}
            )
        for whl in libs.get("whl", []):
            out.append({"whl": whl})
        out.append({"pypi": {"package": ENGINE_PACKAGE}})
        return out

    # -- DeployInterface -------------------------------------------------

    def deploy(self) -> bool:
        client = self._client
        for task in self.databricks_job.tasks:
            if task.notebook_task is None and task.spark_python_task is None:
                raise ValueError(
                    "A Notebook or Spark Python Task must be populated for "
                    "each task in the Databricks Job"
                )
            if (
                task.new_cluster is None
                and task.job_cluster_key is None
            ):
                raise ValueError(
                    "A Cluster must be specified for each task in the "
                    "Databricks Job"
                )
            src_path = self._task_file(task)
            client.workspace_mkdirs(self.workspace_directory)
            dest = f"{self.workspace_directory}/{os.path.basename(src_path)}"
            with open(src_path, "rb") as f:
                client.workspace_upload(dest, f.read(), overwrite=True)
            self._repoint(task, dest)

            libs, conf = (
                collect_libraries(self.pipeline_job)
                if self.pipeline_job is not None
                else ({"pypi": [], "maven": [], "whl": []}, {})
            )
            task.libraries = self._render_libraries(libs)
            if conf:
                if task.new_cluster is not None:
                    task.new_cluster.spark_conf = {
                        **(task.new_cluster.spark_conf or {}), **conf
                    }
                else:
                    for jc in self.databricks_job.job_clusters:
                        if jc.job_cluster_key == task.job_cluster_key:
                            jc.new_cluster.spark_conf = {
                                **(jc.new_cluster.spark_conf or {}), **conf
                            }
                            break

        body = self.databricks_job.as_dict()
        existing = client.jobs_list(name=self.databricks_job.name)
        if existing:
            client.jobs_reset(existing[0]["job_id"], body)
        else:
            client.jobs_create(body)
        return True

    def launch(self):
        runs = []
        for job in self._client.jobs_list(name=self.databricks_job.name):
            runs.append(self._client.jobs_run_now(job["job_id"]))
        if not runs:
            raise ValueError(
                f"no deployed job named {self.databricks_job.name!r}"
            )
        return runs
