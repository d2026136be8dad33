"""Deploy surface (reference ``pipelines/deploy/`` — SURVEY.md §2.2).

Two arms: :mod:`databricks` renders and submits the reference's
Databricks-Workflows job shape (Jobs REST API 2.1) without the vendor SDK,
and :mod:`ray_jobs` is the native analog — a ``ray job submit`` submission
built from a PipelineJob, which is how this engine actually ships to a
fixed-size multi-node Ray cluster.
"""

from .databricks import (
    AutoScale,
    ClusterSpec,
    CreateJob,
    DatabricksSDKDeploy,
    JobCluster,
    MavenLibrary,
    NotebookTask,
    PyPiLibrary,
    SparkPythonTask,
    Task,
    collect_libraries,
)
from .interfaces import DeployInterface
from .ray_jobs import RayJobDeploy

__all__ = [
    "AutoScale",
    "ClusterSpec",
    "CreateJob",
    "DatabricksSDKDeploy",
    "DeployInterface",
    "JobCluster",
    "MavenLibrary",
    "NotebookTask",
    "PyPiLibrary",
    "RayJobDeploy",
    "SparkPythonTask",
    "Task",
    "collect_libraries",
]
