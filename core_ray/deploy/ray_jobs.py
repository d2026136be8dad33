"""Native deploy arm: submit a pipeline as a Ray Job.

The engine's real deployment path is ``ray job submit`` against a fixed-size
multi-node cluster (the Jobs REST API / ``ray.job_submission``).  This
module renders a complete submission from a :class:`PipelineJob` — an
entrypoint command, a ``runtime_env`` carrying the collected pip libraries
and env vars, and metadata embedding the JSON wire format of the pipeline
(``pipelines/converters.py``) so the driver process on the cluster can
reconstruct and run the exact job — and submits it through an injectable
client.  The real arm binds ``ray.job_submission.JobSubmissionClient``
(import-gated: needs a running dashboard, absent in-sandbox); tests bind a
fake and assert the rendered submission.

Counterpart of the reference's Databricks deploy (``deploy/databricks.py``)
re-expressed for Ray — same collect-libraries + upload + idempotent-launch
semantics, different substrate.
"""

from __future__ import annotations

import json
from typing import Any

from .databricks import collect_libraries
from .interfaces import DeployInterface


def default_job_client(address: str):  # pragma: no cover
    """Real arm: a live Ray cluster's Jobs API (needs the dashboard)."""
    from ray.job_submission import JobSubmissionClient

    return JobSubmissionClient(address)


class RayJobDeploy(DeployInterface):
    """Render + submit a pipeline job via the Ray Jobs API.

    Parameters
    ----------
    pipeline_job : PipelineJob | str
        The job to ship — a live ``PipelineJob`` (serialized through the
        JSON converters) or an already-serialized pipeline JSON string.
    address : str
        Cluster address for the default client (e.g. ``http://head:8265``).
    entrypoint : str
        Driver command run on the cluster; defaults to the engine's CLI
        runner reading the pipeline JSON from the submission metadata.
    """

    def __init__(
        self,
        pipeline_job,
        address: str = "http://127.0.0.1:8265",
        entrypoint: str | None = None,
        working_dir: str | None = None,
        pip: list[str] | None = None,
        env_vars: dict[str, str] | None = None,
        submission_id: str | None = None,
        client=None,
    ):
        from ..pipelines.framework import PipelineJob

        if isinstance(pipeline_job, PipelineJob):
            from ..pipelines.converters import PipelineJobToJsonConverter

            self.name = pipeline_job.name
            self.pipeline_json = PipelineJobToJsonConverter(
                pipeline_job
            ).convert()
            self._lib_source: Any = pipeline_job
        else:
            spec = json.loads(pipeline_job)
            self.name = spec.get("name", "pipeline")
            self.pipeline_json = pipeline_job
            self._lib_source = None
        # default driver command: the engine CLI's pipeline runner; the
        # submission metadata carries the spec, the entrypoint materializes
        # it to a file first (metadata survives resubmission verbatim)
        self.entrypoint = entrypoint or (
            'python -c "import json,os,subprocess,sys;'
            "spec=os.environ['CORE_RAY_PIPELINE_JSON'];"
            "open('/tmp/pipeline.json','w').write(spec);"
            'sys.exit(subprocess.call([sys.executable,\'-m\','
            "'core_ray.cli','pipeline','/tmp/pipeline.json']))\""
        )
        self.working_dir = working_dir
        self.pip = list(pip or [])
        self.env_vars = dict(env_vars or {})
        self.submission_id = submission_id or f"core-ray-{self.name}"
        self._client = client or default_job_client(address)

    def render(self) -> dict:
        """The full submission body (what ``submit_job`` receives)."""
        pip = list(self.pip)
        if self._lib_source is not None:
            libs, conf = collect_libraries(self._lib_source)
            pip.extend(py.to_string() for py in libs.get("pypi", []))
            self.env_vars.update(
                {str(k): str(v) for k, v in conf.items()}
            )
        runtime_env: dict = {}
        if pip:
            # dedupe, order-preserving — duplicate pins break pip resolve
            runtime_env["pip"] = list(dict.fromkeys(pip))
        if self.working_dir:
            runtime_env["working_dir"] = self.working_dir
        runtime_env["env_vars"] = {
            **self.env_vars, "CORE_RAY_PIPELINE_JSON": self.pipeline_json
        }
        return {
            "entrypoint": self.entrypoint,
            "submission_id": self.submission_id,
            "runtime_env": runtime_env,
            "metadata": {"name": self.name,
                         "pipeline_json": self.pipeline_json},
        }

    def deploy(self) -> bool:
        """Idempotent by submission_id: an existing submission with the same
        id is stopped+deleted before resubmission (the Jobs API rejects
        duplicate ids), mirroring the reference's reset-by-name."""
        body = self.render()
        existing = {
            getattr(j, "submission_id", None) or j.get("submission_id")
            for j in self._client.list_jobs()
        }
        if self.submission_id in existing:
            self._client.stop_job(self.submission_id)
            self._client.delete_job(self.submission_id)
        self._client.submit_job(**body)
        return True

    def launch(self):
        """Ray jobs run on submit; launch() reports the submission status
        (parity with the reference's run-now returning a run handle)."""
        return self._client.get_job_status(self.submission_id)
