"""JSON ⇄ PipelineJob converter tests (reference
``pipelines/converters/pipeline_job_json.py``): the wire format round-trips
and a JSON-described corpus pipeline actually runs end to end."""

import json

import pandas as pd
import pytest

import ray.data


def _job_json(src_path: str, dst_path: str) -> str:
    return json.dumps(
        {
            "name": "corpus-clean",
            "task_list": [
                {
                    "name": "corpus-clean-task",
                    "step_list": [
                        {
                            "name": "read",
                            "component": "ParquetSource",
                            "component_parameters": {"path": src_path},
                        },
                        {
                            "name": "count",
                            "component": "FunctionTransformer",
                            "component_parameters": {"fn": "token_count"},
                            "depends_on_step": ["read"],
                        },
                        {
                            "name": "write",
                            "component": "ParquetDestination",
                            "component_parameters": {"path": dst_path},
                            "depends_on_step": ["count"],
                        },
                    ],
                }
            ],
        }
    )


def test_registry_has_adapters_and_engine_components():
    from core_ray.pipelines.converters import component_registry

    reg = component_registry()
    for name in [
        "ParquetSource",
        "FunctionTransformer",
        "ParquetDestination",
        "PolarsDeltaDestination",
        "CAISODailyLoadISOSource",
    ]:
        assert name in reg, name


def test_json_job_roundtrip_and_run(tmp_path, sf_dir):
    from core_ray.pipelines.converters import (
        PipelineJobFromJsonConverter,
        PipelineJobToJsonConverter,
    )
    from core_ray.pipelines.framework import PipelineJobExecute

    src = f"{sf_dir}/documents.parquet"
    dst = str(tmp_path / "out")
    raw = _job_json(src, dst)

    job = PipelineJobFromJsonConverter(raw).convert()
    assert [s.name for s in job.steps] == ["read", "count", "write"]

    # byte-identical round trip (the converter preserves parameters)
    back = PipelineJobToJsonConverter(job).convert()
    assert json.loads(back) == json.loads(raw)

    results = PipelineJobExecute(job).run()
    assert results["write"] == {"path": dst}
    out = ray.data.read_parquet(dst).to_pandas()
    want = ray.data.read_parquet(src).to_pandas()
    assert len(out) == len(want)
    assert set(out.columns) == {"doc_id", "n_words"}


def test_unknown_component_and_secret_rejected():
    from core_ray.pipelines.converters import PipelineJobFromJsonConverter

    bad = json.dumps(
        {
            "name": "j",
            "task_list": [
                {
                    "name": "t",
                    "step_list": [
                        {
                            "name": "s",
                            "component": "NoSuchComponent",
                            "component_parameters": {},
                        }
                    ],
                }
            ],
        }
    )
    with pytest.raises(ValueError, match="unknown component"):
        PipelineJobFromJsonConverter(bad).convert()

    secret = json.dumps(
        {
            "name": "j",
            "task_list": [
                {
                    "name": "t",
                    "step_list": [
                        {
                            "name": "s",
                            "component": "ParquetSource",
                            "component_parameters": {
                                "path": {"pipeline_secret": {"type": "X", "vault": "v", "key": "k"}}
                            },
                        }
                    ],
                }
            ],
        }
    )
    with pytest.raises(ValueError, match="unknown secret provider"):
        PipelineJobFromJsonConverter(secret).convert()


def test_hand_built_function_transformer_roundtrips(sf_dir):
    """A **kwargs component must flatten its stored params back into
    component_parameters — nesting them under the kwargs name used to
    produce a component that crashed at transform time."""
    import json as _json

    import ray.data

    from core_ray.pipelines.converters import (
        FunctionTransformer,
        ParquetSource,
        PipelineJobFromJsonConverter,
        PipelineJobToJsonConverter,
    )
    from core_ray.pipelines.framework import PipelineJob, PipelineJobExecute, PipelineStep

    job = PipelineJob(
        name="rt",
        steps=[
            PipelineStep("src", ParquetSource(sf_dir + "/documents.parquet",
                                              columns=["doc_id", "text"])),
            PipelineStep("f", FunctionTransformer("corpus_filter", min_words=10),
                         depends_on=["src"]),
        ],
    )
    j = PipelineJobToJsonConverter(job).convert()
    params = _json.loads(j)["task_list"][0]["step_list"][1]["component_parameters"]
    assert params == {"fn": "corpus_filter", "min_words": 10}
    job2 = PipelineJobFromJsonConverter(j).convert()
    out = PipelineJobExecute(job2).run()["f"]
    assert out.count() > 0  # runs, rather than TypeError at transform time
