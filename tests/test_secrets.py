"""Secret providers + PipelineSecret wire-format round trip (reference
``pipelines/secrets/`` + ``converters/pipeline_job_json.py:53-85`` +
``execute/job.py:141-152``)."""

import json
import os
import stat

import pytest

from core_ray.pipelines.secrets import (
    SECRET_PROVIDERS,
    AzureKeyVaultSecrets,
    DatabricksSecrets,
    EnvVarSecrets,
    FileVaultSecrets,
    HashiCorpVaultSecrets,
    InMemoryVaultSecrets,
    PipelineSecret,
)


def test_env_var_secrets_get_set(monkeypatch):
    monkeypatch.delenv("MYVAULT_TOKEN", raising=False)
    with pytest.raises(KeyError):
        EnvVarSecrets(vault="MYVAULT", key="TOKEN").get()
    assert EnvVarSecrets(vault="MYVAULT", key="TOKEN", secret="s3cr3t").set()
    assert EnvVarSecrets(vault="MYVAULT", key="TOKEN").get() == "s3cr3t"
    monkeypatch.delenv("MYVAULT_TOKEN", raising=False)
    # no-vault form addresses the bare variable
    monkeypatch.setenv("BARE", "v")
    assert EnvVarSecrets(key="BARE").get() == "v"


def test_file_vault_secrets(tmp_path):
    vault = str(tmp_path / "vault")
    with pytest.raises(KeyError):
        FileVaultSecrets(vault=vault, key="pw").get()
    assert FileVaultSecrets(vault=vault, key="pw", secret="hunter2").set()
    path = tmp_path / "vault" / "pw"
    assert path.exists()
    mode = stat.S_IMODE(os.stat(path).st_mode)
    assert mode == 0o600
    assert FileVaultSecrets(vault=vault, key="pw").get() == "hunter2"
    # trailing newline from hand-edited files is stripped
    path.write_text("edited\n")
    assert FileVaultSecrets(vault=vault, key="pw").get() == "edited"
    # keys may not escape the vault directory
    with pytest.raises(ValueError, match="path separators"):
        FileVaultSecrets(vault=vault, key="../pw").get()


def test_in_memory_vault():
    InMemoryVaultSecrets.clear()
    with pytest.raises(KeyError):
        InMemoryVaultSecrets(vault="v", key="k").get()
    InMemoryVaultSecrets(vault="v", key="k", secret="x").set()
    assert InMemoryVaultSecrets(vault="v", key="k").get() == "x"
    InMemoryVaultSecrets.clear()
    with pytest.raises(KeyError):
        InMemoryVaultSecrets(vault="v", key="k").get()


def test_cloud_providers_import_gated():
    for cls in (HashiCorpVaultSecrets, AzureKeyVaultSecrets, DatabricksSecrets):
        with pytest.raises(ImportError):
            cls(vault="v", key="k")


def test_pipeline_secret_resolve_and_wire():
    InMemoryVaultSecrets.clear()
    InMemoryVaultSecrets(vault="v", key="k", secret="val").set()
    ps = PipelineSecret(type=InMemoryVaultSecrets, vault="v", key="k")
    assert ps.resolve() == "val"
    wire = ps.to_wire()
    assert wire == {
        "pipeline_secret": {"type": "InMemoryVaultSecrets", "vault": "v", "key": "k"}
    }
    assert "val" not in json.dumps(wire)
    assert SECRET_PROVIDERS["InMemoryVaultSecrets"] is InMemoryVaultSecrets


def _secret_job_json(src: str, dst_vault: str) -> str:
    return json.dumps(
        {
            "name": "secret-job",
            "task_list": [
                {
                    "name": "t",
                    "step_list": [
                        {
                            "name": "read",
                            "component": "ParquetSource",
                            "component_parameters": {"path": src},
                        },
                        {
                            "name": "write",
                            "component": "ParquetDestination",
                            "component_parameters": {
                                "path": {
                                    "pipeline_secret": {
                                        "type": "InMemoryVaultSecrets",
                                        "vault": dst_vault,
                                        "key": "out_path",
                                    }
                                }
                            },
                            "depends_on_step": ["read"],
                        },
                    ],
                }
            ],
        }
    )


def test_secret_job_convert_without_vault_then_run(tmp_path, sf_dir, ray_session):
    """Converting never touches the vault; execution resolves the secret
    (reference defers resolution to the DI factory, job.py:141-152)."""
    from core_ray.pipelines.converters import (
        PipelineJobFromJsonConverter,
        PipelineJobToJsonConverter,
    )
    from core_ray.pipelines.framework import PipelineJobExecute

    InMemoryVaultSecrets.clear()
    src = os.path.join(sf_dir, "region.parquet")
    job_json = _secret_job_json(src, "jobs")

    # vault is EMPTY here — convert + serialize must both succeed
    job = PipelineJobFromJsonConverter(job_json).convert()
    round_tripped = PipelineJobToJsonConverter(job).convert()
    assert json.loads(round_tripped)["task_list"][0]["step_list"][1][
        "component_parameters"
    ]["path"] == {
        "pipeline_secret": {
            "type": "InMemoryVaultSecrets",
            "vault": "jobs",
            "key": "out_path",
        }
    }

    # running without the secret set fails loudly at resolution time
    with pytest.raises(KeyError, match="out_path"):
        PipelineJobExecute(job).run()

    out_dir = str(tmp_path / "out")
    InMemoryVaultSecrets(vault="jobs", key="out_path", secret=out_dir).set()
    # deferred components cache nothing across runs of a FRESH conversion
    job = PipelineJobFromJsonConverter(job_json).convert()
    results = PipelineJobExecute(job).run()
    assert results["write"]["path"] == out_dir

    import ray.data

    n = ray.data.read_parquet(out_dir).count()
    assert n == ray.data.read_parquet(src).count()
    InMemoryVaultSecrets.clear()


def test_nested_dict_secret_decode():
    from core_ray.pipelines.converters import (
        _decode_secret_params,
        _encode_secret_params,
        _resolve_secret_params,
    )

    InMemoryVaultSecrets.clear()
    InMemoryVaultSecrets(vault="v", key="tok", secret="T").set()
    raw = {
        "plain": 1,
        "options": {
            "token": {
                "pipeline_secret": {
                    "type": "InMemoryVaultSecrets",
                    "vault": "v",
                    "key": "tok",
                }
            },
            "keep": "x",
        },
    }
    decoded, found = _decode_secret_params(raw)
    assert found
    assert isinstance(decoded["options"]["token"], PipelineSecret)
    resolved = _resolve_secret_params(decoded)
    assert resolved == {"plain": 1, "options": {"token": "T", "keep": "x"}}
    assert _encode_secret_params(decoded) == raw
    InMemoryVaultSecrets.clear()
