"""Secret providers + the ``PipelineSecret`` parameter marker (reference
``pipelines/secrets/interfaces.py:19``, ``secrets/models.py:22``,
``secrets/hashicorp_vault.py:21``, ``secrets/azure_key_vault.py``,
``secrets/databricks.py:17``).

The reference lets any ``component_parameters`` value in a pipeline-job JSON
be a ``{"pipeline_secret": {"type", "vault", "key"}}`` wrapper; the executor
resolves it at run time by instantiating the named provider and calling
``get()`` (``execute/job.py:141-152``).  The same model and resolution point
are kept here, with sandbox-honest LOCAL backends as first-class providers —
environment variables, a file-based vault directory, and an in-process
vault for tests — while the cloud backends (HashiCorp Vault, Azure Key
Vault, Databricks secret scopes) keep the reference's constructor signature
but are import-gated behind their SDKs, which are absent in this
environment.

No secret VALUE ever appears in the serialized job JSON — only the
(type, vault, key) pointer round-trips, exactly as in the reference.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass
from typing import Type


class SecretsInterface:
    """get/set provider contract (reference ``secrets/interfaces.py:19``)."""

    def get(self) -> str:
        raise NotImplementedError

    def set(self) -> bool:
        raise NotImplementedError

    def system_type(self) -> str:
        return "ray-data"


@dataclass
class PipelineSecret:
    """Deferred secret pointer inside component parameters (reference
    ``secrets/models.py:22``): resolved to a string by the job executor,
    never by the converter, so converting a job JSON does not require the
    vault to be reachable."""

    type: Type[SecretsInterface]
    vault: str
    key: str

    def resolve(self) -> str:
        return self.type(vault=self.vault, key=self.key).get()

    def to_wire(self) -> dict:
        return {
            "pipeline_secret": {
                "type": self.type.__name__,
                "vault": self.vault,
                "key": self.key,
            }
        }


class EnvVarSecrets(SecretsInterface):
    """Secrets from process environment variables.

    ``vault`` is an optional prefix: the variable read/written is
    ``{VAULT}_{KEY}`` when a vault is given, else ``{KEY}`` — so one
    environment can hold several namespaced vaults."""

    def __init__(self, vault: str = "", key: str = "", secret: str | None = None):
        self.vault = vault
        self.key = key
        self.secret = secret

    def _var(self) -> str:
        return f"{self.vault}_{self.key}" if self.vault else self.key

    def get(self) -> str:
        var = self._var()
        value = os.environ.get(var)
        if value is None:
            raise KeyError(f"secret environment variable {var!r} is not set")
        return value

    def set(self) -> bool:
        if self.secret is None:
            raise ValueError("EnvVarSecrets.set() requires a secret value")
        os.environ[self._var()] = self.secret
        return True


class FileVaultSecrets(SecretsInterface):
    """Secrets as files in a directory vault: ``vault`` is the directory,
    ``key`` the file name.  ``set()`` writes atomically (temp + rename) with
    owner-only permissions; ``get()`` strips one trailing newline so
    hand-edited files behave."""

    def __init__(self, vault: str, key: str, secret: str | None = None):
        self.vault = vault
        self.key = key
        self.secret = secret

    def _path(self) -> str:
        if os.sep in self.key or (os.altsep and os.altsep in self.key):
            raise ValueError(f"secret key {self.key!r} must not contain path separators")
        return os.path.join(self.vault, self.key)

    def get(self) -> str:
        path = self._path()
        try:
            with open(path, "r", encoding="utf-8") as f:
                value = f.read()
        except FileNotFoundError:
            raise KeyError(f"secret {self.key!r} not found in vault {self.vault!r}")
        return value[:-1] if value.endswith("\n") else value

    def set(self) -> bool:
        if self.secret is None:
            raise ValueError("FileVaultSecrets.set() requires a secret value")
        os.makedirs(self.vault, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.vault, prefix=f".{self.key}.")
        try:
            os.write(fd, self.secret.encode("utf-8"))
            os.fsync(fd)
        finally:
            os.close(fd)
        os.chmod(tmp, 0o600)
        os.replace(tmp, self._path())
        return True


class InMemoryVaultSecrets(SecretsInterface):
    """Process-local vaults for tests and wiring checks: a class-level
    ``{vault: {key: secret}}`` store, no I/O."""

    _stores: dict[str, dict[str, str]] = {}

    def __init__(self, vault: str, key: str, secret: str | None = None):
        self.vault = vault
        self.key = key
        self.secret = secret

    def get(self) -> str:
        try:
            return self._stores[self.vault][self.key]
        except KeyError:
            raise KeyError(f"secret {self.key!r} not found in vault {self.vault!r}")

    def set(self) -> bool:
        if self.secret is None:
            raise ValueError("InMemoryVaultSecrets.set() requires a secret value")
        self._stores.setdefault(self.vault, {})[self.key] = self.secret
        return True

    @classmethod
    def clear(cls) -> None:
        cls._stores.clear()


class HashiCorpVaultSecrets(SecretsInterface):
    """HashiCorp Vault KV provider (reference ``hashicorp_vault.py:21``):
    same constructor signature; requires the ``hvac`` SDK, absent here."""

    def __init__(
        self,
        vault: str,
        key: str,
        secret: str | None = None,
        credential: str | None = None,
        kwargs: dict | None = None,
    ):
        try:
            import hvac  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "HashiCorpVaultSecrets requires the 'hvac' package (not "
                "installed in this environment); use EnvVarSecrets or "
                "FileVaultSecrets locally"
            ) from e
        self.client = hvac.Client(url=vault, token=credential, **(kwargs or {}))
        self.key = key
        self.secret = secret

    def get(self) -> str:
        response = self.client.secrets.kv.read_secret_version(path=self.key)
        return response["data"]["data"]["password"]

    def set(self) -> bool:
        self.client.secrets.kv.v2.create_or_update_secret(
            path=self.key, secret={"password": self.secret}
        )
        return True


class AzureKeyVaultSecrets(SecretsInterface):
    """Azure Key Vault provider (reference ``azure_key_vault.py``): same
    constructor signature; requires the Azure SDKs, absent here."""

    def __init__(
        self,
        vault: str,
        key: str,
        secret: str | None = None,
        credential=None,
        kwargs: dict | None = None,
    ):
        try:
            from azure.keyvault.secrets import SecretClient  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "AzureKeyVaultSecrets requires 'azure-keyvault-secrets' (not "
                "installed in this environment); use EnvVarSecrets or "
                "FileVaultSecrets locally"
            ) from e
        self.client = SecretClient(
            vault_url=vault, credential=credential, **(kwargs or {})
        )
        self.key = key
        self.secret = secret

    def get(self) -> str:
        return self.client.get_secret(self.key).value

    def set(self) -> bool:
        self.client.set_secret(self.key, self.secret)
        return True


class DatabricksSecrets(SecretsInterface):
    """Databricks secret-scope provider (reference ``databricks.py:17``):
    read-only in the reference too; requires a Databricks runtime."""

    def __init__(self, vault: str, key: str, secret: str | None = None):
        raise ImportError(
            "DatabricksSecrets requires a Databricks runtime (dbutils), "
            "unavailable in this environment; use EnvVarSecrets or "
            "FileVaultSecrets locally"
        )


SECRET_PROVIDERS: dict[str, Type[SecretsInterface]] = {
    cls.__name__: cls
    for cls in (
        EnvVarSecrets,
        FileVaultSecrets,
        InMemoryVaultSecrets,
        HashiCorpVaultSecrets,
        AzureKeyVaultSecrets,
        DatabricksSecrets,
    )
}


__all__ = [
    "SecretsInterface",
    "PipelineSecret",
    "EnvVarSecrets",
    "FileVaultSecrets",
    "InMemoryVaultSecrets",
    "HashiCorpVaultSecrets",
    "AzureKeyVaultSecrets",
    "DatabricksSecrets",
    "SECRET_PROVIDERS",
]
