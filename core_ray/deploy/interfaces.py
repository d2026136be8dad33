"""Deploy interface (reference ``pipelines/deploy/interfaces.py``)."""

from __future__ import annotations


class DeployInterface:
    """``deploy()`` publishes the job to the target system; ``launch()``
    triggers an immediate run of the published job."""

    def deploy(self) -> bool:
        raise NotImplementedError

    def launch(self):
        raise NotImplementedError
