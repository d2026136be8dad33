from .pcdm_merge import PCDMMergeSink

__all__ = ["PCDMMergeSink"]
