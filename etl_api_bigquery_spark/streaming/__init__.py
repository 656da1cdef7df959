from .runner import CdcStreamRunner

__all__ = ["CdcStreamRunner"]
