from .table import CommitConflictError, FileEntry, LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot", "FileEntry", "CommitConflictError"]
