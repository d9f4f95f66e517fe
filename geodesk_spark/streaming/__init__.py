"""Batch-incremental processing: stage checkpoints, resume, lineage.

The reference has no streaming; its double-snapshot MVCC store
(common/store/FreeStore.java:30-61) maps to snapshot-isolated stage
checkpoints here (SURVEY.md §2.7).
"""
