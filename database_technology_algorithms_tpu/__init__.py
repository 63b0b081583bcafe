"""database_technology_algorithms_tpu — a TPU-native vectorized query engine.

A from-scratch JAX/XLA/Pallas re-imagining of the external-memory database
operator suite in syfantid/Database-Technology-Algorithms (reference mounted
at /root/reference; structural analysis in SURVEY.md).  The reference's
row-struct block files, qsort+minheap external sort, STL hash-map join and
streamed dedup become: columnar SoA record batches in HBM, vectorized
total-order sorts (XLA sort network + Pallas LSD radix kernels), a bucketed
hash / sorted-intersection join family, masked filter/aggregate kernels, and
a hash-partitioned all-to-all shuffle over a device mesh.

Public API surface mirrors the reference's four operators (dbtproj.h:55-96):

    MergeSort            -> ops.sort.sort_batch / external.external_sort
    EliminateDuplicates  -> ops.distinct.distinct
    MergeJoin            -> ops.merge_join.merge_join
    HashJoin             -> ops.hash_join.hash_join
    (valid-flag filter)  -> ops.filter.filter_batch

plus models.pipeline.QueryPipeline, the composed sort→distinct→join→aggregate
plan the reference's driver runs (main.cpp:109-123).
"""

from .batch import (
    FIELD_NUM,
    FIELD_NUMSTR,
    FIELD_RECID,
    FIELD_STR,
    MAX_RECORDS_PER_BLOCK,
    STR_LENGTH,
    STR_PAD,
    RecordBatch,
    canonical_field,
)
from .config import DEFAULT_CONFIG, EngineConfig
from .metrics import OperatorStats

__version__ = "0.1.0"

__all__ = [
    "RecordBatch",
    "EngineConfig",
    "DEFAULT_CONFIG",
    "OperatorStats",
    "canonical_field",
    "FIELD_RECID",
    "FIELD_NUM",
    "FIELD_STR",
    "FIELD_NUMSTR",
    "STR_LENGTH",
    "STR_PAD",
    "MAX_RECORDS_PER_BLOCK",
]
