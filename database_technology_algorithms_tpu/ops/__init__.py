"""Operator kernels: sort, distinct, joins, filter, aggregate, radix/hash paths."""

from .aggregate import group_aggregate
from .distinct import distinct, distinct_sorted
from .filter import compact, filter_batch, truncate
from .hash_join import hash_join, hash_join_count
from .keys import key_hash, key_words
from .merge_join import join_sorted_distinct, merge_join
from .sort import is_sorted, sort_batch, sort_perm

__all__ = [
    "sort_batch",
    "sort_perm",
    "is_sorted",
    "distinct",
    "distinct_sorted",
    "merge_join",
    "join_sorted_distinct",
    "hash_join",
    "hash_join_count",
    "filter_batch",
    "compact",
    "truncate",
    "group_aggregate",
    "key_words",
    "key_hash",
]
