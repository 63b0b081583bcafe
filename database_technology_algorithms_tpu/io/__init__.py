"""Storage layer: reference block-file codec + deterministic generators."""

from .blockfile import BLOCK_SIZE, RECORD_SIZE, read_blockfile, write_blockfile
from .generator import generate_batch, generate_columns, generate_pair_files

__all__ = [
    "read_blockfile",
    "write_blockfile",
    "generate_batch",
    "generate_columns",
    "generate_pair_files",
    "BLOCK_SIZE",
    "RECORD_SIZE",
]
