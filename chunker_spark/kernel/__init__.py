from .chunker import KIB, MIB, Chunk, ChunkerParams, chunk_list, chunk_spans
from .polynomials import DEFAULT_POL
from .vectorized import chunk_buffer

__all__ = [
    "KIB",
    "MIB",
    "Chunk",
    "ChunkerParams",
    "chunk_list",
    "chunk_spans",
    "chunk_buffer",
    "DEFAULT_POL",
]
