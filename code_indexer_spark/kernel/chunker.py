"""Fixed-size sliding-window chunker — exact reference semantics.

Pins the algorithm of
``/root/reference/src/code_indexer/indexing/fixed_size_chunker.py:159-238``
(``chunk_text``) and ``:134-157`` (``_calculate_line_numbers``):

- ``chunk_size`` default 1000 chars, ``overlap = int(0.15 * chunk_size)``
  = 150, ``step = chunk_size - overlap`` = 850 (``:48-49,82-83``).
- windows are ``text[start : start + chunk_size]``; the last chunk is the
  remainder; iteration stops as soon as a window reaches the end.
- line numbers are 1-based: ``line_start = text[:start].count('\n') + 1``,
  ``line_end`` counted up to the chunk's actual end.
- empty / whitespace-only text yields no chunks (``:175-176``).

The reference's own unit tests pin these boundaries
(``tests/unit/chunking/test_fixed_size_chunker.py:18-97``); ours mirror
them in tests/test_chunker.py.
"""

from __future__ import annotations

from typing import Any

DEFAULT_CHUNK_SIZE = 1000
OVERLAP_PERCENTAGE = 0.15


def chunk_params(chunk_size: int = DEFAULT_CHUNK_SIZE) -> tuple[int, int]:
    """(overlap, step) for a chunk size, per the reference formula."""
    overlap = int(chunk_size * OVERLAP_PERCENTAGE)
    return overlap, chunk_size - overlap


def num_chunks(text_len: int, chunk_size: int = DEFAULT_CHUNK_SIZE) -> int:
    """Closed form for the number of windows the loop below emits."""
    if text_len == 0:
        return 0
    _, step = chunk_params(chunk_size)
    if text_len <= chunk_size:
        return 1
    return (text_len - chunk_size - 1) // step + 2


def chunk_text(
    text: str, chunk_size: int = DEFAULT_CHUNK_SIZE
) -> list[dict[str, Any]]:
    """Split text into fixed windows; returns the reference chunk dicts
    minus file-path fields (a row's identity is (url, chunk_index) here)."""
    if not text or not text.strip():
        return []

    _, step = chunk_params(chunk_size)
    chunks: list[dict[str, Any]] = []
    start = 0
    idx = 0
    n = len(text)
    while start < n:
        end = start + chunk_size
        piece = text[start:] if end >= n else text[start:end]
        actual_end = start + len(piece)
        line_start = text[:start].count("\n") + 1
        line_end = text[:actual_end].count("\n") + 1
        chunks.append(
            {
                "text": piece,
                "chunk_index": idx,
                "total_chunks": 0,
                "size": len(piece),
                "line_start": line_start,
                "line_end": line_end,
            }
        )
        if end >= n:
            break
        start += step
        idx += 1

    total = len(chunks)
    for c in chunks:
        c["total_chunks"] = total
    return chunks
