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


# ---------------------------------------------------------------------------
# P2: legacy "smart" line-aware chunker — exact semantics of the
# reference's simplified splitter (indexing/chunker.py:21-126
# _smart_split_with_lines / _split_oversized_line, :715-837 chunk_text
# incl. the MIN_CHUNK_SIZE merge pass :773-814, :906-939 _is_fragment).
# The reference deprecated this path in favor of the fixed-size chunker,
# but it remains callable; this is the faithful re-implementation (the
# language-specific _is_good_break_point heuristics of :156-307 belong
# to the pre-simplification splitter and are not invoked by this path).
# ---------------------------------------------------------------------------

_OVERSIZED_BREAK_CHARS = [" ", ",", ";", "|", '"', "'", "}", "]", ")", ">"]
MIN_SMART_CHUNK = 100

_FRAGMENT_PATTERNS = None


def _is_fragment(text: str) -> bool:
    """chunker.py:906-939: tiny chunks with no meaningful content."""
    global _FRAGMENT_PATTERNS
    import re

    if _FRAGMENT_PATTERNS is None:
        _FRAGMENT_PATTERNS = [re.compile(p) for p in (
            r'^"""$', r"^'''$", r"^def$", r"^class$", r"^async def$",
            r"^def \w+$", r"^class \w+$",
        )]
    text = text.strip()
    if text.startswith("// File:"):
        parts = text.split("\n", 1)
        if len(parts) > 1:
            text = parts[1].strip()
        else:
            return True
    for pat in _FRAGMENT_PATTERNS:
        if pat.match(text):
            return True
    if len(text) < 20 and not any(
        ch in text for ch in ["{", "}", "(", ")", "=", ":", ";"]
    ):
        return True
    return False


def _split_oversized_line(line: str, line_number: int,
                          chunk_size: int) -> list[dict[str, Any]]:
    """chunker.py:96-126: window the line; prefer the FIRST break char
    (in list order) whose last occurrence lands past 80% of the window."""
    chunks: list[dict[str, Any]] = []
    start = 0
    while start < len(line):
        end = start + chunk_size
        if end >= len(line):
            piece = line[start:]
        else:
            piece = line[start:end]
            for break_char in _OVERSIZED_BREAK_CHARS:
                last_break = piece.rfind(break_char)
                if last_break > chunk_size * 0.8:
                    piece = line[start:start + last_break + 1]
                    break
        chunks.append({"text": piece, "line_start": line_number,
                       "line_end": line_number})
        start += len(piece)
    return chunks


def smart_chunk_text(
    text: str, chunk_size: int = DEFAULT_CHUNK_SIZE
) -> list[dict[str, Any]]:
    """P2 legacy chunker: greedy line packing (line cost = len+1), no
    overlap, oversized-line windowing, trailing-newline rule, then the
    fragment merge pass. Every emitted chunk is <= chunk_size by
    construction (packing accounts the joining newlines), so the
    reference's fallback re-split branch (:761-770) is unreachable here."""
    if not text or not text.strip():
        return []
    text_lines = text.splitlines()

    chunk_data: list[dict[str, Any]] = []
    i = 0
    n = len(text_lines)
    while i < n:
        start_line = i + 1
        size = 0
        lines: list[str] = []
        j = i
        while j < n:
            line = text_lines[j]
            line_size = len(line) + 1
            if size + line_size > chunk_size and lines:
                break
            lines.append(line)
            size += line_size
            j += 1
        if not lines:
            line = text_lines[i]
            if len(line) > chunk_size:
                chunk_data.extend(
                    _split_oversized_line(line, i + 1, chunk_size))
                i += 1
                continue
            lines = [line]
        end_line = start_line + len(lines) - 1
        piece = "\n".join(lines)
        if end_line < n or text.endswith("\n"):
            piece += "\n"
        chunk_data.append({"text": piece, "line_start": start_line,
                           "line_end": end_line})
        i += len(lines)

    # merge pass (chunker.py:773-814) — mutates the NEXT element when
    # merging forward, exactly like the reference loop
    filtered: list[dict[str, Any]] = []
    for k, info in enumerate(chunk_data):
        stripped = info["text"].strip()
        if not stripped:
            continue
        if len(stripped) < MIN_SMART_CHUNK:
            if (filtered
                    and len(filtered[-1]["text"] + "\n" + stripped)
                    <= chunk_size
                    and info["line_start"] > filtered[-1]["line_end"]):
                filtered[-1]["text"] = filtered[-1]["text"] + "\n" + stripped
                filtered[-1]["line_end"] = info["line_end"]
                continue
            elif (k + 1 < len(chunk_data)
                  and len(stripped + "\n" + chunk_data[k + 1]["text"].strip())
                  <= chunk_size):
                nxt = chunk_data[k + 1]
                nxt["text"] = stripped + "\n" + nxt["text"]
                nxt["line_start"] = info["line_start"]
                continue
            elif not _is_fragment(stripped):
                filtered.append(info)
            # else: drop the fragment
        else:
            filtered.append(info)

    return [
        {
            "text": c["text"],
            "chunk_index": idx,
            "total_chunks": len(filtered),
            "size": len(c["text"]),
            "line_start": c["line_start"],
            "line_end": c["line_end"],
        }
        for idx, c in enumerate(filtered)
    ]
