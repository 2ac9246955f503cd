"""Property-based tests (hypothesis) for the deterministic kernels —
SURVEY.md §5 / §7.3: the invariants that must hold for ANY input, not
just the fixtures."""

from __future__ import annotations

import fnmatch

from hypothesis import given, settings
from hypothesis import strategies as st

from code_indexer_spark.kernel.chunker import chunk_text
from code_indexer_spark.kernel.embed import embed_text
from code_indexer_spark.kernel.nlp import normalize_surface, split_sentences
from code_indexer_spark.operators.filters import glob_to_regex

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=4000)


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(min_value=10, max_value=500))
def test_chunker_windows_cover_text(text, size):
    """Chunk windows are exact substrings at the arithmetic offsets,
    cover the whole text, and the overlap is exactly int(0.15*size)."""
    chunks = chunk_text(text, size)
    if not text.strip():
        assert chunks == []
        return
    overlap = int(0.15 * size)
    step = size - overlap
    assert chunks, text
    for c in chunks:
        start = c["chunk_index"] * step
        assert c["text"] == text[start:start + size]
        assert c["size"] == len(c["text"])
    last = chunks[-1]
    assert last["chunk_index"] * step + last["size"] == len(text)
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    assert all(c["total_chunks"] == len(chunks) for c in chunks)
    # consecutive windows share exactly `overlap` characters
    for a, b in zip(chunks, chunks[1:]):
        if a["size"] == size:
            assert a["text"][step:] == b["text"][: size - step]


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_surface_idempotent(s):
    once = normalize_surface(s)
    assert normalize_surface(once) == once
    assert once == once.strip()
    assert "  " not in once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_embed_unit_norm_and_deterministic(text):
    v1 = embed_text(text)
    v2 = embed_text(text)
    assert (v1 == v2).all()
    n = float((v1.astype("float64") ** 2).sum())
    assert n == 0.0 or abs(n - 1.0) < 1e-3


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_sentences_nonempty_and_within_text(text):
    for s in split_sentences(text):
        assert s == s.strip() and s
        assert s in text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcXY/._-", max_size=20),
       st.text(alphabet="abcXY*?/", max_size=10))
def test_glob_matches_fnmatch_on_starless_paths(path, pattern):
    """For patterns without '**' and paths without '/', our glob
    semantics agree with fnmatch (the reference's PathPatternMatcher
    contract for simple names)."""
    import re

    if "/" in path or "**" in pattern or "/" in pattern:
        return
    got = re.fullmatch(glob_to_regex(pattern), path) is not None
    assert got == fnmatch.fnmatchcase(path, pattern)


@settings(max_examples=150, deadline=None)
@given(TEXT, st.integers(min_value=50, max_value=600))
def test_smart_chunker_invariants(text, size):
    """P2 legacy chunker invariants for ANY input: chunk_index/total
    consistent, line ranges monotone and within the file, every chunk's
    constituent lines exist verbatim in the source text (the merge pass
    only ever joins stripped fragments with newlines), and the run is
    deterministic."""
    from code_indexer_spark.kernel.chunker import smart_chunk_text

    got = smart_chunk_text(text, size)
    assert got == smart_chunk_text(text, size)  # deterministic
    if not text or not text.strip():
        assert got == []
        return
    n_lines = len(text.splitlines())
    src_lines = set(text.splitlines())
    prev_start = 0
    for i, c in enumerate(got):
        assert c["chunk_index"] == i
        assert c["total_chunks"] == len(got)
        assert c["size"] == len(c["text"])
        assert 1 <= c["line_start"] <= c["line_end"] <= n_lines
        assert c["line_start"] >= prev_start
        prev_start = c["line_start"]
        for ln in c["text"].split("\n"):
            if ln == "":
                continue
            # lines are verbatim source lines, oversized-line windows,
            # or stripped fragments thereof
            assert (ln in src_lines
                    or any(ln in s for s in src_lines)), ln
