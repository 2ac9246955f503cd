"""Determinism-pinning chunker tests — mirrors the reference's own
boundary pins (tests/unit/chunking/test_fixed_size_chunker.py:18-97):
exact 1000-char windows, exactly 150-char overlap, next_start = +850,
remainder last chunk, line-number math."""

from code_indexer_spark.kernel.chunker import chunk_params, chunk_text, num_chunks


def test_params():
    assert chunk_params(1000) == (150, 850)
    assert chunk_params(200) == (30, 170)


def test_empty_and_whitespace():
    assert chunk_text("") == []
    assert chunk_text("   \n  ") == []


def test_single_chunk_exact_boundary():
    text = "a" * 1000
    chunks = chunk_text(text)
    assert len(chunks) == 1
    assert chunks[0]["text"] == text
    assert chunks[0]["size"] == 1000
    assert chunks[0]["total_chunks"] == 1


def test_two_chunk_windows_and_overlap():
    text = "".join(chr(ord("a") + (i % 26)) for i in range(1700))
    chunks = chunk_text(text)
    assert len(chunks) == 2
    assert chunks[0]["text"] == text[0:1000]
    # second window starts at step=850 — 150 chars of exact overlap
    assert chunks[1]["text"] == text[850:1700]
    assert chunks[0]["text"][850:] == chunks[1]["text"][:150]
    assert all(c["total_chunks"] == 2 for c in chunks)


def test_remainder_last_chunk():
    text = "x" * 2000
    chunks = chunk_text(text)
    # starts: 0, 850, 1700 -> last is the 300-char remainder
    assert [c["size"] for c in chunks] == [1000, 1000, 300]
    assert chunks[2]["text"] == text[1700:]


def test_line_numbers_one_based():
    text = ("line\n" * 400).rstrip("\n")  # 1999 chars, 400 lines
    chunks = chunk_text(text)
    assert chunks[0]["line_start"] == 1
    # 1000 chars = 200 full 5-char lines; the window ends exactly after
    # the 200th newline, so line_end = count('\n')+1 = 201 (reference
    # _calculate_line_numbers semantics, fixed_size_chunker.py:147-157)
    assert chunks[0]["line_end"] == 201
    # start 850 = 170 newlines before -> line 171
    assert chunks[1]["line_start"] == 171


def test_num_chunks_closed_form():
    for n in [0, 1, 199, 200, 201, 369, 370, 371, 540, 1000, 5000]:
        expect = len(chunk_text("x" * n, 200)) if n else 0
        assert num_chunks(n, 200) == expect, n
