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


# ---- P2 legacy smart chunker (chunker.py:21-126,773-814,906-939) ----

def test_smart_greedy_line_packing_and_newline_rule():
    from code_indexer_spark.kernel.chunker import smart_chunk_text

    # chunk_size 240: lines cost len+1; two 110-char lines (222) pack,
    # the third (110+1 more) starts the next chunk
    l1, l2, l3 = "a" * 110, "b" * 110, "c" * 110
    text = "\n".join([l1, l2, l3])
    got = smart_chunk_text(text, chunk_size=240)
    assert [c["text"] for c in got] == [l1 + "\n" + l2 + "\n", l3]
    assert [(c["line_start"], c["line_end"]) for c in got] == [(1, 2), (3, 3)]
    # trailing newline on the non-final chunk only (text has no final \n)
    assert got[0]["text"].endswith("\n") and not got[1]["text"].endswith("\n")
    # sub-MIN_CHUNK content with no structure chars is fragment-dropped
    # entirely at tiny chunk sizes (MIN_SMART_CHUNK=100 is absolute)
    assert smart_chunk_text("aaaaaaaaaa\nbbbbbbbb", chunk_size=20) == []


def test_smart_oversized_line_break_chars():
    from code_indexer_spark.kernel.chunker import _split_oversized_line

    # 30-char window; space at pos 25 (> 0.8*30=24) -> break after it
    line = "x" * 25 + " " + "y" * 20
    got = _split_oversized_line(line, 5, 30)
    assert got[0]["text"] == "x" * 25 + " "
    assert got[1]["text"] == "y" * 20
    assert all(c["line_start"] == c["line_end"] == 5 for c in got)
    # break-char preference is LIST ORDER, not rightmost position:
    # space at 25, comma at 27 -> space wins even though comma is later
    line2 = "x" * 25 + " " + "z" + "," + "w" * 20
    got2 = _split_oversized_line(line2, 1, 30)
    assert got2[0]["text"] == "x" * 25 + " "


def test_smart_fragment_merge_prev_and_next():
    from code_indexer_spark.kernel.chunker import smart_chunk_text

    # genuinely separate chunks: greedy accounting (len+1 each) keeps
    # the whitespace-padded tiny line out of the big chunk (101+11>110),
    # but the STRIPPED merge fits (102+5 <= 110) -> merged into prev
    big = "A" * 100
    text = big + "\n" + "  x = 1   "
    got = smart_chunk_text(text, chunk_size=110)
    assert len(got) == 1
    assert got[0]["text"] == big + "\n" + "\n" + "x = 1"
    assert got[0]["line_end"] == 2

    # tiny FIRST chunk (own chunk because line2 doesn't fit greedily:
    # 11+101>110) merges forward into the next chunk (5+1+100 <= 110)
    text2 = "  s = 1   " + "\n" + "B" * 100
    got2 = smart_chunk_text(text2, chunk_size=110)
    assert len(got2) == 1
    assert got2[0]["text"] == "s = 1\n" + "B" * 100
    assert got2[0]["line_start"] == 1 and got2[0]["line_end"] == 2


def test_smart_fragment_drop_and_keep():
    from code_indexer_spark.kernel.chunker import _is_fragment

    assert _is_fragment('"""')
    assert _is_fragment("def")
    assert _is_fragment("def foo")
    assert _is_fragment("short text")          # <20 chars, no structure
    assert not _is_fragment("x = compute(1, 2)")  # has structure
    assert not _is_fragment("a reasonably long sentence here")


def test_smart_empty_and_whitespace():
    from code_indexer_spark.kernel.chunker import smart_chunk_text

    assert smart_chunk_text("", 100) == []
    assert smart_chunk_text("   \n  \n", 100) == []


def test_smart_chunks_bounded_and_indexed():
    from code_indexer_spark.kernel.chunker import smart_chunk_text

    text = "\n".join(f"line {i} " + "w" * (i % 37) for i in range(200))
    got = smart_chunk_text(text, chunk_size=120)
    assert all(c["size"] <= 120 for c in got)
    assert [c["chunk_index"] for c in got] == list(range(len(got)))
    assert all(c["total_chunks"] == len(got) for c in got)
    # line ranges are monotone and within the file
    for a, b in zip(got, got[1:]):
        assert b["line_start"] >= a["line_start"]
    assert got[-1]["line_end"] <= 200


def test_chunk_smart_golden_parquet_fresh():
    """The committed golden parquet that backs oracle_sql('chunk_smart')
    must equal what the current kernel produces — a kernel semantics
    change must fail HERE (fast), not as a driver oracle mismatch.
    Regenerates sf0.001 in-memory via the same generator code path."""
    import pyarrow.parquet as pq

    from tools.gen_chunk_goldens import golden_rows

    got = golden_rows("/root/testdata/sf0.001/documents.parquet")
    committed = pq.read_table(
        "/root/repo/data/goldens/chunk_smart/sf0.001.parquet").to_pydict()
    assert got == committed, (
        "kernel output diverged from committed golden — rerun "
        "tools/gen_chunk_goldens.py if the change is intentional")
