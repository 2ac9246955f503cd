"""Golden-file extraction suite — the byte-identical invariant
(north rule: "byte-identical extracted text per url").

pages.text was written by the fixture generator using
kernel.extract.extract_text at generation time; these tests re-extract
from the stored html bytes (plain Python AND through the Spark Arrow
UDF) and require exact equality, plus pinned edge-case behavior for the
encoding cascade and image filtering."""

import pyarrow.parquet as pq
import pytest

from code_indexer_spark.kernel.extract import (
    decode_bytes, extract_page, extract_text, validate_image)


@pytest.fixture(scope="module")
def pages(kg_small):
    return pq.read_table(f"{kg_small}/pages.parquet").to_pylist()


def test_byte_identical_plain_python(pages):
    for r in pages:
        assert extract_text(r["html"]) == r["text"], r["url"]


def test_byte_identical_in_spark(spark, kg_small):
    import pyspark.sql.functions as F

    from code_indexer_spark.operators.extract import extract_stage

    df = extract_stage(spark.read.parquet(f"{kg_small}/pages.parquet"))
    assert df.filter(F.col("text") != F.col("text_extracted")).count() == 0


def test_encoding_cascade_order():
    # utf-8 wins when valid
    assert decode_bytes("café".encode("utf-8")) == "café"
    # invalid utf-8 falls through to latin-1 (cp1252 unreachable — quirk
    # parity with fixed_size_chunker.py:264-277)
    raw = "café €".encode("cp1252")
    out = decode_bytes(raw)
    assert out == raw.decode("latin-1")
    assert "\x80" in out  # € (cp1252 0x80) -> U+0080 via latin-1


def test_script_style_dropped_entities_unescaped():
    html = (b"<html><head><style>p{}</style><script>x&amp;y</script></head>"
            b"<body><p>a &amp; b</p></body></html>")
    assert extract_text(html) == "a & b"


def test_block_tags_newlines_and_strip():
    html = b"<h1> Title </h1><p>one</p><p>two</p><br>three"
    assert extract_text(html) == "Title\none\ntwo\nthree"


def test_img_extraction_filters():
    html = (b'<img src="a/logo.png"><img src="https://x/y.png">'
            b'<img src="data:image/png;base64,xx"><img src="/rooted/i.jpg">'
            b'<img src="../escape/z.png"><img src="b/../c/pic.gif">')
    _, images = extract_page(html)
    assert images == ["a/logo.png", "rooted/i.jpg", "c/pic.gif"]


def test_img_first_src_only():
    html = b'<img data-src="no.png" src="yes.png" src="dup.png">'
    _, images = extract_page(html)
    assert images == ["yes.png"]


def test_validate_image_format():
    assert validate_image("a/b.PNG") == (True, None)
    assert validate_image("a/b.svg") == (False, "unsupported_format")
    assert validate_image("noext") == (False, "unsupported_format")


def test_markdown_image_extraction():
    """P4 (ref image_extractor.py:162-210): ![alt](src) capture,
    http(s) filter, root-boundary resolution shared with the HTML path."""
    from code_indexer_spark.kernel.extract import extract_markdown_images

    md = ("intro ![logo](assets/logo.png) text\n"
          "![remote](https://cdn.example.com/r.jpg) keep going\n"
          "![alt with words]( /rooted/pic.webp ) and "
          "![dots](b/../c/pic.gif) plus ![escape](../up/z.png)\n"
          "not an image [link](other.md) ![](empty-alt.jpeg)")
    assert extract_markdown_images(md) == [
        "assets/logo.png", "rooted/pic.webp", "c/pic.gif",
        "empty-alt.jpeg"]
    assert extract_markdown_images("") == []
    assert extract_markdown_images("no images here") == []
