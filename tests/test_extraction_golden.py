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


# ---- fast-scanner differential: _fast_scan == html.parser or fallback ----

_ADVERSARIAL = [
    '<p>a &amp; b</p>', '<p>a &ampx b</p>', '<p>&#65;&#x41;</p>',
    '<P>UPPER</P>', '<br/>', '<br />', '<br / >', '<img src="a.png">',
    '<img src="a.png" src="b.png">', "<img src='single.png'>",
    '<img data-src="x" src="y.png">', '<img src="a&amp;b.png">',
    '<img src>', '<script>var a = "<p>not text</p>";</script>after',
    '<script>x</script\t>tail', '<SCRIPT>y</script>z', '<script/>visible?',
    '<noscript><p>inner</p><img src="n.png"></noscript>post',
    '<template><h1>t</h1></template>', '<style>p{}</style>ok',
    '<!-- comment -->text', '<!DOCTYPE html><p>d</p>', '<?php ?>x',
    'a < b > c', '<p class="x">attr</p>', "<p class='y'>sq</p>",
    '<p\nclass="z">nl</p>', '<foo.bar>odd</foo.bar>', '</>empty',
    '<p>unclosed', '<p alt="a>b">quoted gt</p>', '<div>end with </div',
    '<script>never closed', '<p  >spaces</p  >', '<hr>',
    '<ul><li>i</li></ul>', '&amp; bare at start', 'trailing &',
    '<img src="">', '<img alt="no src">', '<span>inline</span>',
    '<img src="" src="b.png">', '<img src="" src="" src="c.png">',
    '<img src="" alt="x">', '<img src="a.png" src="">',
    '<noscript><script>s</script></noscript>after',
]


def _fast_equals_parser(html: str) -> bool:
    from code_indexer_spark.kernel.extract import _fast_scan, _parse

    fast = _fast_scan(html)
    if fast is None:  # fallback is always correct
        return True
    p = _parse(html)
    return ("".join(fast[0]), fast[1]) == ("".join(p.parts), p.img_sources)


def test_fast_scanner_adversarial():
    for case in _ADVERSARIAL:
        assert _fast_equals_parser(case), case


def test_fast_scanner_differential_fuzz():
    """Property: on ANY input the fast scanner either matches the
    stdlib parser exactly or falls back to it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frags = st.sampled_from([
        "<p>", "</p>", "<div>", "</div>", "<br/>", "<br / >", "<hr>",
        "<script>", "</script>", "<script/>", "<style>", "</style>",
        "<noscript>", "</noscript>", '<img src="a.png">',
        "<img src='b.png'>", '<img src="x&amp;y.png">', "<!-- c -->",
        "<!DOCTYPE html>", "<?pi?>", "text", "a & b", "&amp;", "&ampx",
        "&#65;", "&#x41;", "<", ">", '"', "'", "/", "\n", "\t", " ",
        "é", "<TaG>", "</ p >", "<p class=\"k\">", "<p a=b>", "words",
    ])

    @settings(max_examples=400, deadline=None)
    @given(st.lists(frags, min_size=0, max_size=12))
    def prop(parts):
        html = "".join(parts)
        assert _fast_equals_parser(html), repr(html)

    prop()


def test_fast_scanner_takes_fixture_pages(spark, kg_small):
    """The scanner must actually HANDLE the corpus (zero fallbacks) and
    equal the parser page-for-page — otherwise it's dead weight."""
    from code_indexer_spark.kernel.extract import (
        _fast_scan, _parse, decode_bytes)

    rows = spark.read.parquet(f"{kg_small}/pages.parquet") \
        .select("html").collect()
    assert len(rows) > 0
    for r in rows:
        html = decode_bytes(r.html)
        fast = _fast_scan(html)
        assert fast is not None
        p = _parse(html)
        assert ("".join(fast[0]), fast[1]) == ("".join(p.parts),
                                               p.img_sources)
