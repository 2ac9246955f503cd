"""Reusable Column-expression helpers — the engine's "functions" surface.

Everything here is a pure pyspark.sql.functions composition (JVM-side,
whole-stage-codegen friendly); none of it forces a Python UDF. These are
the column-level contracts the reference implements imperatively:

- content_hash / point_id: content-addressed identity
  (/root/reference/src/code_indexer/services/file_chunking_manager.py:376-387);
- identifiers: the FTS identifiers side channel
  (services/smart_indexer.py:1309 — ``text.split()``);
- norm_surface: alias normalization (mirror of kernel.nlp.
  normalize_surface — lowercase alnum runs joined by single spaces);
- rrf_term: the reciprocal-rank-fusion summand, RRF_K=60
  (services/query_strategy.py:48,130-173);
- snippet: N-char context window around the first match
  (services/tantivy_index_manager.py:1133-1186).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

RRF_K = 60


def content_hash(text: Column | str) -> Column:
    """sha256 of the chunk text (file_chunking_manager.py:386-387)."""
    return F.sha2(F.col(text) if isinstance(text, str) else text, 256)


def point_id(url: Column | str, chash: Column | str,
             chunk_index: Column | str) -> Column:
    """md5(url + content_hash + chunk_index) (:376-380)."""
    cols = [F.col(c) if isinstance(c, str) else c
            for c in (url, chash, chunk_index)]
    return F.md5(F.concat_ws("_", *cols))


def triple_id(subj: Column | str, pred: Column | str, obj: Column | str,
              src_url: Column | str) -> Column:
    """Content-addressed triple identity — the MERGE idempotency key."""
    cols = [F.col(c) if isinstance(c, str) else c
            for c in (subj, pred, obj, src_url)]
    return F.sha2(F.concat_ws("|", *cols), 256)


def identifiers(text: Column | str) -> Column:
    """Whitespace token array (smart_indexer.py:1309), empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def norm_surface(s: Column | str) -> Column:
    """Lowercase, collapse non-alnum runs to single spaces, trim — the
    Column twin of kernel.nlp.normalize_surface (alias join key)."""
    c = F.col(s) if isinstance(s, str) else s
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def rrf_term(rank: Column | str, k: int = RRF_K) -> Column:
    """1 / (k + rank); sum per key across providers = RRF score."""
    c = F.col(rank) if isinstance(rank, str) else rank
    return F.lit(1.0) / (F.lit(k) + c)


def snippet(text: Column | str, needle: str, before: int = 30,
            width: int = 65, ci: bool = False) -> Column:
    """Context window around the first occurrence of ``needle``;
    NULL when absent. 1-based substr like the reference's line slice.
    ``ci=True`` locates the needle case-insensitively (position found
    on the lowercased haystack, snippet cut from the ORIGINAL text) —
    a case-insensitive search that displays snippets must use this, or
    rows matched via lower() would get a NULL snippet. Caveat: for the
    rare Unicode chars whose lowercase form changes string LENGTH
    ('İ' -> 'i̇', ligatures), the lowered-haystack offset drifts from
    the original, so the window may be cut a few chars off; exact for
    ASCII-ish corpora."""
    c = F.col(text) if isinstance(text, str) else text
    pos = (F.instr(F.lower(c), needle.lower()) if ci
           else F.instr(c, needle))
    return F.when(
        pos > 0, F.substring(c, F.greatest(pos - before, F.lit(1)), width)
    )


def markdown_image_refs(text: Column | str) -> Column:
    """P4 markdown image refs as a JVM-side expression: every
    ``![alt](src)`` capture, trimmed, leading '/' and './' runs
    stripped (site-root-relative / same-dir-relative), refs that
    normalize to EMPTY dropped alongside remote http(s) URLs — the
    Column twin of kernel.extract.extract_markdown_images (which
    additionally walks INTERIOR '.'/'..' segments; such refs are rare
    and handled on the Python extract path).
    Reference: image_extractor.py:162-210."""
    c = F.col(text) if isinstance(text, str) else text
    refs = F.regexp_extract_all(c, F.lit(r"!\[[^\]]*\]\(([^)]+)\)"), 1)
    cleaned = F.transform(
        refs, lambda s: F.regexp_replace(F.trim(s), r"^(\./|/)+", ""))
    return F.filter(
        cleaned,
        lambda s: (s != "")
        & ~s.startswith("http://") & ~s.startswith("https://"),
    )


def canonical_url(url: Column | str) -> Column:
    """URL canonicalization for crawl dedup, all JVM-side regex — the
    standard normalizations that make syntactically-different URLs of
    the same resource compare equal:

    1. fragment stripped (``#...`` never reaches the server);
    2. scheme + authority lowercased (RFC 3986 §6.2.2.1 — case is only
       significant in path/query);
    3. default ports dropped SCHEME-AWARE: ``:80`` only under
       ``http://``, ``:443`` only under ``https://`` —
       ``http://h:443/x`` names a real non-default-port resource and
       must NOT collapse onto ``http://h/x``;
    4. tracking query params removed (``utm_*``, ``fbclid``,
       ``gclid``) — applied to the QUERY STRING ONLY (everything from
       the first ``?``; a later literal ``?`` is part of a value), and
       each match anchored on its separator: ``&trk=v`` anywhere, or
       ``^?trk=v`` at the very start of the query. So a param merely
       *containing* a tracking name (``?xfbclid=1``), a tracking-shaped
       VALUE (``?r=utm_x=1&y=2``), and an embedded ``?utm_x=`` inside a
       value (``?x=?utm_b=2&y=3`` — ``?`` is legal in query values) are
       never touched, and a path segment containing ``&utm_`` is out of
       scope entirely; separator tidy-up so ``?a&`` shapes cannot
       survive;
    5. trailing path ``/`` dropped.

    Regex-only by design (portable to the SQL oracle verbatim; no
    backreferences — Spark `$1` vs DuckDB `\\1` syntax differs), which
    is why step 4 is a three-pass separator-anchored strip instead of a
    single backreferencing rewrite: (a) drop every ``&trk=v`` (the
    separator is consumed with the param, so following params keep
    their ``&``); after (a) at most the FIRST param can still be a
    tracker, so (b) rewrite ``^?trk=v&`` -> ``?`` and (c) drop a lone
    ``^?trk=v$``. The ``^`` anchors on (b)/(c) also make them
    single-match by construction — identical semantics on engines that
    differ in replace-all defaults (Spark replaces all, DuckDB only
    with 'g'). A full RFC parser would additionally sort params and
    decode %-escapes.
    """
    trk = r"(utm_[a-z]+|fbclid|gclid)"
    c = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(c, r"#.*$", "")                  # 1
    prefix = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    rest = F.substring(c, F.length(prefix) + 1, 1 << 30)
    prefix = F.lower(prefix)                              # 2
    prefix = (                                            # 3
        F.when(prefix.startswith("http://"),
               F.regexp_replace(prefix, r":80$", ""))
        .when(prefix.startswith("https://"),
              F.regexp_replace(prefix, r":443$", ""))
        .otherwise(prefix)
    )
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    query = F.substring(rest, F.length(path) + 1, 1 << 30)
    query = F.regexp_replace(query, "&" + trk + r"=[^&#]*", "")      # 4a
    query = F.regexp_replace(query, r"^\?" + trk + r"=[^&#]*&", "?")  # 4b
    query = F.regexp_replace(query, r"^\?" + trk + r"=[^&#]*$", "")   # 4c
    path = F.regexp_replace(path, r"/$", "")              # 5
    return F.concat(prefix, path, query)
