"""Predicate construction (SURVEY.md §2.4): nested boolean filters,
glob matching, language expansion, ranges — the reference's filter
grammar mapped to Column expressions so Catalyst can push everything
into the scan.

Parity: _parse_filter (filesystem_vector_store.py:2176-2344) — must=AND,
should=OR(>=1), must_not=NOT, recursive; match modes value/any/contains/
text-glob; range gte/gt/lte/lt.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column


def glob_to_regex(pattern: str) -> str:
    """Glob -> anchored regex: ``**`` any path, ``*`` non-separator run,
    ``?`` one char, ``[seq]`` / ``[!seq]`` classes
    (path_pattern_matcher.py parity)."""
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            if pattern[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                seq = pattern[i + 1 : j]
                # glob negation is '!', regex negation is '^': translate
                # (copying '[!a]' verbatim INVERTS the match in regex)
                if seq.startswith("!"):
                    seq = "^" + seq[1:]
                elif seq.startswith("^"):
                    # a literal leading '^' in a glob class must not
                    # become regex negation
                    seq = "\\" + seq
                out.append("[" + seq + "]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def build_filter(spec: dict) -> Column:
    """Nested {must/should/must_not: [conditions]} -> one Column.

    Condition forms:
      {"key": k, "match": {"value": v}}        exact (F2)
      {"key": k, "match": {"any": [v...]}}     set membership (F3)
      {"key": k, "match": {"contains": s}}     case-insensitive substr (F4)
      {"key": k, "match": {"text": glob}}      glob (F5)
      {"key": k, "range": {gte/gt/lte/lt}}     range (F6)
      nested {must/should/must_not}            recursion (F1)
    Dotted keys address struct fields (F.col handles 'a.b').
    """
    def cond(c: dict) -> Column:
        if any(k in c for k in ("must", "should", "must_not")):
            return build_filter(c)
        col = F.col(c["key"])
        if "match" in c:
            m = c["match"]
            if "value" in m:
                return col == F.lit(m["value"])
            if "any" in m:
                return col.isin(list(m["any"]))
            if "contains" in m:
                return F.lower(col).contains(str(m["contains"]).lower())
            if "text" in m:
                return col.rlike(glob_to_regex(m["text"]))
        if "range" in c:
            r = c["range"]
            out = F.lit(True)
            if "gte" in r:
                out = out & (col >= F.lit(r["gte"]))
            if "gt" in r:
                out = out & (col > F.lit(r["gt"]))
            if "lte" in r:
                out = out & (col <= F.lit(r["lte"]))
            if "lt" in r:
                out = out & (col < F.lit(r["lt"]))
            return out
        raise ValueError(f"unsupported condition: {c}")

    expr = F.lit(True)
    for c in spec.get("must", []):
        expr = expr & cond(c)
    shoulds = spec.get("should", [])
    if shoulds:
        s = F.lit(False)
        for c in shoulds:
            s = s | cond(c)
        expr = expr & s
    for c in spec.get("must_not", []):
        expr = expr & ~cond(c)
    return expr


def detect_filter_conflicts(spec: dict) -> list[str]:
    """F10 filter-conflict detection (filter_conflict_detector.py
    semantics): analysis-time validation on the driver, before any job
    runs. Returns human-readable conflict strings (empty = valid).

    Detected classes:
    - same key required equal to X in `must` and excluded in `must_not`;
    - `must` equality on two different values for the same key;
    - empty-range contradiction (gte > lte / gt >= lt) on one key;
    - `must` value outside a `must` range on the same key.
    """
    conflicts: list[str] = []
    eq: dict[str, list] = {}
    ranges: dict[str, dict] = {}
    not_eq: dict[str, list] = {}

    def walk(s: dict) -> None:
        for c in s.get("must", []):
            if any(k in c for k in ("must", "should", "must_not")):
                walk(c)
                continue
            k = c.get("key")
            if "match" in c and "value" in c["match"]:
                eq.setdefault(k, []).append(c["match"]["value"])
            if "range" in c:
                r = ranges.setdefault(k, {})
                for b, v in c["range"].items():
                    r[b] = v
        for c in s.get("must_not", []):
            if "match" in c and "value" in c.get("match", {}):
                not_eq.setdefault(c["key"], []).append(c["match"]["value"])

    walk(spec)
    for k, vals in eq.items():
        if len(set(map(repr, vals))) > 1:
            conflicts.append(f"must requires {k} equal to multiple values: {vals}")
        for v in vals:
            if v in not_eq.get(k, []):
                conflicts.append(f"{k}={v!r} both required and excluded")
            r = ranges.get(k)
            if r and isinstance(v, (int, float)):
                lo_ok = ("gte" not in r or v >= r["gte"]) and \
                        ("gt" not in r or v > r["gt"])
                hi_ok = ("lte" not in r or v <= r["lte"]) and \
                        ("lt" not in r or v < r["lt"])
                if not (lo_ok and hi_ok):
                    conflicts.append(f"{k}={v!r} outside its own must-range {r}")
    for k, r in ranges.items():
        lo = r.get("gte", r.get("gt"))
        hi = r.get("lte", r.get("lt"))
        if lo is not None and hi is not None:
            strict = "gt" in r or "lt" in r
            if lo > hi or (strict and lo >= hi):
                conflicts.append(f"empty range on {k}: {r}")
    return conflicts


# F8: friendly language name -> extension set (language_mapper.py:29-60)
LANGUAGE_MAP = {
    "python": ["py", "pyw", "pyi"],
    "javascript": ["js", "jsx", "mjs"],
    "typescript": ["ts", "tsx"],
    "java": ["java"],
    "c": ["c", "h"],
    "cpp": ["cpp", "cc", "cxx", "hpp"],
    "go": ["go"],
    "rust": ["rs"],
}


def expand_language(lang: str) -> list[str]:
    return LANGUAGE_MAP.get(lang.lower(), [lang.lower()])
