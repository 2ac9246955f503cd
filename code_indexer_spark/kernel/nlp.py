"""Sentence splitting, dependency-pattern SPO rules, mention detection,
and entity-link scoring — the plain-Python semantic contract shared by
the fixture generator, the reference oracle, and the Spark pandas UDFs.

Reference analogs:
- rule engine as *data* evaluated by a generic executor — the X-Ray
  two-phase pattern search (``/root/reference/src/code_indexer/xray/
  search_engine.py:231-507``): regex candidate driver + evaluator;
- mention detection = the FTS "identifiers" side-channel
  (``services/smart_indexer.py:1309`` — ``text.split()``) upgraded to a
  longest-match dictionary scan;
- entity-link scoring = ANN search + rerank (``storage/
  filesystem_vector_store.py:2968-3100``, rerank ``cli_search_funnel.py:
  52-150``): candidates from the alias dictionary, reranked by
  prior × embedding cosine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .embed import cosine, embed_text

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
_NORM_RE = re.compile(r"[a-z0-9]+")


def normalize_surface(s: str) -> str:
    """Lowercase, keep alnum runs, single-space join — the alias key."""
    return " ".join(_NORM_RE.findall(s.lower()))


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence split: newline-bounded, then punctuation."""
    out: list[str] = []
    for line in text.split("\n"):
        for sent in _SENT_SPLIT_RE.split(line):
            sent = sent.strip()
            if sent:
                out.append(sent)
    return out


# ---------------------------------------------------------------------------
# SPO rule set (fixed data, FIXTURES.md §3). Each rule: one predicate, a
# verb-phrase surface, and (subj_type, obj_type) constraints checked
# against alias_dict.entity_type. 40 rules.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Rule:
    rule_id: str
    phrase: str  # literal verb phrase, matched with surrounding spaces
    predicate: str
    subj_type: str
    obj_type: str


_RULE_SPECS: list[tuple[str, str, str, str]] = [
    # (phrase, predicate, subj_type, obj_type)
    ("founded", "founded", "person", "org"),
    ("co-founded", "founded", "person", "org"),
    ("established", "founded", "person", "org"),
    ("leads", "leads", "person", "org"),
    ("runs", "leads", "person", "org"),
    ("chairs", "leads", "person", "org"),
    ("joined", "member_of", "person", "org"),
    ("works at", "member_of", "person", "org"),
    ("works for", "member_of", "person", "org"),
    ("acquired", "acquired", "org", "org"),
    ("bought", "acquired", "org", "org"),
    ("took over", "acquired", "org", "org"),
    ("merged with", "merged_with", "org", "org"),
    ("partnered with", "partner_of", "org", "org"),
    ("collaborates with", "partner_of", "org", "org"),
    ("competes with", "competitor_of", "org", "org"),
    ("invested in", "investor_in", "org", "org"),
    ("backed", "investor_in", "org", "org"),
    ("was born in", "born_in", "person", "place"),
    ("grew up in", "born_in", "person", "place"),
    ("lives in", "resides_in", "person", "place"),
    ("moved to", "resides_in", "person", "place"),
    ("settled in", "resides_in", "person", "place"),
    ("is headquartered in", "headquartered_in", "org", "place"),
    ("is based in", "headquartered_in", "org", "place"),
    ("opened offices in", "operates_in", "org", "place"),
    ("expanded to", "operates_in", "org", "place"),
    ("wrote", "author_of", "person", "work"),
    ("authored", "author_of", "person", "work"),
    ("published", "author_of", "person", "work"),
    ("directed", "director_of", "person", "work"),
    ("produced", "producer_of", "person", "work"),
    ("composed", "composer_of", "person", "work"),
    ("married", "spouse_of", "person", "person"),
    ("mentored", "mentor_of", "person", "person"),
    ("advised", "advisor_of", "person", "person"),
    ("succeeded", "successor_of", "person", "person"),
    ("is located in", "located_in", "place", "place"),
    ("borders", "borders", "place", "place"),
    ("released", "publisher_of", "org", "work"),
]

RULES: list[Rule] = [
    Rule(rule_id=f"R{j:03d}", phrase=p, predicate=pred, subj_type=st, obj_type=ot)
    for j, (p, pred, st, ot) in enumerate(_RULE_SPECS)
]

_RULES_BY_ID: dict[str, Rule] = {r.rule_id: r for r in RULES}

_TRAIL_PUNCT_RE = re.compile(r"[.!?,;:]+$")

# (needle, first_word, rule) precomputed once: the needle " phrase "
# requires the phrase's first word to appear as a space-bounded token,
# so membership in the sentence's word set is a NECESSARY condition —
# an exact prefilter that skips ~95% of the 40 find() calls per sentence
_RULES_PRE: list[tuple[str, str, Rule]] = [
    (f" {r.phrase} ", r.phrase.split(" ", 1)[0], r) for r in RULES
]


def match_rules(sentence: str) -> list[tuple[str, str, str, str]]:
    """sentence -> [(subj_surface, predicate, obj_surface, rule_id)].

    First matching rule wins (rules are ordered; deterministic). The verb
    phrase must appear with surrounding spaces; subject = text before it,
    object = text after it with trailing punctuation stripped.
    """
    words = set(sentence.split(" "))
    for needle, first_word, rule in _RULES_PRE:
        if first_word not in words:
            continue
        pos = sentence.find(needle)
        if pos <= 0:
            continue
        subj = sentence[:pos].strip()
        obj = _TRAIL_PUNCT_RE.sub("", sentence[pos + len(needle):].strip())
        if subj and obj:
            return [(subj, rule.predicate, obj, rule.rule_id)]
    return []


# ---------------------------------------------------------------------------
# Entity linking
# ---------------------------------------------------------------------------

class AliasIndex:
    """In-memory alias dictionary index (broadcast to executors).

    rows: (alias, entity_id, entity_type, prior, canonical_name)
    """

    def __init__(self, rows: list[tuple[str, str, str, float, str]]):
        self.by_norm: dict[str, list[tuple[str, str, float, str]]] = {}
        self.by_first_token: dict[str, list[tuple[tuple[str, ...], str]]] = {}
        seen = set()
        for alias, eid, etype, prior, cname in rows:
            norm = normalize_surface(alias)
            if not norm:
                continue
            self.by_norm.setdefault(norm, []).append((eid, etype, prior, cname))
            toks = tuple(norm.split(" "))
            key = (toks, norm)
            if key not in seen:
                seen.add(key)
                self.by_first_token.setdefault(toks[0], []).append((toks, norm))
        # longest-match-first per first token; deterministic order.
        # Stored as (n_tokens, rest_tokens, norm): the first token is
        # implied by the bucket key, so a 1-token candidate matches by
        # construction and longer ones compare only their tail — this
        # is detect_mentions' hot loop
        for tok0, lst in self.by_first_token.items():
            lst.sort(key=lambda t: (-len(t[0]), t[1]))
            self.by_first_token[tok0] = [
                (len(toks), list(toks[1:]), norm) for toks, norm in lst
            ]
        # deterministic candidate order
        for lst in self.by_norm.values():
            lst.sort()
        # precomputed name embeddings for rerank
        self._name_vecs: dict[str, object] = {}

    def name_vec(self, canonical_name: str):
        v = self._name_vecs.get(canonical_name)
        if v is None:
            v = embed_text(canonical_name)
            self._name_vecs[canonical_name] = v
        return v

    def link(
        self, surface: str, required_type: str | None, context_vec
    ) -> tuple[str, float, list[str]] | None:
        """surface -> (entity_id, link_score, candidate_ids) or None.

        score = prior * (0.5 + 0.5 * cosine(context, canonical_name_vec));
        ties broken by entity_id. Mirrors the reference's over-fetch ->
        rerank -> top-1 funnel (cli_search_funnel.py:52-150).
        """
        cands = self.by_norm.get(normalize_surface(surface))
        if not cands:
            return None
        if required_type is not None:
            cands = [c for c in cands if c[1] == required_type]
            if not cands:
                return None
        best: tuple[float, str] | None = None
        best_score = 0.0
        for eid, _etype, prior, cname in cands:
            sim = cosine(context_vec, self.name_vec(cname))
            score = prior * (0.5 + 0.5 * sim)
            # higher score wins; tie -> lexicographically smaller id
            if best is None or score > best_score + 1e-12 or (
                abs(score - best_score) <= 1e-12 and eid < best[1]
            ):
                best = (score, eid)
                best_score = score
        assert best is not None
        return best[1], best_score, [c[0] for c in cands]

    def detect_mentions(self, text: str) -> list[tuple[int, str, str]]:
        """Longest-match dictionary scan over normalized tokens.

        Returns [(token_pos, norm_alias, matched_surface_norm)] — the
        scalable analog of Aho-Corasick; linear passes per sentence.
        """
        toks = normalize_surface(text).split(" ") if text else []
        out: list[tuple[int, str, str]] = []
        i = 0
        n = len(toks)
        get = self.by_first_token.get
        while i < n:
            cands = get(toks[i])
            if cands is None:
                i += 1
                continue
            matched = None
            for m, rest, norm in cands:
                if m == 1 or (i + m <= n and toks[i + 1:i + m] == rest):
                    matched = (i, norm, norm)
                    i += m
                    break
            if matched:
                out.append(matched)
            else:
                i += 1
        return out


def extract_triples_from_text(
    text: str, index: AliasIndex
) -> list[tuple[str, str, str, str, float]]:
    """Full per-page relation extraction:
    sentences -> rule match -> link both surfaces (type-constrained,
    embedding-reranked) -> [(subj_id, pred, obj_id, rule_id, confidence)].
    """
    out: list[tuple[str, str, str, str, float]] = []
    rules_by_id = _RULES_BY_ID
    for sent in split_sentences(text):
        for subj_sfc, pred, obj_sfc, rule_id in match_rules(sent):
            rule = rules_by_id[rule_id]
            ctx = embed_text(sent)
            s = index.link(subj_sfc, rule.subj_type, ctx)
            if s is None:
                continue
            o = index.link(obj_sfc, rule.obj_type, ctx)
            if o is None:
                continue
            conf = round(min(s[1], o[1]), 6)
            out.append((s[0], pred, o[0], rule_id, conf))
    return out
