"""Deterministic synthetic fixture generation (FIXTURES.md §§1-6).

Generates, with a single seeded PRNG (seed=42) and fixed iteration order:

- ``entities``: ~1,200 entities over {person, org, place, work}, including
  ~100 hand-seeded duplicate groups (same real-world entity under 2-6
  name-variant entity_ids) for the canonicalization goldens;
- ``alias_dict``: canonical name + 1-4 surface variants per entity,
  with deliberately ambiguous aliases (shared last names / org stems)
  that force embedding-similarity reranking;
- ``pages``: Common-Crawl-style rows (url, warc_ts, html, text, lang).
  ``text`` is the golden extraction output — computed with
  kernel.extract.extract_text on the generated html bytes, so the Spark
  pipeline must reproduce it byte-for-byte.

HTML stress features per FIXTURES.md: <img> tags (relative, absolute,
http(s), data: URIs), script/style blocks, HTML entities, and ~2%
cp1252-encoded pages exercising the decode cascade.

No external data; everything below is synthesized from word lists.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel.extract import extract_text
from ..kernel.nlp import RULES

SEED = 42

FIRST_NAMES = [
    "Alric", "Brena", "Cato", "Dalia", "Edric", "Fiora", "Galen", "Hesta",
    "Ilian", "Jessa", "Koren", "Lira", "Marek", "Nessa", "Orin", "Petra",
    "Quill", "Rowan", "Sable", "Torin", "Una", "Vesper", "Wren", "Xavi",
    "Yara", "Zeph",
]
LAST_NAMES = [
    "Montara", "Bellweather", "Crane", "Dovetail", "Emberly", "Fairwind",
    "Glenhart", "Hollis", "Ironwood", "Juniper", "Kestrel", "Larkspur",
    "Meridian", "Northgate", "Oakhurst", "Pemberton", "Quarry", "Redfern",
    "Silverlake", "Thornbury", "Underhill", "Vance", "Westbrook", "Yarrow",
]
ORG_STEMS = [
    "Acme", "Borealis", "Cobalt", "Dynamo", "Everest", "Fulcrum", "Gryphon",
    "Helix", "Ionia", "Jetstream", "Keystone", "Lumen", "Meridian", "Nimbus",
    "Obsidian", "Pinnacle", "Quasar", "Radiant", "Summit", "Tesseract",
    "Umbra", "Vertex", "Wavefront", "Zenith",
]
ORG_MIDS = ["", "Data", "Energy", "Global", "Applied", "Digital", "Quantum",
            "Micro", "Advanced", "Pacific", "Atlantic", "Northern", "Stellar",
            "Prime", "Core"]
ORG_SUFFIXES = ["Corp", "Systems", "Labs", "Industries", "Group", "Holdings",
                "Dynamics", "Technologies", "Partners", "Ventures"]
PLACE_PARTS_A = ["North", "South", "East", "West", "Upper", "Lower", "New",
                 "Old", "Port", "Lake", "Fort", "Mount", "Grand", "Little",
                 "High", "Low"]
PLACE_PARTS_B = ["haven", "bridge", "field", "crest", "mont", "ford", "dale",
                 "mere", "wick", "stead", "harbor", "gate", "shore", "cliff",
                 "glen", "marsh"]
WORK_ADJ = ["Silent", "Crimson", "Endless", "Hidden", "Broken", "Golden",
            "Hollow", "Distant", "Forgotten", "Luminous"]
WORK_NOUN = ["River", "Citadel", "Horizon", "Garden", "Archive", "Voyage",
             "Labyrinth", "Compass", "Symphony", "Chronicle", "Beacon",
             "Orchard", "Lantern", "Harvest", "Outpost"]
WORK_SUFFIX = ["II", "Rising", "Returns", "Origins"]

FILLER_VOCAB = (
    "the quick analysis shows steady growth across regional markets while "
    "observers note that seasonal demand patterns remain broadly consistent "
    "with prior estimates and local reports describe ongoing construction "
    "projects new infrastructure upgrades and community programs expanding "
    "throughout the district despite occasional delays in planning reviews"
).split()

IMG_LOCAL = ["assets/logo.png", "img/banner.jpg", "media/photo.jpeg",
             "icons/map.webp", "pics/anim.gif", "assets/chart.svg",
             "../escape/out.png", "/rooted/img.png"]
IMG_REMOTE = ["https://cdn.example.com/x.png", "http://img.example.org/y.jpg"]
IMG_DATA = ["data:image/png;base64,iVBORw0KGgo="]

ENTITY_TYPES = ["person", "org", "place", "work"]


def _make_entities(rng: random.Random):
    """Returns (entities, dup_groups).

    entities: list of dicts {entity_id, canonical_name, entity_type,
    prior, dup_group (or None)}; entity ids assigned in generation order.
    """
    specs: list[tuple[str, str]] = []  # (type, name)
    seen = set()

    def uniq(name: str) -> bool:
        k = name.lower()
        if k in seen:
            return False
        seen.add(k)
        return True

    # Base pools. Pools are constructed so that DISTINCT entities keep
    # char-3-shingle Jaccard safely below the canonicalization threshold:
    # each org has a unique (stem, mid) pair; place/work name forms are
    # partitioned so a plain name and its suffixed form can't both exist
    # as different entities.
    while sum(1 for t, _ in specs if t == "person") < 360:
        n = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        if uniq(n):
            specs.append(("person", n))
    org_combos = [(s, m) for s in ORG_STEMS for m in ORG_MIDS]
    for stem, mid in rng.sample(org_combos, 360):
        n = " ".join(x for x in (stem, mid, rng.choice(ORG_SUFFIXES)) if x)
        uniq(n)
        specs.append(("org", n))
    place_combos = (
        [(a, b, "joined") for a in PLACE_PARTS_A[:8] for b in PLACE_PARTS_B]
        + [(a, b, "spaced") for a in PLACE_PARTS_A[8:] for b in PLACE_PARTS_B]
    )
    for a, b, form in rng.sample(place_combos, 220):
        n = f"{a}{b}".capitalize() if form == "joined" else f"{a} {b.capitalize()}"
        uniq(n)
        specs.append(("place", n))
    work_combos = (
        [(adj, noun, None) for adj in WORK_ADJ[:5] for noun in WORK_NOUN]
        + [(adj, noun, True) for adj in WORK_ADJ[5:] for noun in WORK_NOUN]
    )
    for adj, noun, suffixed in rng.sample(work_combos, 140):
        n = f"The {adj} {noun}"
        if suffixed:
            n = f"{n} {rng.choice(WORK_SUFFIX)}"
        uniq(n)
        specs.append(("work", n))

    entities = []
    dup_groups: dict[str, list[str]] = {}
    k = 0
    for etype, name in specs:
        eid = f"E{k:05d}"
        k += 1
        entities.append(
            dict(entity_id=eid, canonical_name=name, entity_type=etype,
                 prior=round(0.2 + 0.8 * rng.random(), 6), dup_group=None)
        )

    # duplicate groups: pick 100 base entities, add 1-5 variant records.
    # KNOWN LIMITATION (kept deliberately): _name_variant draws from
    # pools of only 2-4 distinct forms per type, so a group drawing 5
    # variants will contain some byte-identical canonical_names — those
    # members exercise exact-match merging rather than name-variant
    # merging. Deduplicating the draw would change every generated
    # fixture byte and invalidate all pinned goldens (kg graph counts,
    # pagerank scores, chunk goldens); the canonicalization path's
    # variant handling is separately pinned by test_canonicalize's
    # hand-built cases, so the weaker fixture is acceptable.
    bases = rng.sample(range(len(entities)), 100)
    for gi, bi in enumerate(sorted(bases)):
        base = entities[bi]
        group = f"G{gi:03d}"
        base["dup_group"] = group
        members = [base["entity_id"]]
        for _ in range(rng.randint(1, 5)):
            variant = _name_variant(rng, base["canonical_name"],
                                    base["entity_type"])
            eid = f"E{k:05d}"
            k += 1
            entities.append(
                dict(entity_id=eid, canonical_name=variant,
                     entity_type=base["entity_type"],
                     prior=round(0.2 + 0.8 * rng.random(), 6),
                     dup_group=group)
            )
            members.append(eid)
        dup_groups[group] = members
    return entities, dup_groups


def _name_variant(rng: random.Random, name: str, etype: str) -> str:
    """High-Jaccard name variant (same real-world entity)."""
    r = rng.random()
    if etype == "org":
        if r < 0.34:
            return name + " Inc"
        if r < 0.67:
            return name + " Intl"
        return name.replace("Corp", "Corporation") if "Corp" in name \
            else name + " Co"
    if etype == "person":
        parts = name.split(" ")
        if r < 0.5:
            return f"{parts[0]} {parts[-1]} Jr"
        return f"{parts[0]} J {parts[-1]}"
    if etype == "place":
        if r < 0.5:
            return name + " City"
        return name + " Dist"
    # work
    if r < 0.5:
        return name + " Saga"
    return name + " Volume One"


def _make_aliases(rng: random.Random, entities) -> list[dict]:
    """alias_dict rows; includes ambiguous aliases shared across entities."""
    rows = []
    for e in entities:
        name, etype, eid = e["canonical_name"], e["entity_type"], e["entity_id"]
        rows.append(dict(alias=name, entity_id=eid, entity_type=etype,
                         prior=e["prior"], canonical_name=name))
        variants = set()
        if etype == "person":
            first, last = name.split(" ")[0], name.split(" ")[-1]
            variants.add(f"{first[0]}. {last}")
            if rng.random() < 0.6:
                variants.add(last)  # deliberately ambiguous
        elif etype == "org":
            stem = name.split(" ")[0]
            if rng.random() < 0.5:
                variants.add(stem)  # ambiguous across same-stem orgs
            variants.add(name.replace(" ", "-"))
        elif etype == "place":
            variants.add(name.upper())
        else:
            variants.add(name.replace("The ", ""))
        for v in sorted(variants):
            rows.append(dict(alias=v, entity_id=eid, entity_type=etype,
                             prior=e["prior"], canonical_name=name))
    return rows


def _alias_surfaces(aliases) -> dict[str, list[str]]:
    by_eid: dict[str, list[str]] = {}
    for a in aliases:
        by_eid.setdefault(a["entity_id"], []).append(a["alias"])
    return by_eid


def _render_page(rng: random.Random, i: int, entities, by_type,
                 surfaces) -> tuple[bytes, str]:
    """Returns (html_bytes, lang). Deterministic per (rng-state, i)."""
    lang = "en" if i % 10 < 9 else ("de" if i % 20 < 10 else "fr")
    title_e = entities[rng.randrange(len(entities))]
    parts = [
        "<html><head>",
        f"<title>Report {i}: {title_e['canonical_name']}</title>",
        "<style>body { color: #222; }</style>",
        "<script>var ignored = 'not text';</script>",
        "</head><body>",
        f"<h1>Notes on {title_e['canonical_name']} &amp; partners</h1>",
    ]
    n_paras = rng.randint(2, 6)
    for _ in range(n_paras):
        sents = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.4:
                rule = RULES[rng.randrange(len(RULES))]
                subj = rng.choice(by_type[rule.subj_type])
                obj = rng.choice(by_type[rule.obj_type])
                if subj["entity_id"] == obj["entity_id"]:
                    continue
                ssfc = rng.choice(surfaces[subj["entity_id"]])
                osfc = rng.choice(surfaces[obj["entity_id"]])
                sents.append(f"{ssfc} {rule.phrase} {osfc}.")
            else:
                n = rng.randint(5, 14)
                words = [FILLER_VOCAB[rng.randrange(len(FILLER_VOCAB))]
                         for _ in range(n)]
                sents.append(" ".join(words).capitalize() + ".")
        if sents:
            parts.append("<p>" + " ".join(sents) + "</p>")
    r = rng.random()
    if r < 0.10:
        parts.append(f'<img src="{rng.choice(IMG_LOCAL)}" alt="">')
    elif r < 0.14:
        parts.append(f'<img src="{rng.choice(IMG_REMOTE)}">')
    elif r < 0.16:
        parts.append(f'<img src="{IMG_DATA[0]}">')
    if rng.random() < 0.05:
        parts.append("<p>Budget approx €100 at the café résumé desk.</p>")
    parts.append("</body></html>")
    html = "\n".join(parts)
    # ~2% cp1252-encoded pages exercise the decode cascade
    if i % 50 == 7:
        raw = html.encode("cp1252", errors="replace")
    else:
        raw = html.encode("utf-8")
    return raw, lang


def generate(out_dir: str, n_pages: int, seed: int = SEED,
             write_shared: bool = True) -> None:
    """Write pages.parquet (+ shared alias/rules/entities) under out_dir.

    The *entity universe* is generated first with its own fixed seed so
    that every scale shares the same alias_dict / rules / entities; pages
    use a second PRNG seeded (seed, n_pages is NOT mixed in — page i is
    identical across scales up to the smaller N).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng_e = random.Random(seed)
    entities, dup_groups = _make_entities(rng_e)
    aliases = _make_aliases(rng_e, entities)
    by_type: dict[str, list[dict]] = {t: [] for t in ENTITY_TYPES}
    for e in entities:
        by_type[e["entity_type"]].append(e)
    surfaces = _alias_surfaces(aliases)

    if write_shared:
        pq.write_table(pa.table({
            "entity_id": [e["entity_id"] for e in entities],
            "canonical_name": [e["canonical_name"] for e in entities],
            "entity_type": [e["entity_type"] for e in entities],
            "prior": [e["prior"] for e in entities],
            "dup_group": [e["dup_group"] for e in entities],
        }), os.path.join(out_dir, "entities.parquet"))
        pq.write_table(pa.table({
            "alias": [a["alias"] for a in aliases],
            "entity_id": [a["entity_id"] for a in aliases],
            "entity_type": [a["entity_type"] for a in aliases],
            "prior": [a["prior"] for a in aliases],
            "canonical_name": [a["canonical_name"] for a in aliases],
        }), os.path.join(out_dir, "alias_dict.parquet"))
        pq.write_table(pa.table({
            "rule_id": [r.rule_id for r in RULES],
            "pattern": [f"{{SUBJ}} {r.phrase} {{OBJ}}" for r in RULES],
            "phrase": [r.phrase for r in RULES],
            "predicate": [r.predicate for r in RULES],
            "subj_type": [r.subj_type for r in RULES],
            "obj_type": [r.obj_type for r in RULES],
        }), os.path.join(out_dir, "rules.parquet"))

    rng_p = random.Random(seed + 1)
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    writer = None
    pages_path = os.path.join(out_dir, "pages.parquet")
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    for i in range(n_pages):
        raw, lang = _render_page(rng_p, i, entities, by_type, surfaces)
        urls.append(f"https://site{i % 97}.example/p/{i}")
        tss.append(t0 + timedelta(seconds=i * 137))
        htmls.append(raw)
        texts.append(extract_text(raw))
        langs.append(lang)
        if len(urls) == 20000 or i == n_pages - 1:
            batch = pa.table({"url": urls, "warc_ts": tss, "html": htmls,
                              "text": texts, "lang": langs}, schema=schema)
            if writer is None:
                writer = pq.ParquetWriter(pages_path, schema)
            # fine row groups (2k rows ~ 1 MB) so Spark's scan can hand
            # out balanced splits at any parallelism — the bench-scale
            # analog of the 128 MB-block layout a 100 TB table would use;
            # coarse 20k-row groups caused 2-wave task skew at local[8]
            writer.write_table(batch, row_group_size=2000)
            urls, tss, htmls, texts, langs = [], [], [], [], []
    if writer is not None:
        writer.close()


SCALES = {"sf_small": 1000, "sf_med": 20000, "sf_bench": 200000,
          "sf_scale": 600000}


def generate_atomic(out_dir: str, n_pages: int, seed: int = SEED,
                    write_shared: bool = True) -> None:
    """generate() into a sibling tmp dir, then rename into place.

    generate() streams pages.parquet over minutes at bench scales; an
    interruption mid-write would otherwise leave a directory that
    EXISTS (so every later run takes the fixture-cached fast path) but
    holds a footerless parquet — a permanently corrupt fixture nobody
    regenerates. The rename is atomic; a concurrent winner's completed
    fixture is kept and ours discarded."""
    import shutil

    if os.path.isdir(out_dir):
        return
    # per-process tmp: a shared name would let a second concurrent
    # generator rmtree our in-progress tmp and interleave writes into
    # one directory — the mixed/partial dir this function exists to
    # prevent could then be renamed into place. Crashed attempts leave
    # orphan tmp dirs no later pid would ever match, so sweep stale
    # siblings — age-gated well past the longest generation time, so a
    # LIVE concurrent generator's tmp is never touched (bench-scale
    # generation runs minutes, not hours).
    import glob
    import time

    for stale in glob.glob(out_dir + ".tmp.*"):
        try:
            if time.time() - os.path.getmtime(stale) > 6 * 3600:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass
    tmp = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    generate(tmp, n_pages, seed=seed, write_shared=write_shared)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        if os.path.isdir(out_dir):  # lost a benign race: keep theirs
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise


def main():
    import sys
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/kg"
    only = sys.argv[2:] or list(SCALES)
    for name in only:
        out = os.path.join(base, name)
        print(f"generating {name} -> {out} ({SCALES[name]} pages)")
        generate_atomic(out, SCALES[name])


if __name__ == "__main__":
    main()
