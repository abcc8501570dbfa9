"""Deterministic synthetic fixture generator (seed=42, no external data).

Materialises the FIXTURES.md tables at any scale:
  pages(url, warc_ts, html(binary), text, lang)      — graft input shape
  search_addresses(record_id, url, address_line1/2, town, postcode, ...)
  reference_addresses(ref_id, LPI cols..., UPRN)     — tools/constants.py:238-240
  labeled_pairs(record_id, ref_id, block_key, is_match, difficulty)
  expected_clusters(record_id, cluster_root)

Skew profile per FIXTURES.md §7: one postcode holds ~25% of rows, the rest
follow a Zipf(1.2) over the remaining keys — the condition the reference's
greedy batcher existed for (tools/matcher_funcs.py:894-986) and our salted
repartition defuses.

Difficulty classes (FIXTURES.md §4): exact / abbrev (road→rd per the T8
rules, tools/standardise.py:121-139) / floor-flat ('ground floor' → flat a,
tools/standardise.py:404-473) / range (12→'12-14',
tools/standardise.py:147-149) / near-miss (same building, different flat —
must fail the D4 number verification, tools/fuzzy_match.py:263-290) /
no-digit (score-100 rule, tools/constants.py:235).
"""

from __future__ import annotations

import html as _html
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

SEED = 42

_FIRST = [
    "ash", "beech", "cedar", "elm", "maple", "oak", "poplar", "willow",
    "hawthorn", "linden", "rowan", "sycamore", "alder", "birch", "holly",
    "ivy", "laurel", "juniper", "magnolia", "acacia", "hazel", "chestnut",
    "primrose", "bryony", "sorrel", "fern", "vine", "thames", "victoria",
    "nelson", "church", "station", "mill", "park", "high", "spring",
    "green", "king", "queen", "brook",
]
_TYPE = ["road", "street", "avenue", "lane", "grove", "close", "walk", "row",
         "terrace", "rise", "hill", "mews", "place", "crescent", "drive"]
_TOWNS = ["LONDON", "CROYDON", "BRIXTON", "PECKHAM", "CAMBERWELL"]
_HOUSE = ["maple", "laurel", "hazel", "chestnut", "quay", "kirby", "speedwell",
          "nelson", "victoria", "albany", "sovereign", "bellview"]
_AREAS = ["SW", "SE", "N", "E", "W", "NW", "CR", "BR"]

# abbreviation map: inverse of the T8 synonym rules
_ABBREV = {"road": "rd", "street": "st", "avenue": "ave"}
# floor phrase ↔ the flat letter full standardisation rewrites it to (T15)
_FLOORS = ["ground floor", "first floor", "second floor", "third floor"]

KIND_PLAIN, KIND_FLAT, KIND_FLOOR, KIND_HOUSE = 0, 1, 2, 3


@dataclass
class Scale:
    n_ref: int = 2000
    n_search: int = 1500
    n_postcodes: int = 120
    heavy_share: float = 0.25
    zipf_a: float = 1.2
    dup_rate: float = 0.15  # extra search copies of the same entity → clusters


def _postcode_pool(rng: np.random.RandomState, n: int) -> list[str]:
    seen: dict[str, None] = {}
    while len(seen) < n:
        area = _AREAS[rng.randint(len(_AREAS))]
        district = rng.randint(1, 29)
        sector = rng.randint(0, 10)
        unit = "".join(chr(ord("A") + rng.randint(0, 26)) for _ in range(2))
        seen.setdefault(f"{area}{district} {sector}{unit}", None)
    return list(seen)


def _assign_blocks(rng: np.random.RandomState, n_rows: int, pool: list[str],
                   heavy_share: float, zipf_a: float) -> np.ndarray:
    """One heavy key (~heavy_share of rows), Zipf tail over the rest."""
    heavy = int(n_rows * heavy_share)
    tail_ranks = rng.zipf(zipf_a, size=n_rows - heavy)
    tail_ranks = np.clip(tail_ranks, 1, len(pool) - 1)
    idx = np.concatenate([np.zeros(heavy, dtype=int), tail_ranks])
    rng.shuffle(idx)
    return np.array(pool, dtype=object)[idx]


def _make_reference(rng: np.random.RandomState, sc: Scale) -> pd.DataFrame:
    pool = _postcode_pool(rng, sc.n_postcodes)
    pcs = _assign_blocks(rng, sc.n_ref, pool, sc.heavy_share, sc.zipf_a)
    kinds = rng.choice(
        [KIND_PLAIN, KIND_FLAT, KIND_FLOOR, KIND_HOUSE],
        size=sc.n_ref, p=[0.5, 0.3, 0.12, 0.08],
    )
    rows = []
    for i in range(sc.n_ref):
        street = (f"{_FIRST[rng.randint(len(_FIRST))]} "
                  f"{_TYPE[rng.randint(len(_TYPE))]}").upper()
        town = _TOWNS[rng.randint(len(_TOWNS))]
        num = str(rng.randint(1, 199))
        kind = kinds[i]
        sao_text, sao_num, pao_text, pao_num = "", "", "", num
        if kind == KIND_FLAT:
            sao_text, sao_num = "FLAT", str(rng.randint(1, 12))
        elif kind == KIND_FLOOR:
            sao_text = _FLOORS[rng.randint(len(_FLOORS))].upper() + " FLAT"
        elif kind == KIND_HOUSE:
            pao_text = f"{_HOUSE[rng.randint(len(_HOUSE))].upper()} HOUSE"
            pao_num = ""
        rows.append((kind, "", sao_text, sao_num, pao_text, pao_num,
                     street, town, pcs[i]))
    ref = pd.DataFrame(rows, columns=[
        "kind", "Organisation", "SaoText", "SaoStartNumber", "PaoText",
        "PaoStartNumber", "Street", "PostTown", "Postcode",
    ])
    for c in ["SaoStartSuffix", "SaoEndNumber", "SaoEndSuffix",
              "PaoStartSuffix", "PaoEndNumber", "PaoEndSuffix"]:
        ref[c] = ""
    ref = ref.drop_duplicates(
        subset=["SaoText", "SaoStartNumber", "PaoText", "PaoStartNumber",
                "Street", "Postcode"]
    ).reset_index(drop=True)
    ref["ref_id"] = np.arange(len(ref), dtype=np.int64)
    ref["UPRN"] = (100000000 + ref["ref_id"]).astype(str)
    return ref


def _search_line(r, difficulty: str) -> tuple[str, bool]:
    """(address_line1, is_match) for one ref row + difficulty class."""
    street = r.Street.lower()
    num = r.PaoStartNumber
    flat = r.SaoStartNumber
    kind = r.kind

    def body(st: str) -> str:
        return (f"{r.PaoText.lower()} {st}" if kind == KIND_HOUSE
                else f"{num} {st}")

    def with_unit(b: str) -> str:
        if kind == KIND_FLAT:
            return f"flat {flat} {b}"
        if kind == KIND_FLOOR:
            floor = r.SaoText.lower().replace(" flat", "")
            return f"{floor} {b}"
        return b

    if difficulty == "exact":
        return with_unit(body(street)), True
    if difficulty == "abbrev":
        st2 = street
        for full, ab in _ABBREV.items():
            if full in street:
                st2 = street.replace(full, ab)
                break
        return with_unit(body(st2)), True
    if difficulty == "range":
        if not num:  # house-named rows have no PAO number to range
            return with_unit(body(street)), True
        b = f"{num}-{int(num) + 2} {street}"
        return with_unit(b), True
    if difficulty == "near-miss":
        if kind == KIND_FLAT:
            wrong = str(int(flat) % 11 + 1)
            return f"flat {wrong} {body(street)}", False
        if kind == KIND_FLOOR:
            floor = r.SaoText.lower().replace(" flat", "")
            others = [f for f in _FLOORS if f != floor]
            return f"{others[int(num) % len(others)]} {body(street)}", False
        if kind == KIND_HOUSE:
            other = "granville house" if "granville" not in r.PaoText.lower() \
                else "edmund house"
            return f"{other} {street}", False
        wrong = str(int(num) + 1)
        return f"{wrong} {street}", False
    if difficulty == "no-digit":
        # only KIND_HOUSE rows are digit-free on both sides
        return body(street), True
    raise ValueError(difficulty)


def generate(scale: Scale | None = None, seed: int = SEED):
    """Return dict of pandas DataFrames for all fixture tables."""
    sc = scale or Scale()
    rng = np.random.RandomState(seed)
    ref = _make_reference(rng, sc)

    difficulties = np.array(
        ["exact", "abbrev", "range", "near-miss", "no-digit"], dtype=object
    )
    weights = np.array([0.3, 0.25, 0.15, 0.25, 0.05])

    rows, pairs, cluster_edges = [], [], []
    rid = 0
    n_from_ref = int(sc.n_search * 0.85)
    ref_idx = rng.randint(0, len(ref), size=n_from_ref)
    for i in ref_idx:
        r = ref.iloc[i]
        d = str(difficulties[rng.choice(len(difficulties), p=weights)])
        if d == "no-digit" and r.kind != KIND_HOUSE:
            d = "exact"
        line, is_match = _search_line(r, d)
        pc = r.Postcode
        rows.append((rid, line, "", r.PostTown.lower(), pc, None))
        pairs.append((rid, int(r.ref_id), pc.lower().replace(" ", ""),
                      bool(is_match), d))
        if is_match:
            cluster_edges.append((rid, int(r.ref_id)))
        rid += 1
        if is_match and rng.rand() < sc.dup_rate:
            d2 = "abbrev" if d != "abbrev" else "exact"
            line2, im2 = _search_line(r, d2)
            rows.append((rid, line2, "", r.PostTown.lower(), pc, None))
            pairs.append((rid, int(r.ref_id), pc.lower().replace(" ", ""),
                          bool(im2), d2))
            if im2:
                cluster_edges.append((rid, int(r.ref_id)))
            rid += 1

    # distractors: postcodes absent from ref → never match
    main_pcs = set(ref["Postcode"])
    extra_pool = [p for p in _postcode_pool(np.random.RandomState(seed + 1), 60)
                  if p not in main_pcs]
    n_distract = max(sc.n_search - len(rows), 0)
    for _ in range(n_distract):
        st = f"{_FIRST[rng.randint(len(_FIRST))]} {_TYPE[rng.randint(len(_TYPE))]}"
        pc = extra_pool[rng.randint(len(extra_pool))]
        rows.append((rid, f"{rng.randint(1, 99)} {st}", "", "london", pc, None))
        rid += 1

    search = pd.DataFrame(
        rows,
        columns=["record_id", "address_line1", "address_line2", "town",
                 "postcode", "existing_match"],
    )
    search["record_id"] = search["record_id"].astype(np.int64)
    search["url"] = [
        f"https://example.org/page/{i:08d}" for i in search["record_id"]
    ]

    labeled = pd.DataFrame(
        pairs, columns=["record_id", "ref_id", "block_key", "is_match", "difficulty"]
    )

    # ---- expected clusters: union-find over (search ↔ ref entity) edges --
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r_id, ref_id in cluster_edges:
        union(f"s{r_id:012d}", f"r{ref_id:012d}")
    expected_clusters = (
        pd.DataFrame(
            [(r_id, find(f"s{r_id:012d}")) for r_id, _ in cluster_edges],
            columns=["record_id", "cluster_root"],
        )
        .drop_duplicates("record_id")
        .reset_index(drop=True)
    )

    ref_out = ref.drop(columns=["kind"])[[
        "ref_id", "Organisation", "SaoStartNumber", "SaoStartSuffix",
        "SaoEndNumber", "SaoEndSuffix", "SaoText", "PaoStartNumber",
        "PaoStartSuffix", "PaoEndNumber", "PaoEndSuffix", "PaoText",
        "Street", "PostTown", "Postcode", "UPRN",
    ]]
    return {
        "pages": make_pages(search),
        "search_addresses": search,
        "reference_addresses": ref_out,
        "labeled_pairs": labeled,
        "expected_clusters": expected_clusters,
    }


# ---------------------------------------------------------------------------
# pages: html wrapping + the deterministic extraction golden (input_hint T27)
# ---------------------------------------------------------------------------

_TEMPLATE = (
    "<html><head><title>Listing {rid}</title>"
    "<style>p {{margin: 0}}</style></head>"
    "<body><div id=\"main\"><h1>Property listing</h1>"
    "<p>{line1}</p><p>{town} &amp; surroundings</p><p>{pc}</p>"
    "<script>var x = 1 &lt; 2;</script>"
    "</div></body></html>"
)


def extract_text_py(html_str: str) -> str:
    """Reference implementation of the html→text invariant (pure Python,
    mirrored exactly by the Spark-native expression in
    address_matcher_spark/functions/extract.py — byte-identity is tested).

    Pipeline: drop script/style subtrees → block-level tags to newlines →
    strip remaining tags → unescape the 5 XML entities → collapse spaces →
    strip lines → drop empties → join with newline.
    """
    import re

    x = re.sub(r"(?is)<(script|style)\b.*?</\1>", "", html_str)
    x = re.sub(r"(?i)<(?:/p|/div|/li|/h[1-6]|/title|br ?/?)>", "\n", x)
    x = re.sub(r"(?s)<[^>]*>", "", x)
    x = (
        x.replace("&amp;", "&")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&#39;", "'")
    )
    x = re.sub(r"[ \t]+", " ", x)
    lines = [ln.strip() for ln in x.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def make_pages(search: pd.DataFrame) -> pd.DataFrame:
    htmls = [
        _TEMPLATE.format(
            rid=int(r.record_id),
            line1=_html.escape(str(r.address_line1)),
            town=_html.escape(str(r.town)),
            pc=_html.escape(str(r.postcode)),
        )
        for r in search.itertuples()
    ]
    return pd.DataFrame({
        "url": search["url"],
        "warc_ts": pd.Timestamp("2025-07-04T00:00:00Z"),
        "html": [h.encode("utf-8") for h in htmls],
        "text": [extract_text_py(h) for h in htmls],
        "lang": "en",
    })


def write_fixtures(out_dir: str, scale: Scale | None = None, seed: int = SEED) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    tables = generate(scale, seed)
    for name, df in tables.items():
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    return {k: len(v) for k, v in tables.items()}
