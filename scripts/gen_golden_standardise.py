"""Freeze golden fixtures from the reference's own pandas standardisation
functions (tools/standardise.py, tools/preparation.py) on a curated corpus.

Run ONCE (offline, reads /root/reference) to produce
tests/golden/standardise_golden.parquet; tests then only read the committed
fixture — pytest never touches /root/reference.  No reference code is
copied: the reference modules are imported and executed as a black-box
oracle.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REF = Path("/root/reference/tools")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"


def load_module(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# tools.standardise is dependency-light (pandas/numpy/re only)
std = load_module("ref_standardise", REF / "standardise.py")

# corpus: every regex branch in SURVEY.md §2.3, plus adversarial shapes
CORPUS = [
    "Flat 2, Maple Court, 12 High Street, London SW9 7QD",
    "flat 2 maple court 12 high st sw9 7qd",
    "2b sycamore road se15 4qt",
    "Ground Floor Flat 12 Ash Park Road SE54 3HB",
    "basement flat 12 high street n1 3qp",
    "first floor flat 3 beech lane",
    "1st flr 3 beech ln",
    "2nd floor 9 oak ave",
    "third floor flat 22 elm grove",
    "3rd flr flat 22 elm grove",
    "top floor flat 7 birch close",
    "ground and first floor maisonette 4 cedar row",
    "basement ground and first floors 8 willow walk",
    "first and second floor flat 16 poplar terrace",
    "ground and first and second floor 20 alder rise",
    "apartment 12 chestnut house se1 1aa",
    "apartments 3 laurel court",
    "studio flat 5 ivy lane",
    "cluster flat 9 fern mews",
    "room 4 hazel house nw3 2bb",
    "room no. 7 acacia buildings",
    "block b unit 12 juniper estate",
    "unit 3 block c magnolia mansions",
    "a 12 rowan road",
    "b flat 14 linden street",
    "12-14 hawthorn road",
    "12/14 hawthorn road",
    "12 - 14 hawthorn road",
    "02-jan sorrel close",
    "05-may bryony street",
    "21-dec holly road",
    "00-feb odd court",
    "12 lwr marsh se1",
    "6 gnd floor victoria rd",
    "penthouse pt 30 thames view",
    "mais 17 vine st",
    "maisonette 18 vine street",
    "bst flat 9 river lane",
    "bsmt 11 river lane",
    "the old rectory, church lane",  # no numbers
    "garage 14 moss side",
    "parking space 2 kirby estate",
    "shed 5 allotment way",
    "bike store 3 quay house",
    "bicycle store 3 quay house",
    "st agnes place",  # st at start → street
    "flat at 12 high street",  # \bat\b removal
    "o'connor house 12 dublin row",  # apostrophe strip
    "FLAT 2A, 12-16 LONDON ROAD, CROYDON CR0 1AB",
    "flat1 speedwell court",  # no space after flat
    "flats 3 and 4 primrose hill",
    "12a",  # bare number+letter
    "c 5 nelson terrace",
    "flat c 5 nelson terrace",
    "10 downing street sw1a 2aa",
    "1 ash park road se54 3hb",
    "flat 14 1 ash park road se54 3hb",
    "123 main blvd",
    "456 maple avenue",
    "789 oak street",
    "",
    "   ",
    "no numbers here at all",
    "house with no numbers",
    "SE5 9QD",  # postcode only
    "12 high street london",
    "flat 10b 27 acre lane sw2 5sg",
    "27b acre lane sw2 5sg",
    "ground floor 27 acre lane",
    "flat ground floor 27 acre lane",
    "22 - 24 lambeth walk",
    "unit 7, 22-24 lambeth walk se11",
]


def run_reference(corpus: list[str], standardise_flag: bool) -> pd.DataFrame:
    df = pd.DataFrame({"full_address_search": corpus})
    out = std.standardise_address(
        df.copy(), "full_address_search", "address_stand",
        standardise=standardise_flag, out_london=True,
    )
    res = pd.DataFrame({"input": corpus})
    res["standardise"] = standardise_flag
    res["address_stand"] = out["address_stand"].astype(object)
    for c in ["property_number", "flat_number", "room_number",
              "block_number", "unit_number", "house_court_name"]:
        res[c] = out[c].astype(object)
    # normalise pandas NaN → None for stable parquet round-trip
    res = res.where(pd.notna(res), None)
    return res


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    golden = pd.concat(
        [run_reference(CORPUS, False), run_reference(CORPUS, True)],
        ignore_index=True,
    )
    golden.to_parquet(OUT / "standardise_golden.parquet", index=False)

    # street-name extraction golden (tools/standardise.py:222-289)
    street = pd.DataFrame({"input": CORPUS})
    street["street_name"] = [std.extract_street_name(a) for a in CORPUS]
    street.to_parquet(OUT / "street_golden.parquet", index=False)

    # postcode extract/remove golden
    pc_df = pd.DataFrame({"input": CORPUS})
    pc = std.extract_postcode(pc_df, "input")[0]
    pc_df["postcode_extracted"] = pc.astype(object).where(pd.notna(pc), None)
    pc_df["no_postcode"] = std.remove_postcode(pd.DataFrame({"input": CORPUS}), "input")
    pc_df.to_parquet(OUT / "postcode_golden.parquet", index=False)

    # exclusion flags golden (tools/standardise.py:644-680)
    ex_df = pd.DataFrame({"full_address": CORPUS})
    ex_df["Excluded from search"] = np.nan
    ex_df = std.check_no_number_addresses(ex_df, "full_address")
    ex_df = std.remove_non_postal(ex_df, "full_address")
    ex = pd.DataFrame({"input": CORPUS})
    flag = ex_df["Excluded from search"].astype(object)
    ex["excluded"] = flag.where(pd.notna(flag), None)
    ex.to_parquet(OUT / "exclusion_golden.parquet", index=False)

    # LPI full-address assembly golden (tools/preparation.py:146-170,172-237)
    # preparation.py does `from tools.standardise import remove_postcode`;
    # alias the already-loaded module so the import resolves.
    import types

    tools_pkg = types.ModuleType("tools")
    tools_pkg.__path__ = [str(REF)]
    sys.modules.setdefault("tools", tools_pkg)
    sys.modules.setdefault("tools.standardise", std)
    prep = load_module("ref_preparation", REF / "preparation.py")
    lpi_rows = [
        dict(Organisation="", SaoText="", SaoStartNumber="2", SaoStartSuffix="",
             SaoEndNumber="", SaoEndSuffix="", PaoText="", PaoStartNumber="12",
             PaoStartSuffix="", PaoEndNumber="", PaoEndSuffix="",
             Street="HIGH STREET", PostTown="LONDON", Postcode="SW9 7QD"),
        dict(Organisation="ACME LTD", SaoText="FLAT 1", SaoStartNumber="",
             SaoStartSuffix="", SaoEndNumber="", SaoEndSuffix="",
             PaoText="MAPLE COURT", PaoStartNumber="12", PaoStartSuffix="A",
             PaoEndNumber="16", PaoEndSuffix="B", Street="ACRE LANE",
             PostTown="LONDON", Postcode="SW2 5SG"),
        dict(Organisation="", SaoText="UNIT 1 - 2", SaoStartNumber="-999",
             SaoStartSuffix="", SaoEndNumber="-999", SaoEndSuffix="",
             PaoText="KIRBY- ESTATE", PaoStartNumber="22", PaoStartSuffix="",
             PaoEndNumber="24", PaoEndSuffix="", Street="LAMBETH WALK",
             PostTown="LONDON", Postcode="SE11 6QX"),
        dict(Organisation="", SaoText="THE -ANNEX", SaoStartNumber="3.0",
             SaoStartSuffix="", SaoEndNumber="", SaoEndSuffix="",
             PaoText="", PaoStartNumber="7.0", PaoStartSuffix="",
             PaoEndNumber="", PaoEndSuffix="", Street="CHURCH LANE",
             PostTown="", Postcode="N1 3QP"),
        dict(Organisation="", SaoText="", SaoStartNumber="", SaoStartSuffix="",
             SaoEndNumber="", SaoEndSuffix="", PaoText="", PaoStartNumber="",
             PaoStartSuffix="", PaoEndNumber="", PaoEndSuffix="", Street="",
             PostTown="", Postcode=""),
    ]
    lpi = pd.DataFrame(lpi_rows)
    full = prep.create_full_address(lpi.copy())
    # the fulladdress second cleanup pass (tools/preparation.py:221-227)
    cleaned = (
        full.str.replace("-999", "")
        .str.replace(" -", " ")
        .str.replace("- ", " ")
        .str.replace(".0", "", regex=False)
        .str.replace(r"\s{2,}", " ", regex=True)
        .str.strip()
    )
    lpi_golden = lpi.copy()
    lpi_golden["full_address"] = full
    lpi_golden["fulladdress_cleaned"] = cleaned
    lpi_golden.to_parquet(OUT / "lpi_full_address_golden.parquet", index=False)

    print("golden fixtures written to", OUT)
    print(golden.head(20).to_string())


if __name__ == "__main__":
    main()
