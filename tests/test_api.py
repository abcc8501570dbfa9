"""One-call API: a reference user's workflow — arbitrary-schema reference
in, matched results + join-back + clusters + summary out."""

from __future__ import annotations

import pytest

from address_matcher_spark import api


@pytest.fixture(scope="module")
def llpg_ref(spark):
    """Reference extract in the ON-PREM LLPG schema (not LPI) — the API
    must coerce it transparently."""
    rows = [("12", "OAK ROAD", "LONDON", "SW9 7QD", 110),
            ("7", "ELM STREET", "CROYDON", "CR2 6XH", 111),
            ("31", "MAPLE GROVE", "LONDON", "SW9 7XX", 112)]
    return spark.createDataFrame(
        [dict(ref_id=i, Address_LPI=f"{n} {s}", Num_LPI=n, Street=s,
              Postal_Town_LPI=t, Postcode_LPI=pc, UPRN_BLPU=u)
         for i, (n, s, t, pc, u) in enumerate(rows)]
    )


@pytest.fixture(scope="module")
def search(spark):
    rows = [(1, "12 oak road", "LONDON", "SW9 7QD"),
            (2, "7 elm st", "CROYDON", "CR2 6XH"),
            (3, "99 nowhere lane", "LEEDS", "LS1 4AB")]
    return spark.createDataFrame(
        [dict(record_id=i, address_line1=a, address_line2="", town=t,
              postcode=pc) for i, a, t, pc in rows]
    )


def test_match_addresses_end_to_end(search, llpg_ref):
    out = api.match_addresses(search, llpg_ref)
    res = {r["record_id"]: r for r in out.results.collect()}
    assert res[1]["full_match"] and res[1]["UPRN"] == 110
    assert res[2]["full_match"] and res[2]["UPRN"] == 111  # 'st' synonym
    # record 3's area is absent from the reference → co-filtered, never
    # attempted, but still present in the join-back with matched=false
    assert 3 not in res
    orig = {r["record_id"]: r for r in out.results_on_orig.collect()}
    assert len(orig) == 3
    assert orig[1]["matched_with_reference"] is True
    assert orig[3]["matched_with_reference"] is False
    summary = out.summary.collect()[0]
    assert summary["attempted"] == 2 and summary["matched"] == 2
    assert out.clusters.count() == 2


def test_match_addresses_incremental(search, llpg_ref, spark):
    first = api.match_addresses(search, llpg_ref)
    second = api.match_addresses(search, llpg_ref,
                                 prior_results=first.results)
    # everything matchable was matched in run 1 → run 2 attempts nothing
    assert second.summary.collect()[0]["attempted"] == 0
