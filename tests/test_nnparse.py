"""NN-parse harness (N1-N3): the Spark mapInPandas path must byte-equal
the driver-side numpy forward on the same rows, and the masked bi-GRU
must be batch-composition invariant (padding never leaks into results)."""

from __future__ import annotations

import pytest

from address_matcher_spark.operators import nnparse as N

ADDRS = [
    "12 oak road london sw9 7qd",
    "flat 3 7 elm street croydon",
    "maple house, 31-33 hazel grove",
    "x",
    "",
    "98 willow walk, peckham se15 4ab",
]


@pytest.fixture(scope="module")
def model():
    return N.init_tiny_model(seed=13)


def test_batching_invariance(model):
    """Right-padding + masked GRU: a row's tags must not depend on which
    rows share its batch (resume/repartition safety)."""
    batch = N.forward_tags(model, ADDRS)
    singles = [N.forward_tags(model, [a])[0] for a in ADDRS]
    assert batch == singles


def test_fields_regroup_drops_ignore(model):
    tags = N.forward_tags(model, [ADDRS[0]])[0]
    fields = N.fields_from_tags(ADDRS[0], tags)
    assert "IGNORE" not in fields
    # every non-IGNORE char lands in exactly one field, in order
    joined = "".join(fields.values())
    kept = [ch for ch, t in zip(ADDRS[0], tags) if N.CATEGORIES[t] != "IGNORE"]
    assert sorted(joined) == sorted(kept)


def test_spark_parity_with_local_forward(spark, model):
    """The deliverable: broadcast + mapInPandas + chunking reproduces the
    driver-side forward exactly (chunk_rows=2 forces multi-chunk batches)."""
    rows = [(i, a) for i, a in enumerate(ADDRS * 3)]
    df = spark.createDataFrame(rows, "record_id long, full_address string")
    got = {
        r["record_id"]: r
        for r in N.predict_fields(df.repartition(3), model, chunk_rows=2).collect()
    }
    cats = [c for c in N.CATEGORIES if c != "IGNORE"]
    for rid, addr in rows:
        tags = N.forward_tags(model, [addr])[0]
        want = N.fields_from_tags(addr, tags)
        for c in cats:
            assert got[rid][f"nn_{c}"] == want.get(c), (rid, c)
