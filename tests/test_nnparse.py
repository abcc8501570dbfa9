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


def test_lstm_variant_runs_and_is_invariant():
    """N5: model_type selects the cell; same harness, same invariants."""
    m = N.init_tiny_model(seed=13, kind="lstm")
    batch = N.forward_tags(m, ADDRS)
    singles = [N.forward_tags(m, [a])[0] for a in ADDRS]
    assert batch == singles
    assert N.forward_tags(m, ADDRS) != N.forward_tags(
        N.init_tiny_model(seed=13, kind="gru"), ADDRS
    )


def test_post_predict_clean(spark, model):
    """N4: '.0' stripped, missing cols blank, input postcode replaces the
    predicted one (kept as nn_Postcode_predict)."""
    rows = [(0, "12 oak road sw9 7qd"), (1, "7 elm street")]
    df = spark.createDataFrame(rows, "record_id long, full_address string")
    from pyspark.sql import functions as F

    preds = N.predict_fields(df, model).withColumn(
        "nn_PaoStartNumber", F.lit("12.0")
    )
    search = spark.createDataFrame(
        [(0, "SW9 7QD"), (1, None)], "record_id long, postcode string"
    )
    out = {r["record_id"]: r
           for r in N.post_predict_clean(preds, search).collect()}
    assert out[0]["nn_PaoStartNumber"] == "12"
    assert out[0]["nn_Postcode"] == "SW9 7QD"
    assert out[1]["nn_Postcode"] == ""
    assert "nn_Postcode_predict" in out[0].asDict()
