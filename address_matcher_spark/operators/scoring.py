"""Pairwise scoring operators — the only Python in the hot path, as
Arrow-batched vectorized pandas UDFs (never per-row Python UDFs).

Reproduces the reference's scorer surface:
  P1 token_set_ratio with score_cutoff (tools/fuzzy_match.py:88-94)
  P2 plain ratio tie-breaker (tools/fuzzy_match.py:296-308)
  P3 Jaro-Winkler per-field similarity (tools/recordlinkage_funcs.py:62-66)
  P4 Levenshtein — built-in Spark SQL ``levenshtein`` (no UDF needed)
  P5 exact compare — plain column equality

Scale notes: the kernels release no GIL but each Spark task runs its own
Python worker, so parallelism comes from partitioning (the reference used
``workers=-1`` inside one process; we shard across tasks instead —
tools/fuzzy_match.py:88 note in SURVEY §2.8/X5).  The batch kernels
deduplicate repeated strings within an Arrow batch, which mirrors the
reference's per-block cdist reuse of the small side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from address_matcher_spark import kernels as K

FUZZY_MATCH_LIMIT = 85.0  # tools/constants.py:39
NO_NUMBER_FUZZY_MATCH_LIMIT = 100.0  # tools/constants.py:235


def block_cross_score(
    search: "DataFrame",
    ref: "DataFrame",
    key_cols: list[str],
    cutoff: float = FUZZY_MATCH_LIMIT,
    search_id: str = "record_id",
    ref_id: str = "ref_id",
    search_addr: str = "search_mod_address",
    ref_addr: str = "reference_mod_address",
    block_col: str | None = None,
):
    """J1, the cdist shape: cogroup both sides by the block key and score
    the full cross product INSIDE the UDF (tools/fuzzy_match.py:88-94).

    Arrow transfer is O(block rows), not O(pairs): each side's strings
    cross the JVM↔Python boundary once per block, tokenisation happens
    once per row, and only pairs >= cutoff come back — for a 5k x 6k
    block that is ~30M in-memory comparisons but only thousands of
    result rows.  Skew is handled upstream by salting the search side
    and replicating the ref side, which splits a heavy block's cross
    product across salt groups.

    block_col: when the caller packed many blocks into one cogroup key
    (blocking.pack_groups), the real block key arrives as a DATA column
    of this name; the UDF sub-groups by it (one factorize + argsort per
    bucket) and scores each block's cross product separately — identical
    pair set, ~#buckets UDF dispatches instead of ~#blocks.
    """
    import numpy as np

    out_schema = f"{search_id} long, {ref_id} long, fuzzy_score double"

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import os
        import time

        prof_dir = os.environ.get("SPARK_GRAFT_PROF_DIR")
        t0 = time.perf_counter() if prof_dir else 0.0
        c0 = time.process_time() if prof_dir else 0.0
        if left.empty or right.empty:
            return pd.DataFrame({search_id: [], ref_id: [], "fuzzy_score": []})
        lids = left[search_id].to_numpy()
        rids = right[ref_id].to_numpy()
        ltoks = [("" if s is None else s).split() for s in left[search_addr]]
        rtoks = [("" if s is None else s).split() for s in right[ref_addr]]
        tk = time.perf_counter() if prof_dir else 0.0
        pairs = 0
        if block_col is None:
            pairs = len(lids) * len(rids)
            il, jr, sc = K.cross_token_set_scores(ltoks, rtoks, cutoff)
            out = pd.DataFrame({
                search_id: lids[il],
                ref_id: rids[jr],
                "fuzzy_score": sc,
            })
        else:
            lb = left[block_col].to_numpy(dtype=object)
            rb = right[block_col].to_numpy(dtype=object)
            codes, uniq = pd.factorize(np.concatenate([lb, rb]))
            lc, rc = codes[: len(lb)], codes[len(lb):]
            lo = np.argsort(lc, kind="stable")
            ro = np.argsort(rc, kind="stable")
            edges = np.arange(len(uniq) + 1)
            lsplit = np.searchsorted(lc[lo], edges)
            rsplit = np.searchsorted(rc[ro], edges)
            id_parts: list[np.ndarray] = []
            rid_parts: list[np.ndarray] = []
            sc_parts: list[np.ndarray] = []
            for u in range(len(uniq)):
                li = lo[lsplit[u]:lsplit[u + 1]]
                ri = ro[rsplit[u]:rsplit[u + 1]]
                if len(li) == 0 or len(ri) == 0:
                    continue  # block present on one side only in this salt
                pairs += len(li) * len(ri)
                il, jr, sc = K.cross_token_set_scores(
                    [ltoks[i] for i in li], [rtoks[j] for j in ri], cutoff
                )
                if len(il):
                    id_parts.append(lids[li][il])
                    rid_parts.append(rids[ri][jr])
                    sc_parts.append(sc)
            if id_parts:
                out = pd.DataFrame({
                    search_id: np.concatenate(id_parts),
                    ref_id: np.concatenate(rid_parts),
                    "fuzzy_score": np.concatenate(sc_parts),
                })
            else:
                out = pd.DataFrame(
                    {search_id: [], ref_id: [], "fuzzy_score": []})
        if prof_dir:
            # scaling-residue instrumentation (scripts/profile_block_score
            # .py): per-group (start, call wall s, kernel wall s, pairs,
            # call CPU s).  wall vs CPU separates memory-stall slowdown
            # (on-core, inflates both) from OS descheduling under
            # oversubscription (inflates wall only).
            t1 = time.perf_counter()
            c1 = time.process_time()
            with open(f"{prof_dir}/{os.getpid()}.csv", "a") as fh:
                fh.write(
                    f"{t0},{t1 - t0},{t1 - tk},{pairs},"
                    f"{c1 - c0}\n"
                )
        return out

    return (
        search.groupBy(*key_cols)
        .cogroup(ref.groupBy(*key_cols))
        .applyInPandas(score, out_schema)
    )


@F.pandas_udf(DoubleType())
def ratio_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """P2: plain Indel ratio (the reference's misnamed 'wratio' tie-break
    uses fuzz.ratio — tools/fuzzy_match.py:298)."""
    return pd.Series(
        K.ratio_batch(
            left.fillna("").to_numpy(dtype=object),
            right.fillna("").to_numpy(dtype=object),
        )
    )


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """P3: Jaro-Winkler similarity in [0,1] (jellyfish-compatible)."""
    return pd.Series(
        K.jaro_winkler_batch(
            left.fillna("").to_numpy(dtype=object),
            right.fillna("").to_numpy(dtype=object),
        )
    )


def levenshtein_similarity(left: Column, right: Column) -> Column:
    """P4: recordlinkage's normalized levenshtein similarity
    (1 - dist/max(len)) using the built-in JVM levenshtein."""
    maxlen = F.greatest(F.length(left), F.length(right))
    return F.when(maxlen == 0, F.lit(0.0)).otherwise(
        1.0 - F.levenshtein(left, right) / maxlen
    )


def exact_similarity(left: Column, right: Column) -> Column:
    """P5: exact compare with missing→0 (tools/recordlinkage_funcs.py:57-59)."""
    return F.when(left.isNull() | right.isNull(), F.lit(0.0)).otherwise(
        (left == right).cast("double")
    )
