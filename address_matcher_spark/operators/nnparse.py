"""NN address-parser inference harness (N1-N3, optional plug-in).

The reference parses search addresses into LPI fields with a char-level
bidirectional RNN tagger (tools/pytorch_models.py:38-73) driven by a
batched predict loop (tools/model_predict.py:180-230) and regroups the
per-char category predictions into field strings
(tools/model_predict.py:205-230, torch_predictions_to_dicts).  The
trained weights are not shipped — the reference skips the pass when the
model file is absent (tools/matcher_funcs.py:1028-1033) — so what this
module delivers is the SCALE HARNESS itself, runnable with any weights:

  * weights live in ONE driver-side object, broadcast once per job
    (SparkContext.broadcast), deserialised once per executor — never
    shipped per task or per row;
  * inference runs in a `mapInPandas` ITERATOR UDF: each Arrow batch is
    sub-chunked so the padded char matrix stays bounded
    (chunk × max_len × hidden), whatever the upstream partition size;
  * the forward pass is pure NumPy (torch is absent in this sandbox; on a
    real cluster the `_forward` function body is the only thing to swap);
  * padding is mask-correct in BOTH GRU directions, so per-row results
    are independent of batch composition — resume/repartition safe.

Parity: tests/test_nnparse.py checks the Spark path byte-equals the
driver-side forward on the same rows (harness plumbing is the unit under
test), plus batching-invariance (batch of 1 == batch of N).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-char tag categories (tools/model_predict.py index_to_category;
# IGNORE is dropped at regroup time, tools/model_predict.py:237)
CATEGORIES = [
    "IGNORE", "SaoText", "SaoStartNumber", "SaoStartSuffix", "PaoText",
    "PaoStartNumber", "PaoStartSuffix", "Street", "PostTown", "Postcode",
]
VOCAB = " abcdefghijklmnopqrstuvwxyz0123456789-,'"
PAD_IDX = len(VOCAB)       # '<pad>'
UNK_IDX = len(VOCAB) + 1   # '<UNK>'
VOCAB_SIZE = len(VOCAB) + 2


@dataclass
class CharTagger:
    """Weight container for the bi-directional char tagger (numpy arrays
    only, so it broadcast-serialises without torch).  `kind` selects the
    recurrent cell — 'gru' or 'lstm' (N5, tools/constants.py:64 selects
    the variant by model_type; both run through the same harness)."""
    emb: np.ndarray                      # [vocab, d]
    gru_f: dict = field(default_factory=dict)  # gate weights, keys per kind
    gru_b: dict = field(default_factory=dict)
    fc_w: np.ndarray = None              # [2h, n_cat]
    fc_b: np.ndarray = None              # [n_cat]
    kind: str = "gru"

    @property
    def hidden(self) -> int:
        key = "Uz" if self.kind == "gru" else "Ui"
        return self.gru_f[key].shape[0]


def init_tiny_model(seed: int = 13, dim: int = 12, hidden: int = 16,
                    n_cat: int = len(CATEGORIES), kind: str = "gru") -> CharTagger:
    """Deterministic tiny model for harness tests (stands in for trained
    weights the reference does not ship)."""
    rng = np.random.RandomState(seed)

    def w(*shape):
        return (rng.randn(*shape) * 0.3).astype(np.float64)

    def gru():
        return {
            "Wz": w(dim, hidden), "Wr": w(dim, hidden), "Wn": w(dim, hidden),
            "Uz": w(hidden, hidden), "Ur": w(hidden, hidden), "Un": w(hidden, hidden),
            "bz": w(hidden), "br": w(hidden), "bn": w(hidden), "bhn": w(hidden),
        }

    def lstm():
        g = {}
        for gate in ("i", "f", "g", "o"):
            g[f"W{gate}"] = w(dim, hidden)
            g[f"U{gate}"] = w(hidden, hidden)
            g[f"b{gate}"] = w(hidden)
        return g

    cell = gru if kind == "gru" else lstm
    return CharTagger(
        emb=w(VOCAB_SIZE, dim), gru_f=cell(), gru_b=cell(),
        fc_w=w(2 * hidden, n_cat), fc_b=w(n_cat), kind=kind,
    )


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _encode(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """texts → right-padded index matrix [B, T] + mask [B, T]
    (tools/model_predict.py:183-189 semantics: unknown chars → <UNK>)."""
    idx = {c: i for i, c in enumerate(VOCAB)}
    rows = [[idx.get(ch, UNK_IDX) for ch in (t or "").lower()] for t in texts]
    max_len = max((len(r) for r in rows), default=1) or 1
    mat = np.full((len(rows), max_len), PAD_IDX, dtype=np.int64)
    mask = np.zeros((len(rows), max_len), dtype=np.float64)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = r
        mask[i, : len(r)] = 1.0
    return mat, mask


def _gru_direction(x: np.ndarray, mask: np.ndarray, g: dict,
                   reverse: bool) -> np.ndarray:
    """Masked GRU over [B, T, d] → [B, T, h].  Padded steps carry the
    previous hidden state, so results are batch-composition invariant."""
    B, T, _ = x.shape
    h = np.zeros((B, g["Uz"].shape[0]), dtype=np.float64)
    out = np.zeros((B, T, h.shape[1]), dtype=np.float64)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        xt = x[:, t, :]
        m = mask[:, t][:, None]
        z = _sigmoid(xt @ g["Wz"] + h @ g["Uz"] + g["bz"])
        r = _sigmoid(xt @ g["Wr"] + h @ g["Ur"] + g["br"])
        n = np.tanh(xt @ g["Wn"] + r * (h @ g["Un"] + g["bhn"]) + g["bn"])
        h_new = (1.0 - z) * n + z * h
        h = m * h_new + (1.0 - m) * h
        out[:, t, :] = h * m
    return out


def _lstm_direction(x: np.ndarray, mask: np.ndarray, g: dict,
                    reverse: bool) -> np.ndarray:
    """Masked LSTM over [B, T, d] → [B, T, h] (N5 variant)."""
    B, T, _ = x.shape
    H = g["Ui"].shape[0]
    h = np.zeros((B, H), dtype=np.float64)
    c = np.zeros((B, H), dtype=np.float64)
    out = np.zeros((B, T, H), dtype=np.float64)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        xt = x[:, t, :]
        m = mask[:, t][:, None]
        i = _sigmoid(xt @ g["Wi"] + h @ g["Ui"] + g["bi"])
        f = _sigmoid(xt @ g["Wf"] + h @ g["Uf"] + g["bf"])
        gg = np.tanh(xt @ g["Wg"] + h @ g["Ug"] + g["bg"])
        o = _sigmoid(xt @ g["Wo"] + h @ g["Uo"] + g["bo"])
        c_new = f * c + i * gg
        h_new = o * np.tanh(c_new)
        c = m * c_new + (1.0 - m) * c
        h = m * h_new + (1.0 - m) * h
        out[:, t, :] = h * m
    return out


def forward_tags(model: CharTagger, texts: list[str]) -> list[list[int]]:
    """Batch forward: per-char argmax category indices (the numpy analogue
    of tools/model_predict.py:180-202 predict_torch)."""
    if not texts:
        return []
    mat, mask = _encode(texts)
    x = model.emb[mat]                      # [B, T, d]
    cell = _gru_direction if model.kind == "gru" else _lstm_direction
    hf = cell(x, mask, model.gru_f, reverse=False)
    hb = cell(x, mask, model.gru_b, reverse=True)
    logits = np.concatenate([hf, hb], axis=2) @ model.fc_w + model.fc_b
    tags = logits.argmax(axis=2)            # [B, T]
    out = []
    lens = mask.sum(axis=1).astype(int)
    for i, L in enumerate(lens):
        out.append(tags[i, :L].tolist())
    return out


def fields_from_tags(text: str, tags: list[int]) -> dict[str, str]:
    """Regroup per-char tags into field strings, dropping IGNORE
    (tools/model_predict.py:205-237)."""
    out: dict[str, str] = {}
    for ch, tag in zip((text or "").lower(), tags):
        cat = CATEGORIES[tag]
        if cat == "IGNORE":
            continue
        out[cat] = out.get(cat, "") + ch
    return out


def predict_fields(
    df: DataFrame,
    model: CharTagger,
    text_col: str = "full_address",
    id_col: str = "record_id",
    chunk_rows: int = 1024,
) -> DataFrame:
    """N2/N3: distributed inference.  Weights broadcast once; each Arrow
    batch is sub-chunked so the padded [chunk, max_len, hidden] tensors
    stay bounded regardless of partition size."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)
    cats = [c for c in CATEGORIES if c != "IGNORE"]
    schema = f"{id_col} long, " + ", ".join(f"nn_{c} string" for c in cats)

    def infer(batches):
        m = bc.value
        for pdf in batches:
            for lo in range(0, len(pdf), chunk_rows):
                chunk = pdf.iloc[lo: lo + chunk_rows]
                texts = chunk[text_col].fillna("").tolist()
                tag_rows = forward_tags(m, texts)
                cols: dict[str, list] = {id_col: chunk[id_col].tolist()}
                for c in cats:
                    cols[f"nn_{c}"] = []
                for text, tags in zip(texts, tag_rows):
                    fields = fields_from_tags(text, tags)
                    for c in cats:
                        cols[f"nn_{c}"].append(fields.get(c))
                yield pd.DataFrame(cols)

    return df.select(id_col, text_col).mapInPandas(infer, schema)


def post_predict_clean(
    preds: DataFrame,
    search: DataFrame,
    id_col: str = "record_id",
    postcode_col: str = "postcode",
) -> DataFrame:
    """N4 (tools/model_predict.py:262-302): normalise the prediction frame
    for the score-based pass — missing LPI columns become blank strings,
    pandas' float-cast artefacts ('.0') are stripped, and the model's
    predicted postcode is kept only as nn_Postcode_predict while the
    INPUT postcode replaces it (the reference trusts the data's postcode
    over the model's to minimise match errors)."""
    cats = [c for c in CATEGORIES if c != "IGNORE"]
    out = preds
    for c in cats:
        col = f"nn_{c}"
        if col not in out.columns:
            out = out.withColumn(col, F.lit(""))
        else:
            cleaned = F.regexp_replace(
                F.coalesce(F.col(col).cast("string"), F.lit("")), r"\.0", ""
            )
            out = out.withColumn(col, cleaned)
    out = out.withColumnRenamed("nn_Postcode", "nn_Postcode_predict")
    pc = search.select(
        F.col(id_col),
        F.coalesce(F.col(postcode_col).cast("string"), F.lit(""))
        .alias("nn_Postcode"),
    )
    return out.join(pc, id_col, "left")
