"""Per-label embedding outlier flags (operators/similarity.label_outliers).

The oracle replay (tests/test_queries_oracle.py: embedding_outliers)
pins exact values vs DuckDB; these tests pin the operator's semantic
contract -- cut size, bottom-of-group selection, determinism under
repartitioning -- independently of the registry wiring.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.similarity import (
    label_outliers,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cut_size_is_floor_frac_per_label(spark):
    out = label_outliers(_emb(spark), frac=0.2).toPandas()
    per = out.groupby("label").agg(n=("vec_id", "size"),
                                   k=("is_outlier", "sum"))
    for label, row in per.iterrows():
        assert row.k == math.floor(0.2 * row.n), (label, row.n, row.k)


def test_flagged_are_the_least_similar_in_their_label(spark):
    out = label_outliers(_emb(spark), frac=0.25).toPandas()
    for _, g in out.groupby("label"):
        g = g.sort_values(["centroid_sim", "vec_id"]).reset_index(drop=True)
        k = int(g.is_outlier.sum())
        # the flagged set is exactly the first k rows of the
        # (sim, vec_id) ordering -- no interleaving
        assert g.is_outlier.iloc[:k].all()
        assert not g.is_outlier.iloc[k:].any()


def test_frac_zero_flags_nothing(spark):
    out = label_outliers(_emb(spark), frac=0.0)
    assert out.filter(F.col("is_outlier") == 1).count() == 0


def test_deterministic_under_repartition(spark):
    e = _emb(spark)
    a = label_outliers(e, frac=0.1).toPandas()
    b = label_outliers(e.repartition(13), frac=0.1).toPandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_centroid_sim_matches_pandas_brute_force(spark):
    import numpy as np

    out = (label_outliers(_emb(spark), frac=0.1).toPandas()
           .sort_values("vec_id").reset_index(drop=True))
    raw = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype="float64")
            for r in raw.itertuples()}
    cents = {}
    for label, g in raw.groupby("label"):
        cents[label] = np.mean(
            np.stack([vecs[int(i)] for i in g.vec_id]), axis=0)
    for r in out.itertuples():
        v, c = vecs[int(r.vec_id)], cents[r.label]
        cos = float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
        assert abs(round(cos, 6) - r.centroid_sim) < 1e-9, r.vec_id
