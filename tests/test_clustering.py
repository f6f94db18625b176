"""kmeans_embeddings correctness: against a pure-python reference of
the same integer-exact Lloyd's contract, plus determinism, the
empty-cluster keep rule, and argument validation."""

from __future__ import annotations

import pytest

from trisk_datawrangle_spark.llm.clustering import (
    _requantize_center,
    kmeans_embeddings,
)

_SCALE = 1_000_000


def _py_kmeans(vecs: dict[int, list[float]], k: int, n_iter: int):
    """Reference implementation of the exact contract (quantize,
    argmin with (dist, j) tiebreak, integer re-quantized centers,
    empty cluster keeps its center)."""
    q = {
        i: [
            int(_round_half_away(x * _SCALE)) for x in v
        ]
        for i, v in vecs.items()
    }
    centers = [q[i] for i in sorted(q)[:k]]

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), j)
                for j, c in enumerate(centers)
            )
            out[i] = best  # (dist, j)
        return out

    for _ in range(n_iter - 1):
        a = assign()
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for i, (_, j) in a.items():
            counts[j] = counts.get(j, 0) + 1
            s = sums.setdefault(j, [0] * len(q[i]))
            for d, x in enumerate(q[i]):
                s[d] += x
        centers = [
            [_requantize_center(sums[j][d], counts[j])
             for d in range(len(centers[j]))]
            if j in counts
            else centers[j]
            for j in range(k)
        ]
    return {i: (j, dist) for i, (dist, j) in assign().items()}


def _round_half_away(x: float) -> int:
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(
        math.floor(-x + 0.5)
    )


@pytest.fixture(scope="module")
def small(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    return df, {i: v for i, v in rows}


def test_matches_python_reference(spark, small):
    df, vecs = small
    got = {
        r["id"]: (r["cluster"], r["dist_sq"])
        for r in kmeans_embeddings(df, "embedding", "id", k=3, n_iter=3)
        .collect()
    }
    # the DataFrame column is array<float>: round-trip the reference
    # inputs through float32 so both sides quantize the same value
    # (exact .5 scaled ties don't occur with uniform random floats)
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    want = _py_kmeans(
        {i: [f32(x) for x in v] for i, v in vecs.items()}, 3, 3
    )
    assert got == want


def test_deterministic_across_runs(spark, small):
    df, _ = small
    a = sorted(
        kmeans_embeddings(df, "embedding", "id", k=4, n_iter=2).collect()
    )
    b = sorted(
        kmeans_embeddings(df, "embedding", "id", k=4, n_iter=2).collect()
    )
    assert a == b


def test_empty_cluster_keeps_center(spark):
    # two tight groups, k=3: the third seed (id 2) is inside group A,
    # loses all members after one update, and must keep its center
    # (the run must not error and must still output 3 or fewer ids)
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.001, 0.0]),
        (2, [0.002, 0.0]),
        (3, [0.4, 0.4]),
        (4, [0.401, 0.4]),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    out = kmeans_embeddings(df, "embedding", "id", k=3, n_iter=4).collect()
    assert len(out) == 5
    assert {r["cluster"] for r in out} <= {0, 1, 2}


def test_validation(spark, small):
    df, _ = small
    with pytest.raises(ValueError, match="k"):
        kmeans_embeddings(df, "embedding", "id", k=0)
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_embeddings(df, "embedding", "id", k=100)


def test_semdedup_contract(spark):
    from trisk_datawrangle_spark.llm.clustering import semdedup

    # two near-identical vectors (0,1) far from an orthogonal pair
    # (2,3); with k=2 the tight pairs co-cluster and the higher id of
    # each cosine-duplicate pair is marked
    rows = [
        (0, [0.30, 0.30, 0.0]),
        (1, [0.301, 0.30, 0.0]),
        (2, [-0.30, 0.0, 0.30]),
        (3, [-0.301, 0.0, 0.30]),
        (4, [0.0, -0.4, -0.4]),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    got = {
        r["id"]: r["is_dup"]
        for r in semdedup(
            df, "embedding", "id", k=2, n_iter=2, threshold=0.99
        ).collect()
    }
    assert got[0] is False          # lower id of its dup pair survives
    assert got[1] is True           # cosine(v0, v1) ~ 1 > 0.99
    assert got[4] is False          # isolated vector never marked
    # pair (2,3) is near-identical too: the higher id is marked IF
    # they share a cluster (they must — they're antipodal to group A)
    assert got[3] or not (got[2] or got[3])


def test_semdedup_cluster_scoping(spark):
    from trisk_datawrangle_spark.llm.clustering import semdedup

    # identical vectors forced into DIFFERENT clusters are NOT
    # compared: with k = n and n_iter=1 every vector seeds its own
    # cluster and nothing can be marked even at threshold 0
    rows = [(i, [0.5, 0.5]) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    got = semdedup(df, "embedding", "id", k=3, n_iter=1, threshold=0.0)
    # all three sit at distance 0 from every center; argmin tiebreak
    # sends them ALL to cluster 0, so 1 and 2 are dups of 0
    vals = {r["id"]: (r["cluster"], r["is_dup"]) for r in got.collect()}
    assert vals == {0: (0, False), 1: (0, True), 2: (0, True)}


def test_pandas_argmin_path_matches_literal(spark, small, monkeypatch):
    # force the vectorized numpy argmin (the large-k path) and assert
    # bit-identical output to the codegen literal path — both are
    # exact int64 arithmetic with a first-minimum (low-j) tiebreak
    import trisk_datawrangle_spark.llm.clustering as cl

    df, _ = small
    lit = sorted(
        kmeans_embeddings(df, "embedding", "id", k=3, n_iter=3).collect()
    )
    monkeypatch.setattr(cl, "_LITERAL_ARGMIN_MAX_TERMS", 0)
    pnd = sorted(
        kmeans_embeddings(df, "embedding", "id", k=3, n_iter=3).collect()
    )
    assert lit == pnd
