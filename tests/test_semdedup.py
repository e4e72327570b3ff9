"""SemDeDup operator tests: keep-lowest-id semantics, threshold
branches, zero-norm safety, and the KMeans-fitted quantizer path."""

from __future__ import annotations

from pyspark.sql import functions as F

from reviews_quality_check_spark.operators.ann import fixed_centroids, semdedup

DIM = 8


def _embs(spark, rows):
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("vec_id"),
                F.array(*[F.lit(float(x)) for x in v])
                .cast("array<float>")
                .alias("embedding"),
            )
            for i, v in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def _base_rows():
    v = [1.0, 0.5, -0.25, 0.125, 1.0, -0.5, 0.25, 2.0]
    near = list(v)
    near[7] = 2.01  # cos ~ 0.99997
    far = [-x for x in v]  # cos = -1
    ortho = [0.5, -1.0, 0.25, 2.0, -0.5, 1.0, -2.0, 0.125]
    return [(0, v), (1, near), (2, far), (3, ortho)]


def test_semdedup_drops_higher_id_of_near_pair(spark):
    out = {
        r.vec_id: r
        for r in semdedup(
            _embs(spark, _base_rows()),
            threshold=0.96,
            n_cells=4,
            centroids=fixed_centroids(DIM, 4),
            dim=DIM,
        ).collect()
    }
    assert out[0].keep is True  # lowest id of the dup pair survives
    assert out[1].keep is False
    assert out[2].keep is True and out[3].keep is True
    # dup pair must share a cell (near-identical vectors)
    assert out[0].cell == out[1].cell
    assert len(out) == 4


def test_semdedup_threshold_excludes_moderate_similarity(spark):
    # raise tau above the pair's cosine -> nothing dropped
    out = semdedup(
        _embs(spark, _base_rows()),
        threshold=1.1,
        n_cells=4,
        centroids=fixed_centroids(DIM, 4),
        dim=DIM,
    ).collect()
    assert all(r.keep for r in out)


def test_semdedup_zero_norm_vector_kept(spark):
    rows = _base_rows() + [(9, [0.0] * DIM), (10, [0.0] * DIM)]
    out = {
        r.vec_id: r
        for r in semdedup(
            _embs(spark, rows),
            threshold=0.96,
            n_cells=4,
            centroids=fixed_centroids(DIM, 4),
            dim=DIM,
        ).collect()
    }
    # two zero vectors: cosine guarded to 0.0, both kept even if co-celled
    assert out[9].keep is True and out[10].keep is True


def test_semdedup_sign_planes_mode(spark):
    # hyperplane-sign quantizer (the registered/scale path): same
    # verdicts — dup pair co-celled (identical direction -> identical
    # sign bits), moderate/far pairs kept; zero-norm rows never pair
    from reviews_quality_check_spark.operators.ann import md5_unit

    planes = [[md5_unit(f"sd{i}:{j}") for j in range(DIM)] for i in range(3)]
    rows = _base_rows() + [(9, [0.0] * DIM), (10, [0.0] * DIM)]
    out = {
        r.vec_id: r
        for r in semdedup(
            _embs(spark, rows), threshold=0.96, planes=planes, dim=DIM
        ).collect()
    }
    assert out[0].keep is True and out[1].keep is False
    assert out[0].cell == out[1].cell
    assert out[2].keep is True and out[3].keep is True
    assert out[9].keep is True and out[10].keep is True
    assert all(0 <= r.cell < 8 for r in out.values())


def test_semdedup_kmeans_path_matches_fixed_on_dup_pair(spark):
    # fitted quantizer still co-cells near-identical vectors -> same verdict
    out = {
        r.vec_id: r
        for r in semdedup(
            _embs(spark, _base_rows()), threshold=0.96, n_cells=2, dim=DIM
        ).collect()
    }
    assert out[0].keep is True and out[1].keep is False
