"""Exact neighbor-pruned Chamfer (ops/chamfer_pruned.py) — value parity.

The pruned pipeline's contract is BIT-equality with the brute-force Pallas path
(reference CUDA-kernel semantics, custom_metrics.py:471-577): pruning only
skips pairs whose bounding-box lower bound proves they cannot change any
running minimum, and the per-pair f32 math is shared with the brute kernel.
Pinned here on uniform, clustered/surface-like, tied-distance (lattice), and
degenerate clouds — scalar AND per-point minima, against both the brute Pallas
kernel and a dense enumeration pushed through the pruned pipeline's own pair
kernel (monkeypatched _ROUNDS so round 1 covers every tile pair)."""

import numpy as np
import pytest

from heal_swin_tpu.ops import chamfer as ch
from heal_swin_tpu.ops import chamfer_pruned as chp


def _brute_pallas(p, q):
    bp, bq = ch._bucket(len(p)), ch._bucket(len(q))
    pp = np.zeros((bp, 3), np.float32)
    pp[: len(p)] = p
    qp = np.zeros((bq, 3), np.float32)
    qp[: len(q)] = q
    pv, qv = np.arange(bp) < len(p), np.arange(bq) < len(q)
    return float(ch.chamfer_distance_masked_pallas(pp, qp, pv, qv, interpret=True))


def _clouds():
    rng = np.random.default_rng(3)
    uniform_p = (rng.normal(size=(9000, 3)) * 5).astype(np.float32)
    uniform_q = (rng.normal(size=(12000, 3)) * 5 - 1).astype(np.float32)
    # surface-like: a plane patch plus a far dense blob (foreground-clustered,
    # the shape of real unprojected depth maps)
    t = rng.uniform(-10, 10, size=(7000, 2))
    plane = np.stack([t[:, 0], 0.05 * rng.normal(size=7000), t[:, 1]], 1)
    blob = rng.normal(size=(4000, 3)) * 0.3 + np.asarray([30.0, 2.0, 40.0])
    clustered_p = np.concatenate([plane, blob]).astype(np.float32)
    clustered_q = (np.concatenate([plane + 0.01, blob - 0.02])
                   .astype(np.float32))[rng.permutation(11000)]
    # integer lattice: massively tied distances — pruning must not resolve ties
    # differently from the brute fold
    g = np.stack(np.meshgrid(*[np.arange(20)] * 3), -1).reshape(-1, 3)
    lattice_p = g.astype(np.float32)
    lattice_q = (g + 0.5).astype(np.float32)[rng.permutation(8000)][:6000]
    return {
        "uniform": (uniform_p, uniform_q),
        "clustered": (clustered_p, clustered_q),
        "lattice": (lattice_p, lattice_q),
        "tiny_asym": (uniform_p[:37], uniform_q[:4100]),
        "identical": (uniform_p[:5000], uniform_p[:5000].copy()),
    }


@pytest.mark.slow  # interpret-mode 1024^2 blocks, ~minutes each
@pytest.mark.parametrize("name", ["uniform", "clustered", "lattice", "tiny_asym",
                                  "identical"])
def test_pruned_bit_equals_brute(name):
    p, q = _clouds()[name]
    stats = {}
    pruned = chp.chamfer_distance_pruned(p, q, interpret=True, stats=stats)
    brute = _brute_pallas(p, q)
    assert np.float32(pruned).tobytes() == np.float32(brute).tobytes(), (
        f"{name}: {pruned!r} != {brute!r}"
    )
    # sanity vs an exact f64 KD-tree oracle (the difference-form kernels track
    # the true value even on near-identical clouds, where the jnp tiled-matmul
    # fallback's |p|^2+|q|^2-2p.q expansion catastrophically cancels)
    from scipy.spatial import cKDTree

    d_pq = cKDTree(q.astype(np.float64)).query(p.astype(np.float64), workers=-1)[0]
    d_qp = cKDTree(p.astype(np.float64)).query(q.astype(np.float64), workers=-1)[0]
    oracle = float(np.mean(d_pq**2) + np.mean(d_qp**2))
    assert pruned == pytest.approx(oracle, rel=1e-5, abs=1e-9)


@pytest.mark.slow  # interpret-mode 1024^2 blocks, ~minutes each
@pytest.mark.parametrize("name", ["uniform", "clustered", "lattice"])
def test_pruned_per_point_minima_bit_equal_dense(name, monkeypatch):
    """Per-point minima (both directions, original point order) bit-equal to a
    dense enumeration through the same pair kernel."""
    p, q = _clouds()[name]
    pruned_stats = {}
    chp.chamfer_distance_pruned(p, q, interpret=True, stats=pruned_stats)

    monkeypatch.setattr(chp, "_ROUNDS", (10**9,))  # round 1 = every tile pair
    dense_stats = {}
    chp.chamfer_distance_pruned(p, q, interpret=True, stats=dense_stats)
    assert dense_stats["round_pairs"][0] >= (
        -(-len(p) // chp._TP)) * (-(-len(q) // chp._TQ))

    for key in ("d_pq", "d_qp"):
        a, b = pruned_stats[key], dense_stats[key]
        assert a.shape == b.shape
        assert a.tobytes() == b.tobytes(), (
            f"{name}/{key}: {np.count_nonzero(a != b)} of {a.size} minima differ"
        )


@pytest.mark.slow  # interpret-mode 1024^2 blocks, ~minutes each
@pytest.mark.parametrize("name", ["uniform", "clustered"])
def test_pruned_chunked_launches_bit_equal(name, monkeypatch):
    """SMEM-sized pair-list chunking (the v5e 1 MiB scalar-prefetch budget at
    paper scale forces multi-launch folding) is bit-equal to the one-launch
    path: the fold is order-invariant and fillers are no-ops."""
    p, q = _clouds()[name]
    one = {}
    chamfer_one = chp.chamfer_distance_pruned(p, q, interpret=True, stats=one)

    monkeypatch.setattr(chp, "_MAX_ROWS_PER_LAUNCH", 4)  # force multi-launch
    many = {}
    chamfer_many = chp.chamfer_distance_pruned(p, q, interpret=True, stats=many)

    assert np.float32(chamfer_one).tobytes() == np.float32(chamfer_many).tobytes()
    for key in ("d_pq", "d_qp"):
        assert one[key].tobytes() == many[key].tobytes()


def test_pruned_empty_and_dispatch():
    assert np.isnan(chp.chamfer_distance_pruned(np.zeros((0, 3)), np.ones((5, 3))))
    # host-API dispatch: env override routes through the pruned path
    import os

    p = np.random.default_rng(0).normal(size=(300, 3)).astype(np.float32)
    q = p + 0.01
    os.environ["HEAL_SWIN_CHAMFER_IMPL"] = "jnp"
    try:
        a = ch.chamfer_distance(p, q)
    finally:
        del os.environ["HEAL_SWIN_CHAMFER_IMPL"]
    b = chp.chamfer_distance_pruned(p, q, interpret=True)
    assert a == pytest.approx(b, rel=1e-4)


def test_side_caches_hit_by_content_and_role():
    """The r5 per-side caches: identical cloud CONTENT reuses the host prep and
    the device tables (the writer's four variants share their prediction side);
    the same content used as p vs q yields distinct role entries; and the
    cached path is value-identical to a cold prepare."""
    rng = np.random.default_rng(3)
    p = rng.normal(size=(2100, 3)).astype(np.float32)
    q = rng.normal(size=(1700, 3)).astype(np.float32) + 0.05

    chp._SIDE_CACHE.clear()
    chp._DEVICE_SIDE_CACHE.clear()
    pr1 = chp.chamfer_prepare(p, q)
    assert len(chp._SIDE_CACHE) == 2
    assert {r for _, r in chp._DEVICE_SIDE_CACHE} == {"p", "q"}
    v1 = chp.chamfer_distance_pruned(p, q, interpret=True, prepared=pr1)

    # warm path: same content -> same cached device arrays (object identity)
    pr2 = chp.chamfer_prepare(np.array(p), np.array(q))
    assert pr2.p_tiles is pr1.p_tiles and pr2.q3_tiles is pr1.q3_tiles
    assert chp.chamfer_distance_pruned(p, q, interpret=True, prepared=pr2) == v1

    # the same CONTENT as the other side gets its own role entry, not a reuse
    chp.chamfer_prepare(q, p)
    assert len(chp._DEVICE_SIDE_CACHE) == 4

    # the cache is bounded
    for i in range(chp._SIDE_CACHE_MAX + 2):
        chp.chamfer_prepare(
            rng.normal(size=(1100, 3)).astype(np.float32), q
        )
    assert len(chp._SIDE_CACHE) <= chp._SIDE_CACHE_MAX
    assert len(chp._DEVICE_SIDE_CACHE) <= chp._DEVICE_SIDE_CACHE_MAX
