"""Pin the ring-shift permutation's run structure at paper scale.

These facts are the premises of the measured REJECTION of the run-DMA shift
gather / in-kernel shift fold (benchmarks/run_gather_probe.py,
docs/PERFORMANCE.md "In-kernel shift DMA pricing"): the permutation is
16-token slot-structured (96.6% of stage-0 slots are aligned slot copies) but
has ZERO 32-token aligned+contiguous groups — and 32 tokens is the only legal
Mosaic DMA granularity at C=96 (bf16 (8, 128) tiling / 1024-element 1-D rule).
If shifting.py ever changes these numbers, the rejection should be revisited.

Reference semantics: heal_swin/models_torch/hp_shifting.py:309-404 (RingShift).
"""

import numpy as np
import pytest

from heal_swin_tpu.ops.shifting import get_shift_spec


def _aligned_contig_fraction(perm: np.ndarray, g: int) -> float:
    p = perm.astype(np.int64).reshape(-1, g)
    contig = (p[:, 1:] == p[:, :-1] + 1).all(axis=1)
    aligned = p[:, 0] % g == 0
    return float((contig & aligned).mean())


# paper-scale stage token counts (nside 256, patch 4, depths [2,2,6,2])
STAGE_N = (131072, 32768, 8192, 2048)


@pytest.mark.parametrize(
    "n,frac16",
    list(zip(STAGE_N, (0.9657, 0.9331, 0.8730, 0.7734))),
)
def test_ring_shift_16_token_slot_fraction(n, frac16):
    spec = get_shift_spec("ring_shift", n, 8, 64, 4)
    assert spec.kind == "perm"
    got = _aligned_contig_fraction(spec.perm, 16)
    got_inv = _aligned_contig_fraction(spec.inv_perm, 16)
    assert got == pytest.approx(frac16, abs=1e-4)
    # the inverse permutation (the unshift / VJP direction) has the same structure
    assert got_inv == pytest.approx(frac16, abs=1e-4)


def test_ring_shift_has_no_32_token_groups():
    """The only Mosaic-legal DMA granularity at C=96 has a 0% hit rate."""
    spec = get_shift_spec("ring_shift", 131072, 8, 64, 4)
    assert _aligned_contig_fraction(spec.perm, 32) == 0.0
    assert _aligned_contig_fraction(spec.inv_perm, 32) == 0.0


def test_nest_grid_shift_slot_structure():
    """nest_grid_shift is FULLY 16-token slot-structured — and still 0% at 32."""
    spec = get_shift_spec("nest_grid_shift", 131072, 8, 64, 4)
    assert spec.kind == "perm"
    assert _aligned_contig_fraction(spec.perm, 16) == 1.0
    assert _aligned_contig_fraction(spec.perm, 32) == 0.0
