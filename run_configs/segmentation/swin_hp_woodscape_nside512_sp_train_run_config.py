#!/usr/bin/env -S python3 -u
"""nside-512 (2,097,152-pixel) HEAL-SWIN segmentation via sequence parallelism.

TPU extension beyond the reference (no analogue in
/root/reference/heal_swin/run_configs): the paper architecture at DOUBLE the
paper resolution, which does not fit a single chip's HBM at any batch size.
``PLConfig.seq_parallel_devices=4`` shards each sample's 524,288-token sequence
over 4 devices of an 8-device slice (a (data=2, seq=4) mesh, ~1/4 activation
residuals per chip), with per-sample batch semantics unchanged
(parallel/sequence.py; equivalence pinned by tests/test_sequence_parallel.py).
"""

import sys
from pathlib import Path

_d = Path(__file__).resolve().parent
while _d.name != "run_configs":
    _d = _d.parent
sys.path.insert(0, str(_d))  # _common helpers
sys.path.insert(0, str(_d.parent))  # repo root


def get_train_run_config():
    import _common

    return _common.hp_seg_train_run(
        version="woodscape",
        expmt="woodscape_nside512_sp",
        class_weights=_common.WOODSCAPE_WEIGHTS,
        nside=512,
        batch_size=1,
    )


def get_pl_config():
    import _common
    from heal_swin_tpu.training.train_config import PLConfig

    pl = _common.paper_pl_config()
    return PLConfig(
        max_epochs=pl.max_epochs, accelerator=pl.accelerator,
        gpus=8, seq_parallel_devices=4,
    )


def main():
    import _common
    _common.submit_self(__file__, "train")


if __name__ == "__main__":
    main()
