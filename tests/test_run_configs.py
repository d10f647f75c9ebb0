"""All shipped run configs must load and build valid config objects."""

import glob

import pytest

from heal_swin_tpu.utils.utils import get_config_from_config_path

TRAIN_CONFIGS = sorted(
    p for p in glob.glob("run_configs/**/*train_run_config.py", recursive=True)
)


@pytest.mark.parametrize("path", TRAIN_CONFIGS)
def test_train_config_loads(path, monkeypatch):
    monkeypatch.setenv("SLURM_ARRAY_TASK_ID", "1")
    run = get_config_from_config_path(path, "get_train_run_config")
    pl = get_config_from_config_path(path, "get_pl_config")
    assert run.train is not None and run.data is not None and run.model is not None
    assert pl.max_epochs is None or pl.max_epochs > 0
    # class weights must match the dataset class counts where set
    cw = getattr(run.model, "class_weights", None)
    if cw is not None:
        assert len(cw) in (8, 10, 12)


def test_paper_config_matches_baseline():
    """The HEAL-SWIN paper config must carry the BASELINE.md hyperparameters."""
    run = get_config_from_config_path(
        "run_configs/segmentation/swin_hp_synwoodscape_large_train_run_config.py",
        "get_train_run_config",
    )
    m = run.model.swin_hp_transformer_config
    assert m.window_size == 64 and m.patch_size == 4 and m.shift_size == 4
    assert m.shift_strategy == "ring_shift" and m.rel_pos_bias == "flat"
    assert m.use_cos_attn and m.use_v2_norm_placement
    assert m.embed_dim == 96 and m.depths == [2, 2, 6, 2] and m.num_heads == [3, 6, 12, 24]
    assert abs(run.model.optimizer_config.learning_rate - 0.000954993) < 1e-12
    assert run.data.input_nside == 256 and run.data.input_base_pix == 8
    assert run.data.common.batch_size == 2
