"""Zero123 trainer ImageLogger parity: EMA sample grids."""

import numpy as np


def test_log_samples_writes_grid(tmp_path):
    import jax

    from tests.test_diffusion import tiny_config
    from one2345_tpu.diffusion.zero123 import Zero123Stage
    from one2345_tpu.training.train_zero123 import log_samples
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    stage = Zero123Stage(tiny_config(), seed=0)
    trainer = Zero123Trainer(stage)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    B, S = 2, stage.config.image_size
    batch = {
        "image_cond": rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32),
        "image_target": rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32),
        "T": rng.normal(0, 1, (B, 1, 4)).astype(np.float32),
    }
    out = tmp_path / "grid.png"
    log_samples(stage, state, batch, str(out), steps=2, seed=1)
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (3 * S, B * S, 3)  # cond / sample / target rows
