"""End-to-end trainer smoke: tiny body-VQ stage on synthetic data, with
checkpoint save + resume round-trip."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from talkshow_tpu.config import body_vq_config
from talkshow_tpu.data.dataset import synthetic_dataset
from talkshow_tpu.models.vqvae import VQVAE
from talkshow_tpu.train import steps as tsteps
from talkshow_tpu.train.trainer import Trainer


def test_trainer_loop_and_resume(tmp_path):
    cfg = body_vq_config()
    cfg.train.batch_size = 4
    cfg.train.epochs = 2
    cfg.log.print_every = 5
    cfg.log.save_every = 1
    cfg.data.pose.generate_length = 16

    ds = synthetic_dataset(num_clips=2, frames=80)
    ds.generate_length = 16
    vq_body = VQVAE(in_dim=39, num_hiddens=64)
    vq_hand = VQVAE(in_dim=90, num_hiddens=64)
    init_state, step = tsteps.make_body_vq_step(vq_body, vq_hand)

    tr = Trainer(cfg, ds, init_state, lambda s, b: step(s, b), needs_rng=False,
                 run_dir=str(tmp_path / "run")).setup()
    tr.train()
    assert tr.epoch == 2
    assert len(tr.history) == 2
    assert os.path.isfile(str(tmp_path / "run" / "config.json"))
    step_count = int(tr.state.step)
    assert step_count > 0

    # resume from the saved checkpoint into a fresh trainer
    ckpt = str(tmp_path / "run" / "ckpt-1")
    tr2 = Trainer(cfg, ds, init_state, lambda s, b: step(s, b), needs_rng=False,
                  run_dir=str(tmp_path / "run2")).setup()
    tr2.resume(ckpt)
    assert tr2.epoch == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0]))
    # continue one more epoch
    tr2.train(epochs=3)
    assert tr2.epoch == 3
