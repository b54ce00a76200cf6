"""Trainer with a dp x tp mesh on the 8-device virtual CPU backend."""
import numpy as np
import jax

from talkshow_tpu.config import body_vq_config
from talkshow_tpu.data.dataset import synthetic_dataset
from talkshow_tpu.models.vqvae import VQVAE
from talkshow_tpu.train import steps as tsteps
from talkshow_tpu.train.trainer import Trainer


def test_trainer_dp_tp_mesh(tmp_path):
    assert len(jax.devices()) == 8
    cfg = body_vq_config()
    cfg.train.batch_size = 8
    cfg.train.epochs = 1
    cfg.log.save_every = 10
    cfg.data.pose.generate_length = 16
    cfg.parallel.dp = 4
    cfg.parallel.tp = 2

    ds = synthetic_dataset(num_clips=2, frames=100)
    ds.generate_length = 16
    vq_body = VQVAE(in_dim=39, num_hiddens=512)   # wide enough to tp-shard
    vq_hand = VQVAE(in_dim=90, num_hiddens=512)
    init_state, step = tsteps.make_body_vq_step(vq_body, vq_hand)
    tr = Trainer(cfg, ds, init_state, lambda s, b: step(s, b), needs_rng=False,
                 run_dir=str(tmp_path / "run")).setup()
    assert tr.mesh is not None and tr.mesh.shape == {"dp": 4, "tp": 2}
    # a wide kernel should actually be sharded over tp
    from jax.sharding import PartitionSpec as P
    wide = tr.state.params["body"]["encoder"]["down_2"]["Conv_0"]["kernel"]
    assert wide.sharding.spec == P(None, None, "tp")
    tr.train()
    m = tr.history[-1]
    assert np.isfinite(m["body_rec"]) and np.isfinite(m["hand_rec"])
