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


def test_trainer_mesh_with_token_cache(tmp_path):
    """Pixel stage on the dp x tp mesh WITH the frozen-token cache and
    per-stage batch_keys: cached token grids are device_put with the batch
    sharding, epochs 2+ run the poses-free batch structure, loss finite."""
    from talkshow_tpu.models.pixelcnn import GatedPixelCNN
    from talkshow_tpu.models.vqvae import AudioEncoder
    from talkshow_tpu.ops import vq as vq_ops
    import jax.numpy as jnp

    cfg = body_vq_config()
    cfg.train.batch_size = 8
    cfg.train.epochs = 2
    cfg.log.save_every = 10
    cfg.data.pose.generate_length = 16
    cfg.parallel.dp = 4
    cfg.parallel.tp = 2

    ds = synthetic_dataset(num_clips=2, frames=100)
    ds.generate_length = 16
    vq_body = VQVAE(in_dim=39, num_hiddens=64)
    vq_hand = VQVAE(in_dim=90, num_hiddens=64)
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    st_b = vq_ops.init_vq_state(r[0], 64, 64)
    st_h = vq_ops.init_vq_state(r[1], 64, 64)
    vb = vq_body.init(r[2], jnp.zeros((1, 16, 39)), st_b)
    vh = vq_hand.init(r[3], jnp.zeros((1, 16, 90)), st_h)
    frozen_v, frozen_s = {"body": vb, "hand": vh}, {"body": st_b, "hand": st_h}

    prior = GatedPixelCNN(input_dim=64, dim=16, n_layers=3, audio=True,
                          audio_channels=32)
    audio_enc = AudioEncoder(num_hiddens=32)
    init_state, step = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand, frozen_v, frozen_s)
    enc = tsteps.make_token_encoder(vq_body, vq_hand, frozen_v, frozen_s)
    tr = Trainer(cfg, ds, init_state, step, needs_rng=True,
                 run_dir=str(tmp_path / "run"), token_encoder=enc,
                 batch_keys=("poses", "aud_feat", "speaker")).setup()
    assert tr.mesh is not None
    tr.train()
    assert len(tr._token_cache) > 0
    assert np.isfinite(tr.history[-1]["ce_loss"])
