"""MotionServer: bucketed batched serving over the pipeline.

The reference has no serving layer; these tests pin the server's core
guarantees — compile-once bucket programs, masked-face equality with the
unpadded program, correct request routing/cropping.
"""
import numpy as np
import jax
import pytest

from talkshow_tpu.models.wav2vec import Wav2Vec2Config
from talkshow_tpu.pipeline import Pipeline
from talkshow_tpu.serving import MotionServer

TINY_W2V = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                          intermediate_size=64, conv_dim=(16, 16),
                          conv_kernel=(10, 3), conv_stride=(5, 2),
                          num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4)


@pytest.fixture(scope="module")
def pipe():
    return Pipeline.create(0, wav2vec_cfg=TINY_W2V, num_hiddens=64,
                           pixel_dim=16, pixel_layers=3, code_num=64)


def _wav(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(
        np.float32)


def test_serve_routes_and_crops(pipe):
    server = MotionServer(pipe, bucket_frames=16, max_batch=2)
    r0 = server.submit(_wav(0.5, 0), speaker=0)      # 15 frames -> bucket 16
    r1 = server.submit(_wav(0.9, 1), speaker=1)      # 27 frames -> bucket 32
    r2 = server.submit(_wav(0.4, 2), speaker=2)      # 12 frames -> bucket 16
    assert server.pending() == 3
    out = server.flush()
    assert server.pending() == 0
    assert set(out) == {r0, r1, r2}
    assert out[r0].shape == (15, 265)
    assert out[r1].shape == (27, 265)
    assert out[r2].shape == (12, 265)
    for m in out.values():
        assert np.all(np.isfinite(m)) and np.abs(m).max() > 0


def test_compile_once_across_traffic(pipe):
    """After warmup, serving any mix of lengths within the warmed buckets
    must not trace a single new program."""
    server = MotionServer(pipe, bucket_frames=16, max_batch=2)
    n = server.warmup(max_clip_seconds=1.1)          # buckets 16 + 32
    assert n == 2                                    # one program per bucket

    size = server._group_fn._cache_size()
    for i, sec in enumerate([0.3, 0.5, 0.52, 0.8, 1.0]):
        server.submit(_wav(sec, 10 + i), speaker=i % 4)
    out = server.flush()
    assert len(out) == 5
    assert server._group_fn._cache_size() == size


def test_masked_face_equals_unpadded(pipe):
    """The served face output (bucketed, batch-padded, masked wav2vec)
    must numerically match the unpadded single-clip program."""
    wav = _wav(0.5, 3)
    server = MotionServer(pipe, bucket_frames=16, max_batch=2)
    rid = server.submit(wav, speaker=0)
    frames = int(len(wav) * 30 // 16000)
    out = server.flush()[rid]
    ref_face = np.asarray(pipe.generate_face(wav, frame=frames))
    # jaw channels 0:3 and expression channels -100: of the 265-D output
    np.testing.assert_allclose(out[:, :3], ref_face[:, :3], atol=2e-5)
    np.testing.assert_allclose(out[:, -100:], ref_face[:, 3:], atol=2e-5)
