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
    """Random speech-stand-in, pre-rounded to the int16 PCM grid so the
    server's int16 transfer path is bit-exact vs the offline pipeline."""
    rng = np.random.default_rng(seed)
    x = np.round(rng.standard_normal(int(16000 * seconds)) * 0.1 * 32768.0)
    return (np.clip(x, -32768, 32767) / 32768.0).astype(
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
    """After warmup, serving any mix of lengths up to max_clip_seconds must
    not trace a single new program — including clips near the limit that
    round UP to the next bucket."""
    server = MotionServer(pipe, bucket_frames=16, max_batch=2)
    n = server.warmup(max_clip_seconds=1.1)          # buckets 16, 32, 48
    assert n == 3

    size = server._group_fn._cache_size()
    for i, sec in enumerate([0.3, 0.5, 0.52, 0.8, 1.0, 1.09]):
        server.submit(_wav(sec, 10 + i), speaker=i % 4)
    out = server.flush()
    assert len(out) == 6
    assert server._group_fn._cache_size() == size


def test_bucket_boundary_audio_fits(pipe):
    """A wav whose sample count exceeds bucket*ceil(16000/30) while its
    frame count still equals the bucket must be served without truncation
    (regression: the row buffer was sized one frame short)."""
    server = MotionServer(pipe, bucket_frames=32, max_batch=2)
    wav = _wav(17089 / 16000, 7)            # frames=32 == bucket, len>32*534
    assert len(wav) == 17089
    rid = server.submit(wav, speaker=0)
    out = server.flush()
    assert out[rid].shape == (32, 265)
    assert np.all(np.isfinite(out[rid]))


def test_flush_failure_keeps_unserved_requests(pipe, monkeypatch):
    """A crash while serving one group must not drop the other groups'
    queued requests."""
    server = MotionServer(pipe, bucket_frames=16, max_batch=2)
    r0 = server.submit(_wav(0.4, 0))                 # bucket 16
    r1 = server.submit(_wav(0.9, 1))                 # bucket 32

    real = server._run_group

    def boom(bucket, B, requests, key=None):
        if bucket == 32:
            raise RuntimeError("injected")
        return real(bucket, B, requests, key=key)

    monkeypatch.setattr(server, "_run_group", boom)
    with pytest.raises(RuntimeError):
        server.flush()
    # bucket-16 request served and dequeued; bucket-32 request retained
    assert [r.rid for r in server._queue] == [r1]
    monkeypatch.setattr(server, "_run_group", real)
    out = server.flush()
    assert set(out) == {r1}


def test_flush_noise_is_fresh_across_flushes(pipe):
    """Default flushes must not reuse PRNG noise: the same wav submitted
    in two consecutive flushes should (generically) differ, while an
    explicit seed reproduces."""
    server = MotionServer(pipe, bucket_frames=16, max_batch=2)
    wav = _wav(0.5, 9)
    r = server.submit(wav)
    m1 = server.flush()[r]
    r = server.submit(wav)
    m2 = server.flush()[r]
    assert not np.array_equal(m1, m2)
    r = server.submit(wav)
    s1 = server.flush(seed=5)[r]
    r = server.submit(wav)
    s2 = server.flush(seed=5)[r]
    np.testing.assert_array_equal(s1, s2)


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


def test_mesh_sharded_server_matches_single_device(pipe):
    """A mesh-backed server shards each group's batch over the dp axis.
    The deterministic face stage must match the unsharded server exactly;
    the sampled body channels are deterministic per server (same seed,
    same queue) but use shard-local PRNG streams, so they differ between
    topologies (the batched decode draws one gumbel block per group
    rather than per-request keys — see MotionServer.core)."""
    from talkshow_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    plain = MotionServer(pipe, bucket_frames=16, max_batch=4)
    sharded = MotionServer(pipe, bucket_frames=16, max_batch=4, mesh=mesh)
    wavs = [_wav(0.4, 20 + i) for i in range(4)]
    r_p = [plain.submit(w, speaker=i % 4) for i, w in enumerate(wavs)]
    r_s = [sharded.submit(w, speaker=i % 4) for i, w in enumerate(wavs)]
    out_p = plain.flush(seed=11)
    out_s = sharded.flush(seed=11)
    for a, b in zip(r_p, r_s):
        # face (jaw + expression) and canned lower body are deterministic
        np.testing.assert_allclose(out_p[a][:, :3], out_s[b][:, :3],
                                   atol=2e-4)
        np.testing.assert_allclose(out_p[a][:, -100:], out_s[b][:, -100:],
                                   atol=2e-4)
        assert np.all(np.isfinite(out_s[b]))
    # sharded flush is reproducible per seed
    r_s2 = [sharded.submit(w, speaker=i % 4) for i, w in enumerate(wavs)]
    out_s2 = sharded.flush(seed=11)
    for b, b2 in zip(r_s, r_s2):
        np.testing.assert_array_equal(out_s[b], out_s2[b2])

    with pytest.raises(ValueError):
        MotionServer(pipe, max_batch=3, mesh=mesh)


def test_int16_transfer_matches_float32(pipe):
    """transfer_dtype='int16' (half the host->device bytes) must serve
    PCM-grid audio identically to the float32 path, and accept raw int16
    arrays directly."""
    wav = _wav(0.5, 31)                        # already on the int16 grid
    s_i = MotionServer(pipe, bucket_frames=16, max_batch=2)  # default int16
    s_f = MotionServer(pipe, bucket_frames=16, max_batch=2,
                       transfer_dtype="float32")
    r_i = s_i.submit(wav, speaker=2)
    r_f = s_f.submit(wav, speaker=2)
    out_i = s_i.flush(seed=3)[r_i]
    out_f = s_f.flush(seed=3)[r_f]
    np.testing.assert_array_equal(out_i, out_f)

    # raw int16 PCM submission
    pcm = (wav * 32768.0).astype(np.int16)
    r_p = s_i.submit(pcm, speaker=2)
    out_p = s_i.flush(seed=3)[r_p]
    np.testing.assert_array_equal(out_p, out_i)
