"""Fused Pallas AR decoder vs the XLA sampler / full forward.

Runs the kernel in interpret mode (CPU) with float32 tables so the
comparisons are tight; on TPU the production path uses bfloat16 weights and
the in-kernel PRNG (scripts/profile_decode.py measures it).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from talkshow_tpu.models.pixelcnn import (GatedPixelCNN,
                                          sample_tokens_reference)
from talkshow_tpu.models.pixelcnn_pallas import (pack_decode_tables,
                                                 sample_tokens_fused)

L, DIM, K, H = 4, 256, 512, 9


@pytest.fixture(scope="module")
def small_prior():
    m = GatedPixelCNN(input_dim=K, dim=DIM, n_layers=L, n_classes=4,
                      audio=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, 2), jnp.int32),
               jnp.zeros((1,), jnp.int32), jnp.zeros((1, H, 256)))
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, H, 256))
    return m, v, audio


def test_teacher_forced_logits_match_full_forward(small_prior):
    m, v, audio = small_prior
    label = jnp.array([2], jnp.int32)
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, H, 2), 0, K)
    full = m.apply(v, toks, label, audio)                  # (1, H, 2, K)
    tok_out, fused = sample_tokens_fused(
        m, v, label, audio, jax.random.PRNGKey(3), prefix_tokens=toks,
        prefix_len=H, dtype=jnp.float32, return_logits=True)
    assert jnp.all(tok_out == toks), "teacher-forced tokens must round-trip"
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_free_run_matches_xla_sampler_bitwise(small_prior):
    """noise='input' uses the XLA sampler's key-splitting scheme, so the
    sampled trajectories agree token-for-token (categorical IS
    gumbel-argmax)."""
    m, v, audio = small_prior
    label = jnp.array([1], jnp.int32)
    t_xla = sample_tokens_reference(m, v, label, audio, jax.random.PRNGKey(5))
    t_fused = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(5),
                                  dtype=jnp.float32, noise="input")
    assert jnp.all(t_xla == t_fused)


def test_prefix_continuation(small_prior):
    m, v, audio = small_prior
    label = jnp.array([0], jnp.int32)
    toks = jax.random.randint(jax.random.PRNGKey(4), (1, H, 2), 0, K)
    out = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(6),
                              prefix_tokens=toks, prefix_len=4,
                              dtype=jnp.float32, noise="input")
    assert jnp.all(out[:, :4] == toks[:, :4])
    # the continuation matches the XLA sampler's token-for-token
    ref = sample_tokens_reference(m, v, label, audio, jax.random.PRNGKey(6),
                                  prefix_tokens=toks, prefix_len=4)
    assert jnp.all(out == ref)


def test_seed_and_label_sensitivity(small_prior):
    m, v, audio = small_prior
    label = jnp.array([0], jnp.int32)
    a = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(7),
                            dtype=jnp.float32)
    b = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(7),
                            dtype=jnp.float32)
    c = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(8),
                            dtype=jnp.float32)
    d = sample_tokens_fused(m, v, jnp.array([3], jnp.int32), audio,
                            jax.random.PRNGKey(7), dtype=jnp.float32)
    assert jnp.all(a == b)
    assert bool(jnp.any(a != c))
    assert bool(jnp.any(a != d))
    assert int(a.min()) >= 0 and int(a.max()) < K


def test_no_audio_variant():
    m = GatedPixelCNN(input_dim=256, dim=256, n_layers=3, n_classes=4,
                      audio=False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, 2), jnp.int32),
               jnp.zeros((1,), jnp.int32))
    audio = jnp.zeros((1, H, 256))   # only supplies H
    label = jnp.array([1], jnp.int32)
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, H, 2), 0, 256)
    full = m.apply(v, toks, label)
    _, fused = sample_tokens_fused(
        m, v, label, audio, jax.random.PRNGKey(3), prefix_tokens=toks,
        prefix_len=H, dtype=jnp.float32, return_logits=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_tables_reuse_and_rejects_oversize_batch(small_prior):
    m, v, audio = small_prior
    label = jnp.array([0], jnp.int32)
    tables = pack_decode_tables(m, v, dtype=jnp.float32)
    a = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(9),
                            tables=tables, dtype=jnp.float32)
    b = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(9),
                            dtype=jnp.float32)
    assert jnp.all(a == b)
    from talkshow_tpu.models.pixelcnn_pallas import MAX_FUSED_BATCH
    nb = MAX_FUSED_BATCH + 1
    with pytest.raises(ValueError, match="batch"):
        sample_tokens_fused(m, v, jnp.zeros((nb,), jnp.int32),
                            jnp.zeros((nb, H, 256)), jax.random.PRNGKey(0))


def test_batched_free_run_matches_xla_sampler_bitwise(small_prior):
    """B=4 batched kernel (batch in the sublane axis): tokens match the
    batched XLA sampler bit-for-bit in noise='input' mode, with DISTINCT
    labels per sample (exercises per-batch class conditioning rows)."""
    m, v, _ = small_prior
    B = 4
    audio = jax.random.normal(jax.random.PRNGKey(11), (B, H, 256))
    label = jnp.array([0, 1, 2, 3], jnp.int32)
    t_xla = sample_tokens_reference(m, v, label, audio, jax.random.PRNGKey(12))
    t_fused = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(12),
                                  dtype=jnp.float32, noise="input")
    assert t_fused.shape == (B, H, 2)
    assert jnp.all(t_xla == t_fused)
    # samples are diverse across the batch
    assert bool(jnp.any(t_fused[0] != t_fused[1]))


def test_batched_teacher_forced_logits_match_full_forward(small_prior):
    """Batched prefix/teacher-forcing: B=3 with per-sample token grids."""
    m, v, _ = small_prior
    B = 3
    audio = jax.random.normal(jax.random.PRNGKey(13), (B, H, 256))
    label = jnp.array([1, 3, 0], jnp.int32)
    toks = jax.random.randint(jax.random.PRNGKey(14), (B, H, 2), 0, K)
    full = m.apply(v, toks, label, audio)                  # (B, H, 2, K)
    tok_out, fused = sample_tokens_fused(
        m, v, label, audio, jax.random.PRNGKey(15), prefix_tokens=toks,
        prefix_len=H, dtype=jnp.float32, return_logits=True)
    assert jnp.all(tok_out == toks)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_batched_partial_prefix_matches_xla(small_prior):
    """B=2 with a 3-row teacher-forced prefix, then free continuation."""
    m, v, _ = small_prior
    B = 2
    audio = jax.random.normal(jax.random.PRNGKey(16), (B, H, 256))
    label = jnp.array([2, 2], jnp.int32)
    toks = jax.random.randint(jax.random.PRNGKey(17), (B, H, 2), 0, K)
    out = sample_tokens_fused(m, v, label, audio, jax.random.PRNGKey(18),
                              prefix_tokens=toks, prefix_len=3,
                              dtype=jnp.float32, noise="input")
    ref = sample_tokens_reference(m, v, label, audio, jax.random.PRNGKey(18),
                                  prefix_tokens=toks, prefix_len=3)
    assert jnp.all(out[:, :3] == toks[:, :3])
    assert jnp.all(out == ref)


def test_generate_conv_poses_fused_route():
    from talkshow_tpu.models.body import create_body_models, generate_conv_poses
    body = create_body_models(jax.random.PRNGKey(0), code_num=256,
                              pixel_layers=3, window=24)
    feat = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 64))
    ids = jnp.zeros((1,), jnp.int32)
    # the fused route runs end-to-end (interpret mode on CPU)
    conv_f, tok_f = generate_conv_poses(body, feat, ids, jax.random.PRNGKey(2),
                                        use_fused=True)
    conv_x, tok_x = generate_conv_poses(body, feat, ids, jax.random.PRNGKey(2),
                                        use_fused=False)
    assert conv_f.shape == conv_x.shape == (1, 24, 129)
    assert np.isfinite(np.asarray(conv_f)).all()


def test_chunked_fused_matches_xla_per_chunk(small_prior):
    """Batch-chunked fused decode (models/body.py): each chunk's tokens
    match the XLA sampler bit-for-bit under the chunk's own key (noise=
    'input'), so the chunk loop adds no numerics of its own."""
    from talkshow_tpu.models.body import sample_tokens_fused_chunked
    m, v, _ = small_prior
    B, chunk = 4, 2
    audio = jax.random.normal(jax.random.PRNGKey(21), (B, H, 256))
    label = jnp.array([0, 1, 2, 3], jnp.int32)
    rng = jax.random.PRNGKey(22)
    out = sample_tokens_fused_chunked(m, v, label, audio, rng, chunk,
                                      dtype=jnp.float32, noise="input")
    assert out.shape == (B, H, 2)
    keys = jax.random.split(rng, B // chunk)
    for j, i in enumerate(range(0, B, chunk)):
        ref = sample_tokens_reference(m, v, label[i:i + chunk],
                                      audio[i:i + chunk], keys[j])
        assert jnp.all(out[i:i + chunk] == ref)


def test_fused_chunk_size_selection():
    """Auto-select chunk sizing against the analytic VMEM footprint."""
    from talkshow_tpu.models.body import _fused_chunk_size
    from talkshow_tpu.models.pixelcnn_pallas import (FUSED_VMEM_BUDGET,
                                                     MAX_FUSED_BATCH,
                                                     fused_vmem_bytes)
    full = GatedPixelCNN()          # 2048 codes, dim 256, 15 layers
    # the measured frontier's one fallback cell: B=32 x H=300 must chunk
    bc = _fused_chunk_size(full, H=300, B=32)
    assert bc is not None and bc % 8 == 0 and bc < 32
    assert fused_vmem_bytes(full, H=300, B=bc) <= FUSED_VMEM_BUDGET
    # past MAX_FUSED_BATCH at standard clip length: chunk at the cap
    assert _fused_chunk_size(full, H=75, B=64) == MAX_FUSED_BATCH
    # extreme H: even one 8-row launch cannot fit -> XLA fallback
    assert _fused_chunk_size(full, H=3000, B=32) is None
    # sub-sublane batches can't shrink (Bp rounds up to 8 anyway)
    assert _fused_chunk_size(full, H=3000, B=4) is None


def test_fused_vmem_budget_gating():
    """The analytic VMEM estimate must admit every production shape the
    auto-select routes to the kernel and reject shapes that would fail
    Mosaic allocation (the logits output alone is ~40 MB at B=32/H=75)."""
    from talkshow_tpu.models.pixelcnn_pallas import (FUSED_VMEM_BUDGET,
                                                     fused_vmem_bytes)

    full = GatedPixelCNN()          # 2048 codes, dim 256, 15 layers
    # standard 10 s clip (H=75) at the batch cap, production mode (no
    # logits output): fits
    assert fused_vmem_bytes(full, H=75, B=32) <= FUSED_VMEM_BUDGET
    # the same shape WITH the full logits output blows the budget — which
    # is why production skips emitting it
    assert fused_vmem_bytes(full, H=75, B=32,
                            return_logits=True) > FUSED_VMEM_BUDGET
    # 60 s clip at the reference demo's num_sample=12 diversity: fits
    assert fused_vmem_bytes(full, H=450, B=12) <= FUSED_VMEM_BUDGET
    # absurdly long clips must fall back to the XLA sampler
    assert fused_vmem_bytes(full, H=3000, B=32) > FUSED_VMEM_BUDGET
    # monotone in H and B (sanity of the formula; batch rounds to
    # sublane multiples, so compare across Bp boundaries)
    assert (fused_vmem_bytes(full, H=150, B=16)
            > fused_vmem_bytes(full, H=75, B=16)
            > fused_vmem_bytes(full, H=75, B=8))
