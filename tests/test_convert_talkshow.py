"""Checkpoint-conversion parity: torch replicas of the reference nets
(matching state-dict key layout), random weights -> convert -> flax forward
must equal torch forward.

The replicas are assembled here from torch primitives per the architecture
documented in SURVEY.md (nets/spg/vqvae_1d.py, vqvae_modules.py,
gated_pixelcnn_v2.py) — an independent test harness, not an import of the
reference.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as tF
import pytest

from talkshow_tpu.convert import talkshow as conv
from talkshow_tpu.models.pixelcnn import GatedPixelCNN
from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
from talkshow_tpu.ops import vq as vq_ops

torch.manual_seed(0)


# --------------------------- torch replicas ---------------------------------

class TCNR(tnn.Module):
    def __init__(self, cin, cout, sample="none", residual=False):
        super().__init__()
        self.residual = residual
        if sample == "none":
            k, s, p = 3, 1, 1
            self.conv = tnn.Conv1d(cin, cout, k, s, p)
        elif sample == "down":
            k, s, p = 4, 2, 1
            self.conv = tnn.Conv1d(cin, cout, k, s, p)
        elif sample == "up":
            k, s, p = 4, 2, 1
            self.conv = tnn.ConvTranspose1d(cin, cout, k, s, p)
        elif sample == "one":
            self.conv = tnn.Conv1d(cin, cout, 1, 1, 0)
        self.norm = tnn.BatchNorm1d(cout)
        if residual:
            if sample == "down":
                self.residual_layer = tnn.Conv1d(cin, cout, 4, 2, 1)
            elif sample == "up":
                self.residual_layer = tnn.ConvTranspose1d(cin, cout, 4, 2, 1)
            elif cin != cout:
                self.residual_layer = tnn.Conv1d(cin, cout, 3, 1, 1)
            else:
                self.residual_layer = tnn.Identity()

    def forward(self, x):
        out = self.norm(self.conv(x))
        if self.residual:
            out = out + self.residual_layer(x)
        return tF.leaky_relu(out, 0.2)


class TResStack(tnn.Module):
    def __init__(self, ch, layers=2):
        super().__init__()
        self._layers = tnn.ModuleList([TCNR(ch, ch) for _ in range(layers)])
        self.conv = tnn.Conv1d(ch, ch, 3, 1, 1)
        self.norm = tnn.BatchNorm1d(ch)

    def forward(self, x):
        h = x
        for l in self._layers:
            h = l(h)
        return tF.relu(self.norm(self.conv(h)) + x)


class TEncoder(tnn.Module):
    def __init__(self, cin, embed=64, hid=128):
        super().__init__()
        self.project = TCNR(cin, hid // 4)
        self._enc_1 = TResStack(hid // 4)
        self._down_1 = TCNR(hid // 4, hid // 2, "down", True)
        self._enc_2 = TResStack(hid // 2)
        self._down_2 = TCNR(hid // 2, hid, "down", True)
        self._enc_3 = TResStack(hid)
        self.pre_vq_conv = tnn.Conv1d(hid, embed, 1, 1)

    def forward(self, x):
        h = self.project(x)
        h = self._enc_1(h); h = self._down_1(h)
        h = self._enc_2(h); h = self._down_2(h)
        h = self._enc_3(h)
        return self.pre_vq_conv(h)


class TDecoder(tnn.Module):
    def __init__(self, cout, embed=64, hid=128):
        super().__init__()
        self.aft_vq_conv = tnn.Conv1d(embed, hid, 1, 1)
        self._dec_1 = TResStack(hid)
        self._up_2 = TCNR(hid, hid // 2, "up", True)
        self._dec_2 = TResStack(hid // 2)
        self._up_3 = TCNR(hid // 2, hid // 4, "up", True)
        self._dec_3 = TResStack(hid // 4)
        self.project = tnn.Conv1d(hid // 4, cout, 1, 1)

    def forward(self, e):
        h = self.aft_vq_conv(e)
        h = self._dec_1(h); h = self._up_2(h)
        h = self._dec_2(h); h = self._up_3(h)
        h = self._dec_3(h)
        return self.project(h)


class TVQVAE(tnn.Module):
    def __init__(self, cin=39, embed=64, K=128, hid=128):
        super().__init__()
        self.encoder = TEncoder(cin, embed, hid)
        self.decoder = TDecoder(cin, embed, hid)
        emb = torch.randn(K, embed)
        self.vq_layer = tnn.Module()
        self.vq_layer.register_buffer("embeddings", emb)
        ema = tnn.Module(); ema.register_buffer("hidden", torch.zeros_like(emb))
        self.vq_layer.ema_dw = ema
        cs = tnn.Module(); cs.register_buffer("hidden", torch.zeros(K))
        self.vq_layer.ema_cluster_size = cs


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm1d):
            mod.running_mean.normal_(0, 0.1)
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.normal_(1.0, 0.1)
            mod.bias.data.normal_(0, 0.1)


def test_vqvae_conversion_parity():
    t = TVQVAE().eval()
    _randomize_bn(t)
    variables, state = conv.convert_vqvae(t.state_dict())
    model = VQVAE(in_dim=39, num_hiddens=128)

    x_t = torch.randn(2, 39, 24)
    with torch.no_grad():
        z_t = t.encoder(x_t)                       # (B, 64, 6)
        # nearest + decode
        flat = z_t.permute(0, 2, 1).reshape(-1, 64)
        d = (flat ** 2).sum(1, keepdim=True) - 2 * flat @ t.vq_layer.embeddings.T \
            + (t.vq_layer.embeddings ** 2).sum(1)[None]
        idx_t = d.argmin(1)
        e_t = t.vq_layer.embeddings[idx_t].reshape(2, 6, 64).permute(0, 2, 1)
        rec_t = t.decoder(e_t)

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 1))
    quant, idx_j = model.apply(variables, x_j, state, method=VQVAE.encode)
    np.testing.assert_array_equal(np.asarray(idx_j).reshape(-1), idx_t.numpy())
    rec_j = model.apply(variables, idx_j, state, method=VQVAE.decode_latents)
    np.testing.assert_allclose(np.asarray(rec_j).transpose(0, 2, 1),
                               rec_t.numpy(), atol=2e-4)


class TAudioEnc(tnn.Module):
    def __init__(self, cin=64, hid=64):
        super().__init__()
        self.project = TCNR(cin, hid // 4)
        self._enc_1 = TResStack(hid // 4)
        self._down_1 = TCNR(hid // 4, hid // 2, "down", True)
        self._enc_2 = TResStack(hid // 2)
        self._down_2 = TCNR(hid // 2, hid, "down", True)
        self._enc_3 = TResStack(hid)

    def forward(self, x):
        h = self.project(x)
        h = self._enc_1(h); h = self._down_1(h)
        h = self._enc_2(h); h = self._down_2(h)
        return self._enc_3(h)


def test_audio_encoder_conversion_parity():
    t = TAudioEnc().eval()
    _randomize_bn(t)
    variables = conv.convert_audio_encoder(t.state_dict())
    model = AudioEncoder(num_hiddens=64)
    x_t = torch.randn(2, 64, 16)
    with torch.no_grad():
        ref = t(x_t).numpy()
    out = model.apply(variables, jnp.asarray(x_t.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=2e-4)


# --------------------------- PixelCNN replica --------------------------------

class TGatedLayer(tnn.Module):
    def __init__(self, mask_type, dim, kernel, residual, n_classes, bh=True):
        super().__init__()
        self.mask_type, self.residual, self.bh_model = mask_type, residual, bh
        self.class_cond_embedding = tnn.Embedding(n_classes, 2 * dim)
        kh = kernel // 2 + 1
        self.vert_stack = tnn.Conv2d(dim, dim * 2, (kh, 3), 1, (kernel // 2, 1))
        self.vert_to_horiz = tnn.Conv2d(2 * dim, 2 * dim, 1)
        self.horiz_stack = tnn.Conv2d(dim, dim * 2, (1, 2), 1, (0, 1))
        self.horiz_resid = tnn.Conv2d(dim, dim, 1)

    def gate(self, x):
        a, b = x.chunk(2, dim=1)
        return torch.tanh(a) * torch.sigmoid(b)

    def forward(self, x_v, x_h, h):
        if self.mask_type == "A":
            self.vert_stack.weight.data[:, :, -1].zero_()
            self.horiz_stack.weight.data[:, :, :, -1].zero_()
        hc = self.class_cond_embedding(h)
        h_vert = self.vert_stack(x_v)[:, :, :x_v.size(-2), :]
        out_v = self.gate(h_vert + hc[:, :, None, None])
        h_horiz = self.horiz_stack(x_h)[:, :, :, :x_h.size(-1)]
        v2h = self.vert_to_horiz(h_vert)
        out = self.gate(v2h + h_horiz + hc[:, :, None, None])
        out_h = self.horiz_resid(out)
        if self.residual:
            out_h = out_h + x_h
        return out_v, out_h


class TPixelCNN(tnn.Module):
    def __init__(self, K=32, dim=16, n_layers=3, n_classes=4, aud_ch=16):
        super().__init__()
        self.embedding = tnn.Embedding(K, dim)
        self.embedding_aud = tnn.Conv2d(aud_ch, dim, 1, 1, 0)
        self.fusion_v = tnn.Conv2d(dim * 2, dim, 1, 1, 0)
        self.fusion_h = tnn.Conv2d(dim * 2, dim, 1, 1, 0)
        self.layers = tnn.ModuleList([
            TGatedLayer("A" if i == 0 else "B", dim, 7 if i == 0 else 3,
                        i > 0, n_classes) for i in range(n_layers)])
        self.output_conv = tnn.Sequential(
            tnn.Conv2d(dim, 512, 1), tnn.ReLU(True), tnn.Conv2d(512, K, 1))

    def forward(self, tokens, label, aud):
        shp = tokens.size() + (-1,)
        x = self.embedding(tokens.reshape(-1)).view(shp).permute(0, 3, 1, 2)
        x_v = x_h = x
        for i, layer in enumerate(self.layers):
            if i == 1:
                a = self.embedding_aud(aud)
                x_v = self.fusion_v(torch.cat([x_v, a], 1))
                x_h = self.fusion_h(torch.cat([x_h, a], 1))
            x_v, x_h = layer(x_v, x_h, label)
        return self.output_conv(x_h)


def test_pixelcnn_conversion_parity():
    K, DIM, L, AUD = 32, 16, 3, 16
    t = TPixelCNN(K, DIM, L, 4, AUD).eval()
    # trigger mask zeroing once so saved weights contain the zeros too
    with torch.no_grad():
        tok0 = torch.zeros(1, 4, 2, dtype=torch.long)
        t(tok0, torch.zeros(1, dtype=torch.long), torch.zeros(1, AUD, 4, 2))
    variables = conv.convert_pixelcnn(t.state_dict(), n_layers=L)
    model = GatedPixelCNN(input_dim=K, dim=DIM, n_layers=L, n_classes=4,
                          audio=True, bh_model=True, audio_channels=AUD)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, K, (2, 6, 2))
    label = np.asarray([1, 3])
    aud = rng.standard_normal((2, 6, AUD)).astype(np.float32)
    with torch.no_grad():
        aud_t = torch.from_numpy(aud).permute(0, 2, 1)[:, :, :, None].repeat(1, 1, 1, 2)
        ref = t(torch.from_numpy(tokens), torch.from_numpy(label),
                aud_t).permute(0, 2, 3, 1).numpy()
    ours = model.apply(variables, jnp.asarray(tokens, jnp.int32),
                       jnp.asarray(label, jnp.int32), jnp.asarray(aud))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)


# --------------------------- body-AE (FGD extractor) -------------------------

class TBodyAE(tnn.Module):
    """Replica of vqvae_1d.AE(:211-235): VQ encoder/decoder without the
    quantizer, plus the decoder's DEAD frame_enc/gru params that live in the
    released feature_extractor.pth but are never used in forward."""

    def __init__(self, cin=129, embed=64, hid=128):
        super().__init__()
        self.encoder = TEncoder(cin, embed, hid)
        self.decoder = TDecoder(cin, embed, hid)
        # dead weights present in the checkpoint (vqvae_1d.py:135-139)
        self.decoder.frame_enc = tnn.Conv1d(cin, hid // 4, 1, 1)
        self.decoder.gru_sl = tnn.GRU(hid // 2, hid // 2, 1, batch_first=True)

    def forward(self, x):
        return self.decoder(self.encoder(x))


def test_body_ae_conversion_parity():
    from talkshow_tpu.models.vqvae import AE

    t = TBodyAE().eval()
    _randomize_bn(t)
    ckpt = {"generator": {"g": t.state_dict(), "g_optim": {},
                          "discriminator": None}}
    variables = conv.convert_body_ae_checkpoint(ckpt)
    model = AE(in_dim=129, num_hiddens=128)

    x_t = torch.randn(2, 129, 24)
    with torch.no_grad():
        ref = t(x_t).numpy()
        feat_ref = t.encoder(x_t).numpy()
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 1))
    out = model.apply(variables, x_j)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=2e-4)
    feat = model.apply(variables, x_j, method=AE.encode)
    np.testing.assert_allclose(np.asarray(feat).transpose(0, 2, 1), feat_ref,
                               atol=2e-4)
