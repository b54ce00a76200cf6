"""Reference TalkSHOW checkpoint (.pth state dicts) -> flax params.

Converts the torch state dicts saved by the reference trainer
(nets/base.py:29-36 layouts: body-vq ckpt {'generator': {'g_body', 'g_hand',
...}}, body-pixel {'generator': {'generator', 'audioencoder', ...}}, face
{'generator': {...s2g_face...}}) into the param/batch_stats/VQState pytrees
of talkshow_tpu.models.*.

Every tensor mapping reuses the layer-level converters proven against torch
in tests/test_layers.py; this module only encodes the module-tree walk.
DataParallel 'module.' prefixes are stripped (smplx_body_pixel.py:115-126).
"""
from __future__ import annotations

import numpy as np

from talkshow_tpu.convert.torch_weights import (
    conv1d_kernel,
    conv1d_transpose_kernel,
    conv2d_kernel,
    linear_kernel,
    t2j,
)
from talkshow_tpu.ops.vq import VQState


def strip_module_prefix(sd: dict) -> dict:
    return {k.replace("module.", ""): v for k, v in sd.items()}


def _conv(sd, p, transpose=False):
    kfn = conv1d_transpose_kernel if transpose else conv1d_kernel
    out = {"kernel": kfn(sd[p + ".weight"])}
    if p + ".bias" in sd:
        out["bias"] = t2j(sd[p + ".bias"])
    return out


def _bn(sd, p):
    params = {"BatchNorm_0": {"scale": t2j(sd[p + ".weight"]),
                              "bias": t2j(sd[p + ".bias"])}}
    stats = {"BatchNorm_0": {"mean": t2j(sd[p + ".running_mean"]),
                             "var": t2j(sd[p + ".running_var"])}}
    return params, stats


def _cnr(sd, p, sample="none", residual=False):
    """One reference ConvNormRelu (vqvae_modules.py:87-172) -> flax
    ConvNormRelu params/stats."""
    transpose = sample == "up"
    conv_name = "ConvTranspose_0" if transpose else "Conv_0"
    params = {conv_name: _conv(sd, p + ".conv", transpose)}
    bn_p, bn_s = _bn(sd, p + ".norm")
    params["TorchBatchNorm_0"] = bn_p
    stats = {"TorchBatchNorm_0": bn_s}
    if residual:
        rp = p + ".residual_layer"
        if rp + ".weight" in sd:
            params["residual_layer"] = _conv(sd, rp, transpose)
        elif rp + ".0.weight" in sd:     # nn.Sequential wrapper
            params["residual_layer"] = _conv(sd, rp + ".0", transpose)
    return params, stats


def _res_stack(sd, p, layers=2):
    """Res_CNR_Stack (vqvae_modules.py:175-212) -> flax ResCNRStack."""
    params, stats = {}, {}
    for i in range(layers):
        lp, ls = _cnr(sd, f"{p}._layers.{i}")
        params[f"layer_{i}"] = lp
        stats[f"layer_{i}"] = ls
    params["conv"] = _conv(sd, p + ".conv")
    bn_p, bn_s = _bn(sd, p + ".norm")
    params["norm"] = bn_p
    stats["norm"] = bn_s
    return params, stats


def _vq_encoder(sd, p, res_layers=2):
    params, stats = {}, {}
    pp, ps = _cnr(sd, p + ".project")
    params["project"], stats["project"] = pp, ps
    for i, name in ((1, "enc_1"), (2, "enc_2"), (3, "enc_3")):
        ep, es = _res_stack(sd, f"{p}._enc_{i}", res_layers)
        params[name], stats[name] = ep, es
    for i, name in ((1, "down_1"), (2, "down_2")):
        dp_, ds = _cnr(sd, f"{p}._down_{i}", sample="down", residual=True)
        params[name], stats[name] = dp_, ds
    if p + ".pre_vq_conv.weight" in sd:
        params["pre_vq_conv"] = _conv(sd, p + ".pre_vq_conv")
    return params, stats


def _vq_decoder(sd, p, res_layers=2):
    params, stats = {}, {}
    params["aft_vq_conv"] = _conv(sd, p + ".aft_vq_conv")
    for i, name in ((1, "dec_1"), (2, "dec_2"), (3, "dec_3")):
        ep, es = _res_stack(sd, f"{p}._dec_{i}", res_layers)
        params[name], stats[name] = ep, es
    for i, name in ((2, "up_2"), (3, "up_3")):
        up, us = _cnr(sd, f"{p}._up_{i}", sample="up", residual=True)
        params[name], stats[name] = up, us
    params["project"] = _conv(sd, p + ".project")
    return params, stats


def convert_vqvae(sd: dict, prefix: str = ""):
    """One reference VQVAE (vqvae_1d.py:168-208) -> (variables, VQState)."""
    sd = strip_module_prefix(sd)
    p = prefix.rstrip(".")
    pfx = (p + ".") if p else ""
    enc_p, enc_s = _vq_encoder(sd, pfx + "encoder")
    dec_p, dec_s = _vq_decoder(sd, pfx + "decoder")
    variables = {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }
    emb = t2j(sd[pfx + "vq_layer.embeddings"]).astype(np.float32)
    ema_dw = t2j(sd.get(pfx + "vq_layer.ema_dw.hidden", np.zeros_like(emb)))
    ema_count = t2j(sd.get(pfx + "vq_layer.ema_cluster_size.hidden",
                           np.zeros(emb.shape[0])))
    state = VQState(
        embeddings=emb, ema_dw_hidden=ema_dw.astype(np.float32),
        ema_count_hidden=ema_count.astype(np.float32),
        counter=np.zeros((), np.int32),  # not saved by the reference
    )
    return variables, state


def convert_audio_encoder(sd: dict, prefix: str = ""):
    """vqvae_1d.AudioEncoder (:11-34) -> flax AudioEncoder variables."""
    sd = strip_module_prefix(sd)
    pfx = (prefix.rstrip(".") + ".") if prefix else ""
    params, stats = {}, {}
    pp, ps = _cnr(sd, pfx + "project")
    params["project"], stats["project"] = pp, ps
    for i, name in ((1, "enc_1"), (2, "enc_2"), (3, "enc_3")):
        ep, es = _res_stack(sd, f"{pfx}_enc_{i}")
        params[name], stats[name] = ep, es
    for i, name in ((1, "down_1"), (2, "down_2")):
        dp_, ds = _cnr(sd, f"{pfx}_down_{i}", sample="down", residual=True)
        params[name], stats[name] = dp_, ds
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# PixelCNN
# ---------------------------------------------------------------------------

def convert_pixelcnn(sd: dict, n_layers: int | None = None,
                     audio: bool = True, bh_model: bool = True):
    """gated_pixelcnn_v2.GatedPixelCNN (:90-150) -> flax params.

    Structural-mask handling: mask-A kernels have their causally-zeroed
    last row (vert) / last column (horiz) sliced off — our layers encode
    the mask in the padding instead of zeroed weights.

    n_layers=None infers the stack depth from the `layers.<i>.` keys, so
    one call handles both the 3d prior (15 layers) and the 6d prior
    (10 layers, smplx_body_pixel.py:49-53).
    """
    sd = strip_module_prefix(sd)
    if n_layers is None:
        n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                           if k.startswith("layers."))
    params = {
        "embedding": {"embedding": t2j(sd["embedding.weight"])},
        "out_hidden": _conv2d(sd, "output_conv.0"),
        "out_logits": _conv2d(sd, "output_conv.2"),
    }
    if audio:
        params["embedding_aud"] = _conv2d(sd, "embedding_aud")
        params["fusion_v"] = _conv2d(sd, "fusion_v")
        params["fusion_h"] = _conv2d(sd, "fusion_h")
    for i in range(n_layers):
        p = f"layers.{i}"
        mask_a = i == 0
        vert_w = t2j(sd[p + ".vert_stack.weight"])      # (2d, d, kh, kw)
        if mask_a:
            vert_w = vert_w[:, :, :-1, :]               # drop zeroed last row
        layer = {
            "class_embed": {"embedding": t2j(sd[p + ".class_cond_embedding.weight"])},
            "vert_stack": {"kernel": vert_w.transpose(2, 3, 1, 0),
                           "bias": t2j(sd[p + ".vert_stack.bias"])},
            "horiz_resid": _conv2d(sd, p + ".horiz_resid"),
        }
        if bh_model:
            horiz_w = t2j(sd[p + ".horiz_stack.weight"])  # (2d, d, 1, 2)
            if mask_a:
                horiz_w = horiz_w[:, :, :, :-1]           # drop zeroed last col
            layer["horiz_stack"] = {"kernel": horiz_w.transpose(2, 3, 1, 0),
                                    "bias": t2j(sd[p + ".horiz_stack.bias"])}
            layer["vert_to_horiz"] = _conv2d(sd, p + ".vert_to_horiz")
        params[f"layer_{i}"] = layer
    return {"params": params}


def _conv2d(sd, p):
    return {"kernel": conv2d_kernel(sd[p + ".weight"]),
            "bias": t2j(sd[p + ".bias"])}


# ---------------------------------------------------------------------------
# Face generator
# ---------------------------------------------------------------------------

def convert_face(sd: dict, wav2vec_cfg=None):
    """s2g_face.Generator (:142-224, faceformer branch) -> FaceGenerator
    params.  Decoder branches: decoder.0/final_out.0 = jaw head;
    decoder.1/final_out.1 = expression head."""
    from talkshow_tpu.convert.wav2vec import convert_wav2vec2
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    sd = strip_module_prefix(sd)
    cfg = wav2vec_cfg or Wav2Vec2Config()
    w2v_sd = {k[len("audio_encoder."):]: v for k, v in sd.items()
              if k.startswith("audio_encoder.")}
    params = {
        "audio_encoder": convert_wav2vec2(w2v_sd, cfg),
        "audio_feature_map": {
            "kernel": linear_kernel(sd["audio_feature_map.weight"]),
            "bias": t2j(sd["audio_feature_map.bias"]),
        },
        "audio_middle": _face_middle(sd, "audio_middle"),
        "heads": _face_heads(sd),
    }
    return {"params": params}


def _generic_cnr_ln(sd, p):
    """nets/layers.py ConvNormRelu with norm='ln' -> flax CNR1d params."""
    out = {"Conv_0": _conv(sd, p + ".conv"),
           "LayerNorm_0": {"scale": t2j(sd[p + ".norm.weight"]),
                           "bias": t2j(sd[p + ".norm.bias"])}}
    rp = p + ".residual_layer"
    if rp + ".weight" in sd:
        out["residual_layer"] = _conv(sd, rp)
    elif rp + ".0.weight" in sd:
        out["residual_layer"] = _conv(sd, rp + ".0")
    return out


def _face_middle(sd, p):
    params = {"id_mlp": _conv(sd, p + ".id_mlp")}
    first = {}
    for i in range(3):
        first[f"conv_{i}"] = _generic_cnr_ln(sd, f"{p}.first_net.conv_layers.{i}")
    params["first_net"] = first
    return params


def _face_heads(sd):
    params = {}
    for i in range(3):
        params[f"jaw_cnr_{i}"] = _generic_cnr_ln(sd, f"decoder.0.{i}")
        params[f"exp_cnr_{i}"] = _generic_cnr_ln(sd, f"decoder.1.{i}")
    params["jaw_out"] = _conv(sd, "final_out.0")
    params["exp_out"] = _conv(sd, "final_out.1")
    return params


# ---------------------------------------------------------------------------
# Top-level checkpoint entry points
# ---------------------------------------------------------------------------

def convert_body_vq_checkpoint(ckpt: dict):
    """Reference body-vq ckpt-*.pth -> {'body': (vars, state), 'hand': ...}."""
    gen = ckpt["generator"] if "generator" in ckpt else ckpt
    return {"body": convert_vqvae(gen["g_body"]),
            "hand": convert_vqvae(gen["g_hand"])}


def convert_body_pixel_checkpoint(ckpt: dict, n_layers: int | None = None):
    gen = ckpt["generator"] if "generator" in ckpt else ckpt
    return {
        "prior": convert_pixelcnn(gen["generator"], n_layers=n_layers),
        "audio": convert_audio_encoder(gen["audioencoder"]),
    }


def convert_body_ae_checkpoint(ckpt: dict):
    """Reference FGD feature extractor (experiments/feature_extractor.pth;
    nets/body_ae.py TrainWrapper.state_dict = {'g': AE sd, ...}) -> flax AE
    variables.  The reference AE decoder carries dead frame_enc/gru params
    (vqvae_1d.py:135-139, never used in forward) which are skipped."""
    sd = ckpt.get("generator", ckpt)
    if isinstance(sd, dict) and "g" in sd:
        sd = sd["g"]
    sd = strip_module_prefix(sd)
    enc_p, enc_s = _vq_encoder(sd, "encoder")
    dec_p, dec_s = _vq_decoder(sd, "decoder")
    return {"params": {"encoder": enc_p, "decoder": dec_p},
            "batch_stats": {"encoder": enc_s, "decoder": dec_s}}


def convert_face_checkpoint(ckpt: dict, wav2vec_cfg=None):
    """Reference face ckpt: trainer saves {'generator': TrainWrapper.state_dict()}
    = {'generator': {'generator': <flat Generator sd>, 'generator_optim': ...}}
    (trainer/Trainer.py:215-230, nets/base.py:29-36)."""
    sd = ckpt
    while isinstance(sd, dict) and "generator" in sd and not any(
            "." in k for k in sd):
        sd = sd["generator"]
    return convert_face(sd, wav2vec_cfg)
