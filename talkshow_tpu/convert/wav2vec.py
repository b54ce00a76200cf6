"""HF Wav2Vec2 state dict -> flax Wav2Vec2Encoder params."""
from __future__ import annotations

import numpy as np

from talkshow_tpu.convert.torch_weights import conv1d_kernel, linear_kernel, t2j
from talkshow_tpu.models.wav2vec import Wav2Vec2Config


def _weight_norm_conv(sd: dict, prefix: str) -> np.ndarray:
    """Resolve a torch weight-norm'd conv weight (dim=2) to a plain weight.

    Handles both legacy ('weight_g'/'weight_v') and parametrize-style
    ('parametrizations.weight.original0/1') key layouts.
    """
    if prefix + ".weight" in sd:
        return t2j(sd[prefix + ".weight"])
    if prefix + ".weight_g" in sd:
        g, v = t2j(sd[prefix + ".weight_g"]), t2j(sd[prefix + ".weight_v"])
    else:
        g = t2j(sd[prefix + ".parametrizations.weight.original0"])
        v = t2j(sd[prefix + ".parametrizations.weight.original1"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return g * v / norm


def _attention(sd: dict, p: str, num_heads: int) -> dict:
    d_model = t2j(sd[p + ".q_proj.weight"]).shape[0]
    head_dim = d_model // num_heads

    def qkv(name):
        w = linear_kernel(sd[f"{p}.{name}.weight"])           # (in, out)
        b = t2j(sd[f"{p}.{name}.bias"])
        return {"kernel": w.reshape(d_model, num_heads, head_dim),
                "bias": b.reshape(num_heads, head_dim)}

    out_w = linear_kernel(sd[p + ".out_proj.weight"])          # (in, out)
    return {
        "query": qkv("q_proj"),
        "key": qkv("k_proj"),
        "value": qkv("v_proj"),
        "out": {"kernel": out_w.reshape(num_heads, head_dim, d_model),
                "bias": t2j(sd[p + ".out_proj.bias"])},
    }


def _ln(sd: dict, p: str) -> dict:
    return {"scale": t2j(sd[p + ".weight"]), "bias": t2j(sd[p + ".bias"])}


def convert_wav2vec2(state_dict: dict, cfg: Wav2Vec2Config) -> dict:
    """HF Wav2Vec2Model.state_dict() -> params for models.wav2vec.Wav2Vec2Encoder."""
    sd = state_dict
    fe = {}
    for i in range(len(cfg.conv_dim)):
        fe[f"conv_{i}"] = {
            "kernel": conv1d_kernel(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        }
    fe["group_norm"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")

    hidden = t2j(sd["feature_projection.projection.bias"]).shape[0]
    params = {
        "masked_spec_embed": (t2j(sd["masked_spec_embed"])
                              if "masked_spec_embed" in sd
                              else np.zeros(hidden, np.float32)),
        "feature_extractor": fe,
        "feature_projection": {
            "layer_norm": _ln(sd, "feature_projection.layer_norm"),
            "projection": {
                "kernel": linear_kernel(sd["feature_projection.projection.weight"]),
                "bias": t2j(sd["feature_projection.projection.bias"]),
            },
        },
        "pos_conv_embed": {
            "conv": {
                "kernel": _weight_norm_conv(sd, "encoder.pos_conv_embed.conv").transpose(2, 1, 0),
                "bias": t2j(sd["encoder.pos_conv_embed.conv.bias"]),
            },
        },
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "attention": _attention(sd, p + ".attention", cfg.num_heads),
            "layer_norm": _ln(sd, p + ".layer_norm"),
            "ffn_intermediate": {
                "kernel": linear_kernel(sd[p + ".feed_forward.intermediate_dense.weight"]),
                "bias": t2j(sd[p + ".feed_forward.intermediate_dense.bias"]),
            },
            "ffn_output": {
                "kernel": linear_kernel(sd[p + ".feed_forward.output_dense.weight"]),
                "bias": t2j(sd[p + ".feed_forward.output_dense.bias"]),
            },
            "final_layer_norm": _ln(sd, p + ".final_layer_norm"),
        }
    return params


def config_from_hf(hf_config) -> Wav2Vec2Config:
    return Wav2Vec2Config(
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
        layer_norm_eps=hf_config.layer_norm_eps,
    )
