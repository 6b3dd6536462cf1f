"""Port bshall/hubert HubertSoft torch checkpoints to the flax HubertSoft.

Torch key layout (bshall/hubert model.py):
  feature_extractor.conv{0..6}.weight, feature_extractor.norm0.{weight,bias}
  feature_projection.norm.{weight,bias}, feature_projection.projection.{weight,bias}
  positional_embedding.conv.{weight_g,weight_v,bias}   (weight_norm dim=2)
  norm.{weight,bias}
  encoder.layers.{i}.self_attn.{in_proj_weight,in_proj_bias}
  encoder.layers.{i}.self_attn.out_proj.{weight,bias}
  encoder.layers.{i}.{linear1,linear2,norm1,norm2}.{weight,bias}
  proj.{weight,bias}
(masked_spec_embed / label_embedding are training-only; ignored.)
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv(sd, key):  # (out, in, k) -> (k, in, out)
    return {"kernel": np.ascontiguousarray(sd[key + ".weight"].transpose(2, 1, 0))}


def _linear(sd, key):
    return {"kernel": np.ascontiguousarray(sd[key + ".weight"].T),
            "bias": sd[key + ".bias"]}


def _ln(sd, key):
    return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}


def expected_hubert_sd_shapes(num_layers: int = 12, embed_dim: int = 768,
                              ffn_dim: int = 3072, unit_dim: int = 256,
                              conv_dim: int = 512, pos_kernel: int = 128,
                              pos_groups: int = 16) -> dict[str, tuple]:
    """The documented bshall/hubert ``HubertSoft`` state-dict contract.

    Key names/shapes per bshall/hubert model.py (HuBERT-Base dims: 7-conv
    512-wide extractor with kernels 10,3,3,3,3,2,2; 768-d 12-layer post-norm
    torch TransformerEncoder; grouped 128-kernel positional conv with
    weight_norm(dim=2); 256-d soft-unit projection head).
    """
    exp = {
        "feature_extractor.conv0.weight": (conv_dim, 1, 10),
        "feature_extractor.norm0.weight": (conv_dim,),
        "feature_extractor.norm0.bias": (conv_dim,),
        "feature_projection.norm.weight": (conv_dim,),
        "feature_projection.norm.bias": (conv_dim,),
        "feature_projection.projection.weight": (embed_dim, conv_dim),
        "feature_projection.projection.bias": (embed_dim,),
        "positional_embedding.conv.weight_v":
            (embed_dim, embed_dim // pos_groups, pos_kernel),
        "positional_embedding.conv.weight_g": (1, 1, pos_kernel),
        "positional_embedding.conv.bias": (embed_dim,),
        "norm.weight": (embed_dim,),
        "norm.bias": (embed_dim,),
        "proj.weight": (unit_dim, embed_dim),
        "proj.bias": (unit_dim,),
    }
    for i in range(1, 5):
        exp[f"feature_extractor.conv{i}.weight"] = (conv_dim, conv_dim, 3)
    for i in range(5, 7):
        exp[f"feature_extractor.conv{i}.weight"] = (conv_dim, conv_dim, 2)
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        exp.update({
            f"{p}.self_attn.in_proj_weight": (3 * embed_dim, embed_dim),
            f"{p}.self_attn.in_proj_bias": (3 * embed_dim,),
            f"{p}.self_attn.out_proj.weight": (embed_dim, embed_dim),
            f"{p}.self_attn.out_proj.bias": (embed_dim,),
            f"{p}.linear1.weight": (ffn_dim, embed_dim),
            f"{p}.linear1.bias": (ffn_dim,),
            f"{p}.linear2.weight": (embed_dim, ffn_dim),
            f"{p}.linear2.bias": (embed_dim,),
            f"{p}.norm1.weight": (embed_dim,),
            f"{p}.norm1.bias": (embed_dim,),
            f"{p}.norm2.weight": (embed_dim,),
            f"{p}.norm2.bias": (embed_dim,),
        })
    return exp


# Training-only entries a real bshall/hubert checkpoint may carry; ignored
# by the port (model.py: masking embedding / k-means label table).
_HUBERT_TRAINING_ONLY = ("masked_spec_embed", "label_embedding")


def validate_hubert_sd(sd: Mapping[str, np.ndarray],
                       num_layers: int = 12) -> None:
    """Fail loudly (with a full diff) if ``sd`` isn't a bshall/hubert
    HubertSoft checkpoint — a silently mis-keyed or mis-shaped dict would
    otherwise port garbage weights (VERDICT missing #6 residual risk)."""
    shapes = {k.replace("module.", ""): tuple(np.asarray(v).shape)
              for k, v in sd.items()}
    ignored = {k for k in shapes if k.split(".")[0] in _HUBERT_TRAINING_ONLY}
    exp = expected_hubert_sd_shapes(num_layers)
    missing = sorted(set(exp) - set(shapes))
    unexpected = sorted(set(shapes) - set(exp) - ignored)
    mismatched = [f"{k}: got {shapes[k]} want {exp[k]}"
                  for k in sorted(exp) if k in shapes and shapes[k] != exp[k]]
    if missing or unexpected or mismatched:
        raise ValueError(
            "checkpoint does not match the bshall/hubert HubertSoft "
            f"state-dict contract:\n  missing={missing[:8]}\n  "
            f"unexpected={unexpected[:8]}\n  shape_mismatches={mismatched[:8]}")


def port_hubert(sd: Mapping[str, np.ndarray], num_layers: int = 12) -> dict:
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    fe = {"norm0": _ln(sd, "feature_extractor.norm0")}
    for i in range(7):
        fe[f"conv{i}"] = _conv(sd, f"feature_extractor.conv{i}")

    pos = {
        # torch weight_v (out, in/g, k) -> ours (k, in/g, out); g (1, 1, k) -> (k,)
        "v": np.ascontiguousarray(sd["positional_embedding.conv.weight_v"].transpose(2, 1, 0)),
        "g": np.ascontiguousarray(sd["positional_embedding.conv.weight_g"].reshape(-1)),
        "bias": sd["positional_embedding.conv.bias"],
    }

    layers = {}
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        layers[f"layer_{i}"] = {
            "self_attn": {
                "in_proj_weight": sd[f"{p}.self_attn.in_proj_weight"],
                "in_proj_bias": sd[f"{p}.self_attn.in_proj_bias"],
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }

    return {
        "feature_extractor": fe,
        "feature_projection": {
            "norm": _ln(sd, "feature_projection.norm"),
            "projection": _linear(sd, "feature_projection.projection"),
        },
        "positional_embedding": pos,
        "norm": _ln(sd, "norm"),
        **layers,
        "proj": _linear(sd, "proj"),
    }
