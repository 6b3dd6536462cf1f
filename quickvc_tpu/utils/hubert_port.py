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
