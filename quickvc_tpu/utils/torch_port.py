"""Port reference PyTorch checkpoints into quickvc_tpu param pytrees.

The reference ships/produces ``G_*.pth`` / ``D_*.pth`` torch-pickle dicts
(reference utils.py:147-193, keys: model/iteration/optimizer/learning_rate).
This module maps those state dicts weight-for-weight onto our flax trees:

- torch ``Conv1d.weight (out, in, k)``        -> ``kernel/v (k, in, out)``
- torch ``ConvTranspose1d.weight (in, out, k)`` -> ``v (k, out, in)``
- torch ``weight_g (c, 1, 1)``                 -> ``g (c,)``
- torch ``Linear.weight (out, in)``            -> ``kernel (in, out)``
- LSTM weights/biases map 1:1 (same gate order i,f,g,o).

Requires torch only to unpickle; everything else is numpy.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def load_reference_checkpoint(path: str) -> tuple[dict[str, np.ndarray], int, float]:
    """Full reference-schema ``.pth`` -> (state_dict, iteration, learning_rate).

    Reference ``utils.load_checkpoint`` (utils.py:147-168) reads the same
    four-key dict; like it, missing metadata falls back to 0/0.0 so bare
    state dicts still load.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        sd, it = ckpt["model"], int(ckpt.get("iteration") or 0)
        lr = float(ckpt.get("learning_rate") or 0.0)
    else:
        sd, it, lr = ckpt, 0, 0.0
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    return sd, it, lr


def latest_torch_checkpoint(model_dir: str, prefix: str = "G_") -> str | None:
    """Newest ``{prefix}<step>.pth`` in a directory, by numeric step.

    Reference ``utils.latest_checkpoint_path`` (utils.py:196-203): it sorts
    the glob by the integer suffix; we do the same (a lexicographic sort
    would pick G_999999 over G_1200000).
    """
    import glob
    import os
    import re

    def step_of(p: str) -> int:
        m = re.search(r"(\d+)\.pth$", p)
        return int(m.group(1)) if m else -1

    paths = glob.glob(os.path.join(model_dir, f"{prefix}*.pth"))
    return max(paths, key=step_of) if paths else None


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _g(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.reshape(-1))


def _wn_conv(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> dict:
    out = {"v": _conv_w(sd[f"{prefix}.weight_v"]), "g": _g(sd[f"{prefix}.weight_g"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _plain_conv(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    out = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _wavenet(sd: Mapping[str, np.ndarray], prefix: str, n_layers: int,
             has_cond: bool) -> dict:
    """Per-layer torch convs -> stacked scan params (leading layer axis).

    The reference's last res_skip layer is h-wide (skip only,
    modules.py:66); our scanned stack is uniformly 2h-wide with the res half
    of the last layer zeroed (w=0 via v=0; g=1 keeps weight-norm finite).
    """
    out: dict = {}
    if has_cond:
        out["cond_layer"] = _wn_conv(sd, f"{prefix}.cond_layer")

    ins = {"v": [], "g": [], "bias": []}
    rss = {"v": [], "g": [], "bias": []}
    h = None
    for i in range(n_layers):
        c = _wn_conv(sd, f"{prefix}.in_layers.{i}")
        h = c["v"].shape[1]  # in channels == hidden
        for k in ins:
            ins[k].append(c[k])
        r = _wn_conv(sd, f"{prefix}.res_skip_layers.{i}")
        if r["v"].shape[-1] == h:  # last layer: h skip channels -> slot [h:2h]
            v = np.zeros(r["v"].shape[:-1] + (2 * h,), r["v"].dtype)
            v[..., h:] = r["v"]
            g = np.ones(2 * h, r["g"].dtype)
            g[h:] = r["g"]
            bias = np.zeros(2 * h, r["bias"].dtype)
            bias[h:] = r["bias"]
            r = {"v": v, "g": g, "bias": bias}
        for k in rss:
            rss[k].append(r[k])
    out["layers"] = {
        "in": {k: np.stack(v) for k, v in ins.items()},
        "res_skip": {k: np.stack(v) for k, v in rss.items()},
    }
    return out


def _cond_normal(sd, prefix: str, n_layers: int, has_cond: bool) -> dict:
    return {
        "pre": _plain_conv(sd, f"{prefix}.pre"),
        "enc": _wavenet(sd, f"{prefix}.enc", n_layers, has_cond),
        "proj": _plain_conv(sd, f"{prefix}.proj"),
    }


def _resblock(sd, prefix: str) -> dict:
    out = {}
    for j in range(3):
        out[f"conv1_{j}"] = _wn_conv(sd, f"{prefix}.convs1.{j}")
        out[f"conv2_{j}"] = _wn_conv(sd, f"{prefix}.convs2.{j}")
    return out


def port_generator(sd: Mapping[str, np.ndarray], model_cfg) -> dict:
    """Reference SynthesizerTrn state dict -> quickvc_tpu generator params."""
    n_flows = getattr(model_cfg, "n_flows", 4)
    enc_layers = getattr(model_cfg, "enc_wn_layers", 16)
    flow_layers = getattr(model_cfg, "flow_wn_layers", 4)
    num_kernels = len(model_cfg.resblock_kernel_sizes)
    num_ups = len(model_cfg.upsample_rates)

    flow = {}
    for i in range(n_flows):
        # torch ModuleList interleaves couplings and Flips: couplings at even idx
        tp = f"flow.flows.{2 * i}"
        flow[f"flow_{i}"] = {
            "pre": _plain_conv(sd, f"{tp}.pre"),
            "enc": _wavenet(sd, f"{tp}.enc", flow_layers, True),
            "post": _plain_conv(sd, f"{tp}.post"),
        }

    lstm = {}
    for layer in range(3):
        for nm in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            ours = nm.replace("weight", "w").replace("bias", "b")
            lstm[f"{ours}_l{layer}"] = sd[f"enc_spk.lstm.{nm}_l{layer}"]

    backbone = {
        "conv_pre": _wn_conv(sd, "dec.conv_pre"),
        "cond": _plain_conv(sd, "dec.cond"),
    }
    for i in range(num_ups):
        w = _wn_conv(sd, f"dec.ups.{i}")
        # ConvTranspose: torch v (in, out, k) -> ours (k, out, in)
        backbone[f"up_{i}"] = {"v": np.ascontiguousarray(
            sd[f"dec.ups.{i}.weight_v"].transpose(2, 1, 0)),
            "g": w["g"], "bias": w["bias"]}
        for j in range(num_kernels):
            backbone[f"resblock_{i}_{j}"] = _resblock(sd, f"dec.resblocks.{i * num_kernels + j}")

    dec: dict[str, Any] = {"backbone": backbone}
    if model_cfg.decoder_kind == "istft":
        dec["conv_post"] = _wn_conv(sd, "dec.conv_post")
    else:
        dec["head"] = {"subband_conv_post": _wn_conv(sd, "dec.subband_conv_post")}
        if model_cfg.decoder_kind == "ms_istft":
            dec["multistream_conv_post"] = _wn_conv(sd, "dec.multistream_conv_post", bias=False)

    return {
        "enc_q": _cond_normal(sd, "enc_q", enc_layers, True),
        "enc_p": _cond_normal(sd, "enc_p", enc_layers, False),
        "flow": flow,
        "enc_spk": {
            "lstm": lstm,
            "linear": {"kernel": np.ascontiguousarray(sd["enc_spk.linear.weight"].T),
                       "bias": sd["enc_spk.linear.bias"]},
        },
        "dec": dec,
    }


def _wn_conv2d(sd, prefix: str) -> dict:
    # torch Conv2d weight (out, in, kh, kw) -> ours (kh, kw, in, out)
    return {"v": np.ascontiguousarray(sd[f"{prefix}.weight_v"].transpose(2, 3, 1, 0)),
            "g": _g(sd[f"{prefix}.weight_g"]),
            "bias": sd[f"{prefix}.bias"]}


def port_discriminator(sd: Mapping[str, np.ndarray],
                       periods=(2, 3, 5, 7, 11)) -> dict:
    """Reference MultiPeriodDiscriminator state dict -> our params.

    Reference layout: discriminators.0 = DiscriminatorS (Conv1d),
    discriminators.1..5 = DiscriminatorP (Conv2d) (models.py:483-492).
    """
    out: dict[str, Any] = {}
    s = {}
    for i in range(6):
        s[f"WNConv1d_{i}"] = _wn_conv(sd, f"discriminators.0.convs.{i}")
    s["WNConv1d_6"] = _wn_conv(sd, "discriminators.0.conv_post")
    out["disc_s"] = s
    for d, p in enumerate(periods, start=1):
        dd = {}
        for i in range(5):
            dd[f"WNConv2d_{i}"] = _wn_conv2d(sd, f"discriminators.{d}.convs.{i}")
        dd["WNConv2d_5"] = _wn_conv2d(sd, f"discriminators.{d}.conv_post")
        out[f"disc_p{p}"] = dd
    return out


def to_jax(tree):
    """numpy tree -> jnp tree (f32)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
