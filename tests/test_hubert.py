"""HuBERT-soft parity: flax implementation vs a torch replica, matched weights.

The released bshall/hubert checkpoint is not fetchable offline, so parity is
pinned structurally: a torch model built from the same primitives
(Conv1d/GroupNorm/weight_norm(dim=2)/TransformerEncoderLayer) with random
weights, ported through ``utils.hubert_port.port_hubert`` and compared.
This validates both the forward math and the checkpoint port mapping.
"""

import numpy as np
import torch

import jax.numpy as jnp

from quickvc_tpu.models.hubert import HubertSoft
from quickvc_tpu.utils.hubert_port import port_hubert
from quickvc_tpu.utils.torch_port import to_jax


class TorchHubertReplica(torch.nn.Module):
    """Small-config torch HubertSoft with bshall/hubert's key layout."""

    def __init__(self, d=64, layers=2, heads=4, ffn=128, ch=32, unit=24, pos_k=8, pos_g=4):
        super().__init__()
        self.feature_extractor = torch.nn.Module()
        self.feature_extractor.conv0 = torch.nn.Conv1d(1, ch, 10, 5, bias=False)
        self.feature_extractor.norm0 = torch.nn.GroupNorm(ch, ch)
        for i in range(1, 5):
            setattr(self.feature_extractor, f"conv{i}", torch.nn.Conv1d(ch, ch, 3, 2, bias=False))
        for i in range(5, 7):
            setattr(self.feature_extractor, f"conv{i}", torch.nn.Conv1d(ch, ch, 2, 2, bias=False))
        self.feature_projection = torch.nn.Module()
        self.feature_projection.norm = torch.nn.LayerNorm(ch)
        self.feature_projection.projection = torch.nn.Linear(ch, d)
        self.positional_embedding = torch.nn.Module()
        self.positional_embedding.conv = torch.nn.utils.weight_norm(
            torch.nn.Conv1d(d, d, pos_k, padding=pos_k // 2, groups=pos_g), dim=2)
        self.norm = torch.nn.LayerNorm(d)
        self.encoder = torch.nn.TransformerEncoder(
            torch.nn.TransformerEncoderLayer(d, heads, ffn, activation="gelu",
                                             batch_first=True, dropout=0.0),
            num_layers=layers)
        self.proj = torch.nn.Linear(d, unit)

    def forward(self, wav):
        fe = self.feature_extractor
        x = torch.nn.functional.gelu(fe.norm0(fe.conv0(wav.unsqueeze(1))))
        for i in range(1, 7):
            x = torch.nn.functional.gelu(getattr(fe, f"conv{i}")(x))
        x = x.transpose(1, 2)
        x = self.feature_projection.projection(self.feature_projection.norm(x))
        p = self.positional_embedding.conv(x.transpose(1, 2))
        p = torch.nn.functional.gelu(p[:, :, :-1]).transpose(1, 2)
        x = self.norm(x + p)
        x = self.encoder(x)
        return self.proj(x)


def test_hubert_matches_torch_replica(rng):
    d, layers, heads, ffn, ch, unit, pos_k, pos_g = 64, 2, 4, 128, 32, 24, 8, 4
    tmodel = TorchHubertReplica(d, layers, heads, ffn, ch, unit, pos_k, pos_g).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = to_jax(port_hubert(sd, num_layers=layers))

    ours = HubertSoft(embed_dim=d, num_layers=layers, num_heads=heads,
                      ffn_dim=ffn, extractor_channels=ch, unit_dim=unit,
                      pos_kernel_size=pos_k, pos_groups=pos_g)

    wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.3
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(wav)).numpy()
    out = ours.apply({"params": params}, jnp.asarray(wav))

    assert out.shape == golden.shape
    np.testing.assert_allclose(np.asarray(out), golden, atol=2e-4, rtol=2e-3)


def _hf_small_config():
    from transformers import HubertConfig

    return HubertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
        feat_extract_norm="group", do_stable_layer_norm=False, conv_bias=False,
        hidden_act="gelu", hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=False)


def _hf_to_bshall_sd(hf_sd: dict, num_layers: int) -> dict:
    """HuggingFace HubertModel state dict -> bshall/hubert key layout."""
    g = lambda k: hf_sd[k].detach().numpy()  # noqa: E731
    sd = {
        "feature_extractor.norm0.weight":
            g("feature_extractor.conv_layers.0.layer_norm.weight"),
        "feature_extractor.norm0.bias":
            g("feature_extractor.conv_layers.0.layer_norm.bias"),
        "feature_projection.norm.weight": g("feature_projection.layer_norm.weight"),
        "feature_projection.norm.bias": g("feature_projection.layer_norm.bias"),
        "feature_projection.projection.weight": g("feature_projection.projection.weight"),
        "feature_projection.projection.bias": g("feature_projection.projection.bias"),
        "positional_embedding.conv.weight_g":
            g("encoder.pos_conv_embed.conv.parametrizations.weight.original0"),
        "positional_embedding.conv.weight_v":
            g("encoder.pos_conv_embed.conv.parametrizations.weight.original1"),
        "positional_embedding.conv.bias": g("encoder.pos_conv_embed.conv.bias"),
        "norm.weight": g("encoder.layer_norm.weight"),
        "norm.bias": g("encoder.layer_norm.bias"),
    }
    for i in range(7):
        sd[f"feature_extractor.conv{i}.weight"] = g(
            f"feature_extractor.conv_layers.{i}.conv.weight")
    for i in range(num_layers):
        hf = f"encoder.layers.{i}"
        ours = f"encoder.layers.{i}"
        sd[f"{ours}.self_attn.in_proj_weight"] = np.concatenate(
            [g(f"{hf}.attention.{p}_proj.weight") for p in "qkv"], axis=0)
        sd[f"{ours}.self_attn.in_proj_bias"] = np.concatenate(
            [g(f"{hf}.attention.{p}_proj.bias") for p in "qkv"], axis=0)
        sd[f"{ours}.self_attn.out_proj.weight"] = g(f"{hf}.attention.out_proj.weight")
        sd[f"{ours}.self_attn.out_proj.bias"] = g(f"{hf}.attention.out_proj.bias")
        sd[f"{ours}.linear1.weight"] = g(f"{hf}.feed_forward.intermediate_dense.weight")
        sd[f"{ours}.linear1.bias"] = g(f"{hf}.feed_forward.intermediate_dense.bias")
        sd[f"{ours}.linear2.weight"] = g(f"{hf}.feed_forward.output_dense.weight")
        sd[f"{ours}.linear2.bias"] = g(f"{hf}.feed_forward.output_dense.bias")
        sd[f"{ours}.norm1.weight"] = g(f"{hf}.layer_norm.weight")
        sd[f"{ours}.norm1.bias"] = g(f"{hf}.layer_norm.bias")
        sd[f"{ours}.norm2.weight"] = g(f"{hf}.final_layer_norm.weight")
        sd[f"{ours}.norm2.bias"] = g(f"{hf}.final_layer_norm.bias")
    return sd


def test_hubert_matches_huggingface_independent_oracle(rng):
    """Differential vs transformers.HubertModel — an INDEPENDENT third-party
    implementation of the same architecture (fairseq wav2vec2 lineage that
    bshall/hubert wraps). Unlike the torch replica above, none of this
    oracle's forward code is authored in this repo, so a shared misreading
    of the conventions (pos-conv trim side, post-norm order, erf GELU,
    group-norm placement) cannot pass it."""
    from transformers import HubertModel

    torch.manual_seed(7)
    hf = HubertModel(_hf_small_config()).eval()
    d, unit, layers = 64, 24, 2
    sd = _hf_to_bshall_sd(hf.state_dict(), layers)
    # soft-unit head: HubertModel stops at hidden states; apply the same
    # random projection on both sides
    w = rng.standard_normal((unit, d)).astype(np.float32) * 0.1
    b = rng.standard_normal(unit).astype(np.float32) * 0.1
    sd["proj.weight"], sd["proj.bias"] = w, b

    params = to_jax(port_hubert(sd, num_layers=layers))
    ours = HubertSoft(embed_dim=d, num_layers=layers, num_heads=4,
                      ffn_dim=128, extractor_channels=32, unit_dim=unit,
                      pos_kernel_size=8, pos_groups=4)

    wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.3
    with torch.no_grad():
        hidden = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    golden = hidden @ w.T + b
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(wav)))
    assert out.shape == golden.shape
    np.testing.assert_allclose(out, golden, atol=5e-4, rtol=2e-3)


def test_hubert_sd_contract(rng):
    """validate_hubert_sd: accepts the documented bshall/hubert layout
    (+ training-only keys), loudly rejects renamed/mis-shaped entries."""
    import pytest

    from quickvc_tpu.utils.hubert_port import (
        expected_hubert_sd_shapes,
        validate_hubert_sd,
    )

    exp = expected_hubert_sd_shapes()
    assert len(exp) == 20 + 12 * 12  # header+extractor keys + per-layer
    sd = {k: np.zeros(s, np.float32) for k, s in exp.items()}
    sd["masked_spec_embed"] = np.zeros(768, np.float32)   # training-only
    sd["label_embedding.weight"] = np.zeros((100, 256), np.float32)
    validate_hubert_sd(sd)  # passes

    renamed = dict(sd)
    renamed["proj.Weight"] = renamed.pop("proj.weight")
    with pytest.raises(ValueError, match="proj.weight"):
        validate_hubert_sd(renamed)

    shifted = dict(sd)
    shifted["feature_extractor.conv0.weight"] = np.zeros((512, 1, 11), np.float32)
    with pytest.raises(ValueError, match="conv0"):
        validate_hubert_sd(shifted)

    with pytest.raises(ValueError, match="missing"):
        validate_hubert_sd({k: v for k, v in sd.items()
                            if not k.startswith("norm.")})


def test_hubert_units_frame_rate(rng):
    """units(): (B, T) 16 kHz -> (B, T//320, unit_dim) 50 Hz."""
    ours = HubertSoft(embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
                      extractor_channels=16, unit_dim=8, pos_kernel_size=8, pos_groups=4)
    import jax
    wav = jnp.asarray(rng.standard_normal((1, 6400)).astype(np.float32))
    params = ours.init(jax.random.PRNGKey(0), wav)
    units = ours.apply(params, wav, method=HubertSoft.units)
    assert units.shape == (1, 6400 // 320, 8)


def test_bf16_fast_gelu_within_bf16_noise(rng):
    """bf16 runs use tanh-GELU (models/hubert.py:gelu): its deviation from
    exact erf GELU must stay at/below the bf16 quantization floor, and the
    bf16 forward must track the f32 (exact-GELU) forward."""
    from quickvc_tpu.models.hubert import gelu

    # same (bf16-quantized) inputs through both paths: isolates the
    # approximation error from input quantization
    xb = jnp.asarray(np.linspace(-12, 12, 100_001, dtype=np.float32)).astype(jnp.bfloat16)
    exact = np.asarray(jnp.asarray(gelu(xb.astype(jnp.float32))))  # f32 path == erf
    approx = np.asarray(jnp.asarray(gelu(xb)).astype(jnp.float32))
    # absolute deviation bounded by bf16 eps relative to the value scale
    err = np.abs(exact - approx)
    tol = np.maximum(np.abs(exact), 1.0) * 2 ** -7  # 2 bf16 ulps
    assert (err <= tol).all(), float(err.max())

    # end-to-end: tiny-config bf16 forward tracks f32 within bf16 noise
    net = HubertSoft(embed_dim=64, num_layers=2, num_heads=4, ffn_dim=128,
                     extractor_channels=32, unit_dim=24, pos_kernel_size=8,
                     pos_groups=4)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    import jax

    params = jax.jit(net.init)(jax.random.PRNGKey(0), wav)
    u32 = net.apply(params, wav)
    u16 = net.apply(params, wav.astype(jnp.bfloat16)).astype(jnp.float32)
    assert np.abs(np.asarray(u32) - np.asarray(u16)).mean() < 0.05 * float(
        jnp.abs(u32).mean() + 1e-6)
