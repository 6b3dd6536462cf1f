"""Full-model differential test against the ACTUAL reference implementation.

Imports the reference's torch modules from /root/reference (read-only),
builds a small-config SynthesizerTrn there, ports its state dict through
utils.torch_port, and checks that our inference output matches the
reference's ``net_g.infer`` sample for sample. This validates the entire
wiring — encoders, flow order/flips, speaker-encoder windowing, decoder
padding arithmetic, iSTFT head, stream synthesis — against the reference
code itself, with no pretrained weights needed.

Environment shims (the reference imports things this image lacks):
- ``torchaudio.transforms.InverseSpectrogram`` -> thin torch.istft wrapper,
- ``scipy.signal.kaiser``   -> np.kaiser (removed in modern scipy),
- ``torch.Tensor.cuda``     -> no-op (reference pqmf.py hardcodes .cuda()),
- ``torch.randn_like``      -> zeros during inference, so the reference's
  prior sample equals mu, matching our ``noise_scale=0`` path.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_models():
    """Import reference models.py with compatibility shims installed."""
    # torchaudio shim: InverseSpectrogram(n_fft, win_length, hop_length)
    import importlib.machinery

    ta = types.ModuleType("torchaudio")
    ta_tf = types.ModuleType("torchaudio.transforms")
    # real ModuleSpecs: importlib.util.find_spec (e.g. transformers'
    # availability probing) raises ValueError on stubs with __spec__=None
    ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
    ta_tf.__spec__ = importlib.machinery.ModuleSpec("torchaudio.transforms", None)

    class InverseSpectrogram(torch.nn.Module):
        def __init__(self, n_fft, win_length=None, hop_length=None):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2
            self.register_buffer("window", torch.hann_window(self.win_length))

        def forward(self, spec, length=None):
            return torch.istft(spec, self.n_fft, hop_length=self.hop_length,
                               win_length=self.win_length, window=self.window,
                               center=True, normalized=False, onesided=True,
                               length=length)

    ta_tf.InverseSpectrogram = InverseSpectrogram
    ta.transforms = ta_tf
    sys.modules.setdefault("torchaudio", ta)
    sys.modules.setdefault("torchaudio.transforms", ta_tf)

    import scipy.signal
    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = lambda m, beta: np.kaiser(m, beta)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self

    sys.path.insert(0, REF)
    try:
        import models as ref_models_mod  # noqa: F401  (reference models.py)
    finally:
        sys.path.remove(REF)
        torch.Tensor.cuda = orig_cuda
    return ref_models_mod


SMALL_KW = dict(
    inter_channels=16, hidden_channels=16,
    resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
    upsample_rates=[5, 4], upsample_initial_channel=32,
    upsample_kernel_sizes=[16, 16], gen_istft_n_fft=16, gen_istft_hop_size=4,
    subbands=4, gin_channels=16,
)


def _our_config(decoder: str):
    from quickvc_tpu.config import ModelConfig

    return ModelConfig(
        ms_istft_vits=decoder == "ms", mb_istft_vits=decoder == "mb",
        istft_vits=decoder == "istft",
        subbands=4 if decoder != "istft" else 4,
        inter_channels=16, hidden_channels=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        upsample_rates=(5, 4), upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16), gin_channels=16,
        unit_channels=256,  # reference hardcodes 256 (models.py:579)
    )


@pytest.mark.parametrize("decoder", ["ms", "mb", "istft"])
def test_infer_matches_reference(ref_models, rng, decoder):
    from quickvc_tpu.models.encoders import embed_utterance_batch
    from quickvc_tpu.models.synthesizer import SynthesizerTrn
    from quickvc_tpu.utils.torch_port import port_generator, to_jax

    torch.manual_seed(0)
    spec_ch, seg = 33, 8
    kw = dict(SMALL_KW)
    kw["ms_istft_vits"] = decoder == "ms"
    kw["mb_istft_vits"] = decoder == "mb"
    kw["istft_vits"] = decoder == "istft"
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self  # pqmf ctor (mb decoder)
    try:
        ref_net = ref_models.SynthesizerTrn(spec_ch, seg, **kw).eval()
    finally:
        torch.Tensor.cuda = orig_cuda

    f = 200  # > 128 so embed_utterance exercises the sliding windows
    unit = rng.standard_normal((1, 256, f)).astype(np.float32) * 0.3
    mel = rng.standard_normal((1, 80, f)).astype(np.float32) * 0.3

    # Deterministic prior: reference samples z_p = mu + randn*exp(logs);
    # zero the noise to match our noise_scale=0.
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x, **k: torch.zeros_like(x)
    try:
        with torch.no_grad():
            golden = ref_net.infer(torch.from_numpy(unit), torch.from_numpy(mel))
    finally:
        torch.randn_like = orig_randn_like
    golden = golden[0, 0].numpy() if golden.dim() == 3 else golden[0].numpy()

    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()
          if "stft.window" not in k and "updown_filter" not in k
          and not k.startswith("dec.pqmf.")}
    mc = _our_config(decoder)
    params = to_jax(port_generator(sd, mc))

    net = SynthesizerTrn(spec_channels=spec_ch, segment_size=seg, model=mc)
    mel_tl = jnp.asarray(mel.transpose(0, 2, 1))
    g_vec = embed_utterance_batch(
        lambda p, m: net.apply({"params": p}, m, method=SynthesizerTrn.embed_speaker),
        params, mel_tl)
    wave = net.apply({"params": params}, jnp.asarray(unit.transpose(0, 2, 1)),
                     g_vec, 0.0, method=SynthesizerTrn.infer)
    ours = np.asarray(wave)[0, :, 0]

    n = min(len(ours), len(golden))
    assert abs(len(ours) - len(golden)) <= 64, (len(ours), len(golden))
    scale = np.abs(golden[:n]).max() + 1e-9
    err = np.abs(ours[:n] - golden[:n]).max() / scale
    assert err < 5e-3, f"decoder={decoder}: rel max err {err}"
    np.testing.assert_allclose(ours[:n], golden[:n], atol=5e-3 * scale, rtol=0)


FULL_KW = dict(
    inter_channels=192, hidden_channels=192,
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    upsample_rates=[5, 4], upsample_initial_channel=512,
    upsample_kernel_sizes=[16, 16], gen_istft_n_fft=16, gen_istft_hop_size=4,
    subbands=4, gin_channels=256, ms_istft_vits=True,
)  # configs/quickvc.json production widths (reference models.py:549-642)


def test_infer_matches_reference_full_size(ref_models, rng):
    """Default-config (192/512, 16-layer WN) differential — the width-16
    tests don't exercise the full-width weight-norm/grouped-conv port paths
    (VERDICT missing #4). Also pins the f64 conv/flow path at ~1e-6 rel
    (the iSTFT head runs f32 by design, so the waveform gate stays 5e-3)."""
    from quickvc_tpu.config import ModelConfig
    from quickvc_tpu.models.encoders import embed_utterance_batch
    from quickvc_tpu.models.synthesizer import SynthesizerTrn
    from quickvc_tpu.utils.torch_port import port_generator, to_jax

    torch.manual_seed(4)
    spec_ch, seg = 641, 32
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref_net = ref_models.SynthesizerTrn(spec_ch, seg, **FULL_KW).eval()
    finally:
        torch.Tensor.cuda = orig_cuda

    f_unit, f_mel = 80, 200
    unit = rng.standard_normal((1, 256, f_unit)).astype(np.float32) * 0.3
    mel = rng.standard_normal((1, 80, f_mel)).astype(np.float32) * 0.3

    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x, **k: torch.zeros_like(x)
    try:
        with torch.no_grad():
            golden = ref_net.infer(torch.from_numpy(unit), torch.from_numpy(mel))
    finally:
        torch.randn_like = orig_randn_like
    golden = golden[0, 0].numpy() if golden.dim() == 3 else golden[0].numpy()

    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()
          if "stft.window" not in k and "updown_filter" not in k
          and not k.startswith("dec.pqmf.")}
    mc = ModelConfig()  # production defaults == FULL_KW
    params = to_jax(port_generator(sd, mc))
    net = SynthesizerTrn(spec_channels=spec_ch, segment_size=seg, model=mc)

    mel_tl = jnp.asarray(mel.transpose(0, 2, 1))
    g_vec = embed_utterance_batch(
        lambda p, m: net.apply({"params": p}, m, method=SynthesizerTrn.embed_speaker),
        params, mel_tl)
    wave = net.apply({"params": params}, jnp.asarray(unit.transpose(0, 2, 1)),
                     g_vec, 0.0, method=SynthesizerTrn.infer)
    ours = np.asarray(wave)[0, :, 0]

    n = min(len(ours), len(golden))
    assert abs(len(ours) - len(golden)) <= 64, (len(ours), len(golden))
    scale = np.abs(golden[:n]).max() + 1e-9
    err = np.abs(ours[:n] - golden[:n]).max() / scale
    assert err < 5e-3, f"full-size infer rel max err {err}"

    # f64 tightening: speaker embedding + prior encoder + inverse flow at
    # full size, ~3 orders tighter than the f32 waveform gate.
    ref64 = ref_net.double()
    torch.randn_like = lambda x, **k: torch.zeros_like(x)
    try:
        with torch.no_grad():
            g_t = ref64.enc_spk.embed_utterance(
                torch.from_numpy(mel).double().transpose(1, 2)).unsqueeze(-1)
            z_p_t, m_p_t, _ = ref64.enc_p(torch.from_numpy(unit).double())
            z_t = ref64.flow(z_p_t, g=g_t, reverse=True)
    finally:
        torch.randn_like = orig_randn_like

    with jax.enable_x64():
        params64 = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params)
        g64 = embed_utterance_batch(
            lambda p, m: net.apply({"params": p}, m,
                                   method=SynthesizerTrn.embed_speaker),
            params64, jnp.asarray(mel.transpose(0, 2, 1), jnp.float64))
        bound = net.bind({"params": params64})
        z_p, m_p, _ = bound.enc_p(
            jnp.asarray(unit.transpose(0, 2, 1), jnp.float64), noise_scale=0.0)
        z = bound.flow(z_p, g64[:, None, :], reverse=True)
    for ours64, gold_t, name, tol in [
        (np.asarray(g64)[0], g_t[0, :, 0].numpy(), "g_vec", 1e-6),
        (np.asarray(m_p)[0].T, m_p_t[0].numpy(), "m_p", 1e-6),
        (np.asarray(z)[0].T, z_t[0].numpy(), "z", 1e-6),
    ]:
        scale = np.abs(gold_t).max() + 1e-12
        err = np.abs(ours64 - gold_t).max() / scale
        assert err < tol, f"f64 {name}: rel max err {err}"


@pytest.fixture(scope="module")
def ref_losses(ref_models):
    """Reference losses.py (torchaudio.transforms.Spectrogram shimmed)."""
    ta_tf = sys.modules["torchaudio.transforms"]
    if not hasattr(ta_tf, "Spectrogram"):
        class Spectrogram(torch.nn.Module):
            def __init__(self, n_fft, win_length=None, hop_length=None, power=2.0):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.power = power
                self.register_buffer("window", torch.hann_window(self.win_length))

            def forward(self, x):
                z = torch.stft(x, self.n_fft, hop_length=self.hop_length,
                               win_length=self.win_length, window=self.window,
                               center=True, pad_mode="reflect", normalized=False,
                               onesided=True, return_complex=True)
                return z.abs() ** self.power

        ta_tf.Spectrogram = Spectrogram
    sys.path.insert(0, REF)
    try:
        import losses as ref_losses_mod
    finally:
        sys.path.remove(REF)
    return ref_losses_mod


def test_subband_stft_loss_matches_reference(ref_losses, rng):
    """Our MR-STFT sub-band loss == reference losses.subband_stft_loss."""
    from quickvc_tpu.losses import subband_stft_loss

    b, t, s = 2, 1280, 4
    y_mb = rng.standard_normal((b, s, t)).astype(np.float32) * 0.2
    y_hat_mb = rng.standard_normal((b, s, t + 60)).astype(np.float32) * 0.2

    class H:  # reference reads hps.train.{fft_sizes,hop_sizes,win_lengths}
        class train:
            fft_sizes = [384, 683, 171]
            hop_sizes = [30, 60, 10]
            win_lengths = [150, 300, 60]

    golden = ref_losses.subband_stft_loss(
        H, torch.from_numpy(y_mb), torch.from_numpy(y_hat_mb)).item()
    ours = float(subband_stft_loss(
        jnp.asarray(y_mb.transpose(0, 2, 1)),
        jnp.asarray(y_hat_mb.transpose(0, 2, 1)),
        (384, 683, 171), (30, 60, 10), (150, 300, 60)))
    np.testing.assert_allclose(ours, golden, rtol=2e-3)


def test_kl_and_gan_losses_match_reference(ref_losses, rng):
    from quickvc_tpu.losses import discriminator_loss, generator_loss, kl_loss

    shape = (2, 16, 20)
    zs = [rng.standard_normal(shape).astype(np.float32) * 0.4 for _ in range(4)]
    golden = ref_losses.kl_loss(*[torch.from_numpy(z) for z in zs]).item()
    ours = float(kl_loss(*[jnp.asarray(z) for z in zs]))
    np.testing.assert_allclose(ours, golden, rtol=1e-5)

    reals = [rng.standard_normal((2, 40)).astype(np.float32) for _ in range(6)]
    fakes = [rng.standard_normal((2, 40)).astype(np.float32) for _ in range(6)]
    g_d, _, _ = ref_losses.discriminator_loss(
        [torch.from_numpy(x) for x in reals], [torch.from_numpy(x) for x in fakes])
    o_d, _, _ = discriminator_loss([jnp.asarray(x) for x in reals],
                                   [jnp.asarray(x) for x in fakes])
    np.testing.assert_allclose(float(o_d), g_d.item(), rtol=1e-5)
    g_g, _ = ref_losses.generator_loss([torch.from_numpy(x) for x in fakes])
    o_g, _ = generator_loss([jnp.asarray(x) for x in fakes])
    np.testing.assert_allclose(float(o_g), g_g.item(), rtol=1e-5)


def test_training_path_intermediates_match_reference(ref_models, rng):
    """Posterior encoder (speaker-conditioned WN) + FORWARD flow vs reference.

    infer() only exercises the prior encoder and the reverse flow; this
    pins the training-direction halves with zero posterior noise.
    """
    from quickvc_tpu.models.synthesizer import SynthesizerTrn
    from quickvc_tpu.utils.torch_port import port_generator, to_jax

    torch.manual_seed(1)
    spec_ch, seg = 33, 8
    kw = dict(SMALL_KW)
    kw["ms_istft_vits"] = True
    ref_net = ref_models.SynthesizerTrn(spec_ch, seg, **kw).eval()

    f = 60
    spec = rng.standard_normal((1, spec_ch, f)).astype(np.float32) * 0.3
    g_cond = rng.standard_normal((1, 16, 1)).astype(np.float32) * 0.5

    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x, **k: torch.zeros_like(x)
    try:
        with torch.no_grad():
            z_t, m_q_t, logs_q_t = ref_net.enc_q(torch.from_numpy(spec),
                                                 cond=torch.from_numpy(g_cond))
            z_p_t = ref_net.flow(z_t, g=torch.from_numpy(g_cond))
    finally:
        torch.randn_like = orig_randn_like

    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()
          if "stft.window" not in k and "updown_filter" not in k}
    mc = _our_config("ms")
    params = to_jax(port_generator(sd, mc))
    net = SynthesizerTrn(spec_channels=spec_ch, segment_size=seg, model=mc)

    spec_tl = jnp.asarray(spec.transpose(0, 2, 1))
    g_tl = jnp.asarray(g_cond.transpose(0, 2, 1))

    def run(p, s, g):
        bound = net.bind({"params": p})
        z, m_q, logs_q = bound.enc_q(s, g, noise_scale=0.0)
        z_p = bound.flow(z, g)
        return z, m_q, logs_q, z_p

    z, m_q, logs_q, z_p = run(params, spec_tl, g_tl)
    for ours, golden, name in [
        (m_q, m_q_t, "m_q"), (logs_q, logs_q_t, "logs_q"),
        (z, z_t, "z"), (z_p, z_p_t, "z_p"),
    ]:
        o = np.asarray(ours)[0].T
        gref = golden[0].numpy()
        np.testing.assert_allclose(o, gref, atol=2e-4, rtol=1e-3,
                                   err_msg=f"mismatch in {name}")


def test_discriminator_matches_reference(ref_models, rng):
    """Our MPD with ported weights == the reference MultiPeriodDiscriminator."""
    from quickvc_tpu.models.discriminators import MultiPeriodDiscriminator
    from quickvc_tpu.utils.torch_port import port_discriminator, to_jax

    torch.manual_seed(2)
    ref_d = ref_models.MultiPeriodDiscriminator().eval()
    y = rng.standard_normal((1, 1, 4000)).astype(np.float32) * 0.2
    y_hat = rng.standard_normal((1, 1, 4000)).astype(np.float32) * 0.2
    with torch.no_grad():
        g_r, g_g, g_fr, g_fg = ref_d(torch.from_numpy(y), torch.from_numpy(y_hat))

    sd = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}
    params = to_jax(port_discriminator(sd))
    net = MultiPeriodDiscriminator()
    o_r, o_g, o_fr, o_fg = net.apply({"params": params},
                                     jnp.asarray(y.transpose(0, 2, 1)),
                                     jnp.asarray(y_hat.transpose(0, 2, 1)))
    assert len(o_r) == len(g_r) == 6
    for i, (ours, golden) in enumerate(zip(o_r, g_r)):
        np.testing.assert_allclose(np.asarray(ours).reshape(-1),
                                   golden.numpy().reshape(-1),
                                   atol=5e-4, rtol=5e-3, err_msg=f"disc {i} real")
    for i, (ours, golden) in enumerate(zip(o_g, g_g)):
        np.testing.assert_allclose(np.asarray(ours).reshape(-1),
                                   golden.numpy().reshape(-1),
                                   atol=5e-4, rtol=5e-3, err_msg=f"disc {i} fake")
    # feature-map counts per discriminator (used by the FM loss)
    assert [len(f) for f in o_fr] == [len(f) for f in g_fr]
