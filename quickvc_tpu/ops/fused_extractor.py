"""Pallas TPU kernel: fused HuBERT feature-extractor front.

Fuses the first two stages of the HuBERT-soft CNN feature extractor
(models/hubert.py:FeatureExtractor; the reference consumes this model via
``torch.hub.load("bshall/hubert")`` at reference convert.py:44):

    conv0 (k=10, s=5, 1->512, no bias)
    GroupNorm(512, 512)  == per-(batch, channel) instance norm over time
    GELU
    conv1 (k=3, s=2, 512->512, no bias)
    GELU

into ONE kernel pass. Why: conv0's output is the largest tensor in the
whole system — (B, T/5, 512), ~1 GB bf16 at batch 32 x 10 s — and the XLA
path round-trips it through HBM four times (conv0 write, GroupNorm stats
read, normalize+GELU read/write) before conv1 reads it again. Here it
never exists in HBM: the kernel output is conv1's (B, T/10, 512), half the
size, written once.

Three tricks make the kernel trivial — every block is a plain aligned
(TILE, 128) x (128, 512) matmul, no halos, no strided loads, no slicing:

1. **Phase packing.** With the wave viewed as rows r[t] = wav[5t:5t+5],
   conv0 output is x0[t] = r[t] @ W0a + r[t+1] @ W0b (W0a/W0b = the two
   5-row halves of the 10-tap kernel), and conv1 (stride 2) consumes x0 at
   2u, 2u+1, 2u+2. Host-side, pack the four phase streams each conv1 row
   needs into the lane dim of ONE array:
       packed[u] = [r[2u] | r[2u+1] | r[2u+2] | r[2u+3] | 0-pad]   (128 lanes)
2. **Phase-selecting weights.** The three conv0 taps conv1 needs are then
   single matmuls against (128, 512) weights whose rows place W0a/W0b at
   the right phase offsets:
       x0[2u]   = packed[u] @ W0e    (W0a at rows 0:5,  W0b at rows 8:13)
       x0[2u+1] = packed[u] @ W0o    (W0a at rows 8:13, W0b at rows 16:21)
       x0[2u+2] = packed[u] @ W0e1   (W0a at rows 16:21, W0b at rows 24:29)
   and conv1 is three more aligned matmuls:
       y[u] = g(x0[2u]) @ W1[0] + g(x0[2u+1]) @ W1[1] + g(x0[2u+2]) @ W1[2]
   (g = normalize+GELU). The cost is one redundant conv0 matmul (x0[2u+2]
   is x0[2u] shifted) — K=128 matmuls, noise next to conv1's K=512 work.
3. **Closed-form GroupNorm stats.** Per-channel mean/var over time of
   x0 = F @ W0 (F = the (Tc, 10) frame matrix) need only the 10-vector
   S = sum_t F[t] and the 10x10 second-moment C = F^T F:
       mean = S @ W0 / Tc,   E[x^2]_c = W0[:,c]^T C W0[:,c] / Tc
   — an O(T) pass over the 20 MB wave in XLA instead of over the 1 GB
   conv0 output. The kernel receives the folded affine (scale, shift) =
   (gamma/std, beta - mean*gamma/std) per (batch, channel).

GELU matches models/hubert.py:gelu (tanh approximation for bf16, exact erf
otherwise). Equivalence to the XLA extractor front is tested in
tests/test_pallas.py (interpret mode); the compiled path is exercised by
scripts/e2e_bench.py on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_U = 1024   # conv1 output rows per program
LANE = 128      # packed phase lanes (4 phases x 5 samples used, rest zero)
PHASE = 8       # lane offset between consecutive phases


def _erf(x: jax.Array) -> jax.Array:
    """In-kernel erf: Abramowitz-Stegun 7.1.26 polynomial, |err| <= 1.5e-7.

    Mosaic TPU lowering has no erf/erfc primitive (found by the round-5
    on-TPU parity gate: exact-gelu lowered to erfc -> NotImplementedError;
    interpret mode on CPU lowered it fine, masking the bug). exp IS
    lowered, so the classic rational polynomial gives f32-grade accuracy
    well inside the 5e-4 front-parity gate.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x: jax.Array) -> jax.Array:
    # mirror models/hubert.py:gelu without importing it (cycle-free);
    # exact (erf) gelu via the in-kernel polynomial above
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return (0.5 * x * (1.0 + _erf(x * 0.7071067811865476))).astype(x.dtype)


def _kernel(x_ref, scale_ref, shift_ref, w0e_ref, w0o_ref, w0e1_ref, w1_ref,
            o_ref):
    x = x_ref[0]                   # (TILE, 128) packed phases
    sc = scale_ref[0]              # (1, 512) f32
    sh = shift_ref[0]
    cdt = o_ref.dtype

    # stage-grouped emission: all conv0 matmuls, then all norm+GELUs, then
    # the conv1 matmuls — independent work for MXU/VPU overlap
    x0s = [jax.lax.dot_general(x, w[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           for w in (w0e_ref, w0o_ref, w0e1_ref)]
    xs = [_gelu((x0 * sc + sh).astype(cdt)) for x0 in x0s]
    acc = None
    for j, xj in enumerate(xs):
        term = jax.lax.dot_general(xj, w1_ref[j], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    o_ref[0] = _gelu(acc.astype(cdt))


def groupnorm_affine_closed_form(wav: jax.Array, w0: jax.Array,
                                 gamma: jax.Array, beta: jax.Array,
                                 eps: float = 1e-5):
    """Per-(batch, channel) GroupNorm affine of conv0's output, computed in
    the WAVE domain (trick 3 above): returns (scale, shift), both (B, ch)
    f32, such that normalize(conv0(wav)) == conv0(wav) * scale + shift.

    This is also used standalone by the ``faststats`` XLA front
    (models/hubert.py): skipping the stats reduction over the 1 GB conv0
    output lets XLA fuse normalize+GELU into conv0's epilogue — measured
    9.0 -> 7.7 ms on the batch-32 x 10 s front (BENCH.md).
    """
    b, t = wav.shape
    ch = w0.shape[-1]
    tc = (t - 10) // 5 + 1
    nt = tc + 1
    r = wav[:, : 5 * nt].reshape(b, nt, 5)
    f32 = jnp.float32
    fmat = jnp.concatenate([r[:, :-1, :], r[:, 1:, :]], axis=-1).astype(f32)
    w0f = w0.reshape(10, ch).astype(f32)
    s_vec = jnp.sum(fmat, axis=1)                        # (B, 10)
    c_mat = jnp.einsum("btj,btk->bjk", fmat, fmat)       # (B, 10, 10)
    mean = (s_vec @ w0f) / tc                            # (B, ch)
    ex2 = jnp.einsum("jc,bjk,kc->bc", w0f, c_mat, w0f) / tc
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    scale = gamma.astype(f32) * rstd
    shift = beta.astype(f32) - mean * scale
    return scale, shift


def fused_extractor_front(wav: jax.Array, w0: jax.Array, gamma: jax.Array,
                          beta: jax.Array, w1: jax.Array,
                          eps: float = 1e-5) -> jax.Array:
    """conv0 -> GroupNorm -> GELU -> conv1 -> GELU, one Pallas pass.

    wav: (B, T) in the compute dtype (bf16 on the serving path);
    w0: (10, 1, 512) conv0 kernel; gamma/beta: (512,) GroupNorm affine;
    w1: (3, 512, 512) conv1 kernel. Returns (B, n1, 512) in wav.dtype with
    n1 = ((T-10)//5 + 1 - 3)//2 + 1, identical to the XLA stage chain.
    """
    b, t = wav.shape
    ch = w0.shape[-1]
    tc = (t - 10) // 5 + 1          # conv0 output rows
    n1 = (tc - 3) // 2 + 1          # conv1 output rows
    nt = tc + 1                     # rows of the (., 5) wave view
    r = wav[:, : 5 * nt].reshape(b, nt, 5)
    f32 = jnp.float32
    w0f = w0.reshape(10, ch).astype(f32)

    # --- GroupNorm stats, closed form (f32, O(T) on the wave) ---
    scale, shift = groupnorm_affine_closed_form(wav, w0, gamma, beta, eps)

    # --- phase-pack: packed[u] lanes = [r[2u] | r[2u+1] | r[2u+2] | r[2u+3]]
    nb = -(-n1 // TILE_U)
    rows = nb * TILE_U
    # max r-row index used: r[2*(rows-1)+3] -> need 2*rows+2 rows
    rp = jnp.pad(r, [(0, 0), (0, 2 * rows + 2 - nt), (0, PHASE - 5)])
    phases = [rp[:, s::2][:, :rows] for s in range(4)]   # 4 x (B, rows, 8)
    packed = jnp.concatenate(phases, axis=-1)            # (B, rows, 32)
    packed = jnp.pad(packed, [(0, 0), (0, 0), (0, LANE - 4 * PHASE)])

    # --- phase-selecting conv0 weights: (128, 512) each ---
    dt = wav.dtype

    def sel(ph):                                         # weights for x0[2u+ph]
        z = jnp.zeros((LANE, ch), f32)
        z = z.at[ph * PHASE : ph * PHASE + 5].set(w0f[:5])
        z = z.at[(ph + 1) * PHASE : (ph + 1) * PHASE + 5].set(w0f[5:])
        return z.astype(dt)

    w0e, w0o, w0e1 = sel(0), sel(1), sel(2)

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array, resident
    out = pl.pallas_call(
        _kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, TILE_U, LANE), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),       # packed phases
            pl.BlockSpec((1, 1, ch), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),       # scale
            pl.BlockSpec((1, 1, ch), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),       # shift
            vec, vec, vec,                               # w0e / w0o / w0e1
            vec,                                         # w1 (3, 512, 512)
        ],
        out_specs=pl.BlockSpec((1, TILE_U, ch), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, ch), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # f32 inputs at TILE_U=1024 need ~33 MB of scoped VMEM (double-
            # buffered packed/out blocks + three (1024, 512) activation
            # tiles); the 16 MB default is a compiler cap, not the
            # hardware's — same override as ops/fused_attention.py.
            # Found by the round-5 on-TPU parity gate at (2, 160000) f32.
            vmem_limit_bytes=100 * 1024 * 1024),
    )(packed, scale[:, None, :], shift[:, None, :], w0e, w0o, w0e1,
      w1.astype(dt))
    return out[:, :n1]
