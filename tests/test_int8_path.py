"""int8-MXU backend tests: integer-code quantization must reproduce the fake
path exactly, the grouped kernel must match its jnp mirror, and end-to-end
generation must run NaN-free."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig, fpqvar_w4a4
from fpqvar_tpu.models import VARGenerator, build_vae_var
from fpqvar_tpu.ops import packing as P
from fpqvar_tpu.ops import quantizers as Q
from fpqvar_tpu.ops.pallas.int8_matmul import (
    _int8_matmul_2d, _jnp_reference, int8_linear, int8_linear_dual)
from fpqvar_tpu.quantize import build_runtime, quantize_var_params

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2, 3)),
)


@pytest.mark.parametrize("fmt", sorted(P.CODE_MULT))
def test_int_codes_reproduce_fake_quant(fmt):
    """codes * scales == fake_quant_fp bit-wise (same snap, exact integer
    representation)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 256)) * 1.7
    codes, scales = P.quant_int_codes(x, fmt)
    assert codes.dtype == jnp.int8
    g = 128
    deq = (codes.reshape(32, 2, g).astype(jnp.float32)
           * scales[..., None]).reshape(32, 256)
    ref = Q.fake_quant_fp(x, fmt, granularity="per_group")
    np.testing.assert_array_equal(np.asarray(deq), np.asarray(ref))
    mult = P.CODE_MULT[fmt]
    gmax = float(np.max(np.abs(P.G.GRIDS[fmt])))
    assert int(jnp.max(jnp.abs(codes))) <= round(gmax * mult)


@pytest.mark.parametrize("fmt", sorted(P.DUAL_CODE_MULT))
def test_dual_int_codes_reproduce_fake_dual(fmt):
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 256)) * 0.9
    cn, sn, cp, sp = P.quant_int_codes_dual(x, fmt)
    deq = (cn.reshape(16, 2, 128).astype(jnp.float32) * sn[..., None]
           + cp.reshape(16, 2, 128).astype(jnp.float32) * sp[..., None]
           ).reshape(16, 256)
    ref = Q.fake_quant_dual(x, fmt, granularity="per_group")
    np.testing.assert_array_equal(np.asarray(deq), np.asarray(ref))


def test_pack_int_codes_layout():
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 384))  # [N, K]
    pw = P.pack_int_codes(w, "fp_e2")
    assert pw.codes.shape == (384, 256)       # transposed [K, N]
    assert pw.scales.shape == (3, 256)        # [G, N]
    assert pw.shape == (256, 384)
    # stacked variant keeps depth leading
    ws = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 384))
    pws = P.pack_int_codes(ws, "fp_e2")
    assert pws.codes.shape == (2, 384, 256)
    assert pws.shape == (256, 384)
    one = jax.tree_util.tree_map(lambda a: a[0], pws)
    np.testing.assert_array_equal(
        np.asarray(one.codes),
        np.asarray(P.pack_int_codes(ws[0], "fp_e2").codes))


def test_kernel_matches_jnp_reference_interpret():
    """Pallas kernel (interpret mode on CPU) vs the exact jnp mirror."""
    key = jax.random.PRNGKey(4)
    m, k_dim, n = 64, 384, 256
    x = jax.random.normal(key, (m, k_dim))
    w = jax.random.normal(jax.random.fold_in(key, 1), (n, k_dim))
    ac, asc = P.quant_int_codes(x, "fp_e2")
    pw = P.pack_int_codes(w, "fp_e2")
    ref = _jnp_reference(ac, asc, pw.codes, pw.scales, 128)
    out = _int8_matmul_2d(ac, asc, pw.codes, pw.scales,
                          group_size=128, n=n, k_dim=k_dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_kernel3_matches_jnp_reference_interpret():
    """Batch-gridded N-D kernel (interpret mode) vs the jnp mirror — both
    unpadded and padded T, f32 out for exact comparison."""
    from fpqvar_tpu.ops.pallas.int8_matmul import _int8_matmul_3d

    key = jax.random.PRNGKey(7)
    for t in (64, 33):        # 33 exercises the T padding path
        bsz, k_dim, n = 3, 384, 256
        x = jax.random.normal(key, (bsz, t, k_dim))
        w = jax.random.normal(jax.random.fold_in(key, 1), (n, k_dim))
        ac, asc = P.quant_int_codes(x, "fp_e2")
        pw = P.pack_int_codes(w, "fp_e2")
        ref = _jnp_reference(ac.reshape(-1, k_dim), asc.reshape(-1, 3),
                             pw.codes, pw.scales, 128)
        out = _int8_matmul_3d(ac, asc, pw.codes, pw.scales,
                              group_size=128, n=n, k_dim=k_dim,
                              out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out).reshape(-1, n), np.asarray(ref),
            rtol=1e-6, atol=1e-5)


def test_int8_linear_matches_fake_path():
    """int8_linear == fake-quant activation @ fake-quant weight (f32)."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (4, 33, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 256))
    pw = P.pack_int_codes(w, "fp_e2")
    got = int8_linear(x, pw)
    xq = Q.fake_quant_fp(x, "fp_e2", granularity="per_group")
    wq = Q.fake_quant_fp(w, "fp_e2", granularity="per_group")
    ref = xq @ wq.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_int8_linear_dual_matches_fake_path():
    key = jax.random.PRNGKey(6)
    x = jnp.abs(jax.random.normal(key, (8, 256))) - 0.3   # GELU-ish skew
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 256))
    pw = P.pack_int_codes(w, "fp_e2")
    got = int8_linear_dual(x, pw, "fp_e1m2_neg_e2m1_pos")
    xq = Q.fake_quant_dual(x, "fp_e1m2_neg_e2m1_pos",
                           granularity="per_group")
    wq = Q.fake_quant_fp(w, "fp_e2", granularity="per_group")
    ref = xq @ wq.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_model():
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.models.vqvae import init_vqvae_params

    vae_p = init_vqvae_params(jax.random.PRNGKey(0), TINY.vae)
    var_p = init_var_params(jax.random.PRNGKey(1), TINY,
                            adaln_gamma_std=0.02)
    return vae_p, var_p


def test_int8_generation_matches_fake(tiny_model):
    """Full W4A4 recipe generation: int8 backend must sample the same images
    as the fake backend (same quantized values, tighter arithmetic)."""
    vae_p, var_p = tiny_model
    key = jax.random.PRNGKey(7)
    label = jnp.array([3, 5])

    qcfg_fk = fpqvar_w4a4().replace(transform=False)
    qp_fk = quantize_var_params(var_p, TINY, qcfg_fk)
    img_fk = VARGenerator(TINY, qcfg_fk).generate(qp_fk, vae_p, label, key)

    qcfg_i8 = qcfg_fk.replace(backend="int8")
    qp_i8 = quantize_var_params(var_p, TINY, qcfg_i8)
    img_i8 = VARGenerator(TINY, qcfg_i8).generate(qp_i8, vae_p, label, key)
    assert not bool(jnp.isnan(img_i8).any())
    # identical token trajectories => identical images (quantized values are
    # bit-equal; only GEMM arithmetic differs, f32-exact vs f32-matmul)
    np.testing.assert_allclose(np.asarray(img_i8), np.asarray(img_fk),
                               atol=2e-2)


def test_int8_backend_validation():
    with pytest.raises(ValueError):
        build_runtime(fpqvar_w4a4().replace(
            backend="int8", act_quant="per_token"))   # needs per-channel w
    with pytest.raises(ValueError):
        build_runtime(fpqvar_w4a4().replace(
            backend="int8", act_format="fp6_e3m2", weight_format="fp6_e3m2"))


# ---------------------------------------------------------------------------
# int8ch: per-channel weight / per-token act scales -> ONE full-K int8 MXU
# dot, scales hoisted out of the contraction (scripts/kernel_roofline.py:
# full-K int8 runs 1.33x the bf16 GEMM rate on v5e while the per-group-128
# scale chain drops to 0.74x — granularity is the speed knob).
# ---------------------------------------------------------------------------

def _int8ch_cfg():
    return fpqvar_w4a4().replace(
        backend="int8", transform=False,
        weight_quant="per_channel", act_quant="per_token")


def test_int8ch_kernel_matches_channel_dot_interpret():
    """Fused-epilogue Pallas kernel (interpret mode) vs the XLA mirror:
    identical int32 accumulation + f32 rescale, bf16 output cast."""
    from fpqvar_tpu.ops.pallas.int8_matmul import (
        _channel_dot, _int8ch_matmul_2d)

    key = jax.random.PRNGKey(13)
    m, k_dim, n = 48, 384, 256
    x = jax.random.normal(key, (m, k_dim))
    w = jax.random.normal(jax.random.fold_in(key, 1), (n, k_dim))
    ac, asc = P.quant_int_codes(x, "fp_e2", group_size=k_dim)
    pw = P.pack_int_codes(w, "fp_e2", group_size=k_dim)
    ref = _channel_dot(ac, asc, pw.codes, pw.scales).astype(jnp.bfloat16)
    out = _int8ch_matmul_2d(ac, asc, pw.codes, pw.scales, n=n, k_dim=k_dim,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8ch_kernel_d36_width_interpret():
    """K=2304 (the d36-512 width) must pick a 128-aligned K-block: the old
    halving fallback degenerated to bk=3 there, violating int8 tiling."""
    from fpqvar_tpu.ops.pallas.int8_matmul import (
        _channel_dot, _int8ch_matmul_2d)

    key = jax.random.PRNGKey(23)
    m, k_dim, n = 16, 2304, 128
    x = jax.random.normal(key, (m, k_dim))
    w = jax.random.normal(jax.random.fold_in(key, 1), (n, k_dim))
    ac, asc = P.quant_int_codes(x, "fp_e2", group_size=k_dim)
    pw = P.pack_int_codes(w, "fp_e2", group_size=k_dim)
    ref = _channel_dot(ac, asc, pw.codes, pw.scales).astype(jnp.bfloat16)
    out = _int8ch_matmul_2d(ac, asc, pw.codes, pw.scales, n=n, k_dim=k_dim,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8ch_codes_reproduce_per_token_fake():
    """group_size == K makes quant_int_codes per-token: codes * scale must
    equal fake_quant_fp(granularity='per_token') bit-wise."""
    x = jax.random.normal(jax.random.PRNGKey(8), (16, 256)) * 1.3
    codes, scales = P.quant_int_codes(x, "fp_e2", group_size=256)
    assert scales.shape == (16, 1)
    deq = codes.astype(jnp.float32) * scales
    ref = Q.fake_quant_fp(x, "fp_e2", granularity="per_token")
    np.testing.assert_array_equal(np.asarray(deq), np.asarray(ref))


def test_int8ch_linear_matches_per_token_fake_path():
    """int8_linear with a per-channel pack == fake per-token act quant @
    fake per-channel weight quant (exact int32 dot, f32 rescale)."""
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (4, 33, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 256))
    pw = P.pack_int_codes(w, "fp_e2", group_size=256)
    assert pw.scales.shape == (1, 128)
    got = int8_linear(x, pw)
    xq = Q.fake_quant_fp(x, "fp_e2", granularity="per_token")
    wq = Q.fake_quant_fp(w, "fp_e2", granularity="per_channel")
    ref = xq @ wq.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_int8ch_dual_matches_per_token_fake_path():
    key = jax.random.PRNGKey(10)
    x = jnp.abs(jax.random.normal(key, (8, 256))) - 0.3
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 256))
    pw = P.pack_int_codes(w, "fp_e2", group_size=256)
    got = int8_linear_dual(x, pw, "fp_e1m2_neg_e2m1_pos")
    xq = Q.fake_quant_dual(x, "fp_e1m2_neg_e2m1_pos",
                           granularity="per_token")
    wq = Q.fake_quant_fp(w, "fp_e2", granularity="per_channel")
    ref = xq @ wq.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_int8chs_single_grid_fc2_generation_matches_fake(tiny_model):
    """The full-throughput recipe (int8ch + single-grid fc2 = ONE int8 GEMM
    per layer incl. fc2) must match the fake backend at the same config.
    Dual-grid fc2 costs a second GEMM over disjoint neg/pos codes — 4/12 of
    block GEMM flops doubled, cancelling the int8 MXU rate win."""
    vae_p, var_p = tiny_model
    key = jax.random.PRNGKey(12)
    label = jnp.array([1, 7])

    fk = fpqvar_w4a4().replace(
        transform=False, weight_quant="per_channel", act_quant="per_token",
        fc2_format="fp_e2")
    qp_fk = quantize_var_params(var_p, TINY, fk)
    img_fk = VARGenerator(TINY, fk).generate(qp_fk, vae_p, label, key)

    ch = fk.replace(backend="int8")
    qp_ch = quantize_var_params(var_p, TINY, ch)
    img_ch = VARGenerator(TINY, ch).generate(qp_ch, vae_p, label, key)
    assert not bool(jnp.isnan(img_ch).any())
    np.testing.assert_allclose(np.asarray(img_ch), np.asarray(img_fk),
                               atol=2e-2)


# ---------------------------------------------------------------------------
# attn_int8: int8 MXU attention contractions over the packed KV codes
# (QuantConfig.attn_int8 — a TPU-native extension; the reference never
# quantizes q or the score matrix).
# ---------------------------------------------------------------------------

def test_attn_int8_requires_value_codes():
    with pytest.raises(ValueError):
        build_runtime(fpqvar_w4a4().replace(attn_int8=True))   # no packed KV
    qrt = build_runtime(fpqvar_w4a4().replace(
        attn_int8=True, kv_bit=6, kv_backend="packed"))
    assert qrt.attn_int8


def test_attn_int8_score_math_error_bound():
    """The per-(token, head) int8 quantization of q reproduces the f32
    score row to <= |q|_max * |k_code|_max * c / 254 absolute error, and is
    EXACT when q is already an int8-code multiple of its scale."""
    key = jax.random.PRNGKey(20)
    b, l, h, c, m = 2, 5, 3, 64, 17
    q = jax.random.normal(key, (b, l, h, c), jnp.float32)
    kcodes = jax.random.randint(
        jax.random.fold_in(key, 1), (b, m, h, c), -12, 13).astype(jnp.int8)

    qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
    qs = jnp.where(qa > 0, qa / 127.0, 1.0)
    qc = jnp.round(q / qs).astype(jnp.int8)
    got = jnp.einsum("blhc,bmhc->bhlm", qc, kcodes,
                     preferred_element_type=jnp.int32
                     ).astype(jnp.float32) * qs.transpose(0, 2, 1, 3)
    ref = jnp.einsum("blhc,bmhc->bhlm", q, kcodes.astype(jnp.float32))
    bound = float(jnp.max(qa)) / 254.0 * 12 * c
    assert float(jnp.max(jnp.abs(got - ref))) <= bound

    # exactness when q rows are integer multiples of their scale
    q_int = (qc.astype(jnp.float32) * qs)
    qa2 = jnp.max(jnp.abs(q_int), axis=-1, keepdims=True)
    qs2 = jnp.where(qa2 > 0, qa2 / 127.0, 1.0)
    qc2 = jnp.round(q_int / qs2).astype(jnp.int8)
    got2 = jnp.einsum("blhc,bmhc->bhlm", qc2, kcodes,
                      preferred_element_type=jnp.int32
                      ).astype(jnp.float32) * qs2.transpose(0, 2, 1, 3)
    ref2 = jnp.einsum("blhc,bmhc->bhlm", q_int, kcodes.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_attn_int8_generation_close_to_packed(tiny_model):
    """attn_int8 generation must stay NaN-free and close to the plain
    packed-KV attention (same codec; only the q / softmax-weight int8
    rounding differs — <=1/254 of each row's absmax per side)."""
    vae_p, var_p = tiny_model
    base = fpqvar_w4a4().replace(transform=False, kv_bit=6,
                                 kv_backend="packed")
    key = jax.random.PRNGKey(22)
    lab = jnp.array([3, 5])
    qp = quantize_var_params(var_p, TINY, base)
    img = VARGenerator(TINY, base).generate(qp, vae_p, lab, key)
    img_i8 = VARGenerator(TINY, base.replace(attn_int8=True)).generate(
        qp, vae_p, lab, key)
    assert not bool(jnp.isnan(img_i8).any())
    np.testing.assert_allclose(np.asarray(img_i8), np.asarray(img),
                               atol=6e-2)


def test_int8ch_generation_matches_fake(tiny_model):
    """int8ch generation == the fake backend at the SAME granularity
    (per-token acts / per-channel weights): identical quantized values,
    exact-integer GEMMs."""
    vae_p, var_p = tiny_model
    key = jax.random.PRNGKey(11)
    label = jnp.array([2, 9])

    qcfg_fk = fpqvar_w4a4().replace(
        transform=False, weight_quant="per_channel", act_quant="per_token")
    qp_fk = quantize_var_params(var_p, TINY, qcfg_fk)
    img_fk = VARGenerator(TINY, qcfg_fk).generate(qp_fk, vae_p, label, key)

    qcfg_ch = _int8ch_cfg()
    qp_ch = quantize_var_params(var_p, TINY, qcfg_ch)
    pw = qp_ch["blocks"]["mat_qkv_w"]
    assert pw.group_size == pw.shape[-1]          # full-K groups
    assert pw.scales.shape[-2] == 1
    img_ch = VARGenerator(TINY, qcfg_ch).generate(qp_ch, vae_p, label, key)
    assert not bool(jnp.isnan(img_ch).any())
    np.testing.assert_allclose(np.asarray(img_ch), np.asarray(img_fk),
                               atol=2e-2)


# ---------------------------------------------------------------------------
# w4a16: weights-only deployment mode (config.fpqvar_w4a16) — int8 weight
# codes, activations stay bf16, no act-quant chain at all.  TPU-native
# extension: the reference has no weight-only mode (all its forks quantize
# activations).  The GEMM is bf16 x converted-codes with the per-channel
# scale applied once on the output (int8_matmul._wonly_dot).
# ---------------------------------------------------------------------------

def test_wonly_linear_matches_weight_only_fake():
    """int8_linear(..., "bf16") == x_bf16 @ fake-per-channel-quant(w).T."""
    key = jax.random.PRNGKey(12)
    x = jax.random.normal(key, (4, 33, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 256))
    pw = P.pack_int_codes(w, "fp_e2", group_size=256)   # per-channel
    got = int8_linear(x, pw, "bf16")
    # per-channel wonly scales AFTER the dot (codes are exact small ints,
    # bf16-exact), so the reference keeps the dequantized weight in f32 —
    # the path is slightly MORE precise than a bf16-rounded-weight GEMM
    wq = Q.fake_quant_fp(w, "fp_e2", granularity="per_channel")
    ref = np.asarray(x.astype(jnp.bfloat16), dtype=np.float32) @ np.asarray(
        wq, dtype=np.float32).T
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32), ref,
                               rtol=1e-3, atol=1e-3)


def test_wonly_linear_per_group():
    """Grouped weights-only path: dequant fuses into the dot's weight read."""
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (8, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 256))
    pw = P.pack_int_codes(w, "fp_e2", group_size=128)
    got = int8_linear(x, pw, "bf16")
    wq = Q.fake_quant_fp(w, "fp_e2", granularity="per_group")
    ref = x.astype(jnp.bfloat16).astype(jnp.float32) @ np.asarray(
        wq.astype(jnp.bfloat16), dtype=np.float32).T
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32), ref,
                               rtol=2e-2, atol=2e-2)


def test_w4a16_generation_matches_weight_only_fake(tiny_model):
    """fpqvar_w4a16 on the int8 backend == the same weights-only recipe on
    the fake backend (identical quantized weight values; acts untouched on
    both sides) — and both run NaN-free end to end."""
    from fpqvar_tpu.config import fpqvar_w4a16

    vae_p, var_p = tiny_model
    key = jax.random.PRNGKey(14)
    label = jnp.array([4, 7])

    qcfg = fpqvar_w4a16()
    rt = build_runtime(qcfg, TINY.depth, TINY.width)
    assert all(v is None for v in rt.act_q.values())

    qp = quantize_var_params(var_p, TINY, qcfg)
    pw = qp["blocks"]["mat_qkv_w"]
    assert pw.group_size == pw.shape[-1]
    img = VARGenerator(TINY, qcfg).generate(qp, vae_p, label, key)
    assert not bool(jnp.isnan(img).any())

    qcfg_fk = qcfg.replace(backend="fake")
    qp_fk = quantize_var_params(var_p, TINY, qcfg_fk)
    img_fk = VARGenerator(TINY, qcfg_fk).generate(qp_fk, vae_p, label, key)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_fk),
                               atol=2e-2)


def test_w4a16_packed_generation_matches_weight_only_fake(tiny_model):
    """Packed weights-only (w4a16p bench mode): nibble-packed fp4 weight
    codes with bf16 acts must generate like the fake weights-only recipe at
    the same per-group granularity (packed dequant is bit-exact vs fake)."""
    from fpqvar_tpu.config import fpqvar_w4a16

    vae_p, var_p = tiny_model
    key = jax.random.PRNGKey(15)
    label = jnp.array([1, 6])

    qcfg = fpqvar_w4a16().replace(backend="packed",
                                  weight_quant="per_group")
    qp = quantize_var_params(var_p, TINY, qcfg)
    img = VARGenerator(TINY, qcfg).generate(qp, vae_p, label, key)
    assert not bool(jnp.isnan(img).any())

    qcfg_fk = qcfg.replace(backend="fake")
    qp_fk = quantize_var_params(var_p, TINY, qcfg_fk)
    img_fk = VARGenerator(TINY, qcfg_fk).generate(qp_fk, vae_p, label, key)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_fk),
                               atol=2e-2)


@pytest.mark.parametrize("fmt", ["fp_e2", "fp_e3", "fp6_e2m3"])
def test_fused_ch_kernel_matches_xla_chain_interpret(fmt):
    """Round-3 two-phase fused kernel (in-kernel per-token quantize +
    full-K int8 dot + in-VMEM rescale) vs the XLA chain
    (quant_int_codes -> _channel_dot): bit-equal at bf16 output."""
    from fpqvar_tpu.ops.pallas.int8_matmul import (
        _channel_dot, _fused_ch_matmul_2d)

    key = jax.random.PRNGKey(17)
    for m, k_dim, n in [(48, 384, 256), (5, 2304, 128), (33, 256, 640)]:
        x = jax.random.normal(key, (m, k_dim)) * 3.0
        w = jax.random.normal(jax.random.fold_in(key, 1), (n, k_dim))
        ac, asc = P.quant_int_codes(x, fmt, group_size=k_dim)
        pw = P.pack_int_codes(w, fmt, group_size=k_dim)
        ref = _channel_dot(ac, asc, pw.codes, pw.scales).astype(jnp.bfloat16)
        out = _fused_ch_matmul_2d(x, pw.codes, pw.scales, fmt=fmt, n=n,
                                  k_dim=k_dim, out_dtype=jnp.bfloat16,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_ch_kernel_zero_rows_interpret():
    """All-zero activation rows (scale guard) and M padding must not
    perturb neighbouring rows."""
    from fpqvar_tpu.ops.pallas.int8_matmul import (
        _channel_dot, _fused_ch_matmul_2d)

    key = jax.random.PRNGKey(19)
    m, k_dim, n = 7, 256, 128
    x = jax.random.normal(key, (m, k_dim))
    x = x.at[2].set(0.0)
    w = jax.random.normal(jax.random.fold_in(key, 1), (n, k_dim))
    ac, asc = P.quant_int_codes(x, "fp_e2", group_size=k_dim)
    pw = P.pack_int_codes(w, "fp_e2", group_size=k_dim)
    ref = _channel_dot(ac, asc, pw.codes, pw.scales).astype(jnp.bfloat16)
    out = _fused_ch_matmul_2d(x, pw.codes, pw.scales, fmt="fp_e2", n=n,
                              k_dim=k_dim, out_dtype=jnp.bfloat16,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.quick
def test_int8_linear_nd_matches_2d():
    """The N-D (reshape-free) contraction paths must be BIT-equal to the
    flattened-2D result: int32 dots are exact, so keeping the model's
    [B, l, K] shape (the round-4 layout fix, ROUND_NOTES_r04.md) is purely
    a scheduling change.  Covers per-channel int8, weights-only (per
    channel + per group), and the dual-grid fc2 path."""
    key = jax.random.PRNGKey(3)
    b, l, k, n = 2, 5, 256, 384
    x = jax.random.normal(key, (b, l, k), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (n, k), jnp.float32)

    for gs, fmt in ((k, "fp_e2"), (128, "fp_e2")):
        pw = P.pack_int_codes(w, "fp_e2", group_size=gs)
        y_nd = int8_linear(x, pw, fmt)
        y_2d = int8_linear(x.reshape(-1, k), pw, fmt).reshape(b, l, n)
        np.testing.assert_array_equal(np.asarray(y_nd), np.asarray(y_2d))
        # weights-only (W4A16): bf16 dot over converted codes
        y_nd = int8_linear(x, pw, "bf16")
        y_2d = int8_linear(x.reshape(-1, k), pw, "bf16").reshape(b, l, n)
        np.testing.assert_array_equal(np.asarray(y_nd), np.asarray(y_2d))

    pw = P.pack_int_codes(w, "fp_e2", group_size=k)
    y_nd = int8_linear_dual(x, pw, "fp_e1m2_neg_e2m1_pos")
    y_2d = int8_linear_dual(
        x.reshape(-1, k), pw, "fp_e1m2_neg_e2m1_pos").reshape(b, l, n)
    np.testing.assert_array_equal(np.asarray(y_nd), np.asarray(y_2d))
import pytest

@pytest.mark.quick
def test_bench_recipe_registry_builds():
    """Every named benchmark mode must resolve to a valid runtime at d30
    width: the registry is shared by four measurement tools, so an invalid
    combo would otherwise surface only mid-TPU-run."""
    from fpqvar_tpu.config import VARConfig, bench_recipes
    from fpqvar_tpu.quantize.runtime import build_runtime

    cfg = VARConfig(depth=30)
    reg = bench_recipes()
    assert {"bf16", "fake", "int8", "int8ch", "int8chs", "int8chsnr",
            "packed", "w4a16", "w4a16p", "int8kv", "int8att"} <= set(reg)
    for name, qcfg in reg.items():
        qrt = build_runtime(qcfg, cfg.depth, cfg.width)
        assert qrt is not None, name
