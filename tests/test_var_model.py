"""VAR model tests: cache/mask equivalence, rotation & GALT invariance,
end-to-end generation across quant configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import (
    QuantConfig, VARConfig, VQVAEConfig, fpqvar_w4a4, fpqvar_w6a6,
)
from fpqvar_tpu.models import VARGenerator, build_vae_var
from fpqvar_tpu.models import var as V
from fpqvar_tpu.quantize import build_runtime, quantize_var_params

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2, 3)),
)


@pytest.fixture(scope="module")
def tiny_model():
    from fpqvar_tpu.models import var as Vm, vqvae as vqm

    vae_p = vqm.init_vqvae_params(jax.random.PRNGKey(0), TINY.vae)
    # non-degenerate AdaLN gammas so block internals affect outputs
    var_p = Vm.init_var_params(jax.random.PRNGKey(1), TINY,
                               adaln_gamma_std=0.02)
    return vae_p, var_p


def test_quantization_perturbs_forward(tiny_model):
    """Guard against silent no-op quantization: the fp4 recipe must actually
    change the forward output (with non-degenerate AdaLN gammas)."""
    _, var_p = tiny_model
    cfg = TINY
    qcfg = fpqvar_w4a4().replace(transform=False)
    qp = quantize_var_params(var_p, cfg, qcfg)
    qrt = build_runtime(qcfg, cfg.depth)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 4, cfg.width)) * 0.5
    cond = jax.random.normal(jax.random.PRNGKey(12), (2, cfg.width)) * 0.5
    mod = V.compute_modulations(var_p, cfg, cond)
    base, _, _ = V.run_blocks(var_p, cfg, None, x, mod)
    quant, _, _ = V.run_blocks(qp, cfg, qrt, x, mod)
    rel = float(jnp.mean(jnp.abs(base - quant)) / jnp.mean(jnp.abs(base)))
    assert 1e-4 < rel < 0.5, rel


def _random_token_maps(key, cfg, b):
    xs = []
    for pn in cfg.patch_nums:
        key, k = jax.random.split(key)
        xs.append(jax.random.normal(k, (b, pn * pn, cfg.width)) * 0.1)
    return xs


def test_kv_cache_equals_full_attention(tiny_model):
    """Step-by-step decode with the preallocated KV cache must equal a single
    full-sequence forward under the block-causal mask — validates cache
    write offsets, static slicing and mask construction."""
    _, var_p = tiny_model
    cfg = TINY
    b = 2
    key = jax.random.PRNGKey(42)
    xs = _random_token_maps(key, cfg, b)
    cond = jax.random.normal(jax.random.PRNGKey(7), (b, cfg.width)) * 0.1
    mod = V.compute_modulations(var_p, cfg, cond)

    # stepwise with cache
    cache = V.init_kv_cache(cfg, b, jnp.float32)
    outs = []
    cur = 0
    for si, x in enumerate(xs):
        y, cache, _ = V.run_blocks(var_p, cfg, None, x, mod, cache, cur)
        outs.append(y)
        cur += x.shape[1]
    stepwise = jnp.concatenate(outs, axis=1)

    # full sequence with mask
    xfull = jnp.concatenate(xs, axis=1)
    bias = jnp.asarray(V.attn_bias_for_masking(cfg))
    full, _, _ = V.run_blocks(var_p, cfg, None, xfull, mod, attn_bias=bias)

    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(full), atol=2e-5, rtol=1e-4)


def test_rotation_invariance_of_forward(tiny_model):
    """With rotation enabled but quantization disabled, the rotated weights +
    online activation rotation must reproduce the unrotated forward
    ((xQ)(WQ)^T = xW^T)."""
    _, var_p = tiny_model
    cfg = TINY
    qcfg = QuantConfig(enabled=False, rotate=True, block_rotate=True)
    rot_p = quantize_var_params(var_p, cfg, qcfg)
    qrt = build_runtime(qcfg, cfg.depth)

    b = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 4, cfg.width)) * 0.1
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.width)) * 0.1
    mod = V.compute_modulations(var_p, cfg, cond)

    base, _, _ = V.run_blocks(var_p, cfg, None, x, mod)
    rot, _, _ = V.run_blocks(rot_p, cfg, qrt, x, mod)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(base),
                               atol=5e-5, rtol=1e-4)


def test_galt_fold_invariance(tiny_model):
    """x*s @ (W/s)^T == x W^T: transform-only config must match baseline."""
    _, var_p = tiny_model
    cfg = TINY
    rng = np.random.default_rng(0)
    s1 = (1.0 + 0.3 * rng.random((cfg.depth, cfg.width))).astype(np.float32)
    s2 = (1.0 + 0.3 * rng.random((cfg.depth, cfg.width))).astype(np.float32)
    qcfg = QuantConfig(enabled=False, transform=True)
    tp = quantize_var_params(var_p, cfg, qcfg, galt=(s1, s2))
    qrt = build_runtime(qcfg, cfg.depth)

    b = 2
    x = jax.random.normal(jax.random.PRNGKey(3), (b, 4, cfg.width)) * 0.1
    cond = jax.random.normal(jax.random.PRNGKey(4), (b, cfg.width)) * 0.1
    mod = V.compute_modulations(var_p, cfg, cond)
    base, _, _ = V.run_blocks(var_p, cfg, None, x, mod)
    fold, _, _ = V.run_blocks(tp, cfg, qrt, x, mod)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(base),
                               atol=5e-5, rtol=1e-4)


def test_teacher_forcing_forward_shapes(tiny_model):
    _, var_p = tiny_model
    cfg = TINY
    b = 2
    x_wo_first = jax.random.normal(
        jax.random.PRNGKey(5), (b, cfg.L - cfg.first_l, cfg.vae.z_channels))
    logits = V.var_forward(var_p, cfg, None, jnp.array([1, 2]), x_wo_first)
    assert logits.shape == (b, cfg.L, cfg.vae.vocab_size)
    assert not bool(jnp.isnan(logits).any())


@pytest.mark.parametrize("recipe", ["bf16", "fp4", "fp6kv", "int", "packed",
                                    "mixed"])
def test_generation_configs(tiny_model, recipe):
    vae_p, var_p = tiny_model
    cfg = TINY
    galt = (np.ones((cfg.depth, cfg.width), np.float32) * 1.1,
            np.ones((cfg.depth, cfg.width), np.float32) * 0.9)
    if recipe == "bf16":
        qcfg, galt = QuantConfig(), None
    elif recipe == "fp4":
        qcfg = fpqvar_w4a4()
    elif recipe == "fp6kv":
        qcfg = fpqvar_w6a6().replace(kv_bit=6, kv_mode="reference")
    elif recipe == "int":
        qcfg = QuantConfig(enabled=True, int_quant=True, w_bit=8, a_bit=8,
                           weight_quant="per_channel", act_quant="per_token")
        galt = None
    elif recipe == "packed":
        qcfg = fpqvar_w4a4().replace(backend="packed")
    elif recipe == "mixed":
        qcfg = fpqvar_w4a4().replace(
            transform=False, mixed_act_formats=("fp_e2", "fp_e3"))
        galt = None
    qp = quantize_var_params(var_p, cfg, qcfg, galt=galt)
    gen = VARGenerator(cfg, qcfg)
    imgs = gen.generate(qp, vae_p, jnp.array([3, 5]), jax.random.PRNGKey(1))
    assert imgs.shape == (2, 3, 6, 6)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
    assert not bool(jnp.isnan(imgs).any())


def test_generation_deterministic_given_key(tiny_model):
    vae_p, var_p = tiny_model
    gen = VARGenerator(TINY, QuantConfig())
    a = gen.generate(var_p, vae_p, jnp.array([3]), jax.random.PRNGKey(9))
    b = gen.generate(var_p, vae_p, jnp.array([3]), jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_more_smooth_generation(tiny_model):
    """`more_smooth` blends the codebook embedding with a gumbel-softmax of
    the logits (`models/var.py:204-208`) — must run and differ from the
    default hard-sample path."""
    from fpqvar_tpu.config import GenerateConfig

    vae_p, var_p = tiny_model
    gen_hard = VARGenerator(TINY, QuantConfig())
    gen_soft = VARGenerator(TINY, QuantConfig(),
                            gen=GenerateConfig(more_smooth=True))
    key = jax.random.PRNGKey(9)
    a = gen_hard.generate(var_p, vae_p, jnp.array([3]), key)
    b = gen_soft.generate(var_p, vae_p, jnp.array([3]), key)
    assert a.shape == b.shape
    assert not bool(jnp.isnan(b).any())
    assert float(jnp.mean(jnp.abs(a - b))) > 0.0


def test_per_row_keys_batch_independent(tiny_model):
    """Generation with [B, 2] per-row keys: a row's image depends only on
    its own key, not on batch composition (serving reproducibility)."""
    vae_p, var_p = tiny_model
    gen = VARGenerator(TINY, QuantConfig())
    k_a = jax.random.fold_in(jax.random.PRNGKey(0), 7)
    k_b = jax.random.fold_in(jax.random.PRNGKey(0), 8)
    k_c = jax.random.fold_in(jax.random.PRNGKey(0), 9)
    one = gen.generate(var_p, vae_p, jnp.array([3, 1]),
                       jnp.stack([k_a, k_b]))
    two = gen.generate(var_p, vae_p, jnp.array([5, 3]),
                       jnp.stack([k_c, k_a]))
    np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(two[1]))


def test_shared_aln_generation():
    """512-model path: shared SiLU->SharedAdaLin + per-block ada_gss
    (`models/var.py:85`, `basic_var.py:244-245,255-256`)."""
    cfg = VARConfig(
        depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
        shared_aln=True,
        vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                        num_res_blocks=1, patch_nums=(1, 2, 3)))
    vae_p, var_p = build_vae_var(jax.random.PRNGKey(0), cfg)
    assert "shared_ada_lin" in var_p and "ada_gss" in var_p["blocks"]
    gen = VARGenerator(cfg, QuantConfig())
    imgs = gen.generate(var_p, vae_p, jnp.array([1, 2]), jax.random.PRNGKey(3))
    assert imgs.shape == (2, 3, 6, 6)
    assert not bool(jnp.isnan(imgs).any())

    # quantized shared-aln path too
    qcfg = fpqvar_w4a4().replace(transform=False)
    qp = quantize_var_params(var_p, cfg, qcfg)
    imgs2 = VARGenerator(cfg, qcfg).generate(
        qp, vae_p, jnp.array([1, 2]), jax.random.PRNGKey(3))
    assert not bool(jnp.isnan(imgs2).any())


def test_packed_kv_cache_matches_fake_store(tiny_model):
    """int8-code packed KV cache vs the fake 'store'-mode cache: same
    per-token grid quantization math.  With value codes the packed path
    attends over int codes with scales folded into the scores — the
    quantized VALUES are bit-equal (asserted below via the codec) but the
    attention arithmetic keeps full precision where the fake path rounds
    the dequantized cache to bf16, so images agree to bf16 tolerance."""
    vae_p, var_p = tiny_model
    base = fpqvar_w4a4().replace(transform=False, kv_bit=6,
                                 kv_mode="store")
    fake = base
    packed = base.replace(kv_backend="packed")
    key = jax.random.PRNGKey(21)
    qp = quantize_var_params(var_p, TINY, fake)
    img_fake = VARGenerator(TINY, fake).generate(
        qp, vae_p, jnp.array([3, 5]), key)
    img_packed = VARGenerator(TINY, packed).generate(
        qp, vae_p, jnp.array([3, 5]), key)
    np.testing.assert_allclose(np.asarray(img_fake),
                               np.asarray(img_packed), atol=3e-2)


def test_quantize_ada_actually_quantizes(tiny_model):
    """QuantConfig.quantize_ada: ada weights change offline, SiLU(cond) is
    act-quantized online, and generation stays NaN-free — the capability
    the reference's quantize_VAR intends but silently no-ops
    (`quant_utils.py:1232-1250`, SURVEY.md §2.3)."""
    vae_p, var_p = tiny_model
    qcfg = fpqvar_w4a4().replace(transform=False, quantize_ada=True)
    qp = quantize_var_params(var_p, TINY, qcfg)
    w0 = np.asarray(var_p["blocks"]["ada_lin"]["w"])
    w1 = np.asarray(qp["blocks"]["ada_lin"]["w"])
    assert not np.array_equal(w0, w1)            # weights were quantized
    assert np.max(np.abs(w0 - w1)) < np.max(np.abs(w0))  # ...not garbage

    qrt = build_runtime(qcfg, TINY.depth, TINY.width)
    assert qrt.act_q.get("ada") is not None
    cond = jax.random.normal(jax.random.PRNGKey(30), (2, TINY.width))
    mod_q = V.compute_modulations(qp, TINY, cond, qrt)
    mod_nq = V.compute_modulations(qp, TINY, cond, None)
    assert not np.array_equal(np.asarray(mod_q), np.asarray(mod_nq))

    key = jax.random.PRNGKey(31)
    img = VARGenerator(TINY, qcfg).generate(
        qp, vae_p, jnp.array([3, 5]), key)
    assert not bool(jnp.isnan(img).any())
    # the no-ada recipe on the same weights stays close (ada is one small
    # conditioning linear; fp4 error there shifts modulations only mildly)
    qcfg0 = qcfg.replace(quantize_ada=False)
    img0 = VARGenerator(TINY, qcfg0).generate(
        quantize_var_params(var_p, TINY, qcfg0), vae_p,
        jnp.array([3, 5]), key)
    assert float(jnp.mean(jnp.abs(img - img0))) < 0.25


def test_quantize_ada_shared_aln():
    """512-style shared AdaLN: shared_ada_lin weight is quantized too."""
    cfg = VARConfig(
        depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2),
        shared_aln=True,
        vae=VQVAEConfig(vocab_size=64, z_channels=8, patch_nums=(1, 2)))
    var_p = V.init_var_params(jax.random.PRNGKey(2), cfg)
    qcfg = fpqvar_w4a4().replace(transform=False, quantize_ada=True)
    qp = quantize_var_params(var_p, cfg, qcfg)
    w0 = np.asarray(var_p["shared_ada_lin"]["w"])
    w1 = np.asarray(qp["shared_ada_lin"]["w"])
    assert not np.array_equal(w0, w1)
    np.testing.assert_array_equal(
        np.asarray(qp["blocks"]["ada_gss"]),
        np.asarray(var_p["blocks"]["ada_gss"]))   # gss table untouched


def test_kv_codec_value_roundtrip_bit_exact(tiny_model):
    """decode(encode(x)) of the value-code codec == the fake per-token grid
    quantizer bit-wise (exact power-of-two rescale)."""
    from fpqvar_tpu.ops import quantizers as Q
    from fpqvar_tpu.quantize.runtime import make_kv_codec

    for fmt, gs in (("fp_e2", 64), ("fp6_e2m3", 64)):
        codec = make_kv_codec(fmt)
        assert codec.value_codes
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 9, 2, 64))
        codes, scales = codec.encode(x)
        assert codes.dtype == jnp.int8
        dec = codec.decode(codes, scales)
        gran = "per_group" if fmt == "fp_e2" else "per_token"
        ref = Q.fake_quant_fp(x, fmt, granularity=gran, group_size=gs)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(ref))


def test_fused_equals_stepwise_generation(tiny_model):
    """The single-program fused decode must produce identical images to the
    per-scale-step path (same keys, same math, one dispatch)."""
    vae_p, var_p = tiny_model
    key = jax.random.PRNGKey(33)
    lab = jnp.array([1, 4])
    g_step = VARGenerator(TINY, QuantConfig(), fuse_steps=False)
    g_fused = VARGenerator(TINY, QuantConfig(), fuse_steps=True)
    a = g_step.generate(var_p, vae_p, lab, key)
    b = g_fused.generate(var_p, vae_p, lab, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_size_rotation_invariance():
    """Non-block (full-size) rotation path: Paley-generated C x C randomized
    Hadamard; (xQ)(WQ)^T == xW^T through the model forward."""
    cfg = VARConfig(
        depth=2, embed_dim=192, num_heads=3, patch_nums=(1, 2),
        vae=VQVAEConfig(vocab_size=64, z_channels=8, patch_nums=(1, 2)))
    var_p = V.init_var_params(jax.random.PRNGKey(1), cfg,
                              adaln_gamma_std=0.02)
    qcfg = QuantConfig(enabled=False, rotate=True, block_rotate=False)
    rp = quantize_var_params(var_p, cfg, qcfg)
    qrt = build_runtime(qcfg, cfg.depth, cfg.width)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, cfg.width)) * 0.1
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.width)) * 0.1
    mod = V.compute_modulations(var_p, cfg, cond)
    base, _, _ = V.run_blocks(var_p, cfg, None, x, mod)
    rot, _, _ = V.run_blocks(rp, cfg, qrt, x, mod)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(base),
                               atol=5e-5, rtol=1e-4)


def test_d36_512_full_recipe_shapes():
    """Abstract evaluation (no compilation) of one generation step of the
    512x512 d36 model with the full recipe — validates all geometry: L=2240
    patch schedule, shared AdaLN, rotation at C=2304, KV cache, sampling."""
    from fpqvar_tpu.config import var_d36_512, GenerateConfig
    from fpqvar_tpu.quantize import build_runtime

    cfg = var_d36_512()
    assert cfg.L == 2240 and cfg.width == 2304 and cfg.heads == 36
    qcfg = fpqvar_w4a4().replace(transform=False, kv_bit=6,
                                 kv_backend="packed")
    qrt = build_runtime(qcfg, cfg.depth, cfg.width)

    b = 2
    st = V.GenStatics.all_steps(cfg)[4]     # pn=6 step
    params_shapes = jax.eval_shape(
        lambda k: V.init_var_params(k, cfg), jax.random.PRNGKey(0))

    def step(params, x, cond, mod, lvl_pos, cache, f_hat, key):
        from fpqvar_tpu.models import vqvae as vqm

        vae_q = {
            "embedding": jnp.zeros((cfg.vae.vocab_size, cfg.vae.z_channels)),
            "phi": [
                {"w": jnp.zeros((cfg.vae.z_channels, cfg.vae.z_channels,
                                 3, 3)),
                 "b": jnp.zeros((cfg.vae.z_channels,))}
                for _ in range(4)],
        }
        return V.scale_step(params, vae_q, cfg, qrt, GenerateConfig(), st,
                            x, cond, mod, lvl_pos, cache, f_hat, key)

    cache = jax.eval_shape(
        lambda: V.init_kv_cache(cfg, 2 * b, kv_codec=qrt.kv_codec))
    out = jax.eval_shape(
        step,
        params_shapes,
        jnp.zeros((2 * b, st.l, cfg.width), jnp.bfloat16),
        jnp.zeros((2 * b, cfg.width), jnp.float32),
        jnp.zeros((cfg.depth, 6, 2 * b, 1, cfg.width), jnp.bfloat16),
        jnp.zeros((1, cfg.L, cfg.width), jnp.bfloat16),
        cache,
        jnp.zeros((b, cfg.vae.z_channels, 32, 32), jnp.float32),
        jax.random.PRNGKey(0),
    )
    nxt, cache_out, f_hat_out, _ = out
    assert nxt.shape == (2 * b, cfg.patch_nums[5] ** 2, cfg.width)
    assert f_hat_out.shape == (b, cfg.vae.z_channels, 32, 32)
    # packed cache: one append-only segment per scale (models/var.py
    # init_kv_cache)
    assert len(cache_out["segs"]) == cfg.num_scales
    for pn, seg in zip(cfg.patch_nums, cache_out["segs"]):
        assert seg["kc"].shape == (
            cfg.depth, 2 * b, cfg.heads, pn * pn * cfg.head_dim)
        assert seg["ks"].shape == (cfg.depth, 2 * b, cfg.heads, pn * pn)


def test_w8a8_fp8_config(tiny_model):
    """BASELINE config 2: W8A8 per-group FP8 (e4m3), no rotation/transform."""
    vae_p, var_p = tiny_model
    qcfg = QuantConfig(
        enabled=True, w_bit=8, a_bit=8,
        weight_quant="per_group", act_quant="per_group",
        weight_format="fp8_e4m3", act_format="fp8_e4m3",
        fc2_format="fp8_e4m3")
    qp = quantize_var_params(var_p, TINY, qcfg)
    imgs = VARGenerator(TINY, qcfg).generate(
        qp, vae_p, jnp.array([3, 5]), jax.random.PRNGKey(1))
    assert not bool(jnp.isnan(imgs).any())
    # 8-bit should perturb the forward far less than 4-bit
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, TINY.width)) * 0.5
    cond = jax.random.normal(jax.random.PRNGKey(8), (2, TINY.width)) * 0.5
    mod = V.compute_modulations(var_p, TINY, cond)
    base, _, _ = V.run_blocks(var_p, TINY, None, x, mod)
    from fpqvar_tpu.quantize import build_runtime
    q8, _, _ = V.run_blocks(qp, TINY, build_runtime(qcfg, TINY.depth), x, mod)
    rel8 = float(jnp.mean(jnp.abs(base - q8)) / jnp.mean(jnp.abs(base)))
    assert rel8 < 0.02


def test_galt_fp6_ste():
    from fpqvar_tpu.quantize.galt import make_quant_ste

    q4 = make_quant_ste(4)
    q6 = make_quant_ste(6)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128))
    e4 = float(jnp.mean((q4(x) - x) ** 2))
    e6 = float(jnp.mean((q6(x) - x) ** 2))
    assert e6 < e4  # 6-bit grid is finer
    # STE: gradients flow as identity
    g = jax.grad(lambda v: jnp.sum(q4(v) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_single_sort_topk_topp_filter_matches_sequential():
    """The fused one-sort top-k+top-p branch must be bit-equal to the
    sequential two-filter chain (reference helpers.py:8-15 order), ties at
    the k-th value included."""
    from fpqvar_tpu.models.sampling import NEG_INF, top_k_top_p_filter

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 7, 64)).astype(np.float32))
    # plant ties at what will be the kth values
    logits = logits.at[0, 0, :8].set(logits[0, 0, 10])
    for k, p in [(9, 0.9), (1, 0.5), (64, 0.99), (3, 0.96)]:
        fused = top_k_top_p_filter(logits, k, p)
        seq = top_k_top_p_filter(logits, k, 0.0)      # top-k alone
        seq = top_k_top_p_filter(seq, 0, p)           # then top-p alone
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(seq))
        assert bool((fused == NEG_INF).any()) or k == 64


def test_mixed_format_scan_matches_uniform(tiny_model):
    """Mixed-format path (scan + lax.switch over distinct-format bodies):
    with every block assigned the SAME format it must reproduce the uniform
    config bit-wise, and a genuinely mixed assignment must differ from
    uniform (the e3 blocks actually use the e3 grid)."""
    vae_p, var_p = tiny_model
    cfg = TINY
    key = jax.random.PRNGKey(1)
    labels = jnp.array([3, 5])

    uni = fpqvar_w4a4().replace(transform=False)
    qp = quantize_var_params(var_p, cfg, uni)
    ref = VARGenerator(cfg, uni).generate(qp, vae_p, labels, key)

    same = uni.replace(mixed_act_formats=("fp_e2",) * cfg.depth)
    out_same = VARGenerator(cfg, same).generate(
        quantize_var_params(var_p, cfg, same), vae_p, labels, key)
    np.testing.assert_array_equal(np.asarray(out_same), np.asarray(ref))

    # a genuinely mixed assignment must CHANGE the teacher-forcing logits
    # vs uniform (images can alias through argmax sampling; logits can't)
    from fpqvar_tpu.models import var as Vm
    from fpqvar_tpu.quantize.runtime import build_runtime

    x = jax.random.normal(
        jax.random.PRNGKey(7),
        (2, cfg.L - cfg.first_l, cfg.vae.z_channels))
    mix = uni.replace(mixed_act_formats=("fp_e2", "fp_e3"))
    qp_uni = quantize_var_params(var_p, cfg, uni)
    lg_uni = Vm.var_forward(qp_uni, cfg, build_runtime(uni, cfg.depth),
                            labels, x)
    lg_mix = Vm.var_forward(
        quantize_var_params(var_p, cfg, mix), cfg,
        build_runtime(mix, cfg.depth), labels, x)
    assert float(jnp.mean(jnp.abs(lg_mix - lg_uni))) > 0.0
