"""Numerical parity harness against the MOUNTED reference implementation.

Imports the reference packages from /root/reference (PyTorch, CPU) and checks
our quantizers / model forward / stepwise decode against them directly — no
upstream checkpoints needed, shared random weights instead:

- every quantizer matches the reference bit-wise in f32 (the CUDA kernel is
  replaced by a faithful CPU re-implementation of `quant/quant_kernel.cu:12-39`
  including its `<=` last-wins tie rule);
- the block-Hadamard rotation matrix matches `rotate_utils` bit-wise;
- a greedy (argmax) multi-scale decode produces the same per-step CFG-mixed
  logits, the same token indices, and the same final image, for both the
  bf16/f32 baseline and the full FP4 recipe (GALT fold + block rotation +
  W4A4 e2m1 + fc2 dual-grid), plus the fp6 KV-cache quantization mode.

Known deliberate deviations (asserted nowhere, documented here):

- fp4 KV quantization (kv_bit=4): the reference groups the flattened
  [B,H,L,c] cache in 128s across tokens (c=64 -> one group spans 2 tokens,
  `models_fp_quant_transform_rotate/basic_var.py:197-198`); we group per
  64-wide head_dim row BY DEFAULT (see ops/quantizers.fake_quant_kv).
  `QuantConfig.kv_ref_grouping=True` reproduces the reference grouping
  bit-wise — test_kv4_reference_grouping_parity pins both the exact-compat
  mode and the default deviation's magnitude.  kv_bit=6 parity is identical
  granularity on both sides (per-token over head_dim).
- torch.multinomial sampling is RNG-incompatible with JAX by construction;
  the stepwise tests force argmax on both sides.
"""
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"

# ---------------------------------------------------------------------------
# Reference import scaffolding (stubs for dist / quant_cuda / stale imports)
# ---------------------------------------------------------------------------


def _install_ref_stubs():
    if "dist" not in sys.modules or not hasattr(
            sys.modules["dist"], "get_device"):
        dist = types.ModuleType("dist")
        dist.get_device = lambda: "cpu"
        dist.initialized = lambda: False
        dist.get_rank = lambda: 0
        dist.get_world_size = lambda: 1
        sys.modules["dist"] = dist
    if "quant_cuda" not in sys.modules:
        qc = types.ModuleType("quant_cuda")

        def quant(x, grid):
            # CPU re-implementation of quant_forward_cuda_kernel
            # (`quant/quant_kernel.cu:12-39`): nearest grid value with the
            # kernel's `<=` comparison => the LAST minimal-distance grid
            # entry wins ties.  torch.argmin returns the FIRST minimum, so
            # scan the flipped distance row and map the index back.
            d = (x.unsqueeze(-1) - grid).abs()
            ridx = torch.flip(d, dims=[-1]).argmin(dim=-1)
            idx = grid.numel() - 1 - ridx
            return grid[idx].to(x.dtype), idx.to(torch.int32)

        qc.quant = quant
        sys.modules[qc.__name__] = qc
    # rotate_utils / transform_model_utils carry stale source-project imports
    # (`rotation_utils.py:3-7`: utils, transformers, quant_utils) — none of
    # their symbols are used; satisfy them with empty stubs so the real
    # reference `utils` package (which imports dist/torch-era deps) is never
    # touched.
    for name in ("utils", "quant_utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref():
    _install_ref_stubs()
    import models_fp_quant.quant_utils as rqu
    from models_fp_quant_transform_rotate import build_vae_var as _  # noqa
    # quantize_VAR dispatches on isinstance against ITS OWN package's
    # FFN/SelfAttention classes — model surgery must use the same fork's
    # quant_utils copy or it silently no-ops (`quant_utils.py:1192,1213`)
    import models_fp_quant_transform_rotate.quant_utils as rqu_fork
    import models_fp_quant_transform_rotate.var as rvar_mod
    import rotate_utils.rotation_utils as rrot
    from learnable_transformation import transform_model_utils as rtrans

    return types.SimpleNamespace(
        qu=rqu, qu_fork=rqu_fork, var_mod=rvar_mod, rot=rrot, trans=rtrans)


# ---------------------------------------------------------------------------
# 1. Quantizer bit parity
# ---------------------------------------------------------------------------

def _rand(shape, seed, scale=1.0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g, dtype=torch.float32) * scale


def _ours(fn, x, **kw):
    import fpqvar_tpu.ops.quantizers as Q

    return np.asarray(getattr(Q, fn)(jnp.asarray(x.numpy()), **kw))


QUANTIZER_CASES = [
    # (ref_fn, ref_args, our_fn, our_kwargs, exact)
    ("fp_quant_e1_per_group_cuda", dict(n_bits=4), "fake_quant_fp",
     dict(fmt="fp_e1", granularity="per_group"), True),
    ("fp_quant_e2_per_group_cuda", dict(n_bits=4), "fake_quant_fp",
     dict(fmt="fp_e2", granularity="per_group"), True),
    ("fp_quant_e3_per_group_cuda", dict(n_bits=4), "fake_quant_fp",
     dict(fmt="fp_e3", granularity="per_group"), True),
    ("fp_quant_e2_per_token", dict(n_bits=4), "fake_quant_fp",
     dict(fmt="fp_e2", granularity="per_token", clip_abs=3.0), False),
    # the reference fp6 single-grid quantizers hard-cast their output to
    # fp16 (`quant_utils.py:596,613,633,653` `.to(torch.float16)`) even in
    # an f32 model; ours stay f32 — parity = our result rounds to exactly
    # the reference's fp16 value ("cast16" below)
    ("fp6_quant_e2m3_per_group_cuda", dict(n_bits=6), "fake_quant_fp",
     dict(fmt="fp6_e2m3", granularity="per_group"), "cast16"),
    ("fp6_quant_e3m2_per_group_cuda", dict(n_bits=6), "fake_quant_fp",
     dict(fmt="fp6_e3m2", granularity="per_group"), "cast16"),
    ("fp6_quant_e2m3_per_token_cuda", dict(n_bits=6), "fake_quant_fp",
     dict(fmt="fp6_e2m3", granularity="per_token"), "cast16"),
    ("fp_quant_e1m2_neg_e2m1_pos_per_group_cuda", dict(n_bits=4),
     "fake_quant_dual",
     dict(fmt="fp_e1m2_neg_e2m1_pos", granularity="per_group"), True),
    ("fp4_afpq_per_group_cuda", dict(n_bits=4), "fake_quant_dual",
     dict(fmt="fp4_afpq", granularity="per_group"), True),
    ("fp6_quant_int_neg_e2m3_pos_per_group_cuda", dict(n_bits=6),
     "fake_quant_dual",
     dict(fmt="fp6_int_neg_e2m3_pos", granularity="per_group"), True),
    ("fp_neg_reverse_quant_per_group_cuda", dict(n_bits=4),
     "fake_quant_neg_reverse", dict(), True),
    ("quantize_activation_per_token_sym", dict(n_bits=8),
     "fake_quant_int_sym", dict(n_bits=8, granularity="per_token"), True),
    ("quantize_activation_per_group_sym", dict(n_bits=6, group_size=128),
     "fake_quant_int_sym", dict(n_bits=6, granularity="per_group"), True),
    ("quantize_activation_per_tensor_sym", dict(n_bits=8),
     "fake_quant_int_sym", dict(n_bits=8, granularity="per_tensor"), True),
    ("quantize_activation_per_token_asymmetric", dict(n_bits=8),
     "fake_quant_int_asym", dict(n_bits=8, granularity="per_token"), True),
    ("quantize_activation_per_group_asymmetric",
     dict(n_bits=6, group_size=128),
     "fake_quant_int_asym", dict(n_bits=6, granularity="per_group"), True),
    ("log2_quant_per_token_asym", dict(n_bits=6), "fake_quant_log2",
     dict(n_bits=6, granularity="per_token"), False),
    ("log2_quant_per_group_asym", dict(n_bits=6, group_size=128),
     "fake_quant_log2", dict(n_bits=6, granularity="per_group"), False),
]


@pytest.mark.parametrize(
    "ref_fn,ref_kw,our_fn,our_kw,exact",
    QUANTIZER_CASES, ids=[c[0] for c in QUANTIZER_CASES])
def test_quantizer_parity(ref, ref_fn, ref_kw, our_fn, our_kw, exact):
    import zlib
    x = _rand((64, 256), seed=zlib.crc32(ref_fn.encode()))
    want = getattr(ref.qu, ref_fn)(x.clone(), **ref_kw)
    got = _ours(our_fn, x, **our_kw)
    if exact == "cast16":
        np.testing.assert_array_equal(
            got.astype(np.float16), want.numpy())
    elif exact:
        np.testing.assert_array_equal(got, want.numpy())
    elif "log2" in ref_fn:
        # log2 quantizers round a transcendental (2^round(log2|x|)): libm /
        # SIMD lane selection shifts the last ulp of log2 under load (seen
        # only in full-suite runs), which (a) wiggles values by <=5e-5 and
        # (b) can flip an element sitting exactly on a rounding boundary to
        # the adjacent exponent (ratio exactly 2).  Allow both, nothing else.
        w = want.numpy()
        bad = ~np.isclose(got, w, rtol=0, atol=5e-5)
        assert bad.mean() <= 1e-3, f"{bad.sum()} log2 mismatches"
        ratio = np.abs(got[bad]) / np.maximum(np.abs(w[bad]), 1e-30)
        assert np.all((np.abs(ratio - 2.0) < 1e-4)
                      | (np.abs(ratio - 0.5) < 1e-4)), ratio
    else:
        np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=1e-6)


def test_weight_quantizer_parity(ref):
    """Weight quantizers mutate in place in the reference
    (`quant_utils.py:11-43`) — clone before the call."""
    import fpqvar_tpu.ops.quantizers as Q

    w = _rand((256, 256), seed=77)
    want = ref.qu.quantize_weight_per_channel_sym(w.clone(), 8).numpy()
    got = np.asarray(Q.fake_quant_int_sym(
        jnp.asarray(w.numpy()), 8, granularity="per_channel"))
    np.testing.assert_array_equal(got, want)

    w2 = _rand((256, 256), seed=78)
    want2 = ref.qu.quantize_weight_per_group_sym(w2.clone(), 4, 128).numpy()
    got2 = np.asarray(Q.fake_quant_int_sym(
        jnp.asarray(w2.numpy()), 4, granularity="per_group"))
    np.testing.assert_array_equal(got2, want2)


def test_cuda_kernel_tie_rule(ref):
    """Exact grid midpoints snap to the LARGER value (the `<=` in
    `quant_kernel.cu:31`) — both in the stub and in our snap_to_grid."""
    import fpqvar_tpu.ops.quantizers as Q
    import fpqvar_tpu.ops.grids as G

    grid = torch.tensor([-1.0, 0.0, 1.0, 2.0])
    x = torch.tensor([-0.5, 0.5, 1.5])
    snapped, _ = sys.modules["quant_cuda"].quant(x, grid)
    np.testing.assert_array_equal(snapped.numpy(), [0.0, 1.0, 2.0])
    ours = np.asarray(Q.snap_to_grid(
        jnp.asarray(x.numpy()), np.asarray(grid.numpy())))
    np.testing.assert_array_equal(ours, snapped.numpy())


def test_rotation_matrix_parity(ref):
    """block_random_hadamard_matrix (`rotation_utils.py:69-126`) vs our
    torch-seed-42-compatible generation (ops/hadamard.py)."""
    from fpqvar_tpu.ops import hadamard as H

    want = ref.rot.block_random_hadamard_matrix(128, 128, device="cpu").numpy()
    got = np.asarray(H.block_hadamard_block(128, 42), np.float64)
    np.testing.assert_allclose(got, want, atol=1e-12)

    # 256 = two identical 128 blocks on the diagonal
    want2 = ref.rot.block_random_hadamard_matrix(256, 128, device="cpu").numpy()
    got_block = np.asarray(H.block_hadamard_block(128, 42), np.float64)
    full = np.zeros((256, 256))
    full[:128, :128] = got_block
    full[128:, 128:] = got_block
    np.testing.assert_allclose(full, want2, atol=1e-12)


# ---------------------------------------------------------------------------
# 2. Model parity: shared random weights, greedy stepwise decode
# ---------------------------------------------------------------------------

DEPTH, WIDTH, HEADS = 2, 128, 2
PATCH = (1, 2, 3)
NCLS, V, CVAE, CH = 16, 64, 8, 32

_RESET_CLASSES = (
    torch.nn.Linear, torch.nn.LayerNorm, torch.nn.BatchNorm2d,
    torch.nn.SyncBatchNorm, torch.nn.Conv1d, torch.nn.Conv2d,
    torch.nn.ConvTranspose1d, torch.nn.ConvTranspose2d)


def _build_ref_models(shared_aln: bool):
    """Reference (VQVAE, VAR) at a tiny config with seeded random weights.

    build_vae_var globally disables reset_parameters (models/__init__.py:24)
    — capture and restore it, and re-randomize every parameter afterwards
    (disabled init leaves torch.empty garbage)."""
    from models_fp_quant_transform_rotate import build_vae_var as rbuild

    saved = {c: c.reset_parameters for c in _RESET_CLASSES
             if hasattr(c, "reset_parameters")}
    try:
        vae, var = rbuild(
            "cpu", patch_nums=PATCH, V=V, Cvae=CVAE, ch=CH,
            num_classes=NCLS, depth=DEPTH, shared_aln=shared_aln,
            attn_l2_norm=True, flash_if_available=False,
            fused_if_available=False)
    finally:
        for c, fn in saved.items():
            c.reset_parameters = fn
    g = torch.Generator().manual_seed(17)
    with torch.no_grad():
        for p in list(vae.parameters()) + list(var.parameters()):
            p.copy_(torch.randn(
                p.shape, generator=g, dtype=torch.float32) * 0.05)
    vae.eval()
    var.eval()
    return vae.float(), var.float()


@pytest.fixture(scope="module")
def ref_models(ref):
    return _build_ref_models(shared_aln=False)


@pytest.fixture(scope="module")
def our_cfg():
    from fpqvar_tpu.config import VARConfig, VQVAEConfig

    return VARConfig(
        depth=DEPTH, embed_dim=WIDTH, num_heads=HEADS, patch_nums=PATCH,
        num_classes=NCLS,
        vae=VQVAEConfig(vocab_size=V, z_channels=CVAE, ch=CH,
                        ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
                        patch_nums=PATCH))


@pytest.fixture(scope="module")
def our_params(ref_models, our_cfg):
    from fpqvar_tpu.utils import checkpoint as C

    vae, var = ref_models
    var_sd = {k: v.detach().numpy() for k, v in var.state_dict().items()}
    vae_sd = {k: v.detach().numpy() for k, v in vae.state_dict().items()}
    var_p = C.convert_var_state_dict(var_sd, our_cfg)
    vae_p = C.convert_vqvae_state_dict(vae_sd, our_cfg.vae)
    f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float32), t)
    return f32(vae_p), f32(var_p)


def _greedy_argmax_patch(var_mod, record):
    """Patched sample_with_top_k_top_p_: record the CFG-mixed logits and
    return argmax with the reference's (B, l, num_samples) shape."""

    def fake(logits, rng=None, top_k=0, top_p=0.0, num_samples=1):
        record.append(logits.detach().to(torch.float32).clone())
        return logits.argmax(dim=-1, keepdim=True)

    return fake


def _ref_generate(ref, ref_models, rotation=None, best_s=None,
                  quant_kv=None, kv_bit=None):
    """Greedy reference decode -> (per-step mixed logits, final image)."""
    vae, var = ref_models
    C = var.C
    rotation = rotation if rotation is not None \
        else torch.eye(C, dtype=torch.float32)
    if best_s is None:
        s_qkv = torch.ones(C)
        s_fc1 = torch.ones(C)
    else:
        s_qkv, s_fc1 = best_s
    rec = []
    orig = ref.var_mod.sample_with_top_k_top_p_
    ref.var_mod.sample_with_top_k_top_p_ = _greedy_argmax_patch(
        ref.var_mod, rec)
    try:
        img = var.autoregressive_infer_cfg(
            B=1, label_B=torch.tensor([3]), g_seed=0, cfg=1.5,
            top_k=0, top_p=0.0, rotation_matrix=rotation,
            quant_KV=quant_kv, kv_bit=kv_bit,
            mat_qkv_best_s=s_qkv, fc1_best_s=s_fc1)
    finally:
        ref.var_mod.sample_with_top_k_top_p_ = orig
    return [r.numpy() for r in rec], img.detach().numpy()


def _our_generate(our_cfg, vae_p, var_p, qrt=None):
    """Greedy jax decode mirroring VARGenerator._fused (f32, argmax)."""
    from fpqvar_tpu.models import var as Vm
    from fpqvar_tpu.models import vqvae as vq

    cfg = our_cfg
    label = jnp.array([3], jnp.int32)
    b = 1
    cond_BD, mod, lvl_pos, x = Vm.prepare_generation(var_p, cfg, label)
    codec = qrt.kv_codec if qrt is not None else None
    cache = Vm.init_kv_cache(cfg, 2 * b, jnp.float32, kv_codec=codec)
    hw = cfg.patch_nums[-1]
    f_hat = jnp.zeros((b, cfg.vae.z_channels, hw, hw), jnp.float32)
    vae_q = vae_p["quantize"]
    logits_steps = []
    for st in Vm.GenStatics.all_steps(cfg):
        xo, cache, _ = Vm.run_blocks(
            var_p, cfg, qrt, x, mod, cache, st.cur)
        logits = Vm.head_logits(var_p, cfg, xo.astype(jnp.float32), cond_BD)
        t = 1.5 * (st.si / (cfg.num_scales - 1))
        logits = (1.0 + t) * logits[:b] - t * logits[b:]
        logits_steps.append(np.asarray(logits))
        idx = jnp.argmax(logits, axis=-1)
        h = vq.embed_idx(vae_q, idx).transpose(0, 2, 1).reshape(
            b, cfg.vae.z_channels, st.pn, st.pn).astype(jnp.float32)
        f_hat, nxt_raw = vq.get_next_autoregressive_input(
            vae_q, cfg.vae, st.si, f_hat, h)
        if st.si == cfg.num_scales - 1:
            break
        nxt = nxt_raw.reshape(b, cfg.vae.z_channels, -1).transpose(0, 2, 1)
        we = var_p["word_embed"]
        nxt = Vm.linear(nxt, we["w"], we["b"])
        cur_end = st.cur + st.l
        nxt = nxt + lvl_pos[:, cur_end: cur_end + cfg.patch_nums[st.si + 1] ** 2]
        x = jnp.concatenate([nxt, nxt], axis=0)
    img = np.asarray((vq.decode(vae_p, cfg.vae, f_hat) + 1.0) * 0.5)
    return logits_steps, img


def _check_steps(ref_steps, our_steps, atol, rtol):
    assert len(ref_steps) == len(our_steps)
    for si, (r, o) in enumerate(zip(ref_steps, our_steps)):
        # identical greedy trajectories are the hard requirement; logits
        # agree to fp tolerance (matmul association differs)
        np.testing.assert_array_equal(
            o.argmax(-1), r.argmax(-1),
            err_msg=f"greedy tokens diverge at scale step {si}")
        np.testing.assert_allclose(
            o, r, atol=atol, rtol=rtol,
            err_msg=f"logits diverge at scale step {si}")


def test_baseline_stepwise_parity(ref, ref_models, our_cfg, our_params):
    """10-step greedy decode, unquantized f32: logits, tokens and the final
    image (through the full VQVAE pyramid + decoder) must match."""
    vae_p, var_p = our_params
    ref_steps, ref_img = _ref_generate(ref, ref_models)
    our_steps, our_img = _our_generate(our_cfg, vae_p, var_p)
    _check_steps(ref_steps, our_steps, atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-4)


def test_full_recipe_stepwise_parity(ref, ref_models, our_cfg, our_params):
    """Full FP4 recipe: GALT fold (random s) + block rotation + W4A4 e2m1
    per-group + fc2 dual-grid act quant, greedy decode vs the reference's
    transform_model + rotate_model + quantize_VAR pipeline."""
    import copy

    from fpqvar_tpu.config import fpqvar_w4a4
    from fpqvar_tpu.quantize import build_runtime, quantize_var_params

    vae_p, var_p = our_params
    _, var = ref_models
    C = var.C

    g = torch.Generator().manual_seed(99)
    s_qkv = [0.5 + torch.rand(C, generator=g) for _ in range(DEPTH)]
    s_fc1 = [0.5 + torch.rand(C, generator=g) for _ in range(DEPTH)]

    rvar = copy.deepcopy(var)
    ref.trans.transform_model(rvar, s_qkv, s_fc1)
    ref.rot.rotate_model(rvar, "cpu", True)
    rvar = ref.qu_fork.quantize_VAR(
        rvar, weight_quant="per_group", act_quant="per_group",
        w_bit=4, a_bit=4, act_quant_sym=True, fc2_act_log2_quant=False,
        quant_kv=False, kv_bit=4,
        activation_fp_quant=True, weight_fp_quant=True,
        act_fp_type="fp_e2", weight_fp_type="fp_e2",
        fc2_fp_type="fp_e1m2_neg_e2m1_pos")
    # guard against the silent no-op above
    assert isinstance(rvar.blocks[0].attn.proj, ref.qu_fork.QuantizedLinear)
    assert isinstance(rvar.blocks[0].ffn.fc2, ref.qu_fork.QuantizedLinear_fc2)
    rvar.eval()
    q_ref = ref.rot.block_random_hadamard_matrix(C, 128, device="cpu").to(torch.float32)
    ref_steps, _ = _ref_generate(
        ref, (None, rvar), rotation=q_ref,
        best_s=(torch.stack(s_qkv), torch.stack(s_fc1)))

    qcfg = fpqvar_w4a4()
    galt = (np.stack([s.numpy() for s in s_qkv]),
            np.stack([s.numpy() for s in s_fc1]))
    qp = quantize_var_params(var_p, our_cfg, qcfg, galt=galt)
    qp = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), qp)
    qrt = build_runtime(qcfg, our_cfg.depth, our_cfg.width)
    our_steps, our_img = _our_generate(our_cfg, vae_p, qp, qrt=qrt)
    _check_steps(ref_steps, our_steps, atol=5e-4, rtol=5e-3)
    assert not np.isnan(our_img).any()


def test_shared_aln_stepwise_parity(ref, our_cfg):
    """shared_aln=True (the 512x512 family: SiLU->SharedAdaLin(D,6C) shared
    across blocks + per-block ada_gss, reference `var.py:85`,
    `basic_var.py:244-256`): greedy stepwise decode parity on shared random
    weights — validates our compute_modulations shared path and the
    shared_ada_lin/ada_gss checkpoint conversion."""
    import dataclasses

    from fpqvar_tpu.utils import checkpoint as C

    ref_vae, ref_var = _build_ref_models(shared_aln=True)
    cfg = dataclasses.replace(our_cfg, shared_aln=True)
    var_sd = {k: v.detach().numpy() for k, v in ref_var.state_dict().items()}
    vae_sd = {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()}
    f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float32), t)
    var_p = f32(C.convert_var_state_dict(var_sd, cfg))
    vae_p = f32(C.convert_vqvae_state_dict(vae_sd, cfg.vae))

    ref_steps, ref_img = _ref_generate(ref, (ref_vae, ref_var))
    our_steps, our_img = _our_generate(cfg, vae_p, var_p)
    _check_steps(ref_steps, our_steps, atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-4)


def test_kv6_stepwise_parity(ref, ref_models, our_cfg, our_params):
    """fp6 e2m3 per-token KV-cache re-quantization (kv_bit=6,
    `basic_var.py:192-195`) vs our kv_mode='reference' path."""
    from fpqvar_tpu.config import QuantConfig
    from fpqvar_tpu.quantize import build_runtime

    vae_p, var_p = our_params
    ref_steps, _ = _ref_generate(
        ref, ref_models, quant_kv=True, kv_bit=6)
    qcfg = QuantConfig(enabled=False, kv_bit=6, kv_mode="reference")
    qrt = build_runtime(qcfg, our_cfg.depth, our_cfg.width)
    our_steps, _ = _our_generate(our_cfg, vae_p, var_p, qrt=qrt)
    _check_steps(ref_steps, our_steps, atol=2e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# kv_bit=4 grouping parity (VERDICT r2 #10)
# ---------------------------------------------------------------------------

def test_kv4_reference_grouping_parity(ref):
    """kv_ref_grouping=True reproduces the reference's flat-128 cache
    quantization (`fp_quant_e2_per_group_cuda` on a [B,H,L,64] cache,
    `basic_var.py:197-198`) BIT-wise; the default head_dim-row grouping is
    a documented deviation whose magnitude is pinned here."""
    from fpqvar_tpu.config import QuantConfig
    from fpqvar_tpu.ops import quantizers as Q

    # reference cache layout: HEAD-major [B, H, L, c] (`basic_var.py:100`)
    cache_bhlc = _rand((2, 4, 6, 64), seed=77, scale=0.7)  # numel % 128 == 0
    want = ref.qu_fork.fp_quant_e2_per_group_cuda(
        cache_bhlc.clone(), 4).numpy()

    # the model passes TOKEN-major [B, T, H, c] (models/var.py _q_merged);
    # fake_quant_kv must internally restore the reference's head-major
    # element order so groups span consecutive tokens of one head
    cache_blhc = cache_bhlc.numpy().transpose(0, 2, 1, 3)
    compat = QuantConfig(enabled=True, kv_bit=4, kv_ref_grouping=True)
    got = np.asarray(Q.fake_quant_kv(jnp.asarray(cache_blhc), compat))
    np.testing.assert_array_equal(got.transpose(0, 2, 1, 3), want)

    # default grouping (per 64-wide head_dim row): different scale groups,
    # hence different values — but the same grid: error stays within the
    # coarser of the two quantization steps on this data
    default = QuantConfig(enabled=True, kv_bit=4)
    got_d = np.asarray(Q.fake_quant_kv(jnp.asarray(cache_blhc), default))
    got_d = got_d.transpose(0, 2, 1, 3)
    assert np.abs(got_d - want).max() > 0.0          # genuinely different
    err_vs_ref = float(np.mean((got_d - cache_bhlc.numpy()) ** 2))
    err_ref = float(np.mean((want - cache_bhlc.numpy()) ** 2))
    # finer groups (64 <= 128 elements) should not be materially worse
    assert err_vs_ref <= err_ref * 1.5, (err_vs_ref, err_ref)
