# Canonical FPQVAR recipes (mirrors the reference's run.sh:1-25, same flag
# names; one parameterized CLI instead of per-fork entry scripts).  Set
# CKPT_ARGS="--vae-ckpt vae_ch160v4096z32.pth --var-ckpt var_d30.pth" (or
# --packed-ckpt <npz>); without it, evaluate.py runs random-init smoke mode.
CKPT_ARGS=${CKPT_ARGS:-}
CKPT_ARGS_512=${CKPT_ARGS_512:-}

# ---------------- Image 256x256 (VAR-d30) ----------------

# FP4 full recipe + KV cache quantization (run.sh:4)
python scripts/evaluate.py --depth 30 $CKPT_ARGS --quant --w_bit 4 --a_bit 4 \
    --weight_quant per_group --act_quant per_group --act_sym \
    --activation_fp_quant --weight_fp_quant \
    --act_fp_type fp_e2 --weight_fp_type fp_e2 \
    --fc2_fp_type fp_e1m2_neg_e2m1_pos \
    --rotate --block_rotate --transform --quant_kv --kv_bit 6 \
    --out figs_d30_fp4_kv6

# FP6 (run.sh:7)
python scripts/evaluate.py --depth 30 $CKPT_ARGS --quant --w_bit 6 --a_bit 6 \
    --weight_quant per_channel --act_quant per_token --act_sym \
    --activation_fp_quant --weight_fp_quant \
    --act_fp_type fp6_e2m3 --weight_fp_type fp6_e2m3 \
    --fc2_fp_type fp6_int_neg_e2m3_pos --rotate --block_rotate \
    --out figs_d30_fp6

# FP6 + KV cache quantization (run.sh:10)
python scripts/evaluate.py --depth 30 $CKPT_ARGS --quant --w_bit 6 --a_bit 6 \
    --weight_quant per_channel --act_quant per_token --act_sym \
    --activation_fp_quant --weight_fp_quant \
    --act_fp_type fp6_e2m3 --weight_fp_type fp6_e2m3 \
    --fc2_fp_type fp6_int_neg_e2m3_pos --rotate --block_rotate \
    --quant_kv --kv_bit 6 --out figs_d30_fp6_kv6

# ---------------- Image 512x512 (VAR-d36, shared AdaLN) ----------------

# FP4 full recipe (run.sh:16)
python scripts/evaluate.py --depth 36 --resolution 512 $CKPT_ARGS_512 \
    --quant --w_bit 4 --a_bit 4 \
    --weight_quant per_group --act_quant per_group --act_sym \
    --activation_fp_quant --weight_fp_quant \
    --act_fp_type fp_e2 --weight_fp_type fp_e2 \
    --fc2_fp_type fp_e1m2_neg_e2m1_pos \
    --rotate --block_rotate --transform --out figs_d36_fp4

# FP4 + KV cache quantization (run.sh:19)
python scripts/evaluate.py --depth 36 --resolution 512 $CKPT_ARGS_512 \
    --quant --w_bit 4 --a_bit 4 \
    --weight_quant per_group --act_quant per_group --act_sym \
    --activation_fp_quant --weight_fp_quant \
    --act_fp_type fp_e2 --weight_fp_type fp_e2 \
    --fc2_fp_type fp_e1m2_neg_e2m1_pos \
    --rotate --block_rotate --transform --quant_kv --kv_bit 6 \
    --out figs_d36_fp4_kv6

# FP6 (run.sh:22)
python scripts/evaluate.py --depth 36 --resolution 512 $CKPT_ARGS_512 \
    --quant --w_bit 6 --a_bit 6 \
    --weight_quant per_channel --act_quant per_token --act_sym \
    --activation_fp_quant --weight_fp_quant \
    --act_fp_type fp6_e2m3 --weight_fp_type fp6_e2m3 \
    --fc2_fp_type fp6_int_neg_e2m3_pos --rotate --block_rotate \
    --out figs_d36_fp6

# FP6 + KV cache quantization (run.sh:25)
python scripts/evaluate.py --depth 36 --resolution 512 $CKPT_ARGS_512 \
    --quant --w_bit 6 --a_bit 6 \
    --weight_quant per_channel --act_quant per_token --act_sym \
    --activation_fp_quant --weight_fp_quant \
    --act_fp_type fp6_e2m3 --weight_fp_type fp6_e2m3 \
    --fc2_fp_type fp6_int_neg_e2m3_pos --rotate --block_rotate \
    --quant_kv --kv_bit 6 --out figs_d36_fp6_kv6

# ---------------- TPU deployment extras (no reference equivalent) --------

# int8-MXU execution of the same FP4 recipe (exact integer dots) + packed
# int8 KV cache — the HBM-capacity serving mode
# python scripts/evaluate.py --depth 30 $CKPT_ARGS --quant --w_bit 4 \
#     --a_bit 4 --weight_quant per_channel --act_quant per_token --act_sym \
#     --activation_fp_quant --weight_fp_quant --act_fp_type fp_e2 \
#     --weight_fp_type fp_e2 --fc2_fp_type fp_e1m2_neg_e2m1_pos \
#     --rotate --block_rotate --transform --quant_kv --kv_bit 4 \
#     --backend int8 --kv_backend packed --out figs_d30_int8kv

# sharded eval on a dp×tp mesh: add  --dp 2 --tp 4
# multi-host: add  --coordinator host0:8476 --num-hosts 2 --host-id $RANK

# ---------------- Acceptance gate (one command) --------------------------
# The whole protocol — calibration -> GALT -> 50k-image generation
# (resumable) -> npz pack -> IS/FID/sFID/Precision/Recall -> verdict vs the
# published table (BASELINE.md) — behind a single command; every stage
# resumes from its on-disk artifact.  --tiny runs the same chain as a
# smoke test in ~2 min on CPU.
# python scripts/acceptance.py --recipe fp4 --depth 30 \
#     --var-ckpt var_d30.pth --vae-ckpt vae_ch160v4096z32.pth \
#     --inception-ckpt pt_inception-2015-12-05.pth \
#     --ref-npz VIRTUAL_imagenet256_labeled.npz --with-fp16 --out acceptance/
