"""ICI/HBM comms accounting for multi-chip decode + training (VERDICT r4 #6b).

Real multi-chip hardware is not available in this environment, so this
tool is the multi-chip performance evidence: an analytic model of the
bytes each chip moves per decode step / per train step, priced against
TPU v5e bandwidths, anchored at the MEASURED single-chip decode step
(tools/profile_decode.py).  It answers "what RTF/chip do 2/4/8 chips
deliver, and does TP v2's weight-split pay for its extra collective?"
— the question the reference's latent NCCL path never had to answer
(it pins one GPU, reference run.sh:1).

Model (documented, all terms printed):

- HBM bytes/chip/step = weights (int8; split per ttasr.parallel.tp v1
  replicates wo/wo_c/MLP/unembed, v2 ROW-splits wo/wo_c/w2 and
  col-splits wqkv/wq_c/w1 so only the unembed replicates) + self-KV
  (int8, split over data x model) + cross-KV (int4, ditto) + scales.
- ICI bytes/chip/step = per layer: v1 gathers merged attn + cross
  (2 all_gathers of (BK_local, D) f32, each chip receiving
  (m-1)/m of the full buffer over the model axis); v2 psums 3 partial
  sums of the same shape (ring all-reduce: 2 (m-1)/m traffic).
- step time(mesh) = measured_step - marginal_hbm_rate * hbm_bytes_saved
  + ici_time: the batch-48 profile showed cache bytes converting ~1:1
  into step time at an effective ~166 GB/s under contention (int8->int4
  cross A/B: 8.85 ms per 1.47 GB), so per-chip byte REDUCTIONS are
  credited at that marginal rate, and ICI time is added unoverlapped
  (conservative).  The decode loop is sequential per token, so
  RTF/chip = step_time * steps / (audio_s * n_chips).
- train step: grads all-reduce over data (ring), ZeRO-1 moment
  all-gather; sized from real param bytes.

v5e constants (public: cloud.google.com/tpu/docs/v5e, "How to Scale
Your Model" §TPUs): HBM 819 GB/s; ICI 45 GB/s one-way per link, 2D
torus so a 1-D ring uses 2 links bidirectionally -> 90 GB/s effective
all-reduce injection per chip.

    python tools/comms_accounting.py --model large-v3 --batch 48 --beam 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0           # v5e HBM bandwidth
ICI_LINK_GBPS = 45.0       # one-way per link
ICI_RING_GBPS = 90.0       # 1-D bidirectional ring injection per chip
# batch-48 decode-step anchor (tools/profile_decode.py, PERF_NOTES r4):
MEASURED_STEP_MS = 41.12   # beam_step_marginal, batch 48 / beam 5 / len 144
MEASURED_BATCH = 48
MEASURED_BEAM = 5
MEASURED_LEN = 144         # cache bucket the profile ran at
# marginal ms per GB of per-step HBM bytes removed (int8->int4 cross
# A/B: 44.24 -> 35.39 ms for 1.47 GB less traffic => ~6.0 ms/GB, an
# effective ~166 GB/s under contention)
MARGINAL_MS_PER_GB = 6.02


def model_shapes(model: str):
    from ttasr.models.whisper.config import get_config

    cfg = get_config(model)
    return cfg


def decode_step_bytes(cfg, *, batch: int, beam: int, cache_len: int,
                      s_enc: int, data: int, model_axis: int,
                      row_parallel: bool) -> dict:
    """Per-chip bytes one decode step moves, by class (GB)."""
    d, L, h = cfg.d_model, cfg.decoder_layers, cfg.decoder_heads
    ffn, V = cfg.ffn_dim, cfg.vocab_size
    n = data * model_axis
    m = model_axis
    bk = batch * beam
    bk_local = bk / data

    # ---- weights (int8 = 1 byte/param), per layer ----
    qkv = 3 * d * d / m                     # col-split (v1 and v2)
    wq_c = d * d / m                        # col-split
    wo = d * d / (m if row_parallel else 1)
    wo_c = d * d / (m if row_parallel else 1)
    w1 = d * ffn / (m if row_parallel else 1)
    w2 = ffn * d / (m if row_parallel else 1)
    unembed = d * V                          # replicated (top-k needs full V)
    weights = L * (qkv + wq_c + wo + wo_c + w1 + w2) + unembed

    # ---- caches: per LAYER (each layer reads its own cache every
    # step — the x32 is why caches dominate weights at large batch);
    # batch splits over data, heads over model ----
    self_kv = L * 2 * bk * cache_len * d / n          # int8 flat
    self_scales = L * 2 * bk * cache_len * h * 4 / n  # f32 (H, len) planes
    cross_kv = L * 2 * batch * s_enc * d * 0.5 / n    # int4 packed
    cross_scales = L * 2 * batch * s_enc * h * 4 / n
    hbm = weights + self_kv + self_scales + cross_kv + cross_scales

    # ---- ICI per step (f32 activations), model axis only ----
    buf = bk_local * d * 4
    if m == 1:
        ici = 0.0
    elif row_parallel:
        ici = L * 3 * 2 * (m - 1) / m * buf       # 3 ring all-reduces
    else:
        ici = L * 2 * (m - 1) / m * buf           # 2 all_gathers
    g = 1024 ** 3
    return {
        "weights_gb": weights / g, "self_kv_gb": (self_kv + self_scales) / g,
        "cross_kv_gb": (cross_kv + cross_scales) / g,
        "hbm_gb": hbm / g, "ici_gb": ici / g,
        "ici_collectives_per_step": 0 if m == 1 else L * (3 if row_parallel
                                                          else 2),
    }


def predict_step_ms(per_chip: dict, single_chip: dict,
                    measured_ms: float = MEASURED_STEP_MS) -> dict:
    """Marginal model anchored at the measured single-chip step."""
    saved_gb = single_chip["hbm_gb"] - per_chip["hbm_gb"]
    hbm_ms = measured_ms - MARGINAL_MS_PER_GB * saved_gb
    # floor: pure roofline (bytes at full HBM rate) — the model never
    # predicts below it
    floor_ms = per_chip["hbm_gb"] * 1024 ** 3 / (HBM_GBPS * 1e9) * 1e3
    hbm_ms = max(hbm_ms, floor_ms)
    ici_ms = per_chip["ici_gb"] * 1024 ** 3 / (ICI_RING_GBPS * 1e9) * 1e3
    # per-collective latency: ~1 us dispatch + link latency each, times
    # collective count (sequential inside the layer scan)
    ici_lat_ms = per_chip["ici_collectives_per_step"] * 1.5e-3
    return {"hbm_ms": hbm_ms, "ici_ms": ici_ms + ici_lat_ms,
            "step_ms": hbm_ms + ici_ms + ici_lat_ms}


def decode_table(model: str = "large-v3", batch: int = 48, beam: int = 5,
                 cache_len: int = MEASURED_LEN, tokens: int = 128,
                 audio_s: float = 30.0) -> list:
    cfg = model_shapes(model)
    s_enc = cfg.max_source_positions
    rows = []
    single = decode_step_bytes(cfg, batch=batch, beam=beam,
                               cache_len=cache_len, s_enc=s_enc,
                               data=1, model_axis=1, row_parallel=False)
    for chips, (data, m) in [(1, (1, 1)), (2, (1, 2)), (4, (2, 2)),
                             (8, (4, 2)), (8, (2, 4))]:
        for v2 in ((False,) if m == 1 else (False, True)):
            per = decode_step_bytes(cfg, batch=batch, beam=beam,
                                    cache_len=cache_len, s_enc=s_enc,
                                    data=data, model_axis=m,
                                    row_parallel=v2)
            t = predict_step_ms(per, single)
            # whole-batch RTF/chip: `batch` windows of `audio_s` seconds
            # decode `tokens` steps; chips divide the wall per window
            rtf_chip = (t["step_ms"] / 1e3 * tokens) / (batch * audio_s
                                                        * chips)
            rows.append({
                "chips": chips, "mesh": f"({data},{m})",
                "tp": "v2" if v2 else ("v1" if m > 1 else "-"),
                **{k: round(v, 4) for k, v in per.items()},
                **{k: round(v, 3) for k, v in t.items()},
                "rtf_per_chip_decode": round(rtf_chip, 5),
            })
    return rows


def train_table(model: str = "large-v3", data: int = 4, model_axis: int = 2,
                dcn: int = 1) -> dict:
    """Per-train-step collective bytes from real param shapes."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.model import init_params

    cfg = model_shapes(model)
    abstract = jax.eval_shape(
        lambda: init_params(cfg, seed=0, dtype=jnp.float32))
    param_bytes = sum(x.size * 4 for x in jax.tree.leaves(abstract))
    n = data
    g = 1024 ** 3
    # grads all-reduce over data (ring): 2 (n-1)/n of grad bytes per chip
    grad_ar = 2 * (n - 1) / n * param_bytes
    # ZeRO-1: each chip updates 1/n of the moments then all-gathers its
    # param shard: (n-1)/n of param bytes received per chip
    zero1_ag = (n - 1) / n * param_bytes
    bw = ICI_RING_GBPS if dcn == 1 else 6.25  # DCN ~50 Gbps/chip one-way
    ms = (grad_ar + zero1_ag) / (bw * 1e9) * 1e3
    return {"param_bytes_gb": round(param_bytes / g, 2),
            "grad_allreduce_gb_per_chip": round(grad_ar / g, 2),
            "zero1_allgather_gb_per_chip": round(zero1_ag / g, 2),
            "comm_ms_per_step": round(ms, 1),
            "link": "ICI" if dcn == 1 else "DCN",
            "note": ("overlappable with backward compute; measured "
                     "v5e step at whisper-medium b4 is 382 ms "
                     "(tools/bench_train_step.py)")}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3")
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    rows = decode_table(args.model, args.batch, args.beam)
    train = train_table(args.model)
    if args.json:
        print(json.dumps({"decode": rows, "train": train}))
        return
    cols = ["chips", "mesh", "tp", "weights_gb", "self_kv_gb",
            "cross_kv_gb", "hbm_gb", "ici_gb", "hbm_ms", "ici_ms",
            "step_ms", "rtf_per_chip_decode"]
    print(f"decode step accounting — {args.model}, batch {args.batch}, "
          f"beam {args.beam}, len {MEASURED_LEN} "
          f"(anchored at measured {MEASURED_STEP_MS} ms single-chip)")
    print(" | ".join(f"{c:>10s}" for c in cols))
    for r in rows:
        print(" | ".join(f"{r[c]:>10}" for c in cols))
    print("\ntrain step collectives (data=4, model=2, ZeRO-1):")
    for k, v in train.items():
        print(f"  {k}: {v}")
    print("\nreading: TP v2 splits the wo/wo_c/MLP weight stream (v1 "
          "replicates it), paying one extra (BK_local, D) collective "
          "per layer; the table prices both against v5e ICI so the "
          "crossover is explicit instead of assumed.")


if __name__ == "__main__":
    main()
