"""Measure the torch reference's per-rollout-step cost on this host's CPU.

The reference publishes no throughput numbers (BASELINE.md), so bench.py's
`vs_baseline` divides by an ESTIMATED 25k agent-steps/s on the reference's
eval GPU (1x RTX 2080 Ti). This tool replaces guesswork with a measurement:
it loads the LIVING reference model from /root/reference/src (the same
mechanism as tests/ref_compat.py), builds it at FULL scale (hidden 128,
3+3 cross-attn layers, 3-layer interaction, 3-layer GRU, 64 agents,
1024x20 map polylines, 100 traffic lights — configs/model/traffic_bots.yaml)
and times, under torch.no_grad on CPU:

  * encode_input_features (once per episode; map encoder dominates), and
  * the 90x per-step policy forward (as2pl -> as2tl -> interaction -> GRU
    -> add_goal -> add_latent), the reference's Python-stepped hot loop
    (ref waymo_motion.py:269-352).

What it deliberately EXCLUDES: per-step re-featurization, dynamics, the
rule checker, reward and buffer appends — so the measured per-step cost is
a LOWER bound on the reference's true rollout cost, i.e. the implied
agent-steps/s is an UPPER bound (conservative for our speedup claims).

The printed JSON carries the raw CPU numbers plus a 2080 Ti extrapolation
band; the derivation and its error bars live in BASELINE.md.

Usage:  python tools/bench_torch_reference.py  [BATCH=4] [N_STEPS=90]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

# GPU/CPU throughput ratio band for the 2080 Ti extrapolation (documented in
# BASELINE.md): a 2080 Ti sustains ~10-50x a single modern server CPU core on
# fp16 transformer inference at these tiny dims (128-wide, batch 4), where
# kernel-launch overhead caps GPU utilization.
GPU_CPU_RATIO_LOW, GPU_CPU_RATIO_MID, GPU_CPU_RATIO_HIGH = 10.0, 25.0, 50.0


def main():
    import ref_compat  # installs hydra/transforms3d/torchmetrics stubs, sys.path

    ref_compat.setup_reference()
    import torch

    from models.traffic_bots import TrafficBots as RefTB
    from models.modules.distributions import DiagGaussian
    from ref_compat import AttrDict

    torch.manual_seed(0)
    B = int(os.environ.get("BATCH", "4"))  # ref trains batch 4/GPU
    A, PL, NODE, TL = 64, 1024, 20, 100
    D, PE, LATENT = 128, 96, 16
    N_STEPS = int(os.environ.get("N_STEPS", "90"))
    T_HIST = 11
    AGENT_ATTR, MAP_ATTR, TL_ATTR = 11, 11 + NODE, 5

    tf_cfg = AttrDict(d_model=D, n_head=4, d_feedforward=D, dropout_p=0.1,
                      activation="relu", norm_first=True, decoder_self_attn=False,
                      bias=True, out_layernorm=False)
    mlp_cfg = AttrDict(use_layernorm=False, activation="relu", dropout_p=0.1)
    dist_cfg = AttrDict(dist_type="diag_gaus", use_layernorm=False, log_std=-1.0)
    model = RefTB(
        hidden_dim=D, map_attr_dim=MAP_ATTR, tl_attr_dim=TL_ATTR,
        agent_attr_dim=AGENT_ATTR, map_pe_dim=PE, tl_pe_dim=PE, agent_pe_dim=PE,
        map_encoder=AttrDict(densetnt_vectornet=True, pool_mode="max", n_layer=3,
                             mlp_dropout_p=0.1, mlp_use_layernorm=False),
        input_pe_encoder=AttrDict(pe_mode="cat", n_layer=2, mlp_dropout_p=0.1,
                                  mlp_use_layernorm=False),
        goal_manager=AttrDict(
            goal_attr_mode="dest", goal_in_local=True, dest_detach_map_feature=False,
            disable_if_reached=True,
            goal_predictor=AttrDict(mode="mlp", n_layer_gru=3, use_layernorm=True,
                                    res_add_gru=True, detach_features=True),
        ),
        latent_encoder=AttrDict(
            latent_dim=LATENT, temporal_down_sample_rate=5,
            shared_post_prior_net=False, shared_transformer_as=True,
            latent_prior=AttrDict(dist_cfg), latent_post=AttrDict(dist_cfg),
        ),
        tf_cfg=tf_cfg, n_layer_tf_as2pl=3, n_layer_tf_as2tl=3,
        n_step_hist=T_HIST, n_pl_node=NODE,
        temporal_aggregate=AttrDict(mode="max_valid"),
        agent_temporal={"_target_": "models.modules.agent_temporal.MultiAgentGRULoop",
                        "num_layers": 3, "dropout": 0.1},
        agent_interaction=AttrDict(n_layer=3, mask_self_agent=True, detach_tgt=False,
                                   attn_to_map_aware_feature=True),
        add_latent=AttrDict(mode="cat", res_cat=False, res_add=True,
                            n_layer_mlp_in=2, n_layer_mlp_out=2,
                            mlp_in_cfg=AttrDict(mlp_cfg), mlp_out_cfg=AttrDict(mlp_cfg)),
        add_goal=AttrDict(mode="cat", res_cat=False, res_add=True,
                          n_layer_mlp_in=3, n_layer_mlp_out=2,
                          mlp_in_cfg=AttrDict(use_layernorm=True, activation="relu",
                                              dropout_p=0.1),
                          mlp_out_cfg=AttrDict(mlp_cfg)),
        interaction_first=True, add_goal_latent_first=False,
        resample_latent=False, n_layer_final_mlp=-1, final_mlp=AttrDict(mlp_cfg),
    ).eval()
    n_params = sum(p.numel() for p in model.parameters())

    g = torch.Generator().manual_seed(1)

    def rand(*shape):
        return torch.randn(*shape, generator=g)

    with torch.no_grad():
        # ---- per-episode encode (ref traffic_bots.py:109-151)
        enc_args = dict(
            agent_valid=torch.ones(B, T_HIST, A, dtype=torch.bool),
            agent_attr=rand(B, T_HIST, A, AGENT_ATTR),
            agent_pe=rand(B, T_HIST, A, PE),
            agent_pos=rand(B, T_HIST, A, 2),
            map_valid=torch.rand(B, PL, NODE, generator=g) > 0.1,
            map_attr=rand(B, PL, NODE, MAP_ATTR),
            map_pe=rand(B, PL, NODE, PE),
            map_pos=rand(B, PL, 2),
            tl_valid=torch.ones(B, T_HIST, TL, dtype=torch.bool),
            tl_attr=rand(B, T_HIST, TL, TL_ATTR),
            tl_pe=rand(B, T_HIST, TL, PE),
            tl_pos=rand(B, T_HIST, TL, 2),
        )
        model.encode_input_features(**enc_args)  # warmup
        t0 = time.perf_counter()
        feats = model.encode_input_features(**enc_args)
        encode_s = time.perf_counter() - t0

        # ---- 90-step policy forward loop (ref waymo_motion.py:269-352)
        latent = DiagGaussian(rand(B, A, LATENT), rand(B, A, LATENT) * 0.1 - 1.0)
        step_args = dict(
            agent_valid=torch.ones(B, A, dtype=torch.bool),
            agent_feature=rand(B, A, D),
            map_valid=feats["map_feature_valid"],
            map_feature=feats["map_feature"],
            tl_valid=torch.ones(B, TL, dtype=torch.bool),
            tl_feature=rand(B, TL, D),
            goal_valid=torch.ones(B, A, dtype=torch.bool),
            goal_feature=rand(B, A, D),
        )
        model.init(latent, deterministic=True)
        for _ in range(3):  # warmup
            model.forward(**step_args)

        model.init(latent, deterministic=True)
        t0 = time.perf_counter()
        for _ in range(N_STEPS):
            model.forward(**step_args)
        loop_s = time.perf_counter() - t0

    per_step_ms = loop_s / N_STEPS * 1e3
    rollout_s = encode_s + loop_s
    cpu_asps = B * A * N_STEPS / rollout_s
    print(json.dumps({
        "metric": "reference_cpu_rollout",
        "torch_threads": __import__("torch").get_num_threads(),
        "n_params": n_params,
        "batch": B, "n_steps": N_STEPS,
        "encode_ms": round(encode_s * 1e3, 1),
        "per_step_ms": round(per_step_ms, 2),
        "cpu_agent_steps_per_sec": round(cpu_asps, 1),
        "gpu_extrapolation_agent_steps_per_sec": {
            "low_x10": round(cpu_asps * GPU_CPU_RATIO_LOW, 1),
            "mid_x25": round(cpu_asps * GPU_CPU_RATIO_MID, 1),
            "high_x50": round(cpu_asps * GPU_CPU_RATIO_HIGH, 1),
        },
        "note": "per-step cost EXCLUDES featurize/dynamics/rules -> this "
                "over-estimates reference throughput (conservative for the "
                "rebuild's vs_baseline multiple); see BASELINE.md",
    }))


if __name__ == "__main__":
    main()
