"""Capstone parity: the FULL TrafficBots model vs the torch reference.

Shared random weights across every submodule (map/tl/agent encoders, the
as2pl/as2tl cross-attention stacks, the CVAE latent encoder sharing those
stacks, the destination predictor, goal/latent injection, interaction, GRU)
— then:
  1. encode_input_features must match,
  2. the latent posterior/prior distributions must match,
  3. the destination prediction must match,
  4. THREE consecutive policy steps with carried GRU hidden must match the
     reference's stateful forward (the closed-loop hot path).
"""
import numpy as np
import pytest

import ref_compat  # noqa: F401

import jax
import jax.numpy as jnp
import torch

from ref_compat import (
    AttrDict, attention_params, gru_params, mlp_params, t2n, tf_block_params,
    tf_layer_params,
)

from trafficbots_tpu.config import (
    ActionHeadConfig, AgentInteractionConfig, AgentTemporalConfig,
    DistEncoderConfig, GoalManagerConfig, GoalPredictorConfig,
    InputPeEncoderConfig, LatentEncoderConfig, MapEncoderConfig, ModelConfig,
    TransformerConfig,
)
from trafficbots_tpu.models.traffic_bots import TrafficBots

D = 64
PE = 32  # pose-pe out dim (pe_xy_yaw with pe_dim=32)
N_PL, N_NODE, N_TL, A, T_HIST = 16, 10, 6, 5, 11
AGENT_ATTR, MAP_ATTR, TL_ATTR = 11, 11 + N_NODE, 5


def _ref_model():
    from models.traffic_bots import TrafficBots as RefTB

    tf_cfg = AttrDict(d_model=D, n_head=4, d_feedforward=64, dropout_p=0.1,
                      activation="relu", norm_first=True, decoder_self_attn=False,
                      bias=True, out_layernorm=False)
    mlp_cfg = AttrDict(use_layernorm=False, activation="relu", dropout_p=0.1)
    dist_cfg = AttrDict(dist_type="diag_gaus", use_layernorm=False, log_std=-1.0)
    ref = RefTB(
        hidden_dim=D, map_attr_dim=MAP_ATTR, tl_attr_dim=TL_ATTR,
        agent_attr_dim=AGENT_ATTR, map_pe_dim=PE, tl_pe_dim=PE, agent_pe_dim=PE,
        map_encoder=AttrDict(densetnt_vectornet=True, pool_mode="max", n_layer=1,
                             mlp_dropout_p=0.1, mlp_use_layernorm=False),
        input_pe_encoder=AttrDict(pe_mode="cat", n_layer=2, mlp_dropout_p=0.1,
                                  mlp_use_layernorm=False),
        goal_manager=AttrDict(
            goal_attr_mode="dest", goal_in_local=True, dest_detach_map_feature=False,
            disable_if_reached=True,
            goal_predictor=AttrDict(mode="mlp", n_layer_gru=1, use_layernorm=True,
                                    res_add_gru=True, detach_features=True),
        ),
        latent_encoder=AttrDict(
            latent_dim=8, temporal_down_sample_rate=5, shared_post_prior_net=False,
            shared_transformer_as=True, latent_prior=AttrDict(dist_cfg),
            latent_post=AttrDict(dist_cfg),
        ),
        tf_cfg=tf_cfg, n_layer_tf_as2pl=1, n_layer_tf_as2tl=1,
        n_step_hist=T_HIST, n_pl_node=N_NODE,
        temporal_aggregate=AttrDict(mode="max_valid"),
        agent_temporal={"_target_": "models.modules.agent_temporal.MultiAgentGRULoop",
                        "num_layers": 1, "dropout": 0.1},
        agent_interaction=AttrDict(n_layer=1, mask_self_agent=True, detach_tgt=False,
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
    return ref


def _our_model():
    cfg = ModelConfig(
        hidden_dim=D, pe_dim=32,
        tf_cfg=TransformerConfig(d_model=D, n_head=4, d_feedforward=64),
        n_layer_tf_as2pl=1, n_layer_tf_as2tl=1,
        input_pe_encoder=InputPeEncoderConfig(),
        map_encoder=MapEncoderConfig(n_layer=1),
        goal_manager=GoalManagerConfig(
            goal_predictor=GoalPredictorConfig(mode="mlp", n_layer_gru=1)
        ),
        latent_encoder=LatentEncoderConfig(
            latent_dim=8,
            latent_prior=DistEncoderConfig(dist_type="diag_gaus", log_std=-1.0),
            latent_post=DistEncoderConfig(dist_type="diag_gaus", log_std=-1.0),
        ),
        agent_temporal=AgentTemporalConfig(num_layers=1),
        agent_interaction=AgentInteractionConfig(n_layer=1),
    )
    return TrafficBots(cfg=cfg, action_head_cfg=ActionHeadConfig())


def _transfer_params(ref):
    """torch state -> our flax tree, exercising every mapping helper."""
    # map encoder (DenseTNT stacked layout, 1 layer)
    layers = [tf_layer_params(l, True) for l in ref.map_encoder.transformer_densetnt.layers]
    dt = {}
    dt["ln1_s"] = np.stack([l["norm1"]["scale"] for l in layers])
    dt["ln1_b"] = np.stack([l["norm1"]["bias"] for l in layers])
    dt["lnt_s"] = np.stack([l["norm_tgt"]["scale"] for l in layers])
    dt["lnt_b"] = np.stack([l["norm_tgt"]["bias"] for l in layers])
    dt["ln2_s"] = np.stack([l["norm2"]["scale"] for l in layers])
    dt["ln2_b"] = np.stack([l["norm2"]["bias"] for l in layers])
    for on, rn in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "out_proj")):
        dt[on] = np.stack([l["attn"][rn]["kernel"] for l in layers])
        dt["b" + on[1]] = np.stack([l["attn"][rn]["bias"] for l in layers])
    dt["w1"] = np.stack([l["linear1"]["kernel"] for l in layers])
    dt["b1"] = np.stack([l["linear1"]["bias"] for l in layers])
    dt["w2"] = np.stack([l["linear2"]["kernel"] for l in layers])
    dt["b2"] = np.stack([l["linear2"]["bias"] for l in layers])

    params = {
        "map_encoder": {
            "input_pe": {"mlp": mlp_params(ref.map_encoder.input_pe_encoder.mlp)},
            "densetnt": dt,
            "self_attn": tf_block_params(ref.map_encoder.transformer_self_attn, True),
        },
        "tl_encoder": {"mlp": mlp_params(ref.tl_encoder.mlp)},
        "agent_encoder": {"mlp": mlp_params(ref.agent_encoder.mlp)},
        "transformer_as2pl": tf_block_params(ref.transformer_as2pl, True),
        "transformer_as2tl": tf_block_params(ref.transformer_as2tl, True),
        "agent_temporal": gru_params(ref.agent_temporal.rnn, 1, D),
        "agent_interaction_tf": {"tf": tf_block_params(ref.agent_interaction.transformer, True)},
        "add_goal": {"mlp_in": mlp_params(ref.add_goal.mlp_in),
                     "mlp_out": mlp_params(ref.add_goal.mlp_out)},
        "add_latent": {"mlp_in": mlp_params(ref.add_latent.mlp_in),
                       "mlp_out": mlp_params(ref.add_latent.mlp_out)},
        "goal_manager": {"predictor": {
            "gru_as": gru_params(ref.goal_manager.goal_predictor.gru_as.rnn, 1, D),
            "mlp": mlp_params(ref.goal_manager.goal_predictor.mlp),
        }},
        "latent_encoder": {
            "prior_dist": {"mlp_mean": mlp_params(ref.latent_encoder.latent_prior_dist.mlp_mean),
                           "log_std": t2n(ref.latent_encoder.latent_prior_dist.log_std)},
            "post_dist": {"mlp_mean": mlp_params(ref.latent_encoder.latent_post_dist.mlp_mean),
                          "log_std": t2n(ref.latent_encoder.latent_post_dist.log_std)},
            "temporal_post": gru_params(ref.latent_encoder.agent_temporal_post.rnn, 1, D),
            "temporal_prior": gru_params(ref.latent_encoder.agent_temporal_prior.rnn, 1, D),
            "interaction_post": {"tf": tf_block_params(ref.latent_encoder.agent_interaction_post.transformer, True)},
            "interaction_prior": {"tf": tf_block_params(ref.latent_encoder.agent_interaction_prior.transformer, True)},
        },
        # action head is ours alone (the reference holds it on the
        # LightningModule); initialize fused-stacked zeros-compatible params
        "action_head": None,
    }
    return params


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(1)
    ref = _ref_model()
    ours = _our_model()
    rng = np.random.RandomState(40)
    B = 2
    view = dict(
        agent_valid=rng.rand(B, T_HIST, A) > 0.3,
        agent_attr=rng.randn(B, T_HIST, A, AGENT_ATTR).astype(np.float32),
        agent_pe=rng.randn(B, T_HIST, A, PE).astype(np.float32),
        agent_pos=rng.randn(B, T_HIST, A, 2).astype(np.float32),
        map_valid=rng.rand(B, N_PL, N_NODE) > 0.2,
        map_attr=rng.randn(B, N_PL, N_NODE, MAP_ATTR).astype(np.float32),
        map_pe=rng.randn(B, N_PL, N_NODE, PE).astype(np.float32),
        map_pos=rng.randn(B, N_PL, 2).astype(np.float32),
        tl_valid=rng.rand(B, T_HIST, N_TL) > 0.3,
        tl_attr=rng.randn(B, T_HIST, N_TL, TL_ATTR).astype(np.float32),
        tl_pe=rng.randn(B, T_HIST, N_TL, PE).astype(np.float32),
        tl_pos=rng.randn(B, T_HIST, N_TL, 2).astype(np.float32),
    )
    params = _transfer_params(ref)
    return ref, ours, params, view


def _full_init_params(ours, view, rng_batch):
    """Initialize every submodule of our model to get the full tree shape."""
    jview = {k: jnp.asarray(v) for k, v in view.items()}
    B, _, A_ = view["agent_valid"].shape

    def init_fn(mdl):
        feat = mdl.encode_input_features(**jview)
        mdl.latent(posterior=True, **feat)
        mdl.latent(posterior=False, **feat)
        mdl.pred_goal(
            agent_type=jnp.asarray(rng_batch["agent_type"]),
            map_type=jnp.asarray(rng_batch["map_type"]),
            agent_state=jnp.asarray(rng_batch["agent_state"]),
            **feat,
        )
        mdl.policy_step(
            agent_valid=jview["agent_valid"][:, 0],
            agent_feature=feat["agent_feature"][:, 0],
            map_valid=feat["map_feature_valid"],
            map_feature=feat["map_feature"],
            tl_valid=feat["tl_feature_valid"][:, 0],
            tl_feature=feat["tl_feature"][:, 0],
            goal_valid=jview["agent_valid"][:, 0],
            goal_feature=jnp.zeros((B, A_, D)),
            latent_sample=jnp.zeros((B, A_, 8)),
            hidden=mdl.init_hidden(B, A_),
            agent_type=jnp.asarray(rng_batch["agent_type"]),
        )

    return ours.init({"params": jax.random.PRNGKey(0)}, method=init_fn)["params"]


def test_full_model_parity(models):
    ref, ours, params, view = models
    rng = np.random.RandomState(41)
    B = 2
    agent_type = np.eye(3, dtype=bool)[rng.randint(0, 3, size=(B, A))]
    map_type = np.zeros((B, N_PL, 11), dtype=bool)
    map_type[np.arange(B)[:, None], np.arange(N_PL)[None], rng.randint(0, 5, size=(B, N_PL))] = True
    agent_state = rng.randn(B, T_HIST, A, 4).astype(np.float32)
    rng_batch = dict(agent_type=agent_type, map_type=map_type, agent_state=agent_state)

    full = _full_init_params(ours, view, rng_batch)
    # graft the transferred reference weights over the initialized tree
    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if v is None:
                continue
            out[k] = merge(dst[k], v) if isinstance(v, dict) and isinstance(dst.get(k), dict) else v
        return out

    params = merge(full, {k: v for k, v in params.items() if v is not None})

    tview = {k: torch.from_numpy(np.asarray(v)) for k, v in view.items()}
    jview = {k: jnp.asarray(v) for k, v in view.items()}

    # ---- 1. episode feature encoding
    r_feat = ref.encode_input_features(**tview)
    o_feat = ours.apply({"params": params}, method="encode_input_features",
                        deterministic=True, **jview)
    for k in ("map_feature", "agent_feature", "tl_feature"):
        np.testing.assert_allclose(np.asarray(o_feat[k]), t2n(r_feat[k]), atol=3e-5, err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(o_feat["map_feature_valid"]), t2n(r_feat["map_feature_valid"])
    )

    # ---- 2. latent distributions (shared as2pl/as2tl transformers)
    for posterior in (True, False):
        rd = ref.latent_encoder(
            r_feat["agent_feature"], tview["agent_valid"], r_feat["map_feature"],
            r_feat["map_feature_valid"], r_feat["tl_feature"], tview["tl_valid"],
            posterior=posterior,
        )
        od = ours.apply({"params": params}, method="latent", posterior=posterior, **o_feat)
        np.testing.assert_allclose(np.asarray(od.mean), t2n(rd.mean), atol=3e-5)
        np.testing.assert_allclose(np.asarray(od.stddev), t2n(rd.stddev), atol=3e-5)

    # ---- 3. destination prediction
    r_goal = ref.goal_manager.pred_goal(
        agent_type=torch.from_numpy(agent_type), map_type=torch.from_numpy(map_type),
        agent_state=torch.from_numpy(agent_state),
        agent_feature=r_feat["agent_feature"], agent_feature_valid=tview["agent_valid"],
        map_feature=r_feat["map_feature"], map_feature_valid=r_feat["map_feature_valid"],
    )
    o_goal = ours.apply(
        {"params": params}, method="pred_goal",
        agent_type=jnp.asarray(agent_type), map_type=jnp.asarray(map_type),
        agent_state=jnp.asarray(agent_state), **o_feat,
    )
    np.testing.assert_allclose(np.asarray(o_goal.probs), t2n(r_goal.probs), atol=3e-5)

    # ---- 4. three policy steps with carried hidden (the closed-loop path)
    latent_sample = t2n(rd.mean)  # deterministic sample == mean
    dest = t2n(r_goal.probs).argmax(-1)
    r_goal_feat = t2n(r_feat["map_feature"])[np.arange(B)[:, None], dest]
    goal_valid = view["agent_valid"].any(1)

    class _FakeDist:
        def __init__(self, mean):
            self.mean = torch.from_numpy(mean)

        def sample(self, det):
            return self.mean

        def log_prob(self, x):
            return self.mean[..., 0] * 0.0

    ref.init(_FakeDist(latent_sample), deterministic=True)
    h = None  # implicit in ref; ours explicit
    o_hidden = ours.init_hidden(B, A)
    for step in range(3):
        av = view["agent_valid"][:, min(step, T_HIST - 1)]
        af = rng.randn(B, A, D).astype(np.float32)
        tlv = view["tl_valid"][:, min(step, T_HIST - 1)]
        tlf = t2n(r_feat["tl_feature"])[:, min(step, T_HIST - 1)]

        r_pf, _, _, _, _ = ref(
            torch.from_numpy(av), torch.from_numpy(af),
            r_feat["map_feature_valid"], r_feat["map_feature"],
            torch.from_numpy(tlv), torch.from_numpy(tlf),
            torch.from_numpy(goal_valid), torch.from_numpy(r_goal_feat),
        )
        _, _, o_hidden, o_pf, _ = ours.apply(
            {"params": params}, method="policy_step",
            agent_valid=jnp.asarray(av), agent_feature=jnp.asarray(af),
            map_valid=jnp.asarray(np.asarray(o_feat["map_feature_valid"])),
            map_feature=o_feat["map_feature"],
            tl_valid=jnp.asarray(tlv), tl_feature=jnp.asarray(tlf),
            goal_valid=jnp.asarray(goal_valid), goal_feature=jnp.asarray(r_goal_feat),
            latent_sample=jnp.asarray(latent_sample), hidden=o_hidden,
            agent_type=jnp.asarray(agent_type),
        )
        np.testing.assert_allclose(
            np.asarray(o_pf), t2n(r_pf), atol=5e-5, err_msg=f"policy step {step}"
        )
