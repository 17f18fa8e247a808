"""Numerical parity vs the LIVING reference (torch CPU), shared random weights.

Each test loads the reference module from /root/reference/src, transfers its
weights into our flax module via ref_compat, runs both on identical inputs
and asserts fp32 agreement (<=1e-5; tighter for pure physics). This measures
the bit-parity the docstrings claim instead of re-deriving it from formulas.
"""
import numpy as np
import pytest

import ref_compat  # noqa: F401  (installs stubs + sys.path)

import jax
import jax.numpy as jnp
import torch

from ref_compat import (
    attention_params,
    gru_params,
    mlp_params,
    t2n,
    tf_block_params,
)

torch.manual_seed(0)

ATOL = 1e-5


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Positional encodings (parameterless)
# ---------------------------------------------------------------------------

def test_positional_embedding_parity():
    from utils.pos_emb import PositionalEmbedding, PositionalEmbeddingRad
    from trafficbots_tpu.geometry import positional_embedding, positional_embedding_rad

    x = np.random.RandomState(0).uniform(-50, 50, size=(3, 7)).astype(np.float32)
    for dim, theta in ((24, 1e3), (48, 1e1), (16, 1e4)):
        ref = PositionalEmbedding(dim=dim, theta=theta)(torch.from_numpy(x))
        ours = positional_embedding(jnp.asarray(x), dim, theta)
        np.testing.assert_allclose(_np(ours), t2n(ref), atol=ATOL)
    yaw = np.random.RandomState(1).uniform(-np.pi, np.pi, size=(5, 4)).astype(np.float32)
    for dim in (2, 48):
        ref = PositionalEmbeddingRad(dim=dim)(torch.from_numpy(yaw))
        ours = positional_embedding_rad(jnp.asarray(yaw), dim)
        np.testing.assert_allclose(_np(ours), t2n(ref), atol=ATOL)


@pytest.mark.parametrize("mode", ["xy_dir", "mpa_pl", "pe_xy_unit_dir", "pe_xy_dir", "pe_xy_yaw"])
@pytest.mark.parametrize("dir_last", [1, 2])
def test_pose_pe_parity(mode, dir_last):
    from utils.pose_pe import PosePE
    from trafficbots_tpu.geometry import pose_pe

    rng = np.random.RandomState(2)
    xy = rng.uniform(-100, 100, size=(2, 6, 2)).astype(np.float32)
    if dir_last == 1:
        d = rng.uniform(-np.pi, np.pi, size=(2, 6, 1)).astype(np.float32)
    else:
        d = rng.uniform(-1, 1, size=(2, 6, 2)).astype(np.float32)
    ref_mod = PosePE(mode, pe_dim=96)
    ref = ref_mod(torch.from_numpy(xy), torch.from_numpy(d))
    ours = pose_pe(jnp.asarray(xy), jnp.asarray(d), mode, 96)
    assert ours.shape[-1] == ref_mod.out_dim
    np.testing.assert_allclose(_np(ours), t2n(ref), atol=ATOL)


# ---------------------------------------------------------------------------
# MLP (fill-invalid-before-end-activation quirk)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_layernorm", [False, True])
@pytest.mark.parametrize("end_act", [False, True])
def test_mlp_parity(use_layernorm, end_act):
    from models.modules.mlp import MLP as RefMLP
    from trafficbots_tpu.models.modules import MLP

    rng = np.random.RandomState(3)
    x = rng.randn(4, 5, 16).astype(np.float32)
    valid = rng.rand(4, 5) > 0.3

    ref = RefMLP([16, 32, 8], dropout_p=0.1, use_layernorm=use_layernorm,
                 end_layer_activation=end_act).eval()
    ours = MLP([32, 8], dropout_p=0.1, use_layernorm=use_layernorm,
               end_layer_activation=end_act)
    params = mlp_params(ref)

    for fill in (0.0, -7.5):
        r = ref(torch.from_numpy(x), torch.from_numpy(valid), fill_invalid=fill)
        o = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(valid),
                       fill_invalid=fill, deterministic=True)
        np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)


# ---------------------------------------------------------------------------
# Attention (self, cross, NaN guard, mean-head weights)
# ---------------------------------------------------------------------------

def _mk_attention(d_model=32, n_head=4):
    from models.modules.attention import Attention as RefAttention
    from trafficbots_tpu.models.modules import Attention

    ref = RefAttention(d_model=d_model, n_head=n_head, dropout_p=0.1).eval()
    ours = Attention(d_model=d_model, n_head=n_head, dropout_p=0.1, fused=False)
    return ref, ours, attention_params(ref)


def test_attention_self_parity():
    ref, ours, params = _mk_attention()
    rng = np.random.RandomState(4)
    src = rng.randn(3, 10, 32).astype(np.float32)
    pad = rng.rand(3, 10) > 0.5
    pad[0] = True  # entire batch row invalid -> NaN guard path
    r, rw = ref(torch.from_numpy(src), tgt_padding_mask=torch.from_numpy(pad), need_weights=True)
    o, ow = ours.apply({"params": params}, jnp.asarray(src),
                       tgt_padding_mask=jnp.asarray(pad), need_weights=True)
    np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)
    np.testing.assert_allclose(_np(ow), t2n(rw), atol=ATOL)
    assert np.isfinite(_np(o)).all()


def test_attention_cross_parity():
    ref, ours, params = _mk_attention()
    rng = np.random.RandomState(5)
    src = rng.randn(2, 6, 32).astype(np.float32)
    tgt = rng.randn(2, 12, 32).astype(np.float32)
    pad = rng.rand(2, 12) > 0.4
    am = rng.rand(2, 6, 12) > 0.7
    r, _ = ref(torch.from_numpy(src), torch.from_numpy(tgt),
               tgt_padding_mask=torch.from_numpy(pad), attn_mask=torch.from_numpy(am))
    o, _ = ours.apply({"params": params}, jnp.asarray(src), tgt=jnp.asarray(tgt),
                      tgt_padding_mask=jnp.asarray(pad), attn_mask=jnp.asarray(am))
    np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)


# ---------------------------------------------------------------------------
# TransformerBlock (pre/post norm, FFN / DenseTNT variants)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm_first", [True, False])
@pytest.mark.parametrize("d_ff", [64, 0])
def test_transformer_block_parity(norm_first, d_ff):
    from models.modules.transformer import TransformerBlock as RefBlock
    from trafficbots_tpu.models.modules import TransformerBlock

    ref = RefBlock(d_model=32, n_head=4, d_feedforward=d_ff, dropout_p=0.1,
                   n_layer=2, norm_first=norm_first, out_layernorm=True).eval()
    ours = TransformerBlock(d_model=32, n_head=4, d_feedforward=d_ff, dropout_p=0.1,
                            n_layer=2, norm_first=norm_first, out_layernorm=True)
    params = tf_block_params(ref, norm_first)

    rng = np.random.RandomState(6)
    src = rng.randn(2, 8, 32).astype(np.float32)
    tgt = rng.randn(2, 14, 32).astype(np.float32)
    src_pad = rng.rand(2, 8) > 0.7
    tgt_pad = rng.rand(2, 14) > 0.5

    r, _ = ref(torch.from_numpy(src.copy()), src_padding_mask=torch.from_numpy(src_pad),
               tgt=torch.from_numpy(tgt), tgt_padding_mask=torch.from_numpy(tgt_pad))
    o, _ = ours.apply({"params": params}, jnp.asarray(src),
                      src_padding_mask=jnp.asarray(src_pad), tgt=jnp.asarray(tgt),
                      tgt_padding_mask=jnp.asarray(tgt_pad))
    np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)

    # self-attention path
    r, _ = ref(torch.from_numpy(src.copy()), src_padding_mask=torch.from_numpy(src_pad))
    o, _ = ours.apply({"params": params}, jnp.asarray(src),
                      src_padding_mask=jnp.asarray(src_pad))
    np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)


def test_transformer_kv_cache_matches_reference():
    """Our K/V-hoisted rollout path must equal the reference's plain forward."""
    from models.modules.transformer import TransformerBlock as RefBlock
    from trafficbots_tpu.models.modules import TransformerBlock

    ref = RefBlock(d_model=32, n_head=4, d_feedforward=64, n_layer=2,
                   norm_first=True, dropout_p=0.1).eval()
    ours = TransformerBlock(d_model=32, n_head=4, d_feedforward=64, n_layer=2,
                            norm_first=True, dropout_p=0.1)
    params = tf_block_params(ref, True)

    rng = np.random.RandomState(7)
    src = rng.randn(2, 8, 32).astype(np.float32)
    tgt = rng.randn(2, 14, 32).astype(np.float32)
    tgt_pad = rng.rand(2, 14) > 0.5

    kv = ours.apply({"params": params}, None, tgt=jnp.asarray(tgt), return_tgt_kv=True)
    o, _ = ours.apply({"params": params}, jnp.asarray(src),
                      tgt_padding_mask=jnp.asarray(tgt_pad), tgt_kv=kv)
    r, _ = ref(torch.from_numpy(src.copy()), tgt=torch.from_numpy(tgt),
               tgt_padding_mask=torch.from_numpy(tgt_pad))
    np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)


# ---------------------------------------------------------------------------
# GRU (MultiAgentGRULoop; z-gate sign mapping)
# ---------------------------------------------------------------------------

def test_gru_loop_parity():
    from models.modules.agent_temporal import MultiAgentGRULoop
    from trafficbots_tpu.models.modules import StackedGRU

    H, L = 16, 3
    ref = MultiAgentGRULoop(H, L, dropout=0.1).eval()
    ours = StackedGRU(hidden_dim=H, num_layers=L, dropout=0.1)
    params = gru_params(ref.rnn, L, H)

    rng = np.random.RandomState(8)
    B, T, A = 2, 5, 3
    x = rng.randn(B, T, A, H).astype(np.float32)
    valid = rng.rand(B, T, A) > 0.3

    # sequence mode
    r, _ = ref(torch.from_numpy(x), torch.from_numpy(valid))
    o, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(valid))
    np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)

    # single-step mode with carried hidden (the rollout path)
    h_t = torch.zeros(L, B * A, H)
    h_j = jnp.zeros((L, B, A, H))
    for t in range(T):
        r, h_t = ref(torch.from_numpy(x[:, t]), torch.from_numpy(valid[:, t]), h_t)
        o, h_j = ours.apply({"params": params}, jnp.asarray(x[:, t]), jnp.asarray(valid[:, t]), h_j)
        np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL, err_msg=f"step {t}")
        np.testing.assert_allclose(
            _np(h_j.reshape(L, B * A, H)), t2n(h_t), atol=ATOL, err_msg=f"hidden step {t}"
        )


def test_temporal_aggregate_parity():
    from models.modules.agent_temporal import TemporalAggregate
    from trafficbots_tpu.models.modules import temporal_aggregate

    rng = np.random.RandomState(9)
    x = rng.randn(2, 7, 4, 8).astype(np.float32)
    valid = rng.rand(2, 7, 4) > 0.4
    valid[0, :, 0] = False  # never-valid agent
    x = np.where(valid[..., None], x, 0.0).astype(np.float32)
    for mode in ("max", "last", "max_valid", "last_valid", "mean_valid"):
        r, rv = TemporalAggregate(mode)(torch.from_numpy(x.copy()), torch.from_numpy(valid))
        o, ov = temporal_aggregate(jnp.asarray(x), jnp.asarray(valid), mode)
        np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL, err_msg=mode)
        np.testing.assert_array_equal(_np(ov), t2n(rv), err_msg=mode)


# ---------------------------------------------------------------------------
# Dynamics (fp32 physics; exact op order)
# ---------------------------------------------------------------------------

def test_multipathpp_physics_parity():
    from utils.dynamics import MultiPathPP
    from trafficbots_tpu.sim.dynamics import _update_multipathpp

    rng = np.random.RandomState(10)
    B, A = 3, 5
    state = rng.uniform(-10, 10, size=(B, A, 4)).astype(np.float32)
    act_unb = rng.randn(B, A, 2).astype(np.float32)

    for max_acc, max_yaw, dns in ((5.0, 1.5, False), (7.0, 7.0, True)):
        ref = MultiPathPP(dt=0.1, max_acc=max_acc, max_yaw_rate=max_yaw, disable_neg_spd=dns)
        act_ref = ref.process_action(torch.from_numpy(act_unb))
        r_state, r_vel, r_acc, r_yawr = ref.update(torch.from_numpy(state.copy()), act_ref)

        act = jnp.tanh(jnp.asarray(act_unb)) * jnp.asarray([max_acc, max_yaw])
        np.testing.assert_allclose(_np(act), t2n(act_ref), atol=1e-6)
        o_state, o_vel = _update_multipathpp(
            jnp.asarray(state), act[..., 0], act[..., 1], 0.1,
            jnp.full((B, A), dns),
        )
        np.testing.assert_allclose(_np(o_state), t2n(r_state), atol=1e-6)
        np.testing.assert_allclose(_np(o_vel), t2n(r_vel), atol=1e-5)


def test_state_integrator_physics_parity():
    from utils.dynamics import StateIntegrator
    from trafficbots_tpu.sim.dynamics import _update_state_integrator

    rng = np.random.RandomState(11)
    B, A = 2, 4
    state = rng.uniform(-10, 10, size=(B, A, 4)).astype(np.float32)
    act_unb = rng.randn(B, A, 2).astype(np.float32)

    ref = StateIntegrator(dt=0.1, max_v=3.0)
    act_ref = ref.process_action(torch.from_numpy(act_unb))
    r_state, r_vel, r_acc, r_yawr = ref.update(torch.from_numpy(state.copy()), act_ref)

    act = jnp.tanh(jnp.asarray(act_unb)) * 3.0
    o_state, o_vel, o_acc, o_yawr = _update_state_integrator(jnp.asarray(state), act, 0.1)
    np.testing.assert_allclose(_np(o_state), t2n(r_state), atol=1e-6)
    np.testing.assert_allclose(_np(o_vel), t2n(r_vel), atol=1e-6)
    np.testing.assert_allclose(_np(o_acc), t2n(r_acc)[..., 0], atol=1e-5)
    np.testing.assert_allclose(_np(o_yawr), t2n(r_yawr)[..., 0], atol=1e-5)


def test_full_dynamics_update_parity():
    """Dynamics.update end-to-end (per-type dispatch, masking, log_prob)."""
    from utils.dynamics import Dynamics as RefDynamics
    from models.modules.distributions import DiagGaussian as RefDiagGaussian
    from trafficbots_tpu.sim.dynamics import (
        AgentState, dynamics_update, init_agent_state, make_dynamics_params,
    )
    from trafficbots_tpu.distributions import DiagGaussian

    rng = np.random.RandomState(12)
    B, A = 2, 6
    veh = {"_target_": "utils.dynamics.MultiPathPP", "max_acc": 5, "max_yaw_rate": 1.5}
    ped = {"_target_": "utils.dynamics.MultiPathPP", "max_acc": 7, "max_yaw_rate": 7}
    cyc = {"_target_": "utils.dynamics.MultiPathPP", "max_acc": 6, "max_yaw_rate": 3}
    ref = RefDynamics(veh, ped, cyc, dt=0.1)

    valid = rng.rand(B, A) > 0.2
    atype = np.eye(3, dtype=bool)[rng.randint(0, 3, size=(B, A))]
    state = rng.uniform(-10, 10, size=(B, A, 4)).astype(np.float32)
    vel = rng.randn(B, A, 2).astype(np.float32)
    acc = rng.randn(B, A, 1).astype(np.float32)
    yawr = rng.randn(B, A, 1).astype(np.float32)
    size = np.abs(rng.randn(B, A, 3)).astype(np.float32)

    mean = rng.randn(B, A, 2).astype(np.float32)
    log_std = rng.uniform(-2, 0, size=(B, A, 2)).astype(np.float32)

    ref.init(
        torch.from_numpy(valid), torch.from_numpy(state.copy()), torch.from_numpy(size),
        torch.from_numpy(atype), torch.from_numpy(vel.copy()),
        torch.from_numpy(acc.copy()), torch.from_numpy(yawr.copy()),
    )
    rd = RefDiagGaussian(torch.from_numpy(mean), torch.from_numpy(log_std))
    r_state, r_valid, r_action, r_logp = ref.update(rd, deterministic=True)

    params = make_dynamics_params(
        veh={"max_acc": 5, "max_yaw_rate": 1.5},
        ped={"max_acc": 7, "max_yaw_rate": 7},
        cyc={"max_acc": 6, "max_yaw_rate": 3},
        dt=0.1,
    )
    ag = init_agent_state(jnp.asarray(valid), jnp.asarray(state), jnp.asarray(vel),
                          jnp.asarray(acc), jnp.asarray(yawr))
    od = DiagGaussian(mean=jnp.asarray(mean), log_std=jnp.asarray(log_std))
    ag2, o_action, o_logp = dynamics_update(
        params, ag, jnp.asarray(atype), od, jax.random.PRNGKey(0), deterministic=True
    )
    np.testing.assert_allclose(_np(ag2.state), t2n(r_state), atol=1e-6)
    np.testing.assert_allclose(_np(o_action), t2n(r_action), atol=1e-6)
    np.testing.assert_allclose(_np(o_logp), t2n(r_logp), atol=1e-5)
    np.testing.assert_array_equal(_np(ag2.valid), t2n(r_valid))


# ---------------------------------------------------------------------------
# Teacher forcing masks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "kwargs",
    [
        dict(step_spawn_agent=90, step_warm_start=10),
        dict(step_spawn_agent=10, step_warm_start=10),
        dict(step_spawn_agent=0, step_warm_start=0),
        dict(step_spawn_agent=10, step_warm_start=10, step_horizon=40,
             step_horizon_decrease_per_epoch=10),
    ],
)
@pytest.mark.parametrize("epoch", [0, 2])
def test_teacher_forcing_mask_parity(kwargs, epoch):
    from utils.teacher_forcing import TeacherForcing
    from trafficbots_tpu.sim.teacher_forcing import TeacherForcingConfig, teacher_forcing_mask

    rng = np.random.RandomState(13)
    B, T, A = 2, 21, 5
    valid = rng.rand(B, T, A) > 0.3
    # make some agents spawn late with contiguous validity
    valid[:, :8, 3] = False
    valid[:, 8:, 3] = True

    ref = TeacherForcing(**kwargs)
    r = ref.get(torch.from_numpy(valid), epoch)
    o = teacher_forcing_mask(TeacherForcingConfig(**kwargs), jnp.asarray(valid), epoch)
    np.testing.assert_array_equal(_np(o), t2n(r))


def test_teacher_forcing_gt_sdc_parity():
    from utils.teacher_forcing import TeacherForcing
    from trafficbots_tpu.sim.teacher_forcing import TeacherForcingConfig, teacher_forcing_mask

    rng = np.random.RandomState(14)
    valid = rng.rand(2, 21, 5) > 0.3
    valid[:, :, 0] = True  # the reference asserts the SDC is always valid
    ref = TeacherForcing(step_spawn_agent=10, step_warm_start=10)
    r = ref.get(torch.from_numpy(valid), 0, gt_sdc=True)
    o = teacher_forcing_mask(
        TeacherForcingConfig(step_spawn_agent=10, step_warm_start=10),
        jnp.asarray(valid), 0, gt_sdc=True,
    )
    np.testing.assert_array_equal(_np(o), t2n(r))


# ---------------------------------------------------------------------------
# Loss primitives
# ---------------------------------------------------------------------------

def test_balanced_kl_parity():
    from models.metrics.loss import BalancedKL
    from models.modules.distributions import DiagGaussian as RefDiagGaussian
    from trafficbots_tpu.distributions import DiagGaussian
    from trafficbots_tpu.training.loss import balanced_kl

    rng = np.random.RandomState(15)
    B, A, D = 2, 4, 8
    m_p, m_q = rng.randn(B, A, D).astype(np.float32), rng.randn(B, A, D).astype(np.float32)
    s_p, s_q = (rng.uniform(-1, 0.5, size=(B, A, D)).astype(np.float32) for _ in range(2))

    ref = BalancedKL(kl_balance_scale=0.8, kl_free_nats=0.01)
    post_t = RefDiagGaussian(torch.from_numpy(m_p), torch.from_numpy(s_p))
    prior_t = RefDiagGaussian(torch.from_numpy(m_q), torch.from_numpy(s_q))
    r = ref.compute(post_t.distribution, prior_t.distribution)

    post = DiagGaussian(mean=jnp.asarray(m_p), log_std=jnp.asarray(s_p))
    prior = DiagGaussian(mean=jnp.asarray(m_q), log_std=jnp.asarray(s_q))
    o = balanced_kl(post, prior, alpha=0.8, free_nats=0.01)
    np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL)


def test_angular_error_parity():
    from models.metrics.loss import AngularError
    from trafficbots_tpu.sim.rewards import angular_error

    rng = np.random.RandomState(16)
    a = rng.uniform(-2 * np.pi, 2 * np.pi, size=(3, 7)).astype(np.float32)
    b = rng.uniform(-2 * np.pi, 2 * np.pi, size=(3, 7)).astype(np.float32)
    for ang in ("cast", "cosine", "vector", None):
        ref = AngularError("SmoothL1Loss", ang)
        r = ref.compute(torch.from_numpy(a), torch.from_numpy(b))
        o = angular_error(jnp.asarray(a), jnp.asarray(b), ang)
        np.testing.assert_allclose(_np(o), t2n(r), atol=ATOL, err_msg=str(ang))


# ---------------------------------------------------------------------------
# Distributions
# ---------------------------------------------------------------------------

def test_diag_gaussian_parity():
    from models.modules.distributions import DiagGaussian as RefDiagGaussian
    from trafficbots_tpu.distributions import DiagGaussian

    rng = np.random.RandomState(17)
    mean = rng.randn(2, 5, 3).astype(np.float32)
    log_std = rng.uniform(-2, 0, size=(2, 5, 3)).astype(np.float32)
    x = rng.randn(2, 5, 3).astype(np.float32)

    ref = RefDiagGaussian(torch.from_numpy(mean), torch.from_numpy(log_std))
    ours = DiagGaussian(mean=jnp.asarray(mean), log_std=jnp.asarray(log_std))
    np.testing.assert_allclose(
        _np(ours.log_prob(jnp.asarray(x))), t2n(ref.log_prob(torch.from_numpy(x))), atol=ATOL
    )
    # deterministic sample = mean
    np.testing.assert_allclose(
        _np(ours.sample(jax.random.PRNGKey(0), True)), t2n(ref.sample(True)), atol=ATOL
    )
    # per-agent mixed det mask
    det = np.array([[True, False, True, False, True], [False] * 5])
    r = ref.sample(torch.from_numpy(det))
    o = ours.sample(jax.random.PRNGKey(1), jnp.asarray(det))
    np.testing.assert_allclose(_np(o)[det], t2n(r)[det], atol=ATOL)


def test_dest_categorical_parity():
    from models.modules.distributions import DestCategorical as RefDest
    from trafficbots_tpu.distributions import DestCategorical

    rng = np.random.RandomState(18)
    logits = rng.randn(2, 4, 16).astype(np.float32)
    ref = RefDest(logits=torch.from_numpy(logits))
    ours = DestCategorical.from_logits(jnp.asarray(logits))
    idx = rng.randint(0, 16, size=(2, 4))
    np.testing.assert_allclose(
        _np(ours.log_prob(jnp.asarray(idx))),
        t2n(ref.log_prob(torch.from_numpy(idx))),
        atol=ATOL,
    )
    np.testing.assert_array_equal(
        _np(ours.sample(jax.random.PRNGKey(0), True)), t2n(ref.sample(True))
    )
