"""Pre-processing (L2) parity: our pure pipeline vs the reference's modules.

Drives the reference's SceneCentricPreProcessing -> SceneCentricInput ->
SceneCentricLatent chain (torch, eval mode, dropout/perturb off) and our
data.preprocessing.pre_processing on the same synthetic batch, and asserts
every produced key matches — the whole sc/, gt/, ref/, input/, latent_prior/,
latent_post/ contract, in both train (prefix "") and val ("history/") modes.
"""
import numpy as np
import pytest

import ref_compat  # noqa: F401

import jax.numpy as jnp
import torch

from ref_compat import AttrDict, t2n

from trafficbots_tpu.config import DataConfig, ModelConfig
from trafficbots_tpu.data.preprocessing import pre_processing
from trafficbots_tpu.data.synthetic import synthetic_episode_batch


def _ref_pipeline(training: bool):
    from data_modules.scene_centric import SceneCentricPreProcessing
    from data_modules.sc_input import SceneCentricInput
    from data_modules.sc_latent import SceneCentricLatent

    data_size = {
        "agent/vel": (91, 8, 2), "agent/spd": (91, 8, 1), "agent/yaw_rate": (91, 8, 1),
        "agent/acc": (91, 8, 1), "agent/size": (8, 3), "agent/type": (8, 3),
        "map/valid": (16, 10), "map/type": (16, 11), "tl_stop/state": (91, 6, 5),
    }
    pose_pe = AttrDict(agent="pe_xy_yaw", map="pe_xy_yaw", tl="pe_xy_yaw")
    mods = [
        SceneCentricPreProcessing(time_step_current=10, data_size=data_size),
        SceneCentricInput(time_step_current=10, data_size=data_size,
                          dropout_p_history=-1.0, pe_dim=96, pose_pe=pose_pe),
        SceneCentricLatent(time_step_current=10, data_size=data_size,
                           perturb_input_to_latent=False, dropout_p_history=-1.0,
                           pe_dim=96, pose_pe=pose_pe),
    ]
    for m in mods:
        m.train(training)
    return mods


@pytest.mark.parametrize("training", [True, False])
def test_preprocessing_full_contract_parity(training):
    data = DataConfig(n_step=91, n_agent=8, n_agent_no_sim=8,
                      n_pl=16, n_pl_node=10, n_tl=6, n_tl_stop=6)
    b_np = synthetic_episode_batch(data, n_scene=2, seed=7,
                                   with_agent_no_sim=not training)
    if not training:
        # make history genuinely diverge from agent/*[:11] so the val path is pinned
        b_np["history/agent/valid"] = b_np["history/agent/valid"].copy()
        b_np["history/agent/valid"][:, 4, 0] = False
        b_np["history/agent/spd"] = b_np["history/agent/spd"] + 0.5

    ref_batch = {k: torch.from_numpy(np.asarray(v)) for k, v in b_np.items()
                 if isinstance(v, np.ndarray)}
    for m in _ref_pipeline(training):
        ref_batch = m(ref_batch)

    ours = pre_processing(
        {k: jnp.asarray(v) for k, v in b_np.items() if isinstance(v, np.ndarray)},
        ModelConfig(), n_step_hist=11, training=training,
    )

    checked = 0
    for k, rv in ref_batch.items():
        if "/" not in k or not any(
            k.startswith(p) for p in ("sc/", "gt/", "ref/", "input/", "latent_prior/", "latent_post/")
        ):
            continue
        assert k in ours, f"missing key {k}"
        ov = np.asarray(ours[k])
        rvn = t2n(rv)
        assert ov.shape == rvn.shape, f"{k}: {ov.shape} vs {rvn.shape}"
        if ov.dtype == bool:
            np.testing.assert_array_equal(ov, rvn, err_msg=k)
        else:
            np.testing.assert_allclose(ov, rvn.astype(ov.dtype), atol=2e-5, err_msg=k)
        checked += 1
    assert checked > 30, f"only {checked} keys compared"
