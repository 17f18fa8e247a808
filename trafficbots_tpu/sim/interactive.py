"""Interactive (step-at-a-time) closed-loop simulation.

The reference steps its simulator from a Python loop
(ref waymo_motion.py:269-352), so a user can inspect state or intervene
between steps; the scan-based `rollout` here compiles the whole horizon
into one program. This module restores incremental stepping the TPU-native
way: `build_sim`'s pure step body is jitted ONCE and applied per step to an
explicit (carry, x) pytree — interactive stepping, the scan rollout and
training share every line of simulation code, and N interactive steps
reproduce the scan's first N steps (boolean outputs exactly; floats to
XLA-fusion tolerance, since the standalone-jitted body and the scan body
are separate compilations — tests/test_interactive.py).

Typical uses: sim-as-a-service (drive externally-controlled agents against
the learned policy by overriding their states each step), mid-rollout state
surgery / what-if probing, and step-level debugging.

The per-step override mechanism is exactly the teacher-forcing input of the
batch rollout: pass `mask_override` [B, A] plus a `state_override` dict to
force any agent to an external trajectory for that step — the same masked
post-integration override semantics as ref waymo_motion.py:271-284.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .rollout import RolloutCarry, RolloutOutput, StepOutput, build_sim


class InteractiveSim:
    """Stateful host-side wrapper around the pure jitted step body.

    Attributes:
      carry: the RolloutCarry pytree — mutate it directly for state surgery
        (e.g. `sim.carry = sim.carry.replace(agent=...)`).
      t: number of steps taken so far (index into the presliced xs).
    """

    def __init__(self, carry: RolloutCarry, xs: Dict[str, jnp.ndarray],
                 step_fn: Callable, step_future_start: int):
        self.carry = carry
        self.xs = xs
        self.t = 0
        self.n_steps = int(next(iter(xs.values())).shape[0])
        self.outputs = []
        self._step = step_fn
        self._step_future_start = step_future_start

    @property
    def done(self) -> bool:
        return self.t >= self.n_steps

    def step(
        self,
        mask_override: Optional[jnp.ndarray] = None,  # [B, A] bool
        state_override: Optional[Dict[str, jnp.ndarray]] = None,
        # keys: state [B,A,4], vel [B,A,2], acc [B,A,1], yaw_rate [B,A,1]
    ) -> StepOutput:
        """Advance one simulation step. Overrides (if given) REPLACE this
        step's teacher-forcing inputs: agents with mask_override True are
        forced to state_override after the dynamics update, exactly like
        scan-mode teacher forcing.

        A PARTIAL state_override (e.g. only "state") forces the masked
        agents' omitted channels (vel/acc/yaw_rate) to this step's GT values
        — which may be stale or zero for agents with no GT at this step, not
        the agent's current simulated values. Pass every channel explicitly
        (e.g. carry them over from the previous StepOutput) when overriding
        agents outside their GT-valid window."""
        assert not self.done, f"simulation finished after {self.n_steps} steps"
        x = {k: v[self.t] for k, v in self.xs.items()}
        if mask_override is not None:
            x["tf_mask"] = mask_override
        if state_override is not None:
            if mask_override is None:
                raise ValueError("state_override requires mask_override: the "
                                 "injected states apply only to masked agents")
            # blend per-agent: non-forced agents keep this step's GT, which
            # the body also uses as the diffbar-reward target (rollout.py)
            m = mask_override[..., None]
            for k_src, k_dst in (("state", "gt_state"), ("vel", "gt_vel"),
                                 ("acc", "gt_acc"), ("yaw_rate", "gt_yaw_rate")):
                if k_src in state_override:
                    x[k_dst] = jnp.where(m, state_override[k_src], x[k_dst])
            # forced agents must count as GT-valid or kill() could cull them
            x["gt_valid"] = x["gt_valid"] | mask_override
        self.carry, out = self._step(self.carry, x)
        self.outputs.append(out)
        self.t += 1
        return out

    def run_to_end(self) -> "InteractiveSim":
        while not self.done:
            self.step()
        return self

    def finish(self) -> RolloutOutput:
        """Stack the collected per-step outputs into the batch-major
        RolloutOutput the metrics/post-processing stack consumes — the
        interactive analog of the scan's stacked ys."""
        assert self.outputs, "no steps taken"
        ys = jax.tree.map(lambda *leaves: jnp.stack(leaves, axis=0), *self.outputs)

        def bm(x):  # [S, B, A, ...] -> [B, A, S, ...]
            return jnp.moveaxis(x, 0, 2)

        return RolloutOutput(
            valid=bm(ys.valid),
            preds=bm(ys.pred),
            override_masks=bm(ys.override_mask),
            violations={k: bm(v) for k, v in ys.violations.items()},
            diffbar_rewards=bm(ys.diffbar_reward),
            diffbar_rewards_valid=bm(ys.diffbar_reward_valid),
            latent_log_probs=bm(ys.latent_log_prob),
            action_log_probs=bm(ys.action_log_prob),
            attn=None if ys.attn is None else {k: bm(v) for k, v in ys.attn.items()},
            step_future_start=self._step_future_start,
        )


def make_interactive_sim(
    cfg,
    model_apply: Callable,
    dyn_params,
    rule_consts,
    features: Dict[str, jnp.ndarray],
    latent_dist,
    goal,
    goal_valid,
    mask_teacher_forcing: jnp.ndarray,
    key: jax.Array,
    **kwargs,
) -> InteractiveSim:
    """Build an InteractiveSim over the same arguments as `rollout`.

    The step body is jitted once; each `.step()` is one device program (the
    per-step analog of the scan — same compiled math, host-driven control).
    """
    step_start = kwargs.get("step_start", 1)
    carry0, xs, body = build_sim(
        cfg, model_apply, dyn_params, rule_consts, features, latent_dist,
        goal, goal_valid, mask_teacher_forcing, key, **kwargs,
    )
    return InteractiveSim(
        carry0, xs, jax.jit(body),
        step_future_start=cfg.time_step_current + 1 - step_start,
    )
