"""Import shim + weight-transfer helpers for torch reference-parity tests.

Loads the living reference modules from /root/reference/src (torch CPU) with
lightweight stubs for the deps that are not installed here (omegaconf, hydra,
transforms3d, torchmetrics). The transfer helpers map torch state_dicts onto
our flax parameter pytrees so both frameworks run the SAME weights and parity
is measured, not asserted.

Key mapping facts:
  - torch nn.Linear weight [out, in] -> flax Dense kernel [in, out] (transpose)
  - reference Attention packs qkv into in_proj_weight [3d, d]
    (attention.py:22, split at :76-87) -> our separate q/k/v projections
  - torch GRU and this flax version both compute h' = (1-z)*n + z*h; torch
    gate packing order is (r, z, n); flax splits input/recurrent projections
    with biases ir (b_ir+b_hr), iz (b_iz+b_hz), in (b_in), hn (b_hn);
    hr/hz have no bias in flax.
"""
import math
import sys
import types

import numpy as np

_REF = "/root/reference/src"


def _install_stubs():
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.DictConfig = dict
        om.ListConfig = list
        om.OmegaConf = types.SimpleNamespace
        sys.modules["omegaconf"] = om
    if "hydra" not in sys.modules:
        hy = types.ModuleType("hydra")
        hyu = types.ModuleType("hydra.utils")

        def _instantiate(cfg, **kwargs):
            # reference Dynamics instantiates its per-type integrators via
            # hydra (_target_ key, dynamics.py:21-27); resolve it directly
            target = cfg["_target_"] if isinstance(cfg, dict) else cfg._target_
            mod_name, cls_name = target.rsplit(".", 1)
            import importlib

            mod = importlib.import_module(mod_name)
            args = {k: v for k, v in dict(cfg).items() if k != "_target_"}
            args.update(kwargs)
            return getattr(mod, cls_name)(**args)

        hyu.instantiate = _instantiate
        hy.utils = hyu
        sys.modules["hydra"] = hy
        sys.modules["hydra.utils"] = hyu
    if "transforms3d" not in sys.modules:
        t3 = types.ModuleType("transforms3d")
        eu = types.ModuleType("transforms3d.euler")

        def mat2euler(R, axes="sxyz"):
            return (0.0, 0.0, math.atan2(R[1][0], R[0][0]))

        def euler2mat(ai, aj, ak, axes="sxyz"):
            assert ai == 0 and aj == 0, "stub supports z-rotations only"
            c, s = math.cos(ak), math.sin(ak)
            return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])

        eu.mat2euler = mat2euler
        eu.euler2mat = euler2mat
        t3.euler = eu
        sys.modules["transforms3d"] = t3
        sys.modules["transforms3d.euler"] = eu
    if "torchmetrics" not in sys.modules:
        import torch

        tm = types.ModuleType("torchmetrics")

        class Metric(torch.nn.Module):
            """Minimal torchmetrics.Metric: add_state registers plain attrs."""

            def __init__(self, dist_sync_on_step=False, **kwargs):
                super().__init__()
                self._defaults = {}

            def add_state(self, name, default, dist_reduce_fx=None):
                if isinstance(default, torch.Tensor):
                    self.register_buffer(name, default.clone())
                else:
                    setattr(self, name, default)
                self._defaults[name] = default

            def reset(self):
                for k, v in self._defaults.items():
                    if isinstance(v, torch.Tensor):
                        getattr(self, k).copy_(v)
                    else:
                        setattr(self, k, type(v)(v))

            def forward(self, *a, **kw):
                return self.update(*a, **kw)

        tm.Metric = Metric
        tm_metric = types.ModuleType("torchmetrics.metric")
        tm_metric.Metric = Metric
        tm.metric = tm_metric
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.metric"] = tm_metric


def setup_reference():
    """Idempotent: install stubs + put the reference src dir on sys.path."""
    _install_stubs()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)


setup_reference()


# ---------------------------------------------------------------------------
# torch -> numpy/flax transfer helpers
# ---------------------------------------------------------------------------

class AttrDict(dict):
    """dict with attribute access — stands in for omegaconf.DictConfig when
    a reference module both unpacks (**cfg) and attribute-reads (cfg.x)."""

    __getattr__ = dict.__getitem__


def t2n(x):
    return x.detach().cpu().numpy()


def linear_params(lin):
    """torch nn.Linear -> flax Dense param dict."""
    p = {"kernel": t2n(lin.weight).T}
    if lin.bias is not None:
        p["bias"] = t2n(lin.bias)
    return p


def layernorm_params(ln):
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


def mlp_params(ref_mlp):
    """Reference MLP (mlp.py:20-85) -> our MLP param dict (fc{i}/ln{i})."""
    import torch

    out = {}
    i = 0
    for layer in ref_mlp.fc_layers:
        if isinstance(layer, torch.nn.Linear):
            out[f"fc{i}"] = linear_params(layer)
            i += 1
        elif isinstance(layer, torch.nn.LayerNorm):
            out[f"ln{i - 1}"] = layernorm_params(layer)
    return out


def attention_params(ref_attn):
    """Reference Attention (attention.py:9-51) -> our Attention params."""
    d = ref_attn.d_model
    w = t2n(ref_attn.in_proj_weight)  # [3d, d]
    out = {
        "q_proj": {"kernel": w[:d].T},
        "k_proj": {"kernel": w[d : 2 * d].T},
        "v_proj": {"kernel": w[2 * d :].T},
        "out_proj": {"kernel": t2n(ref_attn.out_proj_weight).T},
    }
    if ref_attn.in_proj_bias is not None:
        b = t2n(ref_attn.in_proj_bias)
        out["q_proj"]["bias"] = b[:d]
        out["k_proj"]["bias"] = b[d : 2 * d]
        out["v_proj"]["bias"] = b[2 * d :]
        out["out_proj"]["bias"] = t2n(ref_attn.out_proj_bias)
    return out


def tf_layer_params(ref_layer, norm_first: bool):
    """Reference TransformerCrossAttention (transformer.py:98-240) -> ours.

    Post-norm name differences: ref norm1/norm2 -> our norm1_post/norm2_post
    (and for the d_ff<=0 DenseTNT variant, ref norm1 -> our norm1_post).
    """
    out = {"attn": attention_params(ref_layer.attn)}
    has_ffn = ref_layer.d_feedforward > 0
    if norm_first:
        out["norm1"] = layernorm_params(ref_layer.norm1)
        out["norm_tgt"] = layernorm_params(ref_layer.norm_tgt)
        if has_ffn:
            out["norm2"] = layernorm_params(ref_layer.norm2)
    else:
        out["norm1_post"] = layernorm_params(ref_layer.norm1)
        if has_ffn:
            out["norm2_post"] = layernorm_params(ref_layer.norm2)
    if has_ffn:
        out["linear1"] = linear_params(ref_layer.linear1)
        out["linear2"] = linear_params(ref_layer.linear2)
    return out


def tf_block_params(ref_block, norm_first: bool):
    """Reference TransformerBlock -> our TransformerBlock params."""
    out = {
        f"layer{i}": tf_layer_params(l, norm_first)
        for i, l in enumerate(ref_block.layers)
    }
    if ref_block.out_layernorm is not None:
        out["out_ln"] = layernorm_params(ref_block.out_layernorm)
    return out


def _gru_gates(w_ih, w_hh, b_ih, b_hh, h):
    """torch GRU packed weights (r,z,n order) -> our FusedGRUCell params.

    FusedGRUCell keeps the projections concatenated: w_i [in, 3h], w_h
    [h, 3h], b_i = b_ih + (b_hr, b_hz, 0) merged for r/z (the hidden-side r/z
    biases fold into the input-side ones since the pre-activations are
    summed), and a separate b_hn (applied inside the r* gate product).
    """
    b_i = b_ih.copy()
    b_i[: 2 * h] += b_hh[: 2 * h]
    return {
        "w_i": w_ih.T,
        "w_h": w_hh.T,
        "b_i": b_i,
        "b_hn": b_hh[2 * h :],
    }


def gru_params(ref_rnn, num_layers: int, hidden: int):
    """torch nn.GRU -> dict of our StackedGRU gru{i} cells."""
    out = {}
    for i in range(num_layers):
        out[f"gru{i}"] = _gru_gates(
            t2n(getattr(ref_rnn, f"weight_ih_l{i}")),
            t2n(getattr(ref_rnn, f"weight_hh_l{i}")),
            t2n(getattr(ref_rnn, f"bias_ih_l{i}")),
            t2n(getattr(ref_rnn, f"bias_hh_l{i}")),
            hidden,
        )
    return out


def gru_cells_params(cells, hidden: int):
    """torch nn.ModuleList of GRUCell -> dict of our StackedGRU gru{i} cells."""
    return {
        f"gru{i}": _gru_gates(
            t2n(c.weight_ih), t2n(c.weight_hh), t2n(c.bias_ih), t2n(c.bias_hh), hidden
        )
        for i, c in enumerate(cells)
    }
