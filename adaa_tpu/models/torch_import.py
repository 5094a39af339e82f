"""Torch checkpoint -> flax variables converters.

Checkpoint-compatible weights are a BASELINE.json requirement: users of
the reference hold ``ckpt.pth`` state_dicts (saved by reference
src/trainer.py:20-33), possibly with DataParallel ``module.`` prefixes
(reference src/utils.py:55-65). These converters map them onto the
flax module trees defined in adaa_tpu.models.*:

* conv2d  (O, I, kH, kW) -> (kH, kW, I, O)
* conv1d  (O, I, K)      -> (K, I, O)
* linear  (O, I)         -> (I, O)
* LSTM/GRU ``weight_ih_l0``(G*H, D) -> (D, G*H) with torch gate order
  preserved (i,f,g,o / r,z,n — the flax cells use the same packing).
* BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict as numpy, stripping ``module.`` prefixes."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _np(v)
    return out


# ---------------------------------------------------------------------------
# Generic setters
# ---------------------------------------------------------------------------

def _set(tree: Dict, path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    assert tuple(old.shape) == tuple(value.shape), (
        f"shape mismatch at {'/'.join(path)}: {old.shape} vs {value.shape}"
    )
    node[path[-1]] = value.astype(np.float32)


def _conv2d(sd, key, params, name):
    _set(params, [name, "kernel"], _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))
    if f"{key}.bias" in sd:
        _set(params, [name, "bias"], _np(sd[f"{key}.bias"]))


def _conv1d(sd, key, params, name):
    _set(params, [name, "kernel"], _np(sd[f"{key}.weight"]).transpose(2, 1, 0))
    if f"{key}.bias" in sd:
        _set(params, [name, "bias"], _np(sd[f"{key}.bias"]))


def _linear(sd, key, params, name):
    _set(params, [name, "kernel"], _np(sd[f"{key}.weight"]).T)
    if f"{key}.bias" in sd:
        _set(params, [name, "bias"], _np(sd[f"{key}.bias"]))


def _bn(sd, key, params, stats, name, affine=True):
    if affine:
        _set(params, [name, "scale"], _np(sd[f"{key}.weight"]))
        _set(params, [name, "bias"], _np(sd[f"{key}.bias"]))
    _set(stats, [name, "mean"], _np(sd[f"{key}.running_mean"]))
    _set(stats, [name, "var"], _np(sd[f"{key}.running_var"]))


def _rnn_dir(sd, prefix, suffix, params_dir):
    _set(params_dir, ["weight_ih"], _np(sd[f"{prefix}.weight_ih_{suffix}"]).T)
    _set(params_dir, ["weight_hh"], _np(sd[f"{prefix}.weight_hh_{suffix}"]).T)
    _set(params_dir, ["bias_ih"], _np(sd[f"{prefix}.bias_ih_{suffix}"]))
    _set(params_dir, ["bias_hh"], _np(sd[f"{prefix}.bias_hh_{suffix}"]))


# ---------------------------------------------------------------------------
# Per-model converters
# ---------------------------------------------------------------------------

def lcnn_from_state_dict(sd: Dict, variables: Dict[str, Any]) -> Dict[str, Any]:
    import jax

    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    conv_idx = [0, 3, 6, 10, 13, 16, 19, 22, 25]
    bn_idx = [5, 9, 12, 18, 21, 24]
    for i in conv_idx:
        _conv2d(sd, f"m_transform.{i}", params, f"conv{i}")
    for i in bn_idx:
        _bn(sd, f"m_transform.{i}", params, stats, f"bn{i}", affine=False)

    for j in (0, 1):
        prefix = f"m_before_pooling.{j}.l_blstm"
        _rnn_dir(sd, prefix, "l0", params[f"blstm{j}"]["fwd"])
        _rnn_dir(sd, prefix, "l0_reverse", params[f"blstm{j}"]["bwd"])

    _linear(sd, "m_output_act", params, "output")
    return _to_jnp(variables)


def specrnet_from_state_dict(sd: Dict, variables: Dict[str, Any]) -> Dict[str, Any]:
    import jax

    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    _bn(sd, "first_bn", params, stats, "first_bn")
    for blk, first in (("block0", True), ("block2", False), ("block4", False)):
        tkey = f"{blk}.0"
        bp, bs = params[blk], stats[blk]
        if not first:
            _bn(sd, f"{tkey}.bn1", bp, bs, "bn1")
        _conv2d(sd, f"{tkey}.conv1", bp, "conv1")
        _bn(sd, f"{tkey}.bn2", bp, bs, "bn2")
        _conv2d(sd, f"{tkey}.conv2", bp, "conv2")
        if f"{tkey}.conv_downsample.weight" in sd:
            _conv2d(sd, f"{tkey}.conv_downsample", bp, "conv_downsample")

    for i in (0, 2, 4):
        _linear(sd, f"fc_attention{i}.0", params, f"fc_attention{i}")

    _bn(sd, "bn_before_gru", params, stats, "bn_before_gru")
    for layer in (0, 1):
        _rnn_dir(sd, "gru", f"l{layer}", params["gru"][f"l{layer}_fwd"])
        _rnn_dir(sd, "gru", f"l{layer}_reverse", params["gru"][f"l{layer}_bwd"])
    _linear(sd, "fc1_gru", params, "fc1_gru")
    _linear(sd, "fc2_gru", params, "fc2_gru")
    return _to_jnp(variables)


def rawnet3_from_state_dict(sd: Dict, variables: Dict[str, Any]) -> Dict[str, Any]:
    import jax

    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    _set(params, ["instancenorm_weight"], _np(sd["preprocess.1.weight"]))
    _set(params, ["instancenorm_bias"], _np(sd["preprocess.1.bias"]))
    _set(params, ["conv1", "low_hz_"], _np(sd["conv1.filterbank.low_hz_"]))
    _set(params, ["conv1", "band_hz_"], _np(sd["conv1.filterbank.band_hz_"]))

    for lname in ("layer1", "layer2", "layer3"):
        lp, ls = params[lname], stats[lname]
        _conv1d(sd, f"{lname}.conv1", lp, "conv1")
        _bn(sd, f"{lname}.bn1", lp, ls, "bn1")
        for i in range(7):
            _conv1d(sd, f"{lname}.convs.{i}", lp, f"convs_{i}")
            _bn(sd, f"{lname}.bns.{i}", lp, ls, f"bns_{i}")
        _conv1d(sd, f"{lname}.conv3", lp, "conv3")
        _bn(sd, f"{lname}.bn3", lp, ls, "bn3")
        if f"{lname}.residual.0.weight" in sd:
            _conv1d(sd, f"{lname}.residual.0", lp, "residual")
        _set(lp, ["afms", "alpha"], _np(sd[f"{lname}.afms.alpha"]).reshape(-1))
        _linear(sd, f"{lname}.afms.fc", lp["afms"], "fc")

    _conv1d(sd, "layer4", params, "layer4")
    _conv1d(sd, "attention.0", params, "attention_0")
    _bn(sd, "attention.2", params, stats, "attention_2")
    _conv1d(sd, "attention.3", params, "attention_3")
    _bn(sd, "bn5", params, stats, "bn5")
    _linear(sd, "fc6", params, "fc6")
    # bn6 exists in checkpoints but out_bn=False in prepare_model — skipped
    return _to_jnp(variables)


def _to_jnp(variables):
    import jax.numpy as jnp
    import jax

    return jax.tree_util.tree_map(jnp.asarray, variables)


_CONVERTERS = {
    "lcnn": lcnn_from_state_dict,
    "specrnet": specrnet_from_state_dict,
    "rawnet3": rawnet3_from_state_dict,
}


def import_torch_checkpoint(
    model_name: str, path: str, variables: Dict[str, Any]
) -> Dict[str, Any]:
    sd = load_state_dict(path)
    return import_state_dict(model_name, sd, variables)


def import_state_dict(
    model_name: str, sd: Dict, variables: Dict[str, Any]
) -> Dict[str, Any]:
    if model_name not in _CONVERTERS:
        raise ValueError(f"no torch importer for '{model_name}'")
    return _CONVERTERS[model_name](sd, variables)
