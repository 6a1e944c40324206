"""Torch <-> flax weight bridging for the backbone zoo.

Translates reference-format torch state dicts (``.pth.tar``) into our flax
variable trees and back, implementing the checkpoint-compatibility contract
of SURVEY.md §5.4 / BASELINE.json ("checkpoint formats kept"). Used by the
``--mc`` transfer-surgery path (reference: finetune.py:273-310,
retrieval.py:88-95) and by forward-parity tests.

Tensor conventions:
- torch Conv3d weight [O, I, kt, kh, kw]  <->  flax kernel [kt, kh, kw, I, O]
- torch Linear weight [O, I]              <->  flax kernel [I, O]
- torch BN {weight, bias, running_mean, running_var}
  <-> flax {params: {scale, bias}, batch_stats: {mean, var}}
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["torch_to_flax", "flax_to_torch", "inflate_2d_state_dict",
           "KEY_MAPPERS"]


# ---------------------------------------------------------------------------
# tensor converters
# ---------------------------------------------------------------------------

def _conv_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (2, 3, 4, 1, 0))


def _conv_w_back(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (4, 3, 0, 1, 2))


def _dense_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (1, 0))


# ---------------------------------------------------------------------------
# per-arch key mapping: torch name -> (flax collection, flax path, converter)
# ---------------------------------------------------------------------------

def _bn(prefix_t: str, prefix_f: str):
    """BN parameter mapping entries."""
    return [
        (f"{prefix_t}.weight", ("params", f"{prefix_f}/scale", None)),
        (f"{prefix_t}.bias", ("params", f"{prefix_f}/bias", None)),
        (f"{prefix_t}.running_mean", ("batch_stats", f"{prefix_f}/mean", None)),
        (f"{prefix_t}.running_var", ("batch_stats", f"{prefix_f}/var", None)),
    ]


def _convbn(prefix_t_conv: str, prefix_t_bn: str, prefix_f: str, bias=False):
    out = [(f"{prefix_t_conv}.weight",
            ("params", f"{prefix_f}/conv/kernel", _conv_w))]
    if bias:
        out.append((f"{prefix_t_conv}.bias",
                    ("params", f"{prefix_f}/conv/bias", None)))
    out += _bn(prefix_t_bn, f"{prefix_f}/bn")
    return out


def _resnet_mapping(layers=(2, 2, 2, 2), bottleneck=False,
                    downsample_stages=None) -> list:
    m = _convbn("conv1", "bn1", "stem")
    n_convs = 3 if bottleneck else 2
    for s, blocks in enumerate(layers):
        for i in range(blocks):
            t = f"layer{s + 1}.{i}"
            f = f"layer{s + 1}_{i}"
            for c in range(1, n_convs + 1):
                m += _convbn(f"{t}.conv{c}", f"{t}.bn{c}", f"{f}/conv{c}")
            # type-B downsample on first block of stages 2-4 (and stage 1 for
            # bottleneck where channels change 64 -> 256)
            has_down = (i == 0) and (s > 0 or bottleneck)
            if has_down:
                m += _convbn(f"{t}.downsample.0", f"{t}.downsample.1",
                             f"{f}/downsample")
    m += [("fc.weight", ("params", "fc/kernel", _dense_w)),
          ("fc.bias", ("params", "fc/bias", None))]
    return m


def _c3d_mapping() -> list:
    m = []
    for name in ["conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b",
                 "conv5a", "conv5b"]:
        bn = "bn" + name[4:]
        m += _convbn(name, bn, f"{name}", bias=True)
    m += [("linear.weight", ("params", "linear/kernel", _dense_w)),
          ("linear.bias", ("params", "linear/bias", None))]
    return m


def _sepconv_mapping(t: str, f: str, gate=True) -> list:
    # torch: {t}.sep_conv.0 = down BasicConv3d, .1 = up; gating squeeze/excitation
    m = _convbn(f"{t}.sep_conv.0.conv3d", f"{t}.sep_conv.0.bn", f"{f}/down")
    m += _convbn(f"{t}.sep_conv.1.conv3d", f"{t}.sep_conv.1.bn", f"{f}/up")
    if gate:
        m += [(f"{t}.excitation.weight",
               ("params", f"{f}/excitation/kernel", _conv_w)),
              (f"{t}.excitation.bias",
               ("params", f"{f}/excitation/bias", None))]
    return m


def _sepinc_mapping(t: str, f: str, gate=True) -> list:
    m = _convbn(f"{t}.branch0.conv3d", f"{t}.branch0.bn", f"{f}/branch0")
    m += _convbn(f"{t}.branch1.0.conv3d", f"{t}.branch1.0.bn",
                 f"{f}/branch1_red")
    m += _sepconv_mapping(f"{t}.branch1.1", f"{f}/branch1_sep", gate)
    m += _convbn(f"{t}.branch2.0.conv3d", f"{t}.branch2.0.bn",
                 f"{f}/branch2_red")
    m += _sepconv_mapping(f"{t}.branch2.1", f"{f}/branch2_sep", gate)
    m += _convbn(f"{t}.branch3.1.conv3d", f"{t}.branch3.1.bn", f"{f}/branch3")
    return m


_S3D_INC = [("sepInc_3b", "inc3b"), ("sepInc_3c", "inc3c"),
            ("sepInc_4b", "inc4b"), ("sepInc_4c", "inc4c"),
            ("sepInc_4d", "inc4d"), ("sepInc_4e", "inc4e"),
            ("sepInc_4f", "inc4f"), ("sepInc_5b", "inc5b"),
            ("sepInc_5c", "inc5c")]


def _s3dg_mapping(gate=True) -> list:
    m = _sepconv_mapping("feature.sepConv1", "sepConv1", gate)
    m += _convbn("feature.basicConv3d.conv3d", "feature.basicConv3d.bn",
                 "basicConv3d")
    m += _sepconv_mapping("feature.sep_conv2", "sepConv2", gate)
    for t, f in _S3D_INC:
        m += _sepinc_mapping(f"feature.{t}", f"{f}", gate)
    m += [("fc.weight", ("params", "fc/kernel", _dense_w)),
          ("fc.bias", ("params", "fc/bias", None))]
    return m


def _stconv_mapping(t: str, f: str) -> list:
    m = _convbn(f"{t}.spatial_conv", f"{t}.bn", f"{f}/spatial")
    m += [(f"{t}.temporal_conv.weight",
           ("params", f"{f}/temporal/conv/kernel", _conv_w))]
    return m


def _r2plus1d_mapping(layer_sizes=(1, 1, 1, 1)) -> list:
    m = _stconv_mapping("conv1", "conv1")
    m += _bn("bn1", "bn1")
    for s, blocks in enumerate(layer_sizes):
        for i in range(blocks):
            t = (f"conv{s + 2}.block1" if i == 0
                 else f"conv{s + 2}.blocks.{i - 1}")
            f = f"conv{s + 2}_{i}"
            m += _stconv_mapping(f"{t}.conv1", f"{f}/conv1")
            m += _bn(f"{t}.bn1", f"{f}/bn1")
            m += _stconv_mapping(f"{t}.conv2", f"{f}/conv2")
            m += _bn(f"{t}.bn2", f"{f}/bn2")
            if s > 0 and i == 0:
                m += _stconv_mapping(f"{t}.downsampleconv", f"{f}/downsampleconv")
                m += _bn(f"{t}.downsamplebn", f"{f}/downsamplebn")
    m += [("linear.weight", ("params", "linear/kernel", _dense_w)),
          ("linear.bias", ("params", "linear/bias", None))]
    return m


_MFNET_K_SEC = {2: 3, 3: 4, 4: 6, 5: 3}  # reference mfnet_3d.py:72-75


def _mfnet_mapping() -> list:
    """MFNet-3D names (reference models/mfnet/mfnet_3d.py:67-151):
    conv1.{conv,bn}, conv{2..5}.B{i:02d}.{conv_i1,conv_i2,conv_m1,conv_m2,
    conv_w1}.{bn,conv}, tail.bn, fc."""
    m = [("conv1.conv.weight", ("params", "stem_conv/kernel", _conv_w))]
    m += _bn("conv1.bn", "stem_bn")
    for s, n_units in _MFNET_K_SEC.items():
        for i in range(1, n_units + 1):
            t = f"conv{s}.B{i:02d}"
            f = f"conv{s}_B{i:02d}"
            children = ["conv_i1", "conv_i2", "conv_m1", "conv_m2"]
            if i == 1:
                children.append("conv_w1")  # first_block adapter
            for c in children:
                m.append((f"{t}.{c}.conv.weight",
                          ("params", f"{f}/{c}/conv/kernel", _conv_w)))
                m += _bn(f"{t}.{c}.bn", f"{f}/{c}/bn")
    m += _bn("tail.bn", "tail_bn")
    m += [("fc.weight", ("params", "fc/kernel", _dense_w)),
          ("fc.bias", ("params", "fc/bias", None))]
    return m


def _torchvision_r3d18_mapping() -> list:
    """torchvision.models.video.r3d_18 names: stem.{0,1}, layer{1..4}.
    {0,1}.conv{1,2}.{0,1}, layer{2..4}.0.downsample.{0,1}, fc — mapped
    onto models/video_resnet.py (layer{L}_{i}/conv{1,2}, /downsample)."""
    m = _convbn("stem.0", "stem.1", "stem")
    for s, blocks in enumerate((2, 2, 2, 2)):
        for i in range(blocks):
            t = f"layer{s + 1}.{i}"
            f = f"layer{s + 1}_{i}"
            m += _convbn(f"{t}.conv1.0", f"{t}.conv1.1", f"{f}/conv1")
            m += _convbn(f"{t}.conv2.0", f"{t}.conv2.1", f"{f}/conv2")
            if s > 0 and i == 0:
                m += _convbn(f"{t}.downsample.0", f"{t}.downsample.1",
                             f"{f}/downsample")
    m += [("fc.weight", ("params", "fc/kernel", _dense_w)),
          ("fc.bias", ("params", "fc/bias", None))]
    return m


KEY_MAPPERS = {
    "c3d": _c3d_mapping,
    "torchvision-resnet18": _torchvision_r3d18_mapping,
    "mfnet": _mfnet_mapping,
    "resnet10": lambda: _resnet_mapping((1, 1, 1, 1)),
    "resnet18": lambda: _resnet_mapping((2, 2, 2, 2)),
    "resnet34": lambda: _resnet_mapping((3, 4, 6, 3)),
    "resnet50": lambda: _resnet_mapping((3, 4, 6, 3), bottleneck=True),
    "resnet101": lambda: _resnet_mapping((3, 4, 23, 3), bottleneck=True),
    "resnet152": lambda: _resnet_mapping((3, 8, 36, 3), bottleneck=True),
    "resnet200": lambda: _resnet_mapping((3, 24, 36, 3), bottleneck=True),
    "s3dg": lambda: _s3dg_mapping(True),
    "s3d": lambda: _s3dg_mapping(False),
    "r2plus1d-vcop": lambda: _r2plus1d_mapping((1, 1, 1, 1)),
    "r2plus1d-18": lambda: _r2plus1d_mapping((2, 2, 2, 2)),
}


# ---------------------------------------------------------------------------
# tree plumbing
# ---------------------------------------------------------------------------

def _set_path(tree: dict, path: str, value) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get_path(tree: dict, path: str):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def torch_to_flax(state_dict: Dict[str, np.ndarray], arch: str,
                  strict: bool = True) -> Tuple[dict, dict, list]:
    """Reference torch state dict -> (params, batch_stats, missing_keys).

    ``state_dict`` values must already be numpy (framework.checkpoint.load_state
    produces that). num_batches_tracked entries are ignored.
    """
    if arch not in KEY_MAPPERS:
        raise NotImplementedError(
            f"No torch checkpoint mapping for arch {arch!r} (the reference "
            f"publishes no checkpoints for it). Mapped archs: "
            f"{sorted(KEY_MAPPERS)}")
    mapping = KEY_MAPPERS[arch]()
    params: dict = {}
    batch_stats: dict = {}
    missing = []
    for torch_key, (coll, flax_path, conv) in mapping:
        if torch_key not in state_dict:
            missing.append(torch_key)
            if strict:
                raise KeyError(f"missing torch key {torch_key!r} for {arch}")
            continue
        v = np.asarray(state_dict[torch_key])
        if conv is not None:
            v = conv(v)
        _set_path(params if coll == "params" else batch_stats, flax_path, v)
    return params, batch_stats, missing


def _copy_tree(tree):
    if hasattr(tree, "items"):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


def inflate_2d_state_dict(variables: dict, state_dict_2d: Dict[str, np.ndarray],
                          arch: str = "mfnet", method: str = "inflation"
                          ) -> Tuple[dict, list, list]:
    """Initialize 3D variables from a 2D torch state dict by temporal
    inflation (reference models/mfnet/initializer.py:54-136,
    init_3d_from_2d_dict).

    For each mapped conv whose 2D weight [O, I, kh, kw] matches the target
    5D kernel on every non-temporal dim, the kernel is divided by kt and
    replicated kt times along the temporal axis (preserving the activation
    scale); kt==1 kernels are reshaped. BN/linear params with exact shape
    match copy through. Everything else (shape-mismatched heads, keys absent
    from the 2D dict) keeps its current (xavier) init, like the reference.

    Only ``method='inflation'`` is supported — the reference hardcodes it
    (mfnet_3d.py:156); its 'random' branch is dead code.

    Returns (new_variables, loaded_torch_keys, skipped_torch_keys).
    """
    if method != "inflation":
        raise NotImplementedError(
            "only 'inflation' is implemented (the reference hardcodes "
            "load_method='inflation', models/mfnet/mfnet_3d.py:156)")
    if arch not in KEY_MAPPERS:
        raise NotImplementedError(
            f"No torch checkpoint mapping for arch {arch!r}; mapped archs: "
            f"{sorted(KEY_MAPPERS)}")
    params = _copy_tree(variables["params"])
    batch_stats = _copy_tree(variables.get("batch_stats", {}))
    loaded, skipped = [], []
    for torch_key, (coll, path, conv) in KEY_MAPPERS[arch]():
        if torch_key not in state_dict_2d:
            skipped.append(torch_key)
            continue
        src = np.asarray(state_dict_2d[torch_key])
        tree = params if coll == "params" else batch_stats
        try:
            dst = _get_path(tree, path)
        except KeyError:
            # destination absent from this model variant (e.g. no 'fc'
            # subtree with with_classifier=False) — log-and-skip like the
            # reference initializer (initializer.py:105-140)
            skipped.append(torch_key)
            continue
        if conv is _conv_w and src.ndim == 4:
            kt, kh, kw, ci, co = dst.shape
            if src.shape != (co, ci, kh, kw):
                skipped.append(torch_key)
                continue
            v = np.transpose(src, (2, 3, 1, 0))           # [kh, kw, I, O]
            if kt == 1:
                v = v[None]                               # pure reshape
            else:
                v = np.broadcast_to(v[None] / float(kt), dst.shape)
        else:
            v = conv(src) if conv is not None else src
            if v.shape != dst.shape:
                skipped.append(torch_key)
                continue
        _set_path(tree, path, np.ascontiguousarray(v, dtype=dst.dtype))
        loaded.append(torch_key)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = batch_stats
    return out, loaded, skipped


def flax_to_torch(variables: dict, arch: str) -> Dict[str, np.ndarray]:
    """Flax variables {'params':..., 'batch_stats':...} -> torch state dict."""
    import jax

    if arch not in KEY_MAPPERS:
        raise NotImplementedError(
            f"No torch checkpoint mapping for arch {arch!r}; mapped archs: "
            f"{sorted(KEY_MAPPERS)}")

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray,
                                   variables.get("batch_stats", {}))
    out: Dict[str, np.ndarray] = {}
    for torch_key, (coll, flax_path, conv) in KEY_MAPPERS[arch]():
        tree = params if coll == "params" else stats
        try:
            v = _get_path(tree, flax_path)
        except KeyError:
            continue
        if conv is _conv_w:
            v = _conv_w_back(v)
        elif conv is _dense_w:
            v = _dense_w(v)
        out[torch_key] = np.asarray(v)
    return out
