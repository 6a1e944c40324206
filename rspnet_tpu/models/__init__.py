"""Model registry: arch string -> constructor (reference: models/__init__.py:16-75).

Constructors return flax modules taking NDHWC video input [B, T, H, W, 3].
Every backbone exposes:
- ``__call__(x, train)`` -> logits [B, num_classes] (or embedding when
  ``with_classifier=False``)
- ``features`` method (apply with ``method='features'``) -> pre-pool conv map
- ``feature_dim`` property (replaces the reference's fc-attr introspection,
  moco/split_wrapper.py:181-190)
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn

from . import c3d as _c3d
from . import r2plus1d as _r2plus1d
from . import resnet3d as _resnet3d
from . import s3dg as _s3dg
from .c3d import C3D
from .r2plus1d import R2Plus1DNet
from .resnet3d import ResNet3D
from .s3dg import S3DG

_REGISTRY = {
    "c3d": _c3d.C3D,
    "resnet10": _resnet3d.resnet10,
    "resnet18": _resnet3d.resnet18,
    "resnet34": _resnet3d.resnet34,
    "resnet50": _resnet3d.resnet50,
    "resnet101": _resnet3d.resnet101,
    "resnet152": _resnet3d.resnet152,
    "resnet200": _resnet3d.resnet200,
    "s3dg": _s3dg.s3dg,
    "s3d": _s3dg.s3d,
    "r2plus1d-vcop": _r2plus1d.r2plus1d_vcop,
    "r2plus1d-18": _r2plus1d.r2plus1d_18,
}

def available_archs():
    """Every arch get_model_class accepts: the registry plus the
    dispatch-handled families (sub-registry archs listed by their entry
    names; SLOWFAST_*/SLOW_*/C2D*/I3D* variant names also resolve)."""
    return sorted(_REGISTRY) + ["mfnet", "slowfast", "torchvision-resnet18",
                                "tsm"]


def get_model_class(arch: str, **model_cfg) -> Callable[..., nn.Module]:
    """Return a constructor: (num_classes=..., **kw) -> flax Module.

    Mirrors the reference dispatch (models/__init__.py:16-75); SLOWFAST*
    archs route through the slowfast sub-registry.
    """
    if (arch == "slowfast" or arch.startswith(("SLOWFAST", "SLOW_", "C2D",
                                               "I3D"))):
        from . import slowfast
        return slowfast.get_model_class(arch, **model_cfg)
    if arch == "mfnet":
        from . import mfnet
        return mfnet.MFNet3D
    if arch == "tsm":
        from . import tsm
        return tsm.get_model_class(**model_cfg)
    if arch == "torchvision-resnet18":
        from . import video_resnet
        from functools import partial
        return partial(video_resnet.r3d_18,
                       pretrain=model_cfg.get("pretrain", False))
    if arch in _REGISTRY:
        return _REGISTRY[arch]
    raise ValueError(
        f"Unknown arch {arch!r}; available: {available_archs()}")


__all__ = ["get_model_class", "available_archs", "C3D", "ResNet3D", "S3DG",
           "R2Plus1DNet"]
