"""SSL task layer: MoCo with dual pretext heads (A-VID + RSP).

TPU-native rebuild of the reference moco/ package (SURVEY.md §2.3): the
model factory produces a MultiTaskWrapper; training state and the fused
train step live in builder.py.
"""
from .builder import (MoCoConfig, MoCoState, diff_speed_gather,
                      init_moco_state, make_eval_step,
                      make_sharded_eval_step, make_sharded_train_step,
                      make_train_step, moco_loss, momentum_update,
                      packed_frame_subset, queue_update, speed_index_sets)
from .sharded_queue import (gather_queue_2d, make_sharded_eval_step_2d,
                            make_sharded_train_step_2d, queue_update_sharded,
                            shard_moco_state_2d)
from .wrapper import MultiTaskWrapper


def build_moco_model(cfg, dtype=None, axis_name="data"):
    """Build the pretrain MultiTaskWrapper + MoCoConfig from a ConfigTree
    (reference: ModelFactory.build_moco_diffloss, moco/__init__.py:19-55)."""
    from ..models import get_model_class

    # pass every model.* key through, like the reference's
    # get_model_class(**cfg.get_config('model')) (models/__init__.py:16)
    # — dropping them silently built e.g. a resnet50-based TSM for the
    # tsm-r18 config (base_model never arrived)
    model_cfg = cfg.get_config("model").as_plain_dict()
    arch = model_cfg.pop("arch")
    encoder_factory = get_model_class(arch, **model_cfg)
    if not cfg.get_list("moco.diff_speed"):
        # fail at build time with a clear message — the reference's builder
        # asserts the same (builder:334; its random.choice([]) would crash)
        raise ValueError(
            "moco.diff_speed must be a non-empty list (e.g. [2]); the "
            "dual-speed MoCo builder has no single-speed mode, matching "
            "the reference MoCoDiffLossTwoFc assertion")
    moco_cfg = MoCoConfig(
        dim=cfg.get_int("moco.dim"),
        k=cfg.get_int("moco.k"),
        m=cfg.get_float("moco.m"),
        t=cfg.get_float("moco.t"),
        diff_speed=tuple(cfg.get_list("moco.diff_speed")),
        fc_type=cfg.get_string("moco.fc_type", "linear"),
        loss_lambda_a=cfg.get_float("loss_lambda.A", 1.0),
        loss_lambda_m=cfg.get_float("loss_lambda.M", 1.0),
        # optional, off in all reference-parity configs: decode/ship only
        # the packed union of dual-speed frame positions
        packed_frames=cfg.get_bool("moco.packed_frames", False),
        t_load=(int(cfg.get("temporal_transforms.size"))
                if cfg.get("temporal_transforms.size", None) is not None
                else None),
    )
    model = MultiTaskWrapper(
        encoder_factory=encoder_factory,
        num_classes=moco_cfg.dim,
        finetune=False,
        fc_type=moco_cfg.fc_type,
        dtype=dtype,
        axis_name=axis_name,
    )
    return model, moco_cfg


__all__ = [
    "MultiTaskWrapper", "MoCoConfig", "MoCoState", "build_moco_model",
    "init_moco_state", "make_train_step", "make_sharded_train_step",
    "make_eval_step", "make_sharded_eval_step",
    "momentum_update", "queue_update", "moco_loss", "diff_speed_gather",
    "speed_index_sets",
    "make_sharded_train_step_2d", "make_sharded_eval_step_2d",
    "queue_update_sharded", "shard_moco_state_2d", "gather_queue_2d",
]
