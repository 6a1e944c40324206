"""Shared lists of entry configs + CLI mixins, used by both the config
parity tests (tests/test_config_parity.py) and the golden-manifest
generator (tests/golden/make_config_goldens.py)."""

ENTRY_CONFIGS = [
    "pretrain/c3d.jsonnet",
    "pretrain/resnet18.jsonnet",
    "pretrain/resnet50.jsonnet",
    "pretrain/tsm-r18.jsonnet",
    "pretrain/s3dg.jsonnet",
    "pretrain/r2plus1d.jsonnet",
    "finetune/ucf101_c3d.jsonnet",
    "finetune/ucf101_resnet18.jsonnet",
    "finetune/ucf101_s3dg.jsonnet",
    "finetune/ucf101_r2plus1d.jsonnet",
    "finetune/hmdb51_c3d.jsonnet",
    "finetune/hmdb51_resnet18.jsonnet",
    "finetune/hmdb51_s3dg.jsonnet",
    "finetune/hmdb51_r2plus1d.jsonnet",
    "finetune/smth_smth_c3d.jsonnet",
    "finetune/smth_smth_resnet18.jsonnet",
    "finetune/smth_smth_s3dg.jsonnet",
    "retrieval/ucf101_c3d.jsonnet",
    "retrieval/ucf101_resnet18.jsonnet",
]

PRETRAIN_MIXINS = [
    "add.M0", "add.A0", "add.random_stride", "add.weighted_stride",
    "add.no_random_gray", "add.no_color_jitter", "add.fps25",
]

FINETUNE_MIXINS = [
    "add.linear", "add.multitask", "add.sp_224", "add.addtrans",
    "add.model_2stream", "add.finetune", "add.smth_linear", "add.r18k400",
]


def golden_name(rel: str, ext) -> str:
    name = rel.replace("/", "__").replace(".jsonnet", "")
    if ext:
        name += "__" + "_".join(e.replace(".", "-") for e in ext)
    return name + ".json"
