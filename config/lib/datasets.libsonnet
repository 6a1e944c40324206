// Dataset catalog for rspnet_tpu experiments.
// Keys/values match the reference dataset fragments so that composed
// experiment configs manifest identically (see tests/test_config_parity.py).
local imagenet_stats = {
  mean: [0.485, 0.456, 0.406],
  std: [0.229, 0.224, 0.225],
};

{
  ucf101: imagenet_stats {
    name: 'ucf101',
    root: 'data/UCF101/UCF-101',
    annotation_path: 'data/UCF101/ucfTrainTestlist',
    fold: 1,
    num_classes: 101,
  },

  hmdb51: imagenet_stats {
    name: 'hmdb51',
    root: 'data/hmdb51/videos',
    annotation_path: 'data/hmdb51/metafile',
    fold: 1,
    num_classes: 51,
  },

  kinetics400: imagenet_stats {
    name: 'kinetics400',
    root: 'data/kinetics400',
    num_classes: 400,
    blacklist: [
      'train_video/playing_monopoly/NLL667uPWVA.mp4',
    ],
  },

  kinetics100: imagenet_stats {
    name: 'kinetics100',
    root: 'data/kinetics100',
    num_classes: 100,
    blacklist: [
      'train_video/eating_carrots/eiZ8Hzc7FPU_000080_000090.mp4',
      'train_video/playing_flute/co50KUHacYw_000005_000015.mp4',
      'train_video/sweeping_floor/EuGXJiVQwCg_000005_000015.mp4',
      'train_video/making_tea/mtYFNsRcxY4_000063_000073.mp4',
      'train_video/building_cabinet/jQPSzhKkk-g_000028_000038.mp4',
      'val_video/skipping_rope/sAA809R_u1E_000077_000087.mp4',
    ],
  },

  smth_smth: imagenet_stats {
    name: 'smth_smth',
    root: 'data/smth-smth-v2/20bn-something-something-v2',
    annotation_path: 'data/smth-smth-v2/annotations',
    fold: 1,
    num_classes: 174,
  },

  oops_moco: imagenet_stats {
    name: 'oops_moco',
    root: 'data/oops/oops_video_256/train',
    blacklist: [
      'FailArmy Presents - People are Awesome _ Epic Wins Compilation46.mp4',
    ],
  },
}
