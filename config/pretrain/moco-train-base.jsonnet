// Base config for MoCo + relative-speed (RSP) pretraining.
// Schema contract: SURVEY.md §5.6; values match the reference base config.
local optim = import '../lib/optim.libsonnet';
local datasets = import '../lib/datasets.libsonnet';

{
  arch: 'resnet18',
  model: { arch: $.arch },

  dataset: datasets.kinetics400,  // or datasets.kinetics100

  batch_size: 64,
  num_workers: 4,
  num_epochs: '200',

  optimizer: optim.sgd,
  loss_lambda: optim.loss_lambda,
  log_interval: 10,
  opt_level: 'O0',  // kept for config compatibility; unused on TPU

  checkpoint_interval: 50,

  moco: {
    dim: 128,
    k: 16384,
    m: 0.999,
    t: 0.07,
    mlp: false,
    // [2] = 2x; [4] = 4x; [4,2,1] = random choice per step. Must be
    // non-empty (the reference's builder asserts the same).
    diff_speed: [2],
    aug_plus: false,
    fc_type: 'linear',  // linear | mlp | conv
  },

  spatial_transforms: {
    size: 112,
  },

  temporal_transforms: {
    _size:: 16,
    // Dual-speed sampling loads diff_speed[0]*_size frames and subsamples
    // on-device (rspnet_tpu/moco/diff_speed.py).
    size: if std.length($.moco.diff_speed) == 0
          then self._size
          else $.moco.diff_speed[0] * self._size,
    strides: [
      { stride: 1, weight: 1 },
    ],
    frame_rate: null,  // null = keep native fps; number = resample
    random_crop: true,
  },
}
