local base = import 'moco-train-base.jsonnet';

base {
  arch: 'r2plus1d-vcop',
  batch_size: 32,
  num_workers: 4,
  optimizer+: { lr: 0.05 },
  spatial_transforms+: { size: 112 },
  temporal_transforms+: { _size: 16 },
}
