local base = import 'moco-train-base.jsonnet';

base {
  arch: 's3dg',
  batch_size: 64,
  num_workers: 4,
  optimizer+: { lr: 0.05 },
  spatial_transforms+: { size: 224 },
}
