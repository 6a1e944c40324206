local base = import 'moco-train-base.jsonnet';

base {
  arch: 'c3d',
  batch_size: 32,
  num_workers: 4,
}
