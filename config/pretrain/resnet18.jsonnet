local base = import 'moco-train-base.jsonnet';

base {
  arch: 'resnet18',
  batch_size: 64,
  num_workers: 8,
}
