local base = import 'moco-train-base.jsonnet';

base {
  arch: 'resnet50',
  batch_size: 32,
  num_workers: 4,
}
