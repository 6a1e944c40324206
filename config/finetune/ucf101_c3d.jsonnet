local datasets = import '../lib/datasets.libsonnet';
local models = import '../lib/models.libsonnet';
local default = import './default.libsonnet';

default {
  dataset: datasets.ucf101,
  model: models.c3d,
  model_type: 'multitask',
  batch_size: 20,
  validate: { batch_size: 40 },
  final_validate: { batch_size: 4 },
  optimizer+: { lr: 0.005 },
  num_epochs: 30,
}
