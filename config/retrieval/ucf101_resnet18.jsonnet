local datasets = import '../lib/datasets.libsonnet';
local models = import '../lib/models.libsonnet';
local default = import './default.libsonnet';

default {
  dataset: datasets.ucf101,
  model: models.resnet18,
  model_type: 'multitask',
  batch_size: 8,
  validate: { batch_size: 8 },
  final_validate: { batch_size: 8 },
}
