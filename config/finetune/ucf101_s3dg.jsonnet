local datasets = import '../lib/datasets.libsonnet';
local models = import '../lib/models.libsonnet';
local default = import './default.libsonnet';

default {
  dataset: datasets.ucf101,
  model: models.s3dg,
  model_type: 'multitask',
  spatial_transforms+: { size: 224 },
  temporal_transforms+: {
    size: 64,
    frame_rate: 25,
  },
  batch_size: 4,
  validate: { batch_size: 4 },
  final_validate: { batch_size: 4 },
  optimizer+: { lr: 0.005 },
  num_epochs: 50,
}
