local datasets = import '../lib/datasets.libsonnet';
local models = import '../lib/models.libsonnet';
local default = import './default.libsonnet';

default {
  dataset: datasets.hmdb51,
  model: models.r2plus1d,
  model_type: 'multitask',
  local bs_factor = 112 * 112 * 16 / self.temporal_transforms.size
                    / self.spatial_transforms.size / self.spatial_transforms.size,
  batch_size: 16 * bs_factor,
  validate: { batch_size: 8 * bs_factor },
  final_validate: { batch_size: 4 * bs_factor },
  optimizer+: { lr: 0.1 },
}
