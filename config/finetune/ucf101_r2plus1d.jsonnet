local datasets = import '../lib/datasets.libsonnet';
local models = import '../lib/models.libsonnet';
local default = import './default.libsonnet';

default {
  dataset: datasets.ucf101,
  model: models.r2plus1d,
  model_type: 'multitask',
  temporal_transforms+: {
    size: 16,
    frame_rate: null,
  },
  local bs_factor = 112 * 112 * 8 / self.temporal_transforms.size
                    / self.spatial_transforms.size / self.spatial_transforms.size,
  batch_size: 16 * bs_factor,
  validate: { batch_size: 128 * bs_factor },
  final_validate: { batch_size: 16 * bs_factor },
  optimizer+: { lr: 0.1 },
  num_epochs: 30,
}
