// Named ablation mixins for `-x add.<name>` CLI overrides (pretrain).
{
  no_random_gray: {
    spatial_transforms+: { gray_scale: 0 },
  },

  no_color_jitter: {
    spatial_transforms+: {
      color_jitter: { brightness: 0, contrast: 0, saturation: 0, hue: 0 },
    },
  },

  random_stride: {
    temporal_transforms+: {
      strides: [
        { stride: 1, weight: 1 },
        { stride: 2, weight: 1 },
        { stride: 4, weight: 1 },
      ],
    },
  },

  weighted_stride: {
    temporal_transforms+: {
      strides: [
        { stride: 1, weight: 8 },
        { stride: 2, weight: 1 },
        { stride: 4, weight: 1 },
      ],
    },
  },

  M0: { loss_lambda+: { M: 0 } },  // disable the RSP ranking task
  A0: { loss_lambda+: { A: 0 } },  // disable A-VID InfoNCE

  fps25: {
    temporal_transforms+: { frame_rate: 25 },
  },
}
