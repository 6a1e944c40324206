// Backbone architecture presets (consumed as `model:` config subtrees).
local slowfast_yaml(name) = 'config/slowfast-configs/Kinetics/%s.yaml' % name;

{
  c3d: { arch: 'c3d' },
  s3dg: { arch: 's3dg' },
  s3d: { arch: 's3d' },
  r2plus1d: { arch: 'r2plus1d-vcop' },

  resnet18: { arch: 'resnet18' },
  resnet34: { arch: 'resnet34' },
  resnet50: { arch: 'resnet50' },

  slowfast: {
    arch: 'slowfast',
    cfg_file: {
      slowfast_4x16_r50: slowfast_yaml('SLOWFAST_4x16_R50'),
      slowfast_nln_4x16_r50: slowfast_yaml('SLOWFAST_NLN_4x16_R50'),
    },
  },
}
