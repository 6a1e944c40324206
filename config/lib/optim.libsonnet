// Optimizer presets + pretext-task loss weights.
// Values match the reference optimizer fragments byte-for-byte in manifest.
{
  sgd: {
    lr: 1e-1,
    momentum: 0.9,
    dampening: 0,
    nesterov: false,
    weight_decay: 1e-4,
    patience: 10,
    schedule: 'cosine',
    milestones: [50, 100, 150],
  },

  adam: {
    type: 'adam',
    lr: 1e-3,
    eps: 1e-8,
    schedule: 'none',
  },

  // loss = A * InfoNCE(A-VID) + M * margin-ranking(RSP); F is reserved.
  loss_lambda: {
    A: 1.0,
    M: 1.0,
    F: 1.0,
  },
}
