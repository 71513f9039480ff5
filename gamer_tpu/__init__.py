"""gamer_tpu — a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
GAMER stack (generative augmentation + multi-level behavior modeling for
sequential recommendation): discriminative behavior encoders, RQ-VAE semantic-ID
tokenizers, and generative semantic-ID decoders with session-wise multi-behavior
attention, position-routed MoE experts and trie-constrained on-device beam search.

Layering (see SURVEY.md section 7):
  core/        mesh + runtime + config + logging + registry
  data/        dataset contract readers, SMB session engine, batching
  ops/         numerical building blocks (masks, sinkhorn, kmeans, quantization)
  modules/     flax transformer building blocks, losses
  models/      discriminative / tokenizer / generative model zoo
  decode/      on-device constrained beam search
  train/       training loops, optimizer, checkpointing
  evaluation/  ranking metrics
  tasks/       CLI task pipelines (parity with the reference's 11 tasks)
"""

__version__ = "0.1.0"
